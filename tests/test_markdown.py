"""Markdown conversion tests transcribed from the reference
(internal/markdown/convert_test.go, convert_behavior_test.go)."""

import pytest

from defuddle_spark.markdown import MarkdownError, convert_html


def test_converts_and_cleans_whitespace():
    # convert_test.go:8-25
    got = convert_html("<p>First</p>\n\n\n<p>Second</p>")
    assert got == got.strip()
    assert "\n\n\n" not in got
    assert "First" in got and "Second" in got


def test_empty_input():
    # convert_test.go:27-37
    assert convert_html("") == ""


def test_preserves_readable_markdown():
    # convert_test.go:39-69
    got = convert_html("""<article>
        <h1>Example</h1>
        <p>Read the <a href="https://example.com/docs">docs</a>.</p>
        <blockquote>Quoted text</blockquote>
        <ul><li>First</li><li>Second</li></ul>
        <pre><code class="language-go">fmt.Println("hi")</code></pre>
        <img src="/cover.png" alt="Cover image">
    </article>""")
    for check in ("# Example", "[docs](https://example.com/docs)",
                  "> Quoted text", "- First", "- Second", "fmt.Println",
                  "![Cover image](/cover.png)"):
        assert check in got, got
    assert "```go" in got


def test_deep_nesting_errors():
    # convert_behavior_test.go:8-16
    with pytest.raises((MarkdownError, RecursionError)):
        convert_html("<div>" * 20000)


def test_ordered_list_and_emphasis():
    got = convert_html(
        "<ol><li>One <strong>bold</strong></li><li>Two <em>it</em></li></ol>")
    assert "1. One **bold**" in got
    assert "2. Two *it*" in got


def test_kernel_markdown_option():
    # defuddle_test.go:877-909 TestParseFromString (Markdown option)
    from defuddle_spark import Options, extract_document
    html = """<!DOCTYPE html><html><head><title>Test Page</title>
    <meta name="description" content="This is a test page"></head>
    <body><h1>Main Heading</h1>
    <p>This is the main content of the test page.</p>
    <p>Another paragraph with more content.</p></body></html>"""
    r = extract_document(html, url="https://example.com/test",
                         options=Options(markdown=True))
    assert r.content_markdown
    assert "main content of the test page" in r.content_markdown
    assert r.domain == "example.com"

    # defuddle_test.go:954-966: SeparateMarkdown keeps HTML content
    html2 = "<html><head><title>Separate Markdown</title></head><body><article><h1>Separate Markdown</h1><p>Readable markdown body.</p></article></body></html>"
    r2 = extract_document(html2, options=Options(separate_markdown=True))
    assert "<p>Readable markdown body.</p>" in r2.content
    assert "Readable markdown body" in r2.content_markdown


# --- K1 byte-parity constructs (html-to-markdown v2 conventions) ---------
# The Go library cannot run in this container; these pin the publicly
# documented CommonMark output conventions it follows. Per-construct
# parity status is catalogued in COVERAGE.md §2.8.

def test_smart_escaping_inline():
    got = convert_html("<p>2 * 3 = 6, snake_case, _it_, a*b, #tag, x!y</p>")
    assert "2 * 3 = 6" in got            # isolated * not escaped
    assert "snake_case" in got           # intraword _ not escaped
    assert r"\_it\_" in got              # word-boundary _ escaped
    assert r"a\*b" in got                # flanking * escaped
    assert "#tag" in got                 # mid-line # not escaped
    assert "x!y" in got                  # ! only escaped before [


def test_smart_escaping_line_starts():
    got = convert_html(
        "<p># heading<br>- bullet<br>1. item<br>&gt; quote<br>--- rule</p>")
    assert got.startswith(r"\# heading")
    for frag in (r"\- bullet", r"1\. item", r"\> quote"):
        assert frag in got, got


def test_escaping_brackets_pipes_tildes():
    got = convert_html("<p>[x] | ~~y~~ &lt;div&gt; `tick`</p>")
    assert r"\[x\]" in got
    assert r"\|" in got
    assert r"\~\~y\~\~" in got
    assert r"\<div>" in got
    assert r"\`tick\`" in got


def test_nested_emphasis_and_whitespace_hoisting():
    assert convert_html("<p><strong><em>x</em></strong></p>") == "***x***"
    assert convert_html("<p>a<b> x </b>b</p>") == "a **x** b"
    assert convert_html("<p><del>gone</del></p>") == "~~gone~~"
    assert convert_html("<p><b>  </b>k</p>") == "k"


def test_code_span_fence_expansion():
    assert convert_html("<p><code>a ` b</code></p>") == "``a ` b``"
    assert convert_html("<p><code>`tick`</code></p>") == "`` `tick` ``"
    assert convert_html("<p><code>plain</code></p>") == "`plain`"


def test_code_block_fence_expansion():
    got = convert_html("<pre><code>has ``` inside</code></pre>")
    assert got == "````\nhas ``` inside\n````"


def test_link_destination_and_title():
    got = convert_html(
        '<p><a href="https://x.test/a(1)" title=\'T "q"\'>l</a></p>')
    assert got == '[l](https://x.test/a\\(1\\) "T \\"q\\"")'
    got2 = convert_html('<p><a href="https://x.test/with space">s</a></p>')
    assert got2 == "[s](<https://x.test/with space>)"


def test_image_alt_and_title():
    got = convert_html('<p><img src="/i.png" alt="a [b]" title="T"></p>')
    assert got == '![a \\[b\\]](/i.png "T")'


def test_ordered_list_start_attribute():
    got = convert_html('<ol start="3"><li>three</li><li>four</li></ol>')
    assert got == "3. three\n4. four"


def test_hard_break_is_backslash():
    assert convert_html("<p>a<br>b</p>") == "a\\\nb"


def test_hr_is_triple_dash():
    assert convert_html("<p>a</p><hr><p>b</p>") == "a\n\n---\n\nb"


def test_no_escaping_inside_code():
    got = convert_html("<pre><code>*raw* _x_ [y] # z</code></pre>")
    assert "*raw* _x_ [y] # z" in got
    got2 = convert_html("<p><code>*raw*</code></p>")
    assert got2 == "`*raw*`"


def test_multi_block_list_items():
    # CommonMark continuation: later blocks indent 4 under the item
    assert convert_html("<ul><li><p>a1</p><p>a2</p></li><li>b</li></ul>") == \
        "- a1\n\n    a2\n- b"
    assert convert_html("<ul><li>a<blockquote>q</blockquote></li></ul>") == \
        "- a\n\n    > q"
    assert convert_html("<ol><li>x<pre><code>c()</code></pre></li></ol>") == \
        "1. x\n\n    ```\n    c()\n    ```"
    # nested lists stay tight (no blank line)
    assert convert_html("<ul><li>a<ul><li>n</li></ul></li><li>b</li></ul>") == \
        "- a\n    - n\n- b"


def test_gate_construct_families_through_full_kernel():
    """The extract_markdown driver query's synthesis contract: each
    construct family converts to the exact shape the DuckDB oracle
    rebuilds (__spark_entry__.py), AFTER standardization (which e.g.
    strips ol start= — not in ALLOWED_ATTRIBUTES)."""
    from defuddle_spark.kernel import Options, extract_document

    text = "key agg row scan"
    did = 7
    cases = [
        (f'<h2>Section {did}</h2><p>{text}</p><h3>Detail {did}</h3>'
         '<p>closing words here</p>',
         f'## Section {did}\n\n{text}\n\n### Detail {did}\n\nclosing words here'),
        ('<p>plain <em>soft</em> and <strong>hard</strong> and '
         f'<strong><em>both</em></strong> words</p><p>{text}</p>',
         f'plain *soft* and **hard** and ***both*** words\n\n{text}'),
        (f'<ol start="5"><li>first</li><li>second {did}</li></ol><p>{text}</p>',
         f'1. first\n2. second {did}\n\n{text}'),
        (f'<p>inline <code>x = {did}</code> call</p>'
         f'<pre><code class="language-python">print({did})</code></pre>'
         f'<p>{text}</p>',
         f'inline `x = {did}` call\n\n```python\nprint({did})\n```\n\n{text}'),
        (f'<p>before {did}</p><hr><p>line one<br>line two</p>'
         f'<p><img src="https://img.example.test/{did}.png" alt="Figure {did}">'
         f'</p><p>{text}</p>',
         f'before {did}\n\n---\n\nline one \\\n line two\n\n'
         f'![Figure {did}](https://img.example.test/{did}.png)\n\n{text}'),
    ]
    for construct, want in cases:
        html = (f'<!DOCTYPE html><html><head><meta charset="utf-8">'
                f'<title>Doc {did}</title></head><body><article>'
                f'<h1>Doc {did}</h1>{construct}</article></body></html>')
        r = extract_document(html, url=f"https://md.example.test/{did}",
                             options=Options(markdown=True))
        assert r.content_markdown == want, construct


def test_table_cells_flatten_by_default():
    """ConvertString registers base+commonmark only (convert.go:13-23) —
    no table plugin — so table elements fall back to block-container
    rendering: each cell's content becomes its own block."""
    h = ('<table><thead><tr><th>Name</th><th>Count</th></tr></thead>'
         '<tbody><tr><td>alpha</td><td>7</td></tr></tbody></table>')
    assert convert_html(h) == "Name\n\nCount\n\nalpha\n\n7"
    # block content inside a cell renders as blocks too
    assert convert_html(
        "<table><tr><td><p>para</p><ul><li>x</li></ul></td></tr></table>"
    ) == "para\n\n- x"
    # caption participates in document order
    assert convert_html(
        "<table><caption>Cap</caption><tr><td>v</td></tr></table>"
    ) == "Cap\n\nv"


def test_table_pipe_rendering_behind_option():
    h = ('<table><tr><th>Name</th><th>Count</th></tr>'
         '<tr><td>alpha</td><td>7</td></tr></table>')
    assert convert_html(h, pipe_tables=True) == \
        "| Name | Count |\n| --- | --- |\n| alpha | 7 |"
    # threads through list-item table blocks as well
    h2 = "<ul><li>item<table><tr><td>cell</td></tr></table></li></ul>"
    assert convert_html(h2, pipe_tables=True) == \
        "- item\n\n    | cell |\n    | --- |"
    assert convert_html(h2) == "- item\n\n    cell"


def test_kernel_markdown_pipe_tables_option():
    from defuddle_spark.kernel import Options, extract_document

    body = "word " * 60
    html = ('<!DOCTYPE html><html><head><title>T</title></head><body>'
            f'<article><p>{body}</p><table><tr><td>a</td><td>b</td></tr>'
            '</table></article></body></html>')
    flat = extract_document(html, options=Options(markdown=True))
    piped = extract_document(
        html, options=Options(markdown=True, markdown_pipe_tables=True))
    assert "a\n\nb" in flat.content_markdown
    assert "| a | b |" in piped.content_markdown


def test_orphan_table_tags_block_parity_across_modes():
    """ADVICE r5: orphan table-family tags (td/tr/caption with no ancestor
    <table> in the rendered tree) must act as block containers in pipe
    mode exactly as in the default mode — only a cell reached through
    _render_table renders as a pipe cell. The full parser drops orphan
    cell tags in body, so drive the renderer with a constructed tree."""
    from defuddle_spark.dom import Element, Text
    from defuddle_spark.markdown import _render_blocks

    root = Element("div")
    td = Element("td")
    td.append(Text("cell one"))
    tr = Element("tr")
    for t in ("a", "b"):
        c = Element("td")
        c.append(Text(t))
        tr.append(c)
    cap = Element("caption")
    cap.append(Text("cap"))
    for n in (td, tr, cap):
        root.append(n)
    outs = {}
    for mode in (False, True):
        out = []
        _render_blocks(root, 0, out, pipe_tables=mode)
        outs[mode] = out
    assert outs[False] == ["cell one", "a", "b", "cap"]
    assert outs[True] == outs[False]


def test_unhandled_block_elements_flatten_as_blocks():
    """dl/dt/dd, hgroup, menu, and orphan <li> are BLOCK elements in the
    v2 base plugin's classification: their children render as
    blank-line-separated blocks (an hgroup keeps its heading a heading),
    never inline-concatenated."""
    assert convert_html("<dl><dt>term</dt><dd>definition</dd></dl>") == \
        "term\n\ndefinition"
    assert convert_html("<hgroup><h1>A</h1><p>sub</p></hgroup>") == \
        "# A\n\nsub"
    assert convert_html("<menu><li>one</li><li>two</li></menu>") == \
        "one\n\ntwo"
    assert convert_html("<li>orphan</li>after") == "orphan\n\nafter"
    assert convert_html("<address>42 Street</address><p>x</p>") == \
        "42 Street\n\nx"
