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
