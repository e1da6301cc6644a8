"""Element processor tests transcribed from the reference
(internal/elements/elements_test.go, processing_behavior_test.go,
roles_test.go, footnotes_test.go)."""

from defuddle_spark import elements
from defuddle_spark.dom import parse
from defuddle_spark.selectors import find_all, find_first


def _doc(html):
    return parse(f"<html><body>{html}</body></html>")


def test_code_block_processing():
    # elements_test.go:13-36
    doc = _doc("""
    <div class="highlight language-javascript">
        <pre><code>function test() { return "hello"; }</code></pre>
    </div>
    <div class="syntaxhighlighter">
        <div class="code"><div class="line">console.log("test");</div></div>
    </div>""")
    elements.process_code_blocks(doc)
    pres = find_all(doc.html, "pre")
    assert len(pres) > 0
    # language detected and carried on code element
    code = find_first(doc.html, "code")
    assert code.get("class") == "language-javascript"
    assert code.get("data-lang") == "javascript"


def test_wordpress_syntaxhighlighter_lines():
    # code.go:454-508 line extraction
    doc = _doc("""
    <div class="syntaxhighlighter python">
      <div class="code">
        <div class="line">def f():</div>
        <div class="line">    return 1</div>
      </div>
    </div>""")
    elements.process_code_blocks(doc)
    pre = find_first(doc.html, "pre")
    assert pre is not None
    assert "def f():" in pre.text()
    assert "return 1" in pre.text()
    code = find_first(pre, "code")
    assert code.get("data-lang") == "python"


def test_heading_processing():
    # elements_test.go:38-66
    doc = _doc("""
    <h1><a href="#test" class="anchor">Test Heading</a><button class="copy-link">Copy</button></h1>
    <h2>Clean Heading <span><a href="#clean">§</a></span></h2>""")
    elements.process_headings(doc)
    headings = find_all(doc.html, "h1, h2")
    assert len(headings) == 2
    assert find_all(doc.html, 'a[href^="#"]') == []
    h1 = find_first(doc.html, "h1")
    assert h1.text() == "Test Heading"  # rescued from navigation text
    h2 = find_first(doc.html, "h2")
    assert "Clean Heading" in h2.text()
    assert "§" not in h2.text()


def test_math_processing():
    # elements_test.go:68-98 + processing_behavior_test.go:49-96
    doc = _doc("""
    <div class="math-display">
        <span class="MathJax_Preview">preview</span>
        <span class="MathJax"><script type="math/tex">x^2 + y^2</script></span>
        <script type="text/javascript" src="/mathjax.js"></script>
    </div>""")
    elements.process_math(doc)
    math = find_first(doc.html, "math")
    assert math is not None
    assert math.get("xmlns") == "http://www.w3.org/1998/Math/MathML"
    assert math.get("display") == "block"  # parent div.math-display
    assert "x^2 + y^2" in (math.get("data-latex") or "")
    assert find_all(doc.html, ".MathJax_Preview") == []
    assert find_all(doc.html, 'script[src*="mathjax"]') == []


def test_math_centered_parent_is_block():
    # processing_behavior_test.go:70-84
    doc = _doc('<div style="TEXT-ALIGN: center"><span class="MathJax"><script type="math/tex">x^2</script></span></div>')
    elements.process_math(doc)
    assert find_first(doc.html, "math").get("display") == "block"


def test_math_preserves_existing_mathml():
    # processing_behavior_test.go:86-99
    doc = _doc('<div><math display="inline"><mi>x</mi><mo>=</mo><mn>1</mn></math></div>')
    elements.process_math(doc)
    math = find_first(doc.html, "math")
    assert math.get("display") == "inline"
    assert math.text().strip() == "x=1"


def test_looks_like_latex():
    # elements_test.go:100-114
    for text in ("$x^2$", r"\frac{1}{2}", "alpha_beta"):
        assert elements.looks_like_latex(text)
    assert not elements.looks_like_latex("plain text")


def test_image_processing_small_and_tracking_removed():
    # elements_test.go:116-149 + processing_behavior_test.go:12-27
    doc = _doc("""
    <article>
        <img src="/analytics/pixel.gif" alt="tracking" width="1" height="1">
        <img src="icon.png" class="decorative-icon" alt="icon" width="32" height="32">
        <img src="hero.jpg" class="article-photo" alt="Launch photo overview shot">
    </article>""")
    elements.process_images(doc)
    assert find_all(doc.html, 'img[src*="pixel.gif"]') == []
    assert find_all(doc.html, "img.decorative-icon") == []
    kept = find_all(doc.html, "img.article-photo")
    assert len(kept) == 1
    assert "responsive-image" in kept[0].get("class")


def test_image_lazy_promotion_and_figure_metadata():
    # elements_test.go:151-180
    doc = _doc("""
    <figure>
        <img data-src="https://example.com/images/hero-photo.jpg" data-srcset="hero-small.jpg 480w, hero-large.jpg 960w" alt="Detailed product hero display" width="960">
    </figure>
    <picture>
        <source srcset="  https://example.com/image.webp 1x  ">
        <img src="fallback.jpg" alt="Fallback image">
    </picture>""")
    elements.process_images(doc)
    fig = find_first(doc.html, "figure")
    assert "image-figure" in fig.get("class")
    assert "large-image" in fig.get("class")
    cap = find_first(fig, "figcaption")
    assert cap.text().strip() == "Detailed product hero display"
    img = find_first(fig, "img")
    assert img.get("src") == "https://example.com/images/hero-photo.jpg"
    assert img.get("srcset") == "hero-small.jpg 480w, hero-large.jpg 960w"
    assert not img.get("data-src")
    assert "responsive-image" in img.get("class")
    assert find_first(doc.html, "source").get("srcset") == "https://example.com/image.webp 1x"


def test_image_alt_from_context_heading():
    # processing_behavior_test.go:29-47
    doc = _doc("""
    <article>
        <h2>Launch Event Gallery</h2>
        <figure><img src="launch-event-photo.jpg" alt="image" width="960"></figure>
    </article>""")
    elements.process_images(doc)
    img = find_first(doc.html, "figure img")
    assert img.get("alt") == "Launch Event Gallery"
    assert "responsive-image" in img.get("class")
    assert img.get("loading") == "eager"
    assert find_first(doc.html, "figcaption").text().strip() == "Launch Event Gallery"
    assert "large-image" in find_first(doc.html, "figure").get("class")


def test_footnote_processing():
    # elements_test.go:182-212
    doc = _doc("""
    <p>This is text with a footnote<sup><a href="#fn1">1</a></sup>.</p>
    <div id="fn1">This is the footnote content.</div>
    <p>Another reference<a href="#note2">[2]</a>.</p>
    <div id="note2">Second footnote.</div>""")
    footnotes = elements.process_footnotes(doc)
    assert len(footnotes) > 0
    for fn in footnotes:
        assert fn.id
        if fn.definition is not None:
            assert fn.content


def test_footnote_text_patterns_no_crash():
    # elements_test.go:214-227
    doc = _doc("<p>Alpha [1] beta (2) gamma *3 delta †4 epsilon [note].</p>")
    proc = elements.FootnoteProcessor(doc)
    fns = proc.detect_text_footnotes(elements.FootnoteProcessingOptions())
    assert fns


def test_footnote_definition_prefix_matching():
    # footnotes_test.go:33-57
    for key, text in (("1", "1. Dot note"), ("2", "[2] Bracket note"),
                      ("3", "3) Paren note")):
        doc = _doc(f'<article><section class="footnotes"><ol><li>{text}</li></ol></section></article>')
        d = elements.FootnoteProcessor(doc).find_footnote_definition(key)
        assert d is not None
        assert d.text().strip() == text


def test_footnote_cleanup_dedupes():
    # footnotes_test.go:12-31
    doc = _doc("<p>x</p>")
    proc = elements.FootnoteProcessor(doc)
    cleaned = proc.cleanup([
        elements.Footnote(id="fn1", content="Note"),
        elements.Footnote(id="fn1", content="Duplicate"),
        elements.Footnote(id="", content="Invalid"),
    ])
    assert len(cleaned) == 1 and cleaned[0].id == "fn1"


def test_roles_convert_semantic_elements():
    # roles_test.go:13-44
    doc = _doc("""
    <div role="paragraph" id="intro">Intro</div>
    <div role="list" id="steps">
        <div role="listitem"><span class="label">1)</span>
            <div class="content"><div role="paragraph">First item</div></div></div>
        <div role="listitem"><span class="label">2)</span>
            <div class="content"><div role="paragraph">Second item</div></div></div>
    </div>
    <div role="button" id="cta">Click</div>
    <div role="link" id="docs-link" href="https://example.com/docs">Docs</div>""")
    elements.process_roles(doc)
    assert len(find_all(doc.html, "p#intro")) == 1
    assert len(find_all(doc.html, "ol#steps")) == 1
    assert len(find_all(doc.html, "ol#steps > li")) == 2
    assert find_all(doc.html, ".label") == []
    assert len(find_all(doc.html, "button#cta")) == 1
    assert len(find_all(doc.html, 'a#docs-link[href="https://example.com/docs"]')) == 1
    assert find_all(doc.html, "[role]") == []


def test_roles_unordered_without_numbered_labels():
    # roles_test.go:57-73
    doc = _doc("""
    <div role="list" id="items">
        <div role="listitem"><span class="label">•</span>Alpha</div>
        <div role="listitem"><span class="label">•</span>Beta</div>
    </div>""")
    elements.process_roles(doc)
    assert len(find_all(doc.html, "ul#items")) == 1
    assert len(find_all(doc.html, "ul#items > li")) == 2
    assert find_all(doc.html, "ol#items") == []


def test_public_interfaces_keep_structure():
    # elements_test.go:229-261
    doc = _doc("""
    <div>
        <h1><a href="#test">Test</a></h1>
        <pre><code class="language-go">fmt.Println("hello")</code></pre>
        <img src="test.jpg" alt="">
        <div class="MathJax"><script type="math/tex">x^2</script></div>
        <p>Footnote<sup><a href="#fn1">1</a></sup></p>
        <div id="fn1">Note content</div>
    </div>""")
    elements.process_headings(doc)
    elements.process_code_blocks(doc)
    elements.process_images(doc)
    elements.process_math(doc)
    elements.process_footnotes(doc)
    assert len(doc.body.element_children()) > 0


def test_kernel_optin_wiring():
    # processors run only when Options.process_* enabled (unwired default)
    from defuddle_spark import Options, extract_document
    html = """<html><head><title>T</title></head><body><article>
    <h1>T</h1><p>Some body text here for the article to extract.</p>
    <div role="list"><div role="listitem"><span class="label">•</span>Item text</div></div>
    </article></body></html>"""
    default = extract_document(html)
    # default path: T4 eats the bare role=list (no .content wrapper) and the
    # item text is lost — reference-faithful unwired behavior
    assert "Item text" not in default.content
    processed = extract_document(html, options=Options(process_roles=True))
    # opt-in roles processor converts before standardization, keeping text
    assert "Item text" in processed.content
    assert "<ul" in processed.content or "<li" in processed.content
