"""Remaining FIXTURES.md archetypes as end-to-end kernel tests:
#7 hidden-and-small (lazy data-src identifiers, tracking pixels),
#8 partial-selector zoo, #10 footnotes standardization."""

from defuddle_spark import Options, extract_document


def test_archetype_hidden_and_small():
    # FIXTURES.md #7; defuddle.go:1392-1417, 1537-1563
    body = "Article body text with plenty of words to avoid retry noise. " * 24
    html = f"""<html><head><title>Hidden Test</title></head><body><article>
        <h1>Hidden Test</h1>
        <p>{body}</p>
        <div style="display:none">hidden-inline-none</div>
        <div style="visibility: hidden">hidden-vis</div>
        <span style="opacity:0">hidden-opacity</span>
        <img data-src="https://cdn.test/lazy-small.jpg" width="20" height="20">
        <img src="https://cdn.test/big.jpg" width="600" height="400" alt="keep">
        <svg width="10" height="10" viewBox="0 0 10 10"><rect/></svg>
    </article></body></html>"""
    r = extract_document(html)
    assert "hidden-inline-none" not in r.content
    assert "hidden-vis" not in r.content
    assert "hidden-opacity" not in r.content
    # lazy-loaded small image identified by data-src and removed
    assert "lazy-small.jpg" not in r.content
    assert "big.jpg" in r.content
    assert 'viewBox="0 0 10 10"' not in r.content
    assert "Article body text" in r.content


def test_archetype_partial_selector_zoo():
    # FIXTURES.md #8; constants.go:307-806 over all TEST_ATTRIBUTES
    body = "Real article content sentence with several meaningful words. " * 30
    html = f"""<html><head><title>Zoo</title></head><body><article>
        <h1>Zoo</h1>
        <p>{body}</p>
        <div class="newsletter_signup_box">ZOO-newsletter</div>
        <div id="related-stories">ZOO-related</div>
        <div data-testid="share-box-top">ZOO-share</div>
        <div data-qa="breadcrumb-nav">ZOO-breadcrumb</div>
        <div data-cy="post-meta-line">ZOO-postmeta</div>
        <section class="trending-now">ZOO-trending</section>
    </article></body></html>"""
    r = extract_document(html)
    for marker in ("ZOO-newsletter", "ZOO-related", "ZOO-share",
                   "ZOO-breadcrumb", "ZOO-postmeta", "ZOO-trending"):
        assert marker not in r.content, marker
    assert "Real article content" in r.content
    assert not r.retry_used  # body large enough that partials stay active


def test_archetype_footnotes_standardization():
    # FIXTURES.md #10; constants.go:835-896; standardize T3
    body = "Document text with citations and long enough body to matter. " * 24
    html = f"""<html><head><title>Notes</title></head><body><article>
        <h1>Notes</h1>
        <p>{body}<a href="#fn:1" id="fnref:1">1</a> and
           <span class="footnote-hovercard-target"><a href="#fn:2">2</a></span></p>
        <p>Back <a href="#top" class="skip-anchor-link">to top</a></p>
        <div class="footnotes"><ol>
            <li id="fn:1">First note <a href="#fnref:1" class="footnote-backref">↩</a></li>
            <li id="fn:2">Second note</li>
        </ol></div>
    </article></body></html>"""
    r = extract_document(html)
    # inline refs wrapped in <sup> (a[href^="#fn"] is a footnote selector)
    assert "<sup>" in r.content
    # backref anchors removed (T3 backref selectors)
    assert "footnote-backref" not in r.content or "↩" not in r.content
    # footnote ids preserved through attribute stripping
    assert 'id="fn:1"' in r.content
    assert "First note" in r.content


def test_archetype_charset_in_pipeline():
    # FIXTURES.md #14 through extract_document_bytes
    from defuddle_spark.kernel import extract_document_bytes
    body = ("Texto del artículo con suficientes palabras para la prueba. " * 24)
    html = (f'<html><head><meta charset="iso-8859-1"><title>Año</title></head>'
            f"<body><article><h1>Año</h1><p>{body}</p></article></body></html>")
    r = extract_document_bytes(html.encode("iso-8859-1"), url="https://es.test/a")
    assert r.title == "Año"
    assert "artículo" in r.extracted_text
