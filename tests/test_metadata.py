"""Metadata unit tests transcribed from internal/metadata/metadata_test.go
and scorer tests from internal/scoring/scorer_test.go."""

from defuddle_spark import metadata
from defuddle_spark.dom import parse
from defuddle_spark.metadata import _clean_title, _domain_from_url, get_schema_property
from defuddle_spark.selectors import find_first


def test_clean_title_removes_site_name():
    # metadata_test.go:21-65
    cases = [
        ("Advanced Test Article - Test Site", "Test Site", "Advanced Test Article"),
        ("Test Site | Advanced Test Article", "Test Site", "Advanced Test Article"),
        ("Advanced Test Article - Test (Site)+", "Test (Site)+", "Advanced Test Article"),
        ("Advanced Test Article", "Different Site", "Advanced Test Article"),
    ]
    for title, site, want in cases:
        assert _clean_title(title, site) == want


def test_schema_property_array_index():
    # metadata_test.go:67-81
    schema = {"author": [{"name": "First Author"}, {"name": "Second Author"}]}
    assert get_schema_property(schema, "author.[1].name") == "Second Author"


def test_domain_from_url():
    # metadata_test.go:83-92
    assert _domain_from_url("https://www.example.com/articles/1") == "example.com"
    assert _domain_from_url("://bad-url") == ""


def test_extract_prefers_base_url_and_meta():
    # metadata_test.go:94-152
    doc = parse("""<html><head>
        <title>Example Article - Example Site</title>
        <link rel="icon" href="/favicon.ico">
    </head><body><time datetime="2025-01-01"></time></body></html>""")
    meta_tags = [
        {"name": "author", "content": "Meta Author"},
        {"name": "description", "content": "Meta description"},
        {"property": "og:image", "content": "https://cdn.example.com/image.jpg"},
        {"property": "og:site_name", "content": "Example Site"},
        {"property": "article:published_time", "content": "2026-04-21"},
    ]
    m = metadata.extract(doc.html, None, meta_tags,
                         "https://www.example.com/articles/test")
    assert m["domain"] == "example.com"
    assert m["favicon"] == "https://www.example.com/favicon.ico"
    assert m["title"] == "Example Article"
    assert m["author"] == "Meta Author"
    assert m["description"] == "Meta description"
    assert m["image"] == "https://cdn.example.com/image.jpg"
    assert m["site"] == "Example Site"
    assert m["published"] == "2026-04-21"


def test_extract_falls_back_to_schema_and_dom():
    # metadata_test.go:153-206
    doc = parse("""<html><head>
        <title>Schema Headline | Publisher Name</title>
        <base href="https://blog.example.org/posts/123">
    </head><body><div class="author">DOM Author</div></body></html>""")
    schema = {
        "headline": "Schema Headline",
        "description": "Schema description",
        "datePublished": "2026-04-20",
        "image": {"url": "https://blog.example.org/schema-image.jpg"},
        "author": [{"name": "Schema Author"}, {"name": "Schema Author"},
                   {"name": "Another Author"}],
        "publisher": {"name": "Publisher Name"},
    }
    m = metadata.extract(doc.html, schema, [], "")
    assert m["domain"] == "blog.example.org"
    assert m["title"] == "Schema Headline"
    assert m["author"] == "Schema Author, Another Author"
    assert m["description"] == "Schema description"
    assert m["image"] == "https://blog.example.org/schema-image.jpg"
    assert m["site"] == "Publisher Name"
    assert m["published"] == "2026-04-20"
    assert m["favicon"] == "https://blog.example.org/favicon.ico"


def test_extract_canonical_url_and_dom_author_fallback():
    # metadata_test.go:208-233
    doc = parse("""<html><head>
        <title>Canonical Article</title>
        <link rel="canonical" href="https://www.example.net/articles/canonical">
    </head><body>
        <div class="author">Author, Alice</div>
        <a href="/authors/bob">Bob Writer</a>
        <time datetime="2026-04-30T10:00:00Z"></time>
    </body></html>""")
    m = metadata.extract(doc.html, None, [], "")
    assert m["domain"] == "example.net"
    assert m["author"] == "Alice, Bob Writer"
    assert m["published"] == "2026-04-30T10:00:00Z"
    assert m["favicon"] == "https://www.example.net/favicon.ico"


# -- scorer_test.go transcriptions -------------------------------------------

def test_score_element_favors_main_content():
    # scorer_test.go:21-46
    from defuddle_spark.scoring import score_element
    doc = parse("""<html><body>
        <div class="content">
            <h1>Test Article</h1>
            <p>This is a test paragraph with some content.</p>
            <p>Another paragraph with more content.</p>
        </div>
        <div class="sidebar">
            <a href="#">Link 1</a><a href="#">Link 2</a><a href="#">Link 3</a>
        </div>
    </body></html>""")
    content = find_first(doc.html, ".content")
    sidebar = find_first(doc.html, ".sidebar")
    assert score_element(content) > 0
    assert score_element(content) > score_element(sidebar)


def test_find_best_element_threshold():
    # scorer_test.go:48-68
    from defuddle_spark.scoring import find_best_element
    doc = parse("<html><body><div>tiny</div><div>" + "word " * 100 + "</div></body></html>")
    divs = [d for d in doc.body.descendants() if d.tag == "div"]
    best = find_best_element(divs, 50)
    assert best is divs[1]
    assert find_best_element([divs[0]], 50) is None


def test_score_and_remove_keeps_content_removes_nav():
    # scorer_test.go:70-97
    from defuddle_spark.scoring import score_and_remove
    doc = parse("""<html><body>
        <div class="nav-widget"><a href="/1">Home</a> <a href="/2">About</a> <a href="/3">More</a> menu navigation links</div>
        <div class="story"><p>""" + "Real article content with many words here. " * 10 + """</p></div>
    </body></html>""")
    score_and_remove(doc.html)
    assert find_first(doc.html, ".nav-widget") is None
    assert find_first(doc.html, ".story") is not None


def test_is_likely_content_class_or_id():
    # scorer_test.go:131-149
    from defuddle_spark.scoring import is_likely_content
    doc = parse('<html><body><div class="main-article">x</div><div id="story-1">y</div><div class="widget">z</div></body></html>')
    divs = [d for d in doc.body.descendants() if d.tag == "div"]
    assert is_likely_content(divs[0])
    assert is_likely_content(divs[1])
    assert not is_likely_content(divs[2])


def test_dom_probes_match_selector_engine():
    """DomProbes' hand-coded matchers must agree with the generic selector
    engine on every probe, including the tricky cases (token-exact class
    match, [attr] presence with empty value, .authors a ancestor walk)."""
    from defuddle_spark.dom import parse
    from defuddle_spark.metadata import DomProbes
    from defuddle_spark.selectors import find_all, find_first

    html = """<html><head>
      <title>First Title</title><title>Second Title</title>
      <link rel="stylesheet" href="/s.css">
      <link rel="shortcut icon" href="/fav.png">
      <link rel="canonical" href="https://x.test/canon">
      <base href="https://x.test/">
    </head><body>
      <time>undated</time><time datetime="">empty-ok</time>
      <time datetime="2024-01-01">real</time>
      <span class="author-bio">not a token match</span>
      <span class="author">Token Match</span>
      <div itemprop="author">Item Prop</div>
      <a href="/author/jane">By Href</a>
      <a href="/authority">authority substring counts</a>
      <div class="authors"><section><a href="/a">Nested A</a></section></div>
      <div class="not-authors"><a href="/b">Not This</a></div>
    </body></html>"""
    root = parse(html).html
    p = DomProbes(root)

    assert p.title_el is find_first(root, "title")
    assert p.icon_el is find_first(root, 'link[rel*="icon"]')
    assert p.time_el is find_first(root, "time[datetime]")
    assert p.canonical_el is find_first(root, 'link[rel="canonical"]')
    assert p.base_el is find_first(root, "base[href]")
    assert p.author_itemprop == find_all(root, '[itemprop="author"]')
    assert p.author_class == find_all(root, ".author")
    assert p.author_href == find_all(root, '[href*="author"]')
    assert p.authors_a == find_all(root, ".authors a")
    assert p.time_el.get("datetime") == ""
    assert [e.text() for e in p.authors_a] == ["Nested A"]
