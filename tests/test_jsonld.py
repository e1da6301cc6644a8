"""Offline JSON-LD 1.1 expansion/compaction (jsonld.py) — the expansion
path the with-network reference takes (defuddle.go:1024-1056), including
the assertions the round-1 raw-fallback transcription had to drop
(defuddle_test.go:819-859 checks BOTH item["type"] and item["@type"])."""

import json

from defuddle_spark.jsonld import (
    ExpansionError, compact, expand, process_schema_org_data)
from defuddle_spark.kernel import extract_document


def test_graph_and_arrays_through_expansion():
    # defuddle_test.go:819-859 TestSchemaOrgDataHandlesGraphAndArrays —
    # full assertion set, including the `type` alias only the expansion
    # path produces (schema.org context aliases type -> @type; the Go
    # pipeline then mirrors it back via preserveJSONLDType)
    html = """<html><head>
        <script type="application/ld+json">
        {
            "@context": "https://schema.org",
            "@graph": [
                {"@type": "Organization", "name": "Example Publisher"},
                {"@type": "Article", "headline": "Graph Headline",
                 "author": [{"name": "First Author"}, {"name": "Second Author"}]}
            ]
        }
        </script>
    </head><body><article><h1>Graph Headline</h1><p>Readable article body for graph schema.</p></article></body></html>"""
    r = extract_document(html)
    items = json.loads(r.schema_org)
    assert len(items) == 2
    org, article = items
    assert org["@type"] == "Organization"
    assert org["type"] == "Organization"          # expansion-path-only alias
    assert org["name"] == "Example Publisher"
    authors = article["author"]
    assert [a["name"] for a in authors] == ["First Author", "Second Author"]
    assert all("@type" not in a for a in authors)
    assert r.title == "Graph Headline"
    assert r.author == "First Author, Second Author"


def test_single_item_expansion_compacts_to_aliases():
    doc = {
        "@context": "https://schema.org",
        "@type": "Article",
        "headline": "Inline Schema Headline",
        "wordCount": 120,
        "author": {"@type": "Person", "name": "Schema Author"},
    }
    out = process_schema_org_data(doc)
    assert out["@context"] == "https://schema.org/"
    assert out["type"] == "Article"
    assert out["headline"] == "Inline Schema Headline"
    assert out["wordCount"] == 120                # @value round trip
    assert out["author"] == {"type": "Person", "name": "Schema Author"}


def test_inline_dict_context_expands_offline():
    doc = {
        "@context": {"@vocab": "http://schema.org/",
                     "title": "http://schema.org/headline"},
        "@type": "Article",
        "title": "Renamed Headline",
    }
    out = process_schema_org_data(doc)
    assert out["type"] == "Article"
    # the inline term maps onto schema.org/headline, compacted back to its
    # vocabulary name
    assert out["headline"] == "Renamed Headline"


def test_remote_non_schema_context_falls_back_raw():
    doc = {"@context": "https://example.test/ctx.jsonld",
           "@type": "Article", "headline": "Kept Raw"}
    out = process_schema_org_data(doc)
    assert out is doc                             # untouched raw parse
    try:
        expand(doc)
        raise AssertionError("expected ExpansionError")
    except ExpansionError:
        pass


def test_missing_context_falls_back_raw():
    doc = {"@type": "Article", "author": {"name": "Ann"}}
    out = process_schema_org_data(doc)
    assert out is doc


def test_unmapped_keyword_like_terms_dropped():
    doc = {"@context": "https://schema.org", "@type": "Thing",
           "@madeUp": "x", "name": "ok"}
    out = process_schema_org_data(doc)
    assert out["name"] == "ok" and "@madeUp" not in out


def test_multinode_compacts_into_graph():
    expanded = expand([
        {"@context": "https://schema.org", "@type": "Thing", "name": "a"},
        {"@context": "https://schema.org", "@type": "Thing", "name": "b"},
    ])
    assert len(expanded) == 2
    out = compact(expanded)
    assert [n["name"] for n in out["@graph"]] == ["a", "b"]


def test_array_context_later_layer_wins():
    # JSON-LD 1.1 §4.1: contexts in an array apply in order, later entries
    # overriding earlier ones (json-gold does the same). A schema.org URL
    # FOLLOWING inline term definitions must win for the terms it defines —
    # here the inline "type" mapping is overridden by the schema.org
    # type -> @type alias, so @type compacts to the alias, not to
    # additionalType.
    doc = {
        "@context": [{"type": "http://schema.org/additionalType"},
                     "https://schema.org/"],
        "@type": "Article",
        "headline": "Later Context Wins",
    }
    out = process_schema_org_data(doc)
    assert out["type"] == "Article"
    assert out["headline"] == "Later Context Wins"


def test_array_context_earlier_schema_org_overridable():
    # ...and the mirror image: inline definitions AFTER the schema.org URL
    # override its entries for the terms they (re)define.
    doc = {
        "@context": ["https://schema.org/",
                     {"title": "http://schema.org/headline"}],
        "@type": "Article",
        "title": "Inline Overrides Later",
    }
    out = process_schema_org_data(doc)
    assert out["type"] == "Article"
    assert out["headline"] == "Inline Overrides Later"


def test_custom_inline_context_expands_not_fallback():
    """A NON-schema.org inline context (custom @vocab + term->IRI map)
    takes the real expansion path — json-gold's with-network behavior
    (defuddle.go:1024-1056) needs no fetch for embedded contexts. The
    compacted output carries the schema.org `type` alias; non-schema
    IRIs stay absolute."""
    doc = {
        "@context": {"@vocab": "http://example.com/vocab#",
                     "headline": "http://purl.org/dc/terms/title"},
        "@type": "Post",
        "headline": "Hello",
        "views": 5,
    }
    out = process_schema_org_data(doc)
    assert out["@context"] == "https://schema.org/"
    # expanded against the custom @vocab, compacted against schema.org:
    # the type alias applies, the IRI stays absolute (not in the vocab)
    assert out["type"] == "http://example.com/vocab#Post"
    assert out["http://purl.org/dc/terms/title"] == "Hello"
    assert out["http://example.com/vocab#views"] == 5


def test_custom_inline_context_keyword_alias():
    """An inline context may ALIAS keywords (`"kind": "@type"`); the
    alias expands to @type and compacts back to schema.org's `type`."""
    doc = {
        "@context": {"@vocab": "http://schema.org/", "kind": "@type"},
        "kind": "Article",
        "name": "N",
    }
    out = process_schema_org_data(doc)
    assert out["type"] == "Article"
    assert out["name"] == "N"


def test_custom_inline_context_id_coercion():
    """`{"@type": "@id"}` term coercion turns string values into node
    references, which compact to `{"id": ...}` objects."""
    doc = {
        "@context": {"@vocab": "http://schema.org/",
                     "sameAs": {"@id": "http://schema.org/sameAs",
                                "@type": "@id"}},
        "@type": "Person",
        "name": "P",
        "sameAs": "https://example.test/profile",
    }
    out = process_schema_org_data(doc)
    assert out["type"] == "Person"
    assert out["sameAs"] == {"id": "https://example.test/profile"}
