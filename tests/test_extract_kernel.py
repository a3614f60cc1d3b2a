"""Focused extraction-kernel tests: JSON-LD context features, RDFa subject
rules, microdata structure — cases beyond the synthetic-corpus e2e suite."""

import json

from trident_spark.kernels.extract import RDF_TYPE, extract_page

SCHEMA = "https://schema.org/"


def _triples(html, url="http://x/page"):
    t, _, err = extract_page(html, url)
    assert err is None
    return [(x.subj, x.pred, x.obj_lexical, x.obj_kind) for x in t]


def _jsonld(node):
    return f'<script type="application/ld+json">{json.dumps(node)}</script>'


def test_jsonld_type_id_coercion_curie_and_url():
    node = {
        "@context": {
            "@vocab": SCHEMA,
            "sameAs": {"@id": SCHEMA + "sameAs", "@type": "@id"},
            "wiki": "https://en.wikipedia.org/wiki/",
        },
        "@id": "http://x/e1",
        "sameAs": ["wiki:Alice_Example", "http://other.org/alice", "../rel"],
    }
    t = _triples(_jsonld(node))
    objs = {(o, k) for _, p, o, k in t if p == SCHEMA + "sameAs"}
    assert objs == {
        ("https://en.wikipedia.org/wiki/Alice_Example", "iri"),
        ("http://other.org/alice", "iri"),
        ("http://x/rel", "iri"),
    }


def test_jsonld_uncoerced_url_stays_literal():
    node = {"@context": SCHEMA.rstrip("/"), "@id": "http://x/e",
            "name": "http://not-an-entity.example/x"}
    t = _triples(_jsonld(node))
    assert ("http://x/e", SCHEMA + "name",
            "http://not-an-entity.example/x", "literal") in t


def test_jsonld_graph_and_nested_context():
    node = {
        "@context": {"@vocab": SCHEMA},
        "@graph": [
            {"@id": "http://x/a", "@type": "Person", "name": "A"},
            {"@id": "http://x/b", "@type": "Person", "name": "B"},
        ],
    }
    t = _triples(_jsonld(node))
    assert ("http://x/a", RDF_TYPE, SCHEMA + "Person", "iri") in t
    assert ("http://x/b", SCHEMA + "name", "B", "literal") in t


def test_rdfa_about_property_same_element():
    t = _triples(
        '<span about="https://ex.org/alice" property="https://schema.org/name">'
        "Alice</span>"
    )
    assert ("https://ex.org/alice", SCHEMA + "name", "Alice", "literal") in t


def test_rdfa_about_property_href_same_element():
    t = _triples(
        '<a about="https://ex.org/alice" property="https://schema.org/url" '
        'href="https://ex.org/alice.html">home</a>'
    )
    assert ("https://ex.org/alice", SCHEMA + "url",
            "https://ex.org/alice.html", "iri") in t


def test_microdata_nested_independent_item_extracted():
    html = (
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Alice</span>'
        '<div itemscope itemtype="https://schema.org/Organization">'
        '<span itemprop="name">Acme</span></div></div>'
    )
    t = _triples(html)
    types = {o for _, p, o, _ in t if p == RDF_TYPE}
    assert types == {SCHEMA + "Person", SCHEMA + "Organization"}
    names = {o for _, p, o, _ in t if p == SCHEMA + "name"}
    assert names == {"Alice", "Acme"}


def test_microdata_nested_property_item_links_parent():
    html = (
        '<div itemscope itemtype="https://schema.org/Person" itemid="http://x/p">'
        '<div itemprop="worksFor" itemscope '
        'itemtype="https://schema.org/Organization" itemid="http://x/o">'
        '<span itemprop="name">Acme</span></div></div>'
    )
    t = _triples(html)
    assert ("http://x/p", SCHEMA + "worksFor", "http://x/o", "iri") in t
    assert ("http://x/o", SCHEMA + "name", "Acme", "literal") in t


def test_base_href_changes_resolution():
    html = (
        '<head><base href="https://cdn.example.org/root/"></head>'
        '<body><div vocab="https://schema.org/" about="item1" typeof="Thing">'
        "</div></body>"
    )
    t = _triples(html, url="http://original.example/page")
    assert ("https://cdn.example.org/root/item1", RDF_TYPE,
            SCHEMA + "Thing", "iri") in t


def test_malformed_jsonld_ignored():
    t, text, err = extract_page(
        '<script type="application/ld+json">{oops</script><p>Hi There.</p>',
        "http://x/p")
    assert err is None and t == [] and "Hi There." in text


def test_rdfa_rel_and_rev():
    html = (
        '<div vocab="https://schema.org/" about="https://ex.org/alice">'
        '<a rel="knows" href="https://ex.org/bob">Bob</a>'
        '<a rev="parent" href="https://ex.org/carol">Carol</a></div>'
    )
    t = _triples(html)
    assert ("https://ex.org/alice", SCHEMA + "knows",
            "https://ex.org/bob", "iri") in t
    assert ("https://ex.org/carol", SCHEMA + "parent",
            "https://ex.org/alice", "iri") in t


def test_html_link_rel_without_vocab_ignored():
    t = _triples('<link rel="stylesheet" href="/style.css">'
                 '<a rel="nofollow" href="http://x/other">x</a>')
    assert t == []
