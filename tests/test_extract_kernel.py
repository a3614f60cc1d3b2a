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


def test_vendored_schema_org_context_coerces_url_terms():
    """A page using the real remote schema.org context URL gets the
    VENDORED context document (r4): url/sameAs/image string values are
    @id-coerced IRIs (relative ones resolve against the page), while
    text-ranged properties stay literals."""
    for ctx in ("https://schema.org", "http://schema.org/",
                "https://schema.org/docs/jsonldcontext.json"):
        node = {
            "@context": ctx,
            "@id": "http://x/e1",
            "name": "Alice Example",
            "url": "/about",
            "sameAs": "https://en.wikipedia.org/wiki/Alice_Example",
            "image": "https://img.example/a.png",
        }
        t = _triples(_jsonld(node))
        assert ("http://x/e1", SCHEMA + "url", "http://x/about",
                "iri") in t
        assert ("http://x/e1", SCHEMA + "sameAs",
                "https://en.wikipedia.org/wiki/Alice_Example", "iri") in t
        assert ("http://x/e1", SCHEMA + "image",
                "https://img.example/a.png", "iri") in t
        assert ("http://x/e1", SCHEMA + "name", "Alice Example",
                "literal") in t


def test_vendored_activitystreams_context():
    """The AS2 remote context URL resolves to the vendored document:
    bare terms expand under the AS vocab and object/link-ranged terms
    are @id-coerced."""
    AS = "https://www.w3.org/ns/activitystreams#"
    node = {
        "@context": "https://www.w3.org/ns/activitystreams",
        "@type": "Like",
        "@id": "http://x/act1",
        "actor": "http://x/alice",
        "object": "http://x/note7",
        "summary": "Alice liked a note",
    }
    t = _triples(_jsonld(node))
    assert ("http://x/act1", RDF_TYPE, AS + "Like", "iri") in t
    assert ("http://x/act1", AS + "actor", "http://x/alice", "iri") in t
    assert ("http://x/act1", AS + "object", "http://x/note7", "iri") in t
    assert ("http://x/act1", AS + "summary", "Alice liked a note",
            "literal") in t


def test_unknown_remote_context_still_guesses_vocab():
    node = {"@context": "https://vocab.example/ns", "@id": "http://x/e",
            "p": "v"}
    t = _triples(_jsonld(node))
    assert ("http://x/e", "https://vocab.example/ns/p", "v", "literal") in t


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


# ---------------------------------------------------------------------------
# Fast-parser differential gate (CLAUDE.md rule 8 applied to HTML parsing):
# parse_html (regex tokenizer) must build the same tree as parse_html_ref
# (stdlib html.parser) over the corpora, handwritten edge cases, and an
# HTML-shaped fuzz domain.  Divergence is only tolerated on raw line noise
# (documented in the parse_html docstring).
# ---------------------------------------------------------------------------

import random

from trident_spark.kernels.extract import parse_html, parse_html_ref


def _tree_sig(root):
    out = []

    def walk(n, d):
        out.append((d, n.tag, tuple(sorted((k, v) for k, v in n.attrs.items()))))
        buf = []

        def flush():
            if buf:
                out.append((d + 1, "#text", "".join(buf)))
                buf.clear()

        for ch in n.children:
            if isinstance(ch, str):
                buf.append(ch)
            else:
                flush()
                walk(ch, d + 1)
        flush()

    walk(root, 0)
    return out


_EDGE_CASES = [
    '<p>a &amp; b &lt;x&gt; &#65; &#x42;</p>',
    '<!-- c --><p>x</p><!-- unterminated',
    '<!DOCTYPE html><html><body><p>t</p></body></html>',
    '<script>if (a<b && c>d) { "</div>" }</script><p>after</p>',
    '<script type="application/ld+json">{"a": "<b>"}</script>',
    '<style>p > a { color: red }</style>',
    '<div/><span>x</span>',
    '<p>1 < 2 and 3 > 2</p>',
    '<img src="x.png" alt="a&quot;b"><br><hr>',
    '<div class=unquoted id="q" disabled>t</div>',
    '<div><span>unclosed',
    '<p>text</p></div></p>extra',
    '<a href="/x?a=1&amp;b=2">l</a>',
    '<A HREF="X">upper</A>',
    '<div  a = "1"  b=2 >s</div>',
    '<?xml version="1.0"?><p>pi</p>',
    '<![CDATA[raw <b> stuff]]><p>y</p>',
    '<![CDATA[unterminated raw',
    '<p>trailing<',
    '<p>trailing<div',
    '<title>a <b> c</title>',
    '<svg><path d="M0,0"/></svg>',
    '<script>no close tag',
    '<style>unclosed style',
    '<br/><input type="text" value=""/>',
    '</p>only end',
    '',
    'plain text only & entity &gt;',
    '<div a="x" a="y">dup</div>',
    '<!doctype',
    '<?pi unterminated',
    '<a href=http://x/>t</a>',
    '</><p>q</p>',
    '</ ><i>j</i>',
    '<base href="/sub/"><a href="rel">r</a>',
]


def test_fast_parser_matches_ref_on_edge_cases():
    for case in _EDGE_CASES:
        assert _tree_sig(parse_html(case)) == _tree_sig(parse_html_ref(case)), case


def test_fast_parser_matches_ref_on_corpus():
    from trident_spark.pipeline.pages import gen_page

    for i in range(1, 501):
        h = gen_page(i)["html"].decode()
        assert _tree_sig(parse_html(h)) == _tree_sig(parse_html_ref(h)), i


def _rnd_html(rng, depth=0):
    tags = ["div", "p", "span", "a", "b", "script", "style", "img", "br",
            "base", "title"]
    parts = []
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        if r < 0.35 or depth > 3:
            parts.append(rng.choice(
                ["text & stuff", "a<b", "x &amp; y", "1 < 2", "&#65;b",
                 "plain", "tail<", "'quote\"s'"]))
        elif r < 0.45:
            parts.append("<!-- comment <fake> -->")
        else:
            t = rng.choice(tags)
            attrs = ""
            if rng.random() < 0.6:
                attrs = ' href="/x/%d" data-v=%d' % (rng.randint(0, 9),
                                                     rng.randint(0, 9))
            if rng.random() < 0.1:
                attrs += " itemscope"
            inner = _rnd_html(rng, depth + 1)
            if rng.random() < 0.15:
                parts.append(f"<{t}{attrs}>{inner}")  # unclosed
            elif rng.random() < 0.1:
                parts.append(f"<{t}{attrs}/>{inner}")  # self-closing
            else:
                parts.append(f"<{t}{attrs}>{inner}</{t}>")
    return "".join(parts)


def test_fast_parser_matches_ref_on_html_shaped_fuzz():
    for k in range(1500):
        s = _rnd_html(random.Random(k))
        assert _tree_sig(parse_html(s)) == _tree_sig(parse_html_ref(s)), repr(s)


# ---------------------------------------------------------------------------
# to_iri fast path: differential fuzz vs the definitional slow path
# (CLAUDE.md rule 8: every fast path gets a behaviour-identity gate)
# ---------------------------------------------------------------------------


def _to_iri_slow(base_url: str, ref: str):
    """The definitional semantics to_iri's fast path must reproduce."""
    from trident_spark.kernels import iri as K

    try:
        base = K.parse_ref(base_url)
    except K.IRIError:
        base = None
    try:
        resolved = K.resolve(base, ref).iri if base is not None \
            else K.parse_iri(ref).iri
        return K.normalize(resolved)
    except K.IRIError:
        return None


_TO_IRI_BASES = [
    "https://example.org/dir/page.html",
    "https://example.org/",
    "https://EXAMPLE.org:443/a/b/",          # normalizes: case + def. port
    "http://example.org:8080/x?q=1#frag",
    "https://user@example.org/a/./b/../c",   # dot segments in the base
    "https://example.org",                   # empty path + authority
    "file:///tmp/data/",
    "https://xn--bcher-kva.example/b/",      # punycode host
    "not a url",                             # unparseable base
]

_TO_IRI_REFS = [
    "/entity/thing-123", "/a/b/c", "/", "//other.org/x", "/a:b/c",
    "img.png", "a/b", "sub/dir/", "a:b", "1:b", "x/a:b", "",
    "?q=2", "#frag", "page.html#s", "a%20b", "/p%41th", "/a/../b",
    "./same", "../up", "/dot./x", "/x/.hidden", "..", ".",
    "/üñïcode", "päge.html", "/path with space", "/q?x=1", "/semi;p=1",
    "/!$&'()*+,;=:@", "odd\ttab", "/end/", "trailing.", "/a//b",
    # query/fragment tails on the concat fast path
    "/p?x=1#f", "page?x", "a#b", "?", "#", "a?b?c", "x#y#z", "/p?q=%41",
    "p?ü=1", "/p#fräg", "sub/q?a=/b:c", "/p?#", "/p?a=1&b=2",
    # leading-../ ancestor climbing
    "../x", "../../x", "../../../deep", "../x#me", "../a/b?q=1",
    "../", "../../", "../x:y", "..//x", "../x/../y", "a/../b",
]


def test_to_iri_fast_path_matches_slow():
    from trident_spark.kernels.extract import _Ctx

    for base in _TO_IRI_BASES:
        ctx = _Ctx(base)
        for ref in _TO_IRI_REFS:
            # bypass the per-page cache: fresh context per (base, ref)
            got = _Ctx(base).to_iri(ref)
            want = _to_iri_slow(base, ref)
            assert got == want, (base, ref, got, want)


def test_to_iri_fast_path_matches_slow_fuzz():
    import random

    from trident_spark.kernels.extract import _Ctx

    seg_chars = "abXY09-._~!$&'()*+,;=:@%/ü #?\\"
    rng = random.Random(1234)
    for _ in range(4000):
        base = rng.choice(_TO_IRI_BASES)
        ref = "".join(rng.choice(seg_chars)
                      for _ in range(rng.randint(1, 18)))
        if rng.random() < 0.3:
            ref = "/" + ref
        if rng.random() < 0.15:
            ref = "./" + ref
        if rng.random() < 0.25:
            ref = "../" * rng.randint(1, 4) + ref
        got = _Ctx(base).to_iri(ref)
        want = _to_iri_slow(base, ref)
        assert got == want, (base, ref, got, want)


def test_to_iri_fast_path_after_set_base():
    """<base href> mutates the page base — the precomputed prefix/dir must
    follow it, not the original url."""
    from trident_spark.kernels.extract import _Ctx

    ctx = _Ctx("https://example.org/old/page.html")
    ctx.set_base("https://cdn.example.net/assets/")
    assert ctx.to_iri("/img.png") == "https://cdn.example.net/img.png"
    assert ctx.to_iri("x.css") == "https://cdn.example.net/assets/x.css"
    assert ctx.to_iri("x.css") == _to_iri_slow(
        "https://cdn.example.net/assets/", "x.css")


def test_setup_fast_base_split_matches_slow():
    """_setup_fast's string-split shortcut for already-normalized bases
    must produce exactly the slow normalize→parse→components derivation
    (differential gate per the fast-path rule, CLAUDE.md #8)."""
    import random

    from trident_spark.kernels import iri as K
    from trident_spark.kernels.extract import _DOTSEG_RE, _Ctx

    def slow(base_url):
        try:
            b = K.parse_ref(base_url)
        except K.IRIError:
            return (None, "/")
        try:
            nb = K.normalize(b)
            c = K.components(K.parse_ref(nb))
        except K.IRIError:
            return (None, "/")
        path = c.path or ""
        if c.authority is None or _DOTSEG_RE.search(path):
            return (None, "/")
        return (f"{c.scheme}://{c.authority}",
                path[: path.rfind("/") + 1] if "/" in path else "/")

    hosts = ["example.org", "EXAMPLE.org", "a_b.example", "ex~tilde.org",
             "xn--bcher-kva.example", "example.com.", "bücher.example",
             "127.0.0.1", "example.org:8080", "example.org:80",
             "example.org:443", "user@example.org", "[2001:db8::1]"]
    paths = ["/", "/a/b/", "/a/b/c.html", "", "/a/./b/", "/a/../b/",
             "/%41/", "/%7e/", "/ü/", "/a//b/", "/:@/x", "/trailing.",
             "/a b/", "/q's/", "/(x)/"]
    tails = ["", "?q=1", "?a'b", "#frag", "?q=1#f"]
    schemes = ["http", "https", "HTTP", "file", "ftp"]
    rng = random.Random(99)
    for _ in range(3000):
        base = (f"{rng.choice(schemes)}://{rng.choice(hosts)}"
                f"{rng.choice(paths)}{rng.choice(tails)}")
        ctx = _Ctx(base)
        assert (ctx._fast_prefix, ctx._fast_dir) == slow(base), base


def test_jsonld_11_keyword_aliasing():
    """JSON-LD 1.1 keyword aliasing: a context mapping "id"→"@id" and
    "type"→"@type" makes bare "id"/"type" keys behave as the keywords
    (the real ActivityStreams context does exactly this); an explicit
    keyword present on the same node wins over its alias."""
    node = {
        "@context": {"@vocab": SCHEMA, "id": "@id", "type": "@type"},
        "id": "http://x/e9",
        "type": "Person",
        "name": "Alice",
    }
    t = _triples(_jsonld(node))
    assert ("http://x/e9", RDF_TYPE, SCHEMA + "Person", "iri") in t
    assert ("http://x/e9", SCHEMA + "name", "Alice", "literal") in t
    # no phantom schema:id / schema:type literal triples
    assert not [x for x in t if x[1] in (SCHEMA + "id", SCHEMA + "type")]
    # explicit keyword wins over the aliased key
    node2 = {
        "@context": {"@vocab": SCHEMA, "id": "@id"},
        "@id": "http://x/real",
        "id": "http://x/shadowed",
        "name": "Bob",
    }
    t2 = _triples(_jsonld(node2))
    assert ("http://x/real", SCHEMA + "name", "Bob", "literal") in t2
    assert not [x for x in t2 if x[0] == "http://x/shadowed"]


def test_jsonld_activitystreams_vendored_aliases():
    """The vendored AS2 context carries the real document's id/type
    aliases, so plain AS2 payloads (which never write @id/@type) extract
    with proper IRIs and rdf:type."""
    as2 = "https://www.w3.org/ns/activitystreams#"
    node = {
        "@context": "https://www.w3.org/ns/activitystreams",
        "id": "http://x/note/1",
        "type": "Note",
        "attributedTo": "http://x/alice",
        "content": "Hello world",
    }
    t = _triples(_jsonld(node))
    assert ("http://x/note/1", RDF_TYPE, as2 + "Note", "iri") in t
    assert ("http://x/note/1", as2 + "attributedTo", "http://x/alice",
            "iri") in t
    assert ("http://x/note/1", as2 + "content", "Hello world",
            "literal") in t


def test_jsonld_set_container_and_exact_term_alias():
    """@set containers flatten like @list sugar (order-free), and an
    expanded term definition maps its BARE term to the declared @id even
    without @vocab (JSON-LD term-definition precedence)."""
    node = {
        "@context": {
            "homepage": {"@id": "http://xmlns.com/foaf/0.1/homepage",
                         "@type": "@id"},
            "nick": "http://xmlns.com/foaf/0.1/nick",
        },
        "@id": "http://x/p",
        "nick": {"@set": ["ali", "lis"]},
        "homepage": "http://x/alice",
    }
    t = _triples(_jsonld(node))
    nicks = {o for _, p, o, _ in t if p == "http://xmlns.com/foaf/0.1/nick"}
    assert nicks == {"ali", "lis"}
    assert ("http://x/p", "http://xmlns.com/foaf/0.1/homepage",
            "http://x/alice", "iri") in t


def test_rdfa_bare_token_matching_prefix_name_uses_vocab():
    """(review r4) RDFa resolves bare @property/@typeof tokens via
    @vocab, never via prefix mappings: a token equal to a declared
    prefix name must expand to vocab+token, not the namespace IRI."""
    html = ('<div prefix="og: http://ogp.me/ns#" vocab="https://schema.org/">'
            '<span about="http://x/e" property="og">v</span></div>')
    t = _triples(html)
    assert ("http://x/e", SCHEMA + "og", "v", "literal") in t
    assert not [x for x in t if x[1] == "http://ogp.me/ns#"]
