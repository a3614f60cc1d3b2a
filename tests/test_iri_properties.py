"""Property-based tests (hypothesis) for the IRI kernel — invariants that
hold for *any* input, complementing the fixed golden vectors:

- resolve(base, rel) is absolute and parseable whenever rel is valid
- normalize is idempotent
- relativize∘resolve round-trips to the target
- parse is byte-stable for already-rendered refs
"""

import string

from hypothesis import given, settings, strategies as st

from trident_spark.kernels import iri as K

# path/query-safe ASCII chars (no %, no lax chars, no delimiters)
_SAFE = string.ascii_letters + string.digits + "-._~!$&'()*+,;=:@"
_SEG = st.text(alphabet=_SAFE.replace(":", "").replace("@", ""), min_size=0, max_size=8)
_HOST_CHARS = string.ascii_lowercase + string.digits + "-"


@st.composite
def abs_iris(draw):
    scheme = draw(st.sampled_from(["http", "https", "ftp", "foo"]))
    host = draw(st.text(alphabet=_HOST_CHARS, min_size=1, max_size=12)).strip("-") or "h"
    segs = draw(st.lists(_SEG, min_size=0, max_size=4))
    path = "/" + "/".join(segs) if segs else "/"
    query = draw(st.none() | st.text(alphabet=_SAFE + "/?", max_size=10))
    iri = f"{scheme}://{host}{path}"
    if query is not None:
        iri += "?" + query
    return iri


@st.composite
def rel_refs(draw):
    kind = draw(st.sampled_from(["path", "abs_path", "query", "fragment", "dots"]))
    # empty segments would create "//" inside a path, which RFC 3986 §3.3
    # forbids without an authority (the kernel correctly rejects those)
    segs = [s or "x" for s in
            draw(st.lists(_SEG.filter(lambda s: ":" not in s), min_size=1, max_size=3))]
    if kind == "path":
        ref = "/".join(segs)
    elif kind == "abs_path":
        ref = "/" + "/".join(segs)
    elif kind == "query":
        ref = "?" + (segs[0] or "q")
    elif kind == "fragment":
        ref = "#" + (segs[0] or "f")
    else:
        ups = draw(st.integers(0, 3))
        ref = "/".join([".."] * ups + [segs[0] or "x"])
    return ref


@settings(max_examples=300, deadline=None)
@given(base=abs_iris(), rel=rel_refs())
def test_resolve_produces_valid_absolute(base, rel):
    resolved = K.resolve(base, rel)
    assert resolved.pos.scheme_end > 0  # absolute
    reparsed = K.parse_ref(resolved.iri)  # parseable
    assert reparsed.iri == resolved.iri


@settings(max_examples=300, deadline=None)
@given(iri=abs_iris())
def test_normalize_idempotent(iri):
    once = K.normalize(iri)
    assert K.normalize(once) == once


@settings(max_examples=300, deadline=None)
@given(base=abs_iris(), target=abs_iris())
def test_relativize_resolve_roundtrip(base, target):
    try:
        rel = K.relativize(base, target)
    except K.IRIError:
        return  # dot-segment targets are legitimately rejected
    assert K.resolve(base, rel).iri == target


@settings(max_examples=300, deadline=None)
@given(iri=abs_iris())
def test_parse_render_stable(iri):
    ref = K.parse_ref(iri)
    assert K.parse_ref(ref.iri).iri == ref.iri


@settings(max_examples=200, deadline=None)
@given(iri=abs_iris())
def test_to_uri_ascii_and_parseable(iri):
    uri = K.iri_to_uri(iri)
    assert uri.isascii()
    # converting back and forth keeps a fixed point
    rt = K.iri_to_uri(K.uri_to_iri(uri).iri)
    assert rt == uri


@settings(max_examples=500, deadline=None)
@given(s=st.text(alphabet=string.ascii_letters + string.digits + ":/@.?#%-~&=+ ",
                 max_size=28),
       prefix=st.sampled_from(["", "http://", "//", "https://h"]))
def test_fast_path_matches_slow_path(s, prefix):
    """The safe-ASCII fast path must agree with the validating parser on
    both the rendered IRI and the component positions."""
    s = prefix + s

    def run():
        try:
            r = K.parse_ref(s)
            return (r.iri, r.pos)
        except K.IRIError:
            return ("err", None)

    fast_result = run()
    orig = K._fast_parse
    K._fast_parse = lambda x: None
    try:
        slow_result = run()
    finally:
        K._fast_parse = orig
    assert fast_result == slow_result


@st.composite
def fastpath_iris(draw):
    """IRIs shaped to straddle the _FAST_NORMALIZED boundary: plain hosts,
    punycode (xn--) labels, default ports, dot segments, %-escapes."""
    host = draw(st.sampled_from(
        ["example.com", "xn--fa-hia.de", "a.xn--rsum-bpad.org", "xn--x.bad",
         "up.example.org", "xn--"]))
    port = draw(st.sampled_from(["", ":80", ":8080", ":443"]))
    path = draw(st.sampled_from(
        ["/", "/a/b", "/a/../b", "/%7Euser", "/a/./", "/xn--foo"]))
    scheme = draw(st.sampled_from(["http", "https", "foo"]))
    return f"{scheme}://{host}{port}{path}"


@settings(max_examples=300, deadline=None)
@given(iri=fastpath_iris())
def test_normalize_fast_path_matches_slow_path(iri):
    """CLAUDE.md rule 8 for normalize: the string fast path must agree with
    the full path (normalize of a pre-parsed ref never takes the fast path)."""
    assert K.normalize(iri) == K.normalize(K.parse_ref(iri))
