"""Pure-Python conformance tests for the IRI kernel.

Golden vectors come from the reference's test suite (iri/iri_test.go):
RFC 3986 §5.4.1/§5.4.2 resolution examples, §6.2 normalization table,
RFC 3987 §3.1/§3.2 IRI↔URI conversions, and the relativization table.
"""

import pytest

from trident_spark.conformance import (  # noqa: F401 — re-exported for other tests
    ABNORMAL_RESOLUTION,
    FROM_URI_CASES,
    NORMAL_RESOLUTION,
    NORMALIZE_CASES,
    RELATIVIZE_CASES,
    RESOLVE_BASE as BASE,
    TO_URI_CASES,
)
from trident_spark.kernels import iri as K


VALID_REFS = [
    "http://example.com/p?q#f",
    "a:b/c",
    "a/b/c",
    "/a/b/c",
    "//example.com/path",
    "",
    "#fragment",
    "?query",
    "urn:isbn:0451450523",
    "http://例子.com/résumé",
    "a:b",
]

INVALID_REFS = [
    ("1http://example.com", "first path segment"),
    ("scheme:..//path", "not allowed to start with //"),
    ("http://example.com/%GG", "percent encoding"),
]

COMPONENT_CASES = [
    ("foo://example.com:8042/over/there?name=ferret#nose",
     "foo", "example.com:8042", "/over/there", "name=ferret", "nose", True),
    ("urn:example:animal:ferret:nose",
     "urn", None, "example:animal:ferret:nose", None, None, True),
]


@pytest.mark.parametrize("rel,expected", sorted(NORMAL_RESOLUTION.items()))
def test_resolve_normal(rel, expected):
    assert K.resolve(BASE, rel).iri == expected


@pytest.mark.parametrize("rel,expected", sorted(ABNORMAL_RESOLUTION.items()))
def test_resolve_abnormal(rel, expected):
    assert K.resolve(BASE, rel).iri == expected


def test_resolve_ambiguous_colon_errors():
    with pytest.raises(K.IRIError, match="first path segment"):
        K.resolve(BASE, "1:b")


@pytest.mark.parametrize("inp,expected", NORMALIZE_CASES)
def test_normalize(inp, expected):
    assert K.normalize(inp) == expected


def test_normalize_eszett():
    assert K.normalize("http://faß.de/") == "http://fass.de/"


@pytest.mark.parametrize("iri,expected", TO_URI_CASES)
def test_iri_to_uri(iri, expected):
    assert K.iri_to_uri(iri) == expected


@pytest.mark.parametrize("uri,expected,err", FROM_URI_CASES)
def test_uri_to_iri(uri, expected, err):
    if err:
        with pytest.raises(K.IRIError):
            K.uri_to_iri(uri)
    else:
        assert K.uri_to_iri(uri).iri == expected


@pytest.mark.parametrize("base,target,expected", RELATIVIZE_CASES)
def test_relativize(base, target, expected):
    got = K.relativize(base, target)
    assert got == expected, f"relativize({base!r}, {target!r}) = {got!r} != {expected!r}"
    # round-trip: resolving the result against base must yield the target
    assert K.resolve(base, got).iri == target


@pytest.mark.parametrize("base,target", [
    ("http://a/b/c", "http://a/b/./d"),
    ("http://a/b/c", "http://a/b/../d"),
])
def test_relativize_dot_segments_rejected(base, target):
    with pytest.raises(K.IRIError):
        K.relativize(base, target)


@pytest.mark.parametrize("ref", VALID_REFS)
def test_parse_valid(ref):
    assert K.parse_ref(ref).iri == ref


@pytest.mark.parametrize("ref,msg", INVALID_REFS)
def test_parse_invalid(ref, msg):
    with pytest.raises(K.IRIError, match=re_escape_partial(msg)):
        K.parse_ref(ref)


def re_escape_partial(s):
    import re
    return re.escape(s)


@pytest.mark.parametrize(
    "iri,scheme,authority,path,query,fragment,absolute", COMPONENT_CASES
)
def test_components(iri, scheme, authority, path, query, fragment, absolute):
    c = K.components(K.parse_ref(iri))
    assert c == (scheme, authority, path, query, fragment, absolute)


def test_lax_ascii_percent_encoded():
    # RFC 3987 §3.1 MAY-rule: lenient parsing of certain ASCII chars
    ref = K.parse_ref("http://example.com/a b")
    assert ref.iri == "http://example.com/a%20b"


def test_bidi_mixed_rejected():
    with pytest.raises(K.IRIError):
        K.parse_ref("http://example.com/aב")  # latin + hebrew in one segment


def test_forbidden_bidi_formatting_rejected():
    with pytest.raises(K.IRIError):
        K.parse_ref("http://example.com/a\u202Eb")


def test_parse_iri_rejects_relative():
    with pytest.raises(K.IRIError):
        K.parse_iri("/only/a/path")


def test_remove_dot_segments():
    assert K.remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert K.remove_dot_segments("mid/content=5/../6") == "mid/6"


# ---------------------------------------------------------------------------
# Strict IDNA2008 / UTS-46 host validation profile
# ---------------------------------------------------------------------------

STRICT_VALID_HOSTS = [
    "example.com", "EXAMPLE.Com", "a-b.example", "192.168.0.1",
    "example.com.",                      # single root dot ok
    "faß.de",                            # ß PVALID in IDNA2008
    "xn--fa-hia.de",                     # A-label round-trips to faß
    "xn--fass-qra.de",                   # decodes to fúass — canonical
    "münchen.de", "пример.рф", "例え.jp",
    "[2001:db8::1]", "[v1.x]",
    "\u0915\u094d\u200c\u0937.in",     # ka+virama+ZWNJ+ssa (ContextJ ok)
]

STRICT_INVALID_HOSTS = [
    ("", "empty host"),
    ("-foo.de", "hyphen"),
    ("foo-.de", "hyphen"),
    ("ab--cd.de", "positions 3-4"),      # CheckHyphens
    ("ex ample.com", "non-LDH"),
    ("ex_ample.com", "non-LDH"),         # STD3 rules
    ("exa%41mple", "non-LDH"),
    ("☃.net", "disallowed"),
    ("foo..bar", "empty label"),
    ("a" * 64 + ".com", "63"),           # VerifyDnsLength (label)
    (".".join(["a" * 60] * 5), "253"),   # VerifyDnsLength (host)
    ("xn--a.de", "disallowed"),          # decodes to C1 control
    ("cafe\u0301.fr", "NFC"),           # decomposed e + combining acute
    ("\u0301abc.fr", "leading combining mark"),
    ("a\u200cb.in", "joiner"),          # ContextJ violation
    ("[2001:db8::1", "unterminated"),
    ("[vx]", "invalid IP literal"),
]


def test_validate_host_strict_accepts_valid_hosts():
    for host in STRICT_VALID_HOSTS:
        assert K.validate_host_strict(host) is None, host


def test_validate_host_strict_rejects_with_reason():
    for host, frag in STRICT_INVALID_HOSTS:
        err = K.validate_host_strict(host)
        assert err is not None, host
        if frag:
            assert frag in err, (host, err)


def test_validate_host_strict_never_raises():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def prop(s):
        out = K.validate_host_strict(s)
        assert out is None or isinstance(out, str)

    prop()
