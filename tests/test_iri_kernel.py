"""Pure-Python conformance tests for the IRI kernel.

Golden vectors come from the reference's test suite (iri/iri_test.go):
RFC 3986 §5.4.1/§5.4.2 resolution examples, §6.2 normalization table,
RFC 3987 §3.1/§3.2 IRI↔URI conversions, and the relativization table.
"""

import pytest

from trident_spark.kernels import iri as K

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 normal examples (iri/iri_test.go:583-609)
NORMAL_RESOLUTION = {
    "g:h": "g:h",
    "g": "http://a/b/c/g",
    "./g": "http://a/b/c/g",
    "g/": "http://a/b/c/g/",
    "/g": "http://a/g",
    "//g": "http://g",
    "?y": "http://a/b/c/d;p?y",
    "g?y": "http://a/b/c/g?y",
    "#s": "http://a/b/c/d;p?q#s",
    "g#s": "http://a/b/c/g#s",
    "g?y#s": "http://a/b/c/g?y#s",
    ";x": "http://a/b/c/;x",
    "g;x": "http://a/b/c/g;x",
    "g;x?y#s": "http://a/b/c/g;x?y#s",
    "": "http://a/b/c/d;p?q",
    ".": "http://a/b/c/",
    "./": "http://a/b/c/",
    "..": "http://a/b/",
    "../": "http://a/b/",
    "../g": "http://a/b/g",
    "../..": "http://a/",
    "../../": "http://a/",
    "../../g": "http://a/g",
}

# RFC 3986 §5.4.2 abnormal examples (iri/iri_test.go:625-646)
ABNORMAL_RESOLUTION = {
    "../../../g": "http://a/g",
    "../../../../g": "http://a/g",
    "/./g": "http://a/g",
    "/../g": "http://a/g",
    "g.": "http://a/b/c/g.",
    ".g": "http://a/b/c/.g",
    "g..": "http://a/b/c/g..",
    "..g": "http://a/b/c/..g",
    "./../g": "http://a/b/g",
    "./g/.": "http://a/b/c/g/",
    "g/./h": "http://a/b/c/g/h",
    "g/../h": "http://a/b/c/h",
    "g;x=1/./y": "http://a/b/c/g;x=1/y",
    "g;x=1/../y": "http://a/b/c/y",
    "g?y/./x": "http://a/b/c/g?y/./x",
    "g?y/../x": "http://a/b/c/g?y/../x",
    "g#s/./x": "http://a/b/c/g#s/./x",
    "g#s/../x": "http://a/b/c/g#s/../x",
}

# RFC 3986 §6.2 normalization (iri/iri_test.go:512-560)
NORMALIZE_CASES = [
    ("HTTP://User@Example.COM/Path", "http://User@example.com/Path"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/a/b/../c/./d", "http://example.com/a/c/d"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com:80/path", "http://example.com/path"),
    ("http://example.com:8080/path", "http://example.com:8080/path"),
    ("http://example.com/re\u0301sume\u0301.html", "http://example.com/résumé.html"),
    ("HTTP://EXAMPLE.COM:80/a/../b/%7E", "http://example.com/b/~"),
    ("", ""),
]

# RFC 3987 §3.1 IRI→URI (iri/iri_test.go:435-498)
TO_URI_CASES = [
    ("http://example.com/a/b", "http://example.com/a/b"),
    ("http://example.com/résumé", "http://example.com/r%C3%A9sum%C3%A9"),
    ("http://example.com/?p=résumé", "http://example.com/?p=r%C3%A9sum%C3%A9"),
    ("http://example.com/#résumé", "http://example.com/#r%C3%A9sum%C3%A9"),
    ("ftp://résumé@example.com/", "ftp://r%C3%A9sum%C3%A9@example.com/"),
    ("http://résumé.example.org/", "http://xn--rsum-bpad.example.org/"),
    ("http://user:p@résumé.com:8080/p?q=v#f", "http://user:p@xn--rsum-bpad.com:8080/p?q=v#f"),
    ("http://-résumé.com/", "http://xn---rsum-csad.com/"),
    ("http://" + "a" * 63 + ".com/", "http://" + "a" * 63 + ".com/"),
    ("http://a%20b.com/", "http://a%20b.com/"),
    ("http://example.com/e\u0301", "http://example.com/%C3%A9"),
]

# RFC 3987 §3.2 URI→IRI (iri/iri_test.go:363-413)
FROM_URI_CASES = [
    ("http://example.org/D%C3%BCrst", "http://example.org/Dürst", False),
    ("http://example.org/%FCrst", "http://example.org/%FCrst", False),
    ("http://example.com/%E2%80%AE", "http://example.com/%E2%80%AE", False),
    ("http://example.com/%C", "", True),
    ("http://example.com/foo%GGbar", "", True),
    ("/a%C3%A9b%E9c/", "/aéb%E9c/", False),
    ("a%3A/b", "a:/b", False),
]

# Relativize table (iri/iri_test.go:939-966)
RELATIVIZE_CASES = [
    ("http://a/b/c", "http://a/b/c", ""),
    ("http://a/b/c", "http://a/b/c#frag", "#frag"),
    ("http://a/b/c?q1", "http://a/b/c?q2", "?q2"),
    ("http://a/b/c", "http://a/b/c/d/e", "c/d/e"),
    ("http://a/b/c/d", "http://a/b/c/e", "e"),
    ("http://a/b/c/d", "http://a/e", "../../e"),
    ("http://a/b/c", "http://x/y/z", "//x/y/z"),
    ("http://a/b/c", "http://x", "//x"),
    ("http://a/b/c", "https://x/y/z", "https://x/y/z"),
    ("http://a/b/c?q", "http://a/b/c", "c"),
    ("http://a/b", "http://a/c", "c"),
    ("http://a", "http://a/b/c", "b/c"),
    ("http://a/b/c", "http://a/", "../"),
    ("http://a/b", "mailto:user@b", "mailto:user@b"),
    ("http://example.com/a", "http:/b/c", "http:/b/c"),
    ("http://a/b", "http://a", "//a"),
    ("mailto:user@example.com", "mailto:", "mailto:"),
    ("http://a/b", "http://a/", "."),
    ("mailto:a@b.com", "mailto:c@d.com", "c@d.com"),
    ("foo:a/b/c", "foo:a/d/e", "../d/e"),
]

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
