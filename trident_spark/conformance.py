"""Golden conformance vectors from the reference test suite (jplu/trident),
the single source of truth for both pytest and the driver-contract oracles.

Sources: iri/iri_test.go (RFC 3986 §5.4.1/§5.4.2 resolution, §6.2
normalization, RFC 3987 §3.1/§3.2 conversion, relativization) and
langtag/langtag_test.go (RFC 5646 Appendix A well-formedness, §4.5
canonicalization).
"""

RESOLVE_BASE = "http://a/b/c/d;p?q"

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
    ("http://user:p@résumé.com:8080/p?q=v#f",
     "http://user:p@xn--rsum-bpad.com:8080/p?q=v#f"),
    ("http://-résumé.com/", "http://xn---rsum-csad.com/"),
    ("http://" + "a" * 63 + ".com/", "http://" + "a" * 63 + ".com/"),
    ("http://a%20b.com/", "http://a%20b.com/"),
    ("http://example.com/e\u0301", "http://example.com/%C3%A9"),
]

# RFC 3987 §3.2 URI→IRI (iri/iri_test.go:363-413): (uri, expected, is_error)
FROM_URI_CASES = [
    ("http://example.org/D%C3%BCrst", "http://example.org/Dürst", False),
    ("http://example.org/%FCrst", "http://example.org/%FCrst", False),
    ("http://example.com/%E2%80%AE", "http://example.com/%E2%80%AE", False),
    ("http://example.com/%C", "", True),
    ("http://example.com/foo%GGbar", "", True),
    ("/a%C3%A9b%E9c/", "/aéb%E9c/", False),
    ("a%3A/b", "a:/b", False),
]

# relativization (iri/iri_test.go:939-966): (base, target, expected)
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

# RFC 5646 well-formedness, Parse mode (langtag/langtag_test.go:687-710)
LANGTAG_PARSE_OK = [
    ("de", "de"),
    ("en-US", "en-US"),
    ("sr-Latn-RS", "sr-Latn-RS"),
    ("MN-cYRL-mn", "mn-Cyrl-MN"),
    ("de-CH-x-phonebk", "de-CH-x-phonebk"),
    ("x-whatever", "x-whatever"),
    ("i-klingon", "i-klingon"),
    ("art-lojban", "art-lojban"),
    ("en-a-myext-b-another", "en-a-myext-b-another"),
    ("zz-US", "zz-US"),
    ("en-Zzzz-US", "en-Zzzz-US"),
    ("de-DE-1901-1901", "de-DE-1901-1901"),
    ("en-a-foo-a-bar", "en-a-foo-a-bar"),
]

# RFC 5646 §4.5 canonicalization (langtag/langtag_test.go:737-755)
LANGTAG_NORMALIZE_OK = [
    ("zh-min-nan", "nan"),
    ("art-lojban", "jbo"),
    ("i-klingon", "tlh"),
    ("i-enochian", "i-enochian"),
    ("en-BU", "en-MM"),
    ("zh-gan", "gan"),
    ("en-b-ccc-a-aaa", "en-a-aaa-b-ccc"),
    ("is-Latn", "is"),
    ("SR-LATN-rs", "sr-Latn-RS"),
]

# valid IRI-references, byte-exact storage (iri/iri_test.go:265-282)
PARSE_VALID_REFS = [
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

# invalid IRI-references that must be rejected (iri/iri_test.go:301-310)
PARSE_INVALID_REFS = [
    "1http://example.com",      # invalid scheme start / ':' in first segment
    "scheme:..//path",          # path may not start with // without authority
    "http://example.com/%GG",   # invalid percent encoding
]

# not-well-formed tags, Parse mode (langtag/langtag_test.go:704-710)
LANGTAG_PARSE_INVALID = [
    "en_US",              # forbidden character
    "en--US",             # empty subtag
    "verylongsubtag-en",  # subtag too long
    "x-",                 # empty private use
    "en-a-",              # empty extension
    "en-a-b-foo",         # empty extension sequence
]

# well-formed but invalid tags, normalize mode (langtag/langtag_test.go:749-755)
LANGTAG_NORMALIZE_INVALID = [
    "zz-US",                 # invalid language subtag
    "en-BOGUS",              # invalid region subtag
    "de-419-DE",             # two region tags
    "de-DE-1901-1901",       # duplicate variant
    "ar-a-aaa-b-bbb-a-ccc",  # duplicate singleton
    "zh-gan-gan",            # too many extlangs
]

# canonical → extlang form, RFC 5646 §4.5 (langtag/langtag_test.go:774-815)
EXTLANG_FORM_CASES = [
    ("hak-CN", "zh-hak-CN"),
    ("yue", "zh-yue"),
    ("en-US", "en-US"),          # not an extlang: no-op
    ("zh-hak-CN", "zh-hak-CN"),  # already extlang form
    ("x-my-tag", "x-my-tag"),    # private use: no-op
]

# host/port normalization as full-IRI vectors (iri/authority_test.go:140-265)
HOST_NORMALIZE_CASES = [
    ("http://EXAMPLE.COM:8080/p", "http://example.com:8080/p"),
    ("http://example.com:80/p", "http://example.com/p"),
    ("https://example.com:443/p", "https://example.com/p"),
    ("ftp://example.com:21/p", "ftp://example.com/p"),
    ("ws://example.com:80/p", "ws://example.com/p"),
    ("wss://example.com:443/p", "wss://example.com/p"),
    ("gopher://example.com:80/p", "gopher://example.com:80/p"),  # unknown scheme
    ("http://[2001:DB8::7]/p", "http://[2001:db8::7]/p"),        # IPv6 case
    ("http://faß.de/p", "http://fass.de/p"),                     # nameprep ß→ss
    ("http://[::1]:80/p", "http://[::1]/p"),
    ("http://xn--fa-hia.de/p", "http://fass.de/p"),              # punycode decode
    # hostile hosts (ref iri/autority.go:251-288 flow: lowercase →
    # ToASCII → ToUnicode, whole-host fallback on either error, ß→ss last)
    ("https://straße.de/a", "https://strasse.de/a"),
    ("https://XN--BCHER-KVA.example/b", "https://bücher.example/b"),
    # mixed-script multi-label punycode (Cyrillic IDN)
    ("https://xn--d1acufc.xn--p1ai/x", "https://домен.рф/x"),
    # invalid punycode label: the WHOLE host keeps its lowercased form —
    # even when sibling labels are valid punycode
    ("https://XN--ZZZZ999999.example/x", "https://xn--zzzz999999.example/x"),
    ("https://xn--bcher-kva.xn--zzzz999999.example/x",
     "https://xn--bcher-kva.xn--zzzz999999.example/x"),
    # trailing root dot survives; empty final label is not an error
    ("https://DOM.example.COM./x", "https://dom.example.com./x"),
    # ZWJ inside a label: lenient punycode round-trip is the identity
    ("http://a‍b.example/x", "http://a‍b.example/x"),
]
