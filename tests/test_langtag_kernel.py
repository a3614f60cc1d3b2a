"""Conformance tests for the langtag kernel.

Golden vectors from the reference suite (langtag/langtag_test.go:687-815):
RFC 5646 Appendix A well-formedness, §4.5 canonicalization, extlang form.
"""

import pytest

from trident_spark.conformance import (
    LANGTAG_NORMALIZE_OK as NORMALIZE_OK,
    LANGTAG_PARSE_OK as PARSE_OK,
)
from trident_spark.kernels import langtag as L

PARSE_ERR = [
    ("en_US", L.ERR_FORBIDDEN_CHAR),
    ("en--US", L.ERR_EMPTY_SUBTAG),
    ("verylongsubtag-en", L.ERR_SUBTAG_TOO_LONG),
    ("x-", L.ERR_EMPTY_PRIVATE_USE),
    ("en-a-", L.ERR_EMPTY_EXTENSION),
    ("en-a-b-foo", L.ERR_EMPTY_EXTENSION),
]

NORMALIZE_ERR = [
    ("zz-US", L.ERR_INVALID_LANGUAGE),
    ("en-BOGUS", L.ERR_INVALID_SUBTAG),
    ("de-419-DE", L.ERR_INVALID_SUBTAG),
    ("de-DE-1901-1901", L.ERR_DUPLICATE_VARIANT),
    ("ar-a-aaa-b-bbb-a-ccc", L.ERR_DUPLICATE_SINGLETON),
    ("zh-gan-gan", L.ERR_TOO_MANY_EXTLANGS),
]

EXTLANG_FORM = [
    ("hak-CN", "zh-hak-CN"),
    ("yue", "zh-yue"),
    ("en-US", "en-US"),
]


@pytest.mark.parametrize("tag,want", PARSE_OK)
def test_parse_ok(tag, want):
    assert L.parse(tag).tag == want


@pytest.mark.parametrize("tag,code", PARSE_ERR)
def test_parse_err(tag, code):
    with pytest.raises(L.LangTagError) as ei:
        L.parse(tag)
    assert ei.value.code == code


@pytest.mark.parametrize("tag,want", NORMALIZE_OK)
def test_normalize_ok(tag, want):
    assert L.normalize(tag).tag == want


@pytest.mark.parametrize("tag,code", NORMALIZE_ERR)
def test_normalize_err(tag, code):
    with pytest.raises(L.LangTagError) as ei:
        L.normalize(tag)
    assert ei.value.code == code


@pytest.mark.parametrize("tag,want", EXTLANG_FORM)
def test_to_extlang_form(tag, want):
    assert L.to_extlang_form(tag).tag == want


def test_grandfathered_flag():
    assert L.parse("i-klingon").is_grandfathered
    assert L.normalize("i-enochian").is_grandfathered
    assert not L.normalize("i-klingon").is_grandfathered  # replaced by tlh


def test_fields_decomposition():
    t = L.parse("sr-Latn-RS-fonipa-a-ext1-x-priv")
    assert t.language == "sr"
    assert t.script == "Latn"
    assert t.region == "RS"
    assert t.variants == ("fonipa",)
    assert t.extensions == (("a", "ext1"),)
    assert t.private_use == ("priv",)


def test_registry_loaded_once():
    r1 = L.load_registry()
    r2 = L.load_registry()
    assert r1 is r2
    assert len(r1) > 9000


def test_normalize_result_matches_reparse():
    """Differential gate (CLAUDE.md rule 8): normalize() now builds its
    ParsedTag from the canonicalized run directly; it must stay identical
    to rendering + re-parsing, across the conformance corpus plus fuzzed
    subtag combinations."""
    import random

    from trident_spark.conformance import LANGTAG_NORMALIZE_OK, LANGTAG_PARSE_OK
    from trident_spark.kernels import langtag as L

    reg = L.load_registry()
    tags = [t for t, _ in LANGTAG_NORMALIZE_OK] + \
        [t for t, _ in LANGTAG_PARSE_OK]
    rng = random.Random(5)
    subs = ["en", "de", "zh", "sr", "Latn", "Hant", "US", "DE", "RS",
            "419", "x", "a", "min", "nan", "boont", "1996", "u", "co",
            "phonebk", "yue", "cmn", "i-klingon", "art-lojban"]
    for _ in range(3000):
        tags.append("-".join(rng.choice(subs)
                             for _ in range(rng.randint(1, 5))))
    checked = 0
    for t in tags:
        try:
            want = L._normalize_reparse(t, reg)
        except L.LangTagError:
            with pytest.raises(L.LangTagError):
                L.normalize(t, reg)
            continue
        assert L.normalize(t, reg) == want, t
        checked += 1
    assert checked > 800
