"""RFC 5646 (BCP 47) language-tag kernel — pure Python, batch-oriented.

Re-derives the per-row semantics of the reference's ``langtag`` package
(jplu/trident: langtag/langtag.go, langtag/langtag_parser.go) from RFC 5646:

- ``parse``            — well-formedness check + case normalization (§2.1.1)
- ``normalize``        — validity check + canonicalization (§4.5)
- ``to_extlang_form``  — canonical → extlang form (§4.5)

Validity checks consult the IANA language-subtag registry (public data,
vendored as trident_spark/data/iana_registry.json.gz; rebuild with
scripts/build_registry.py).  The registry dict is loaded once per process and
is intended to be shared via a Spark broadcast variable inside pandas UDFs
(mirroring the reference's parse-registry-once guidance, langtag/embedded.go).

Spark-free on purpose so it can run inside Arrow-batched UDFs.
"""

from __future__ import annotations

import gzip
import json
from functools import lru_cache
from pathlib import Path
from typing import NamedTuple

__all__ = [
    "LangTagError",
    "ERR_FORBIDDEN_CHAR",
    "load_registry",
    "parse",
    "normalize",
    "to_extlang_form",
]

_DATA = Path(__file__).resolve().parent.parent / "data" / "iana_registry.json.gz"

# BCP 47 structural constants (RFC 5646 §2.1 ABNF)
MAX_SUBTAG_LEN = 8
MAX_EXTLANGS = 1
SCRIPT_LEN = 4
REGION_ALPHA_LEN = 2
REGION_NUM_LEN = 3
EXTLANG_LEN = 3
SHORT_PRIMARY_LEN = 3
MIN_VARIANT_ALPHA = 5
MIN_VARIANT_DIGIT = 4


class LangTagError(ValueError):
    def __init__(self, code: str, message: str | None = None):
        super().__init__(message or code)
        self.code = code


# error codes mirror the reference's sentinel names for test parity
ERR_FORBIDDEN_CHAR = "ErrForbiddenChar"
ERR_EMPTY_SUBTAG = "ErrEmptySubtag"
ERR_SUBTAG_TOO_LONG = "ErrSubtagTooLong"
ERR_EMPTY_PRIVATE_USE = "ErrEmptyPrivateUse"
ERR_EMPTY_EXTENSION = "ErrEmptyExtension"
ERR_INVALID_LANGUAGE = "ErrInvalidLanguage"
ERR_INVALID_SUBTAG = "ErrInvalidSubtag"
ERR_DUPLICATE_VARIANT = "ErrDuplicateVariant"
ERR_DUPLICATE_SINGLETON = "ErrDuplicateSingleton"
ERR_TOO_MANY_EXTLANGS = "ErrTooManyExtlangs"


@lru_cache(maxsize=1)
def load_registry(path: str | None = None) -> dict:
    """Load the compact IANA registry: {key: record} with keys
    ``"<type>:<lower(subtag)>"`` or ``lower(tag)`` (grandfathered/redundant).

    Reads via importlib.resources so it also works when the package ships as
    a ``spark-submit --py-files`` zip (zipimport has no filesystem paths).
    """
    if path is not None:
        with gzip.open(path, "rt", encoding="utf-8") as f:
            return json.load(f)["records"]
    try:
        raw = _DATA.read_bytes()
    except OSError:
        import importlib.resources as ir

        raw = ir.files("trident_spark").joinpath("data/iana_registry.json.gz").read_bytes()
    return json.loads(gzip.decompress(raw))["records"]


def _is_langtag_char(c: str) -> bool:
    return c.isascii() and (c.isalnum() or c == "-")


def _title(s: str) -> str:
    return s[:1].upper() + s[1:].lower()


class ParsedTag(NamedTuple):
    tag: str  # rendered canonical-case tag
    language: str
    extlangs: tuple[str, ...]
    script: str
    region: str
    variants: tuple[str, ...]
    extensions: tuple[tuple[str, str], ...]  # (singleton, value)
    private_use: tuple[str, ...]
    is_grandfathered: bool


class _Run:
    """One parse/canonicalize pass over a tag (RFC 5646 §2.1 state machine)."""

    # states
    START, AFTER_LANG, AFTER_EXTLANG, AFTER_SCRIPT, AFTER_REGION, IN_VARIANT, \
        IN_EXT, IN_PRIVATE = range(8)

    def __init__(self, registry: dict, tag: str, check_validity: bool):
        self.reg = registry
        self.subtags = tag.split("-")
        self.check = check_validity
        self.language = ""
        self.extlangs: list[str] = []
        self.script = ""
        self.region = ""
        self.variants: list[str] = []
        self.extensions: list[list[str]] = []  # [singleton, value]
        self.private: list[str] = []
        self.state = self.START
        self.seen_variants: set[str] = set()
        self.seen_singletons: set[str] = set()
        self.extension_expected = False

    # -- parsing ------------------------------------------------------------

    def parse(self) -> None:
        subtags = self.subtags
        trailing_hyphen = len(subtags) > 1 and subtags[-1] == ""
        if trailing_hyphen:
            subtags = subtags[:-1]

        if subtags and subtags[0].lower() == "x":
            if len(subtags) == 1:
                raise LangTagError(ERR_EMPTY_PRIVATE_USE)
            for sub in subtags[1:]:
                self._validate_subtag(sub)
                self.private.append(sub)
            self.state = self.IN_PRIVATE
        else:
            for i, sub in enumerate(subtags):
                self._validate_subtag(sub)
                if self.state == self.IN_PRIVATE:
                    self.private.append(sub)
                elif self.state == self.IN_EXT:
                    self._extension_subtag(sub)
                else:
                    self._langtag_subtag(i, sub)

        if trailing_hyphen:
            if self.extension_expected:
                raise LangTagError(ERR_EMPTY_EXTENSION)
            if self.state == self.IN_PRIVATE and not self.private:
                raise LangTagError(ERR_EMPTY_PRIVATE_USE)
        if self.extension_expected:
            raise LangTagError(ERR_EMPTY_EXTENSION)

    @staticmethod
    def _validate_subtag(sub: str) -> None:
        if not sub:
            raise LangTagError(ERR_EMPTY_SUBTAG)
        if len(sub) > MAX_SUBTAG_LEN:
            raise LangTagError(ERR_SUBTAG_TOO_LONG)

    def _langtag_subtag(self, i: int, sub: str) -> None:
        if i == 0:
            self._primary_language(sub)
            return
        if len(sub) == 1:
            self._singleton(sub)
            return
        # RFC 5646 §2.2.2 allows at most one extlang
        if (
            self.extlangs
            and len(sub) == EXTLANG_LEN
            and sub.isalpha()
            and (not self.check or f"extlang:{sub.lower()}" in self.reg)
        ):
            raise LangTagError(ERR_TOO_MANY_EXTLANGS)

        if self._try_extlang(sub):
            self.state = self.AFTER_EXTLANG
            return
        if self._try_script(sub):
            self.state = self.AFTER_SCRIPT
            return
        if self._try_region(sub):
            self.state = self.AFTER_REGION
            return
        if self._try_variant(sub):
            self.state = self.IN_VARIANT
            return
        raise LangTagError(ERR_INVALID_SUBTAG)

    def _primary_language(self, sub: str) -> None:
        min_len = 2 if self.check else 1
        if not (min_len <= len(sub) <= MAX_SUBTAG_LEN) or not sub.isalpha():
            raise LangTagError(ERR_INVALID_LANGUAGE)
        if self.check:
            rec = self.reg.get(f"language:{sub.lower()}")
            if rec is None or rec.get("type") != "language":
                raise LangTagError(ERR_INVALID_LANGUAGE)
        self.language = sub
        self.state = (
            self.AFTER_LANG if len(sub) <= SHORT_PRIMARY_LEN else self.AFTER_EXTLANG
        )

    def _try_extlang(self, sub: str) -> bool:
        if (
            self.state != self.AFTER_LANG
            or len(self.extlangs) >= MAX_EXTLANGS
            or len(sub) != EXTLANG_LEN
            or not sub.isalpha()
        ):
            return False
        if self.check:
            rec = self.reg.get(f"extlang:{sub.lower()}")
            if rec is None or rec.get("type") != "extlang":
                return False
        self.extlangs.append(sub)
        return True

    def _try_script(self, sub: str) -> bool:
        if self.state > self.AFTER_EXTLANG or len(sub) != SCRIPT_LEN or not sub.isalpha():
            return False
        if self.check:
            rec = self.reg.get(f"script:{sub.lower()}")
            if rec is None or rec.get("type") != "script":
                return False
        self.script = sub
        return True

    def _try_region(self, sub: str) -> bool:
        is_region_fmt = (len(sub) == REGION_ALPHA_LEN and sub.isalpha()) or (
            len(sub) == REGION_NUM_LEN and sub.isdigit()
        )
        if self.state > self.AFTER_SCRIPT or not is_region_fmt:
            return False
        if self.check:
            rec = self.reg.get(f"region:{sub.lower()}")
            if rec is None or rec.get("type") != "region":
                return False
        self.region = sub
        return True

    def _try_variant(self, sub: str) -> bool:
        if self.check:
            ok_fmt = (
                (len(sub) >= MIN_VARIANT_ALPHA and sub[0].isalpha())
                or (len(sub) >= MIN_VARIANT_DIGIT and sub[0].isdigit())
            ) and sub.isalnum()
        else:
            ok_fmt = sub.isalnum()
        if (self.state > self.AFTER_REGION and self.state != self.IN_VARIANT) or not ok_fmt:
            return False
        if self.check:
            rec = self.reg.get(f"variant:{sub.lower()}")
            if rec is None or rec.get("type") != "variant":
                return False
            low = sub.lower()
            if low in self.seen_variants:
                raise LangTagError(ERR_DUPLICATE_VARIANT)
            self.seen_variants.add(low)
        self.variants.append(sub)
        return True

    def _singleton(self, sub: str) -> None:
        if self.extension_expected:
            raise LangTagError(ERR_EMPTY_EXTENSION)
        s = sub.lower()
        if self.check:
            if s in self.seen_singletons:
                raise LangTagError(ERR_DUPLICATE_SINGLETON)
            self.seen_singletons.add(s)
        if s == "x":
            self.state = self.IN_PRIVATE
            return
        self.state = self.IN_EXT
        self.extension_expected = True
        self.extensions.append([s, ""])

    def _extension_subtag(self, sub: str) -> None:
        if len(sub) == 1:
            self._singleton(sub)
            return
        last = self.extensions[-1]
        last[1] = sub if not last[1] else last[1] + "-" + sub
        self.extension_expected = False

    # -- canonicalization (RFC 5646 §4.5) ------------------------------------

    def canonicalize(self) -> None:
        self._extlang_to_primary()
        self._replace_deprecated()
        self._order_variants()
        self._suppress_script()
        self.extensions.sort(key=lambda e: e[0])

    def _extlang_to_primary(self) -> None:
        if not self.extlangs:
            return
        rec = self.reg.get(f"extlang:{self.extlangs[0].lower()}")
        if rec is None or rec.get("type") != "extlang":
            return
        prefixes = [p.lower() for p in rec.get("prefix", [])]
        if self.language.lower() in prefixes and rec.get("preferred"):
            self.language = rec["preferred"]
            self.extlangs = self.extlangs[1:]

    def _replace_deprecated(self) -> None:
        def repl(sub: str, stype: str) -> str:
            if not sub:
                return sub
            rec = self.reg.get(f"{stype}:{sub.lower()}")
            if rec and rec.get("preferred"):
                return rec["preferred"]
            return sub

        self.language = repl(self.language, "language")
        self.script = repl(self.script, "script")
        self.region = repl(self.region, "region")
        self.variants = [repl(v, "variant") for v in self.variants]

    def _order_variants(self) -> None:
        if len(self.variants) <= 1:
            return

        def prefix_contains(prefixes: list[str], variant: str) -> bool:
            vl = variant.lower()
            return any(
                sub.lower() == vl for p in prefixes for sub in p.split("-")
            )

        import functools

        def cmp(a: str, b: str) -> int:
            ra = self.reg.get(f"variant:{a.lower()}")
            rb = self.reg.get(f"variant:{b.lower()}")
            if ra and prefix_contains(ra.get("prefix", []), b):
                return 1  # b appears in a's prefix → a comes after b
            if rb and prefix_contains(rb.get("prefix", []), a):
                return -1
            has_a = bool(ra and ra.get("prefix"))
            has_b = bool(rb and rb.get("prefix"))
            if has_a != has_b:
                return -1 if has_a else 1
            return -1 if a < b else (1 if a > b else 0)

        self.variants.sort(key=functools.cmp_to_key(cmp))

    def _suppress_script(self) -> None:
        if not self.script:
            return
        rec = self.reg.get(f"language:{self.language.lower()}")
        if rec and rec.get("suppress_script", "").lower() == self.script.lower():
            self.script = ""

    # -- rendering (case normalization, RFC 5646 §2.1.1) ---------------------

    def render(self) -> str:
        parts: list[str] = []
        if self.language:
            parts.append(self.language.lower())
        elif self.private:
            return "-".join(["x"] + [p.lower() for p in self.private])
        parts.extend(e.lower() for e in self.extlangs)
        if self.script:
            parts.append(_title(self.script))
        if self.region:
            parts.append(self.region.upper())
        parts.extend(v.lower() for v in self.variants)
        for singleton, value in self.extensions:
            parts.append(singleton)
            if value:
                parts.append(value.lower())
        if self.state == self.IN_PRIVATE and self.private:
            parts.append("x")
            parts.extend(p.lower() for p in self.private)
        return "-".join(parts)

    def result(self, is_grandfathered: bool) -> ParsedTag:
        return ParsedTag(
            tag=self.render(),
            language=self.language.lower(),
            extlangs=tuple(e.lower() for e in self.extlangs),
            script=_title(self.script) if self.script else "",
            region=self.region.upper(),
            variants=tuple(v.lower() for v in self.variants),
            extensions=tuple((s, v.lower()) for s, v in self.extensions),
            private_use=tuple(p.lower() for p in self.private),
            is_grandfathered=is_grandfathered,
        )


def _check_charset(tag: str) -> None:
    if not all(_is_langtag_char(c) for c in tag):
        raise LangTagError(ERR_FORBIDDEN_CHAR)


def parse(tag: str, registry: dict | None = None) -> ParsedTag:
    """Well-formedness check + case normalization (no registry validity)."""
    reg = registry if registry is not None else load_registry()
    _check_charset(tag)
    is_gf = False
    rec = reg.get(tag.lower())
    if rec and rec.get("type") in ("grandfathered", "redundant"):
        is_gf = True
    run = _Run(reg, tag, check_validity=False)
    run.parse()
    return run.result(is_gf)


def normalize(tag: str, registry: dict | None = None) -> ParsedTag:
    """Validity check + full RFC 5646 §4.5 canonicalization."""
    reg = registry if registry is not None else load_registry()
    _check_charset(tag)
    is_gf = False
    check = True
    rec = reg.get(tag.lower())
    if rec and rec.get("type") in ("grandfathered", "redundant"):
        if rec.get("preferred"):
            tag = rec["preferred"]
        elif rec.get("type") == "grandfathered":
            is_gf = True
            check = False
    run = _Run(reg, tag, check_validity=check)
    run.parse()
    run.canonicalize()
    # canonicalize mutates the run's subtag fields in place, so its result
    # equals re-parsing the rendered canonical string — enforced by the
    # differential gate tests/test_langtag_kernel.py::
    # test_normalize_result_matches_reparse (fast-path rule, CLAUDE.md #8)
    return run.result(is_gf)


def _normalize_reparse(tag: str, registry: dict | None = None) -> ParsedTag:
    """The pre-optimization reference path: render the canonical form and
    re-parse it.  Kept ONLY as the slow side of the differential gate."""
    reg = registry if registry is not None else load_registry()
    _check_charset(tag)
    is_gf = False
    check = True
    rec = reg.get(tag.lower())
    if rec and rec.get("type") in ("grandfathered", "redundant"):
        if rec.get("preferred"):
            tag = rec["preferred"]
        elif rec.get("type") == "grandfathered":
            is_gf = True
            check = False
    run = _Run(reg, tag, check_validity=check)
    run.parse()
    run.canonicalize()
    final = _Run(reg, run.render(), check_validity=False)
    final.parse()
    return final.result(is_gf)


def to_extlang_form(tag: str | ParsedTag, registry: dict | None = None) -> ParsedTag:
    """Convert a canonical tag to its extlang form (e.g. hak-CN → zh-hak-CN)."""
    reg = registry if registry is not None else load_registry()
    lt = tag if isinstance(tag, ParsedTag) else normalize(tag, reg)
    if not lt.language or lt.is_grandfathered:
        return lt
    rec = reg.get(f"extlang:{lt.language.lower()}")
    if rec is None or rec.get("type") != "extlang" or not rec.get("prefix"):
        return lt
    new_tag = rec["prefix"][0] + "-" + lt.tag
    run = _Run(reg, new_tag, check_validity=False)
    run.parse()
    return run.result(False)
