#!/usr/bin/env python
"""Build trident_spark/data/iana_registry.json.gz from the IANA language
subtag registry (public data, https://www.iana.org/assignments/
language-subtag-registry/language-subtag-registry).

The registry is a record-jar file: records separated by `%%`, fields as
`Key: Value` with continuation lines indented by two spaces.  We keep only
the fields the RFC 5646 §4.5 canonicalization rules need and store them as a
flat JSON dict keyed exactly like the reference's lookup map
(``"<type>:<lower(subtag)>"`` for subtags, ``lower(tag)`` for
grandfathered/redundant tags; ranges like ``qaa..qtz`` are expanded eagerly).

Usage:  python scripts/build_registry.py <registry-file> [out.json.gz]
"""

from __future__ import annotations

import gzip
import json
import sys
from pathlib import Path

KEEP_FIELDS = {
    "Type",
    "Subtag",
    "Tag",
    "Preferred-Value",
    "Prefix",
    "Suppress-Script",
    "Scope",
    "Macrolanguage",
    "Deprecated",
}

MAX_NUMERIC_EXPANSION = 20_000
MAX_ALPHA_EXPANSION = 40_000


def parse_records(text: str):
    records: list[dict] = []
    fields: dict[str, list[str]] = {}
    last_key: str | None = None
    file_date = ""
    for line in text.splitlines():
        if line == "%%":
            if fields:
                records.append(fields)
            fields = {}
            last_key = None
            continue
        if line.startswith("  ") and last_key:
            fields[last_key][-1] += " " + line.strip()
            continue
        if ":" in line:
            key, _, value = line.partition(":")
            key, value = key.strip(), value.strip()
            if key == "File-Date":
                file_date = value
                continue
            fields.setdefault(key, []).append(value)
            last_key = key
    if fields:
        records.append(fields)
    return file_date, records


def expand_range(range_str: str) -> list[str]:
    start, end = range_str.split("..")
    if len(start) != len(end) or not start:
        raise ValueError(f"bad range {range_str}")
    if start.isdigit() and end.isdigit():
        lo, hi = int(start), int(end)
        if hi - lo > MAX_NUMERIC_EXPANSION:
            raise ValueError(f"numeric range too large: {range_str}")
        return [str(i).zfill(len(start)) for i in range(lo, hi + 1)]
    if start.isalpha() and end.isalpha():
        out = []
        cur = list(start.lower())
        end_l = end.lower()
        while True:
            out.append("".join(cur))
            if "".join(cur) == end_l:
                return out
            if len(out) > MAX_ALPHA_EXPANSION:
                raise ValueError(f"alpha range too large: {range_str}")
            i = len(cur) - 1
            while True:
                cur[i] = chr(ord(cur[i]) + 1)
                if cur[i] <= "z":
                    break
                cur[i] = "a"
                i -= 1
    raise ValueError(f"mixed range {range_str}")


def compact(rec_fields: dict[str, list[str]]) -> dict:
    rec = {}
    for k, v in rec_fields.items():
        if k not in KEEP_FIELDS:
            continue
        if k == "Prefix":
            rec["prefix"] = v
        elif k == "Preferred-Value":
            rec["preferred"] = v[0]
        elif k == "Suppress-Script":
            rec["suppress_script"] = v[0]
        elif k == "Deprecated":
            rec["deprecated"] = True
        else:
            rec[k.lower()] = v[0]
    return rec


def build(src: Path) -> dict:
    file_date, raw = parse_records(src.read_text(encoding="utf-8"))
    out: dict[str, dict] = {}
    for fields in raw:
        rec = compact(fields)
        rtype = rec.get("type", "")
        subtag = rec.get("subtag", "")
        tag = rec.get("tag", "")
        if ".." in subtag:
            for sub in expand_range(subtag):
                r = dict(rec)
                r["subtag"] = sub
                out[f"{rtype}:{sub.lower()}"] = r
        elif ".." in tag:
            for t in expand_range(tag):
                r = dict(rec)
                r["tag"] = t
                out[t.lower()] = r
        elif subtag:
            out[f"{rtype}:{subtag.lower()}"] = rec
        elif tag:
            out[tag.lower()] = rec
    return {"file_date": file_date, "records": out}


def main() -> None:
    src = Path(sys.argv[1])
    dst = Path(
        sys.argv[2]
        if len(sys.argv) > 2
        else Path(__file__).resolve().parent.parent
        / "trident_spark"
        / "data"
        / "iana_registry.json.gz"
    )
    registry = build(src)
    dst.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(dst, "wt", encoding="utf-8") as f:
        json.dump(registry, f, separators=(",", ":"))
    print(f"{len(registry['records'])} records (file date {registry['file_date']}) -> {dst}")


if __name__ == "__main__":
    main()
