"""Pure-Python XXH64 compatible with Spark's ``xxhash64`` expression.

Implements the public XXH64 algorithm (Yann Collet's xxHash spec) plus
Spark's multi-argument convention: arguments are hashed left-to-right with
the running hash as the seed of the next one, starting from seed 42; string
arguments contribute their UTF-8 bytes, long arguments their 8 little-endian
bytes via the streamlined processLong path.  NULL arguments are skipped.

Exists so driver-side oracles (e.g. the full-pipeline golden in
``__spark_entry__``) can reproduce term ids without running Spark —
verified bit-for-bit against ``F.xxhash64`` in tests/test_kernels_spark.py.
"""

from __future__ import annotations

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & M64


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        i = 0
        for i in range(0, n - 31, 32):
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & M64
        i = 0
    h = (h + n) & M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def _to_signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxh64_long(value: int, seed: int) -> int:
    """Spark's hashLong: the 8-byte little-endian integer fast path."""
    h = (seed + P5 + 8) & M64
    h ^= _round(0, value & M64)
    h = (_rotl(h, 27) * P1 + P4) & M64
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def spark_xxhash64(*args: str | int | None) -> int:
    """Bit-compatible with ``F.xxhash64(*cols)`` for string/long columns:
    seed 42, each non-null argument rehashes with the running value as
    seed; returns the signed 64-bit value Spark produces."""
    h = 42
    for a in args:
        if a is None:
            continue
        if isinstance(a, int):
            h = xxh64_long(a, h)
        else:
            h = xxh64(a.encode("utf-8"), h)
    return _to_signed(h)
