"""Driver-side xxHash64 — the same public-domain XXH64 algorithm
(Yann Collet; seed 42) Spark's ``xxhash64`` expression implements
JVM-side, so the engine can turn a point lookup's oid literals into
``__obucket`` partition values WITHOUT scheduling a Spark job: the
old bucket-value resolution (createDataFrame → distinct → collect)
cost a fixed ~0.4-0.5 s per lookup — pure scheduling overhead for a
handful of literals. Property-tested against Spark's own expression
over random longs and unicode strings (``tests/test_xxh64.py``); the
engine falls back to the Spark job for any literal/type combination
outside the tested envelope (see ``Engine._oid_bucket_values``).

The engine only ever hashes the STRING rendering of ``_oid``
(``_obucket`` casts to string first so every integral width hashes
identically), so the supported driver-side inputs are exactly python
``str`` (UTF-8 encoded) and ``int`` (decimal rendering — Spark's
``CAST(long AS string)``)."""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit value — the exact number
    Spark's ``xxhash64(col)`` yields for the same bytes (Spark's
    default seed is 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7)
             + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def obucket_of(oid: int | str, buckets: int) -> int:
    """``pmod(xxhash64(cast(oid AS string)), buckets)`` computed on the
    driver — the bucket directory a write puts this oid in (see
    ``Engine._obucket``). ``int`` renders decimal (Spark's
    ``CAST(long AS string)``); ``str`` hashes its UTF-8 bytes."""
    s = str(oid) if isinstance(oid, int) else oid
    return xxh64(s.encode("utf-8")) % buckets
