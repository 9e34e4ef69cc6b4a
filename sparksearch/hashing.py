"""Driver-side twin of Spark's ``xxhash64`` expression.

``term_id = xxhash64(term)`` is the engine's vocabulary key everywhere
(``index/build.py``); format v3 drops term STRINGS from the index
entirely (tfrows/stats are int-keyed — measured 1.4× faster stage A and
28 % smaller tfrows at 500 k docs), so query-term → term_id resolution
must happen on the driver without a Spark job.  This module is a pure
Python port of the hash Spark evaluates JVM-side.

The port below implements the public xxHash64 algorithm with Spark's
defaults (seed 42, UTF-8 bytes of the string) and is pinned by
``tests/test_hashing.py`` against vectors produced by the Spark
``xxhash64`` expression itself, including non-ASCII input and every
tail-length class (0–7 bytes past the last 8-byte word, with and
without the 32-byte stripe loop).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxhash64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Spark-compatible xxhash64 over ``data``; returns SIGNED int64
    (matching the Spark column value)."""
    length = len(data)
    end = length & ~7  # whole 8-byte words
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        i = 0
        stop = length & ~31
        while i < stop:
            for off, v in ((0, "v1"), (8, "v2"), (16, "v3"), (24, "v4")):
                w = int.from_bytes(data[i + off : i + off + 8], "little")
                acc = {"v1": v1, "v2": v2, "v3": v3, "v4": v4}[v]
                acc = (acc + w * _P2) & _M
                acc = (_rotl(acc, 31) * _P1) & _M
                if v == "v1":
                    v1 = acc
                elif v == "v2":
                    v2 = acc
                elif v == "v3":
                    v3 = acc
                else:
                    v4 = acc
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            t = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (((h ^ t) * _P1) + _P4) & _M
        i = stop
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + length) & _M
    # remaining 8-byte words
    while i < end:
        w = int.from_bytes(data[i : i + 8], "little")
        t = (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ t, 27) * _P1) + _P4) & _M
        i += 8
    # remaining 4-byte lane, then bytes
    if i + 4 <= length:
        w = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl(h ^ ((w * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < length:
        h = (_rotl(h ^ ((data[i] & 0xFF) * _P5) & _M, 11) * _P1) & _M
        i += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def term_id_of(term: str) -> int:
    """term string → the engine's term_id (= Spark ``xxhash64(term)``)."""
    return xxhash64(term.encode("utf-8"))
