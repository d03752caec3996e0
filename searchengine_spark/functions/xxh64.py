"""Driver-side XXH64 — resolves ``pmod(xxhash64(term), n_buckets)``
bucket literals WITHOUT a Spark job.

Spark's ``F.xxhash64`` on a string column is XXH64 (Yann Collet's
public xxHash, BSD) over the UTF-8 bytes with seed 42. Query compile
paths need the bucket id of a handful of literal terms to build the
partition-pruning predicate; running a ``createDataFrame + collect``
microjob for that (the old ``_terms_scan_cond``) put one full Spark
job — scheduler round-trip included — on EVERY batch's driver critical
path (SCALING.json: fused batch 1->4 cores only 2.1x, driver fixed
costs the bound). A few hundred pure-Python hashes cost microseconds.

Bit-equivalence with the JVM expression is pinned by
tests/test_index_build.py::test_xxh64_matches_spark across ASCII,
unicode, empty, and >32-byte strings.
"""

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


def _merge(acc: int, val: int) -> int:
    return ((acc ^ _round(0, val)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` — unsigned 64-bit int. Seed 42 = Spark's
    default for ``F.xxhash64`` (one arg, no explicit seed)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k1 * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def term_bucket(term: str, n_buckets: int) -> int:
    """The bucket id ``pmod(xxhash64(term), n_buckets)`` assigns —
    Spark's hash is the SIGNED int64 view of XXH64, pmod is the
    non-negative Java remainder (== Python ``%`` for positive n)."""
    h = xxh64(term.encode("utf-8"))
    if h >= 1 << 63:
        h -= 1 << 64
    return h % n_buckets
