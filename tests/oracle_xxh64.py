"""Pure-Python reimplementation of Spark's XXH64 variant
(org.apache.spark.sql.catalyst.expressions.XXH64 — the engine behind
``F.xxhash64``, seed 42, little-endian fetches, per-type dispatch:
strings hash their UTF-8 bytes, longs/ints hash their fixed-width
value; multi-argument calls chain each argument's hash as the next
seed). Written from the published algorithm for the rows-only-query
oracles (tests/test_rows_only_oracles.py); the test suite asserts
equality against Spark itself on a probe set before using it.
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


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int = 42) -> int:
    value &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int = 42) -> int:
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int = 42) -> int:
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[off + 8 * i : off + 8 * i + 8], "little")
                v = (v + k * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        k = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        k = int.from_bytes(data[off : off + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64(*args, seed: int = 42) -> int:
    """Spark ``F.xxhash64(...)`` equivalent: chain each argument's hash
    as the next argument's seed; returns a SIGNED 64-bit int (what the
    LongType column holds, and what Spark's min()/comparisons use)."""
    h = seed
    for a in args:
        if isinstance(a, str):
            h = hash_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bool):
            raise TypeError("ambiguous bool")
        elif isinstance(a, int):
            # match the Spark column type: ints beyond 32 bits are longs;
            # callers hashing an IntegerType literal use hash_int directly
            h = hash_long(a & _M, h)
        else:
            raise TypeError(f"unsupported type {type(a)}")
    return _to_signed(h)


def xxhash64_str_then_int(s_hash_signed: int, i: int, seed: int = 42) -> int:
    """``F.xxhash64(longCol, intLiteral)`` — long then IntegerType."""
    h = hash_long(s_hash_signed & _M, seed)
    h = hash_int(i, h)
    return _to_signed(h)
