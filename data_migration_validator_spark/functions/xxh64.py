"""Pure-Python reference implementation of Spark's ``xxhash64`` expression.

Spark's XxHash64 expression (catalyst XXH64) is standard XXH64 over each
input's little-endian byte representation, chained: the running hash seeds
the next input's hash, starting from seed 42.  int/short/byte inputs hash
as 4-byte words, longs as 8-byte words, strings as UTF-8 bytes.

This module exists for the ORACLE side (DuckDB UDFs in
``scripts/check_oracle.py`` and pytest oracles), so the MinHash/SimHash
family can be value-checked against an independent engine instead of
rows-only — it is never on a Spark hot path.  Parity with the JVM
expression is asserted in ``tests/test_operators.py``.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Standard XXH64 of ``data`` with ``seed`` (unsigned 64-bit result)."""
    seed &= _MASK
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        limit = n - 32
        while off <= limit:
            v1 = (_rotl((v1 + int.from_bytes(data[off:off + 8], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + int.from_bytes(data[off + 8:off + 16], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + int.from_bytes(data[off + 16:off + 24], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + int.from_bytes(data[off + 24:off + 32], "little") * _P2) & _MASK, 31) * _P1) & _MASK
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h ^= v
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while off + 8 <= n:
        k = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        off += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """``F.xxhash64(*values)`` for Python values (signed 64-bit result).

    Type mapping mirrors the Catalyst expression: str → UTF-8 bytes;
    int → 4-byte LE when it fits in int32 (the type ``F.lit`` infers),
    else 8-byte LE (LongType).  Pass ``("long", v)`` to force LongType
    for small values hashed through a bigint column.
    """
    h = seed & _MASK
    for v in values:
        if isinstance(v, tuple) and v[0] == "long":
            h = xxh64(int(v[1]).to_bytes(8, "little", signed=True), h)
        elif isinstance(v, str):
            h = xxh64(v.encode("utf-8"), h)
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = xxh64(v.to_bytes(4, "little", signed=True), h)
            else:
                h = xxh64(v.to_bytes(8, "little", signed=True), h)
        else:
            raise TypeError(f"unsupported value for spark_xxhash64: {v!r}")
    return _signed(h)
