"""Pure-Python ports of the two hash functions Spark's expressions use
(xxHash64 and Murmur3_x86_32), for INDEPENDENT golden generation.

Both algorithms are public specifications (xxHash by Yann Collet;
MurmurHash3 by Austin Appleby); Spark's variants are straight ports of
those specs with (a) seed 42 by default and (b) a multi-argument fold
where each value's hash seeds the next (see Spark's
`sql.catalyst.expressions.hash.scala`, public source). The
implementations below follow the published specs; `_SELF_TEST` pins
them against values produced by a live Spark session so any drift
fails loudly at import.

No engine code is imported — tools/gen_pipeline_goldens.py uses these
to recompute dedup/ANN signatures from scratch.
"""

from __future__ import annotations

M64 = (1 << 64) - 1
M32 = (1 << 32) - 1

P64_1 = 0x9E3779B185EBCA87
P64_2 = 0xC2B2AE3D27D4EB4F
P64_3 = 0x165667B19E3779F9
P64_4 = 0x85EBCA77C2B2AE63
P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * P64_2) & M64
    h ^= h >> 29
    h = (h * P64_3) & M64
    h ^= h >> 32
    return h


def _signed64(x: int) -> int:
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (signed-64 result, as Spark returns)."""
    seed &= M64
    length = len(data)
    pos = 0
    if length >= 32:
        v1 = (seed + P64_1 + P64_2) & M64
        v2 = (seed + P64_2) & M64
        v3 = seed
        v4 = (seed - P64_1) & M64
        while pos + 32 <= length:
            w1 = int.from_bytes(data[pos : pos + 8], "little")
            w2 = int.from_bytes(data[pos + 8 : pos + 16], "little")
            w3 = int.from_bytes(data[pos + 16 : pos + 24], "little")
            w4 = int.from_bytes(data[pos + 24 : pos + 32], "little")
            v1 = (_rotl64((v1 + w1 * P64_2) & M64, 31) * P64_1) & M64
            v2 = (_rotl64((v2 + w2 * P64_2) & M64, 31) * P64_1) & M64
            v3 = (_rotl64((v3 + w3 * P64_2) & M64, 31) * P64_1) & M64
            v4 = (_rotl64((v4 + w4 * P64_2) & M64, 31) * P64_1) & M64
            pos += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * P64_2) & M64, 31) * P64_1) & M64
            h = (h * P64_1 + P64_4) & M64
    else:
        h = (seed + P64_5) & M64
    h = (h + length) & M64
    while pos + 8 <= length:
        w = int.from_bytes(data[pos : pos + 8], "little")
        h ^= (_rotl64((w * P64_2) & M64, 31) * P64_1) & M64
        h = (_rotl64(h, 27) * P64_1 + P64_4) & M64
        pos += 8
    if pos + 4 <= length:
        w = int.from_bytes(data[pos : pos + 4], "little")
        h ^= (w * P64_1) & M64
        h = (_rotl64(h, 23) * P64_2 + P64_3) & M64
        pos += 4
    while pos < length:
        h ^= (data[pos] * P64_5) & M64
        h = (_rotl64(h, 11) * P64_1) & M64
        pos += 1
    return _signed64(_fmix64(h))


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit integer (Spark's hashLong)."""
    seed &= M64
    value &= M64
    h = (seed + P64_5 + 8) & M64
    h ^= (_rotl64((value * P64_2) & M64, 31) * P64_1) & M64
    h = (_rotl64(h, 27) * P64_1 + P64_4) & M64
    return _signed64(_fmix64(h))


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 32-bit integer (Spark's hashInt)."""
    seed &= M64
    h = (seed + P64_5 + 4) & M64
    h ^= ((value & M32) * P64_1) & M64
    h = (_rotl64(h, 23) * P64_2 + P64_3) & M64
    return _signed64(_fmix64(h))


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Spark's xxhash64(...): fold left, each value's hash seeding the
    next. Supported value types: str (UTF-8 bytes), ('long', v),
    ('int', v). Plain Python ints are treated as longs (Spark's
    BIGINT), matching e.g. xxhash64(col_of_longs, ...)."""
    h = seed
    for v in values:
        if isinstance(v, tuple):
            kind, x = v
        elif isinstance(v, str):
            kind, x = "str", v
        elif isinstance(v, int):
            kind, x = "long", v
        else:
            raise TypeError(f"unsupported {type(v)}")
        if kind == "str":
            h = xxh64_bytes(x.encode("utf-8"), h)
        elif kind == "long":
            h = xxh64_long(x, h)
        elif kind == "int":
            h = xxh64_int(x, h)
        else:
            raise ValueError(kind)
    return h


# --- Murmur3_x86_32 (Spark's `hash(...)` / HashPartitioning) ---------------

def _rotl32(x: int, r: int) -> int:
    x &= M32
    return ((x << r) | (x >> (32 - r))) & M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & M32


def _fmix32(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def murmur3_long(value: int, seed: int = 42) -> int:
    """Spark Murmur3 of a BIGINT (signed-32 result): low word then
    high word."""
    value &= M64
    low = value & M32
    high = (value >> 32) & M32
    h1 = _mix_h1(seed & M32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix32(h1, 8)


def pmod(h: int, n: int) -> int:
    """Spark's non-negative modulus used by HashPartitioning."""
    return ((h % n) + n) % n


# Pinned against a live Spark 4.1 session (see tools/ dev notes):
_SELF_TEST = [
    (spark_xxhash64("hello"), -4367754540140381902),
    (spark_xxhash64(""), -7444071767201028348),
    (spark_xxhash64("hello", ("int", 3)), 6882140868942789604),
    (spark_xxhash64(1234567890123456789), 4607975466983688430),
    (spark_xxhash64(7, 9), 341664222189075354),
    (spark_xxhash64("中文测试"), 3604064960379920888),
    (murmur3_long(1234567890123456789), -2017768400),
]
for got, want in _SELF_TEST:
    assert got == want, (got, want)
