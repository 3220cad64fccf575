"""MurmurHash3 x64_128 (Austin Appleby's public-domain algorithm) for
the fingerprint processor's ``MurmurHash3`` method.

ES ingest-common FingerprintProcessor hashes the canonical bytes with
MurmurHash3.hash128 (seed 0) and emits h1 || h2, each little-endian
(16 bytes, then base64).  Spark ships only the 32-bit murmur (F.hash)
JVM-side, so this method runs as an Arrow-batched pandas UDF over the
already-concatenated canonical binary column — the serialization stays
JVM-side; only the final digest crosses to Python, and only for
pipelines that opt into this method.  Cross-checked in tests against
Spark's shaded Guava Hashing.murmur3_128(0) (same algorithm, same byte
order)."""

from __future__ import annotations

_MASK = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> bytes:
    """16 bytes: h1 little-endian || h2 little-endian (the ES layout)."""
    h1 = h2 = seed
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o:o + 8], "little")
        k2 = int.from_bytes(data[o + 8:o + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16:]
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")


def murmur3_udf():
    """pandas_udf binary -> binary (16-byte digest per row)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def mm3(s):
        return s.map(lambda b: None if b is None else murmur3_x64_128(bytes(b)))

    return mm3
