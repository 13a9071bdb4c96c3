"""Pure-Python Murmur3 x86_32 compatible with Spark's ``F.hash``.

Spark's HashPartitioning places a row in partition
``pmod(murmur3(cols, seed=42), P)`` (Murmur3Hash expression; for a
string column the hash is Murmur3_x86_32 over its UTF-8 bytes with the
running hash as seed, trailing bytes mixed one signed byte at a time —
org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes semantics,
public Apache Spark source). Re-implemented here so the pure-Python
oracle can reproduce the engine's deterministic doc_id assignment
(partition id, then natural-key order) without a JVM.

Equality with ``F.hash`` is asserted directly in tests/test_hashing.py.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _to_signed(x: int) -> int:
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_bytes(data: bytes, seed: int) -> int:
    """Murmur3_x86_32.hashUnsafeBytes: 4-byte little-endian blocks,
    then each trailing byte mixed individually as a SIGNED int."""
    h1 = seed & _MASK
    n_aligned = len(data) - len(data) % 4
    for i in range(0, n_aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(n_aligned, len(data)):
        b = data[i]
        half = b - 256 if b >= 128 else b  # signed byte
        h1 = _mix_h1(h1, _mix_k1(half & _MASK))
    return _to_signed(_fmix(h1, len(data)))


def hash_long(value: int, seed: int) -> int:
    """Murmur3_x86_32.hashLong: low word then high word."""
    h1 = seed & _MASK
    low = value & _MASK
    high = (value >> 32) & _MASK
    h1 = _mix_h1(h1, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _to_signed(_fmix(h1, 8))


def spark_hash(values, seed: int = 42) -> int:
    """Spark ``F.hash(*cols)``: fold columns, each column's hash seeds
    the next. Supports str/bytes/int (the key column types we use)."""
    h = seed
    for v in values:
        if isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        elif isinstance(v, bool):
            h = hash_long(int(v), h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        else:
            raise TypeError(f"unsupported key type {type(v)}")
    return h


def partition_id(values, num_partitions: int, seed: int = 42) -> int:
    """pmod(hash, P) — the HashPartitioning bucket of a row."""
    return spark_hash(values, seed) % num_partitions
