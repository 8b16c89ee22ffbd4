"""Vectorized numpy bloom filter — the seen-set prefilter kernel.

Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` as public SQL
functions (they are internal to runtime-filter injection), so the engine
carries its own Arrow/numpy-vectorized bloom. Keys are the engine's canonical
64-bit URL hashes (``xxhash64(url)``); k probe positions are derived by double
hashing from the two 32-bit halves, so no further hashing is needed at build
or probe time.

Semantics: "definitely not present" is exact; "maybe present" has false-
positive rate ~(1-e^{-kn/m})^k. The seen-set uses this as a prefilter only —
candidates flagged "maybe" still go through an exact left-anti join
(``scrape_spark.operators.seen``), so dedup is exact end-to-end while the
expensive join touches only (duplicates + ε) rows. Replaces the reference's
per-row ``SELECT 1 FROM scraped_pages WHERE url=%s`` probe (models.py:207-216).
"""

from __future__ import annotations

import numpy as np

DEFAULT_BITS_PER_KEY = 16
DEFAULT_NUM_HASHES = 7  # optimal k ≈ bits_per_key * ln2 ≈ 11; 7 is cheaper and <1e-4 FP


def sizeof_bits(n_keys: int, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> int:
    """Bloom size in bits, byte-aligned, with a small floor."""
    bits = max(1024, int(n_keys) * bits_per_key)
    return (bits + 7) // 8 * 8


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(hashes), k) probe positions via double hashing g_i = h1 + i*h2."""
    h = hashes.astype(np.int64).view(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # force odd so strides cover the table
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def build(hashes: np.ndarray, m_bits: int, k: int = DEFAULT_NUM_HASHES) -> bytes:
    """Build a bloom filter over int64 hash keys; returns the bit array bytes."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _positions(np.asarray(hashes), m_bits, k).reshape(-1)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits.tobytes()


def might_contain(
    bloom: bytes, hashes: np.ndarray, k: int = DEFAULT_NUM_HASHES
) -> np.ndarray:
    """Vectorized membership probe → bool array (True = maybe present)."""
    hashes = np.asarray(hashes)
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(bloom, dtype=np.uint8)
    m_bits = len(bits) * 8
    pos = _positions(hashes, m_bits, k)
    probe = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probe.all(axis=1)


def merge(blooms: list[bytes]) -> bytes:
    """OR together equally-sized blooms (union of key sets)."""
    out = np.frombuffer(blooms[0], dtype=np.uint8).copy()
    for b in blooms[1:]:
        arr = np.frombuffer(b, dtype=np.uint8)
        if len(arr) != len(out):
            raise ValueError("bloom size mismatch")
        out |= arr
    return out.tobytes()
