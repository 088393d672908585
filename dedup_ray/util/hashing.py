"""Deterministic hashing primitives.

Everything downstream (MinHash permutations, band keys, SimHash bit draws,
shingle hashes, content digests) must be reproducible across processes,
cluster sizes and runs — Python's salted ``hash()`` is never used.  All
64-bit hashes are keyed BLAKE2b (stdlib, C-speed) or derived from them by
fixed-wraparound uint64 arithmetic.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Odd multiplicative constants for wraparound-mod-2^64 mixing (the classic
# splitmix64 / Murmur finalizer constants — public domain).
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def stable64(data: bytes | str, seed: int = 0) -> int:
    """Deterministic 64-bit hash of a token/string (keyed BLAKE2b)."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    h = hashlib.blake2b(data, digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def stable64_array(items: list[bytes | str], seed: int = 0) -> np.ndarray:
    """Vectorized-ish stable64 over a python list → uint64 array."""
    key = seed.to_bytes(8, "little")
    out = np.empty(len(items), dtype=np.uint64)
    blake2b = hashlib.blake2b
    for i, it in enumerate(items):
        if isinstance(it, str):
            it = it.encode("utf-8", "surrogatepass")
        out[i] = int.from_bytes(blake2b(it, digest_size=8, key=key).digest(), "little")
    return out


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (wraparound arithmetic)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
    return x


def combine_rows(mat: np.ndarray, salt: int = 0) -> np.ndarray:
    """Hash each row of a 2-D uint64 array to one uint64 (order-sensitive).

    Used for LSH band keys: ``mat`` is (n_docs, rows_per_band) of signature
    values; returns (n_docs,) bucket hashes.
    """
    with np.errstate(over="ignore"):
        acc = np.full(mat.shape[0], np.uint64(salt) * _GOLDEN + _MIX2, dtype=np.uint64)
        for j in range(mat.shape[1]):
            acc = mix64(acc + _GOLDEN + mat[:, j])
    return acc


def content_digest(texts, algo: str = "md5") -> list[str]:
    """Hex content digest per text, for exact dedup.

    md5 is the default because the DuckDB oracle can reproduce it
    (``md5(text)``); sha256 available for the scale path.
    """
    fn = hashlib.md5 if algo == "md5" else hashlib.sha256
    out = []
    for t in texts:
        if t is None:
            t = ""
        if isinstance(t, str):
            t = t.encode("utf-8", "surrogatepass")
        out.append(fn(t).hexdigest())
    return out
