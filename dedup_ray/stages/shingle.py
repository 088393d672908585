"""Tokenization and k-shingle hashing (vectorized).

Replaces the reference's token-explode (``wordlist.py:23-32``, SURVEY.md M4)
as the unit fed to MinHash.  Two semantics are preserved exactly:

- the **null sentinel**: a document with no tokens contributes a single
  sentinel shingle derived from its own id, so it "does not intersect with
  any other" (``wordlist.py:24-27``);
- determinism: token hashes are keyed BLAKE2b; shingle hashes are a fixed
  wraparound-uint64 polynomial over the token hashes, so signatures are
  identical across runs, batch layouts and cluster sizes.

The per-batch hot path hashes only the *unique* tokens of the batch
(python loop over the vocabulary), then combines token-hash arrays into
shingle hashes fully vectorized in numpy.
"""

from __future__ import annotations

import numpy as np

from dedup_ray.util.hashing import _GOLDEN, mix64, stable64, stable64_array


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization (split on runs of whitespace, drop empties)."""
    return text.split()


def shingle_hash_batch(
    texts: list[str | None],
    doc_ids: list,
    k: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Hash the k-shingles of each text.

    Returns ``(values, offsets)``: ``values`` is the concatenated uint64
    shingle hashes of all docs; ``offsets[i]:offsets[i+1]`` slices doc i
    (len(offsets) == len(texts)+1).  Docs shorter than k tokens get one
    shingle over all their tokens; empty docs get the id-derived sentinel.
    """
    tok_lists: list[list[str]] = []
    vocab: dict[str, int] = {}
    for t in texts:
        toks = tokenize(t) if t else []
        tok_lists.append(toks)
        for w in toks:
            if w not in vocab:
                vocab[w] = len(vocab)

    tok_hash = (
        stable64_array(list(vocab.keys()), seed=seed)
        if vocab
        else np.empty(0, dtype=np.uint64)
    )

    values_parts: list[np.ndarray] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    with np.errstate(over="ignore"):
        for i, toks in enumerate(tok_lists):
            if not toks:
                sh = np.array(
                    [stable64(f"\x00sentinel:{doc_ids[i]}", seed=seed)],
                    dtype=np.uint64,
                )
            else:
                h = tok_hash[np.fromiter((vocab[w] for w in toks), dtype=np.int64)]
                kk = min(k, len(h))
                # rolling polynomial over windows of kk token hashes
                acc = np.zeros(len(h) - kk + 1, dtype=np.uint64)
                for j in range(kk):
                    acc = mix64(acc * _GOLDEN + h[j : len(h) - kk + 1 + j])
                sh = acc
            values_parts.append(sh)
            offsets[i + 1] = offsets[i] + len(sh)
    values = (
        np.concatenate(values_parts) if values_parts else np.empty(0, dtype=np.uint64)
    )
    return values, offsets
