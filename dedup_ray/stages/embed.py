"""Text → embedding production + embedding-cosine near-dup edges.

The reference trains Doc2Vec to embed documents (``doc2vec.py:46-133``);
the north rule replaces the trainer, but a 100-TB pipeline still needs a
stage that PRODUCES an embedding column from text.  This module provides a
deterministic, training-free one — hashed token features (the standard
"feature hashing" / hashing-trick representation): token → one of ``dim``
buckets by seeded 64-bit hash, sqrt-scaled counts, L2 normalization.
Cosine over these vectors approximates token-multiset cosine — the right
cheap geometry for near-dup detection (and a drop-in input to the ANN and
classifier stages).

Scale shape: the embedder is a stateless vectorized ``map_batches`` (the
hash is computed per token batch — no vocabulary, no model artifact, no
shuffle); embedding-cosine dedup reuses the bounded-block pair machinery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.util.dsutil import as_arrow
from dedup_ray.util.hashing import stable64_array


def hashed_embedding_batch(
    texts: list, dim: int, seed: int, ngram: int = 1
) -> np.ndarray:
    """(n_docs, dim) float64: L2-normalized sqrt-count hashed features.

    ``ngram=1`` hashes single tokens — cosine then tracks token-multiset
    cosine, which for natural-language corpora is dominated by the shared
    common-word mass (unrelated documents sit at cosine ~0.7).  For
    NEAR-DUP GEOMETRY use ``ngram=3``: word-3-grams are near-unique per
    document (unrelated docs ~0.0) while a 3% token edit still preserves
    ~90% of them (near-dups ~0.9) — the same discrimination argument as the
    shingle unit fed to MinHash.  N-gram hashes are combined from the
    token-hash array with the same wraparound-uint64 polynomial as
    ``stages/shingle.py`` — no n-gram strings are materialized."""
    from dedup_ray.util.hashing import _GOLDEN, mix64

    out = np.zeros((len(texts), dim), dtype=np.float64)
    toks_per_doc = [(t or "").lower().split() for t in texts]
    all_toks = [tok for toks in toks_per_doc for tok in toks]
    if all_toks:
        h = stable64_array(all_toks, seed=seed)
        if ngram > 1:
            # per-doc windows of `ngram` token hashes → one hash each,
            # vectorized across the whole batch: a window is invalid iff it
            # crosses a doc boundary (docs shorter than `ngram` keep one
            # window over all their tokens, like shingle_hash_batch)
            lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
            ends = np.cumsum(lens)
            starts = ends - lens
            with np.errstate(over="ignore"):
                acc = np.zeros(max(len(h) - ngram + 1, 0), dtype=np.uint64)
                for j in range(ngram):
                    acc = mix64(acc * _GOLDEN + h[j : len(h) - ngram + 1 + j])
            parts = []
            doc_lens = []
            with np.errstate(over="ignore"):
                for s, e in zip(starts, ends):
                    n = e - s
                    if n == 0:
                        doc_lens.append(0)
                    elif n < ngram:
                        # short doc: ONE window over its own tokens only —
                        # never a full-width window crossing the doc
                        # boundary (that would make the hash depend on the
                        # batch layout)
                        a = np.zeros(1, dtype=np.uint64)
                        for j in range(n):
                            a = mix64(a * _GOLDEN + h[s + j : s + j + 1])
                        parts.append(a)
                        doc_lens.append(1)
                    else:
                        parts.append(acc[s : e - ngram + 1])
                        doc_lens.append(n - ngram + 1)
            h = (
                np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
            )
        else:
            doc_lens = [len(t) for t in toks_per_doc]
        buckets = (h % np.uint64(dim)).astype(np.int64)
        # signed hashing (Weinberger et al. '09): a second hash bit gives
        # each token ±1, so E[dot] = 0 for disjoint token sets — without
        # the sign, small dims saturate and unrelated docs read similar
        signs = (((h >> np.uint64(32)) & np.uint64(1)).astype(np.float64) * 2.0) - 1.0
        doc_idx = np.repeat(np.arange(len(texts)), doc_lens)
        np.add.at(out, (doc_idx, buckets), signs)
    out = np.sign(out) * np.sqrt(np.abs(out))
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    out /= norms
    return out


def embed_docs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    seed: int = 42,
    batch_size: int = 1024,
    keep_cols: tuple = (),
    ngram: int = 1,
):
    """documents → Dataset(id[, keep_cols…], embedding list<double>).

    Stateless vectorized map; ``keep_cols`` ride along so downstream
    blocking needs no join (Acero rejects list-typed join payloads anyway).
    """

    def f(batch: pa.Table) -> pa.Table:
        vecs = hashed_embedding_batch(
            batch[text_col].to_pylist(), dim, seed, ngram=ngram
        )
        cols = {id_col: batch[id_col]}
        for c in keep_cols:
            cols[c] = batch[c]
        cols["embedding"] = pa.array(list(vecs))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def cosine_dup_edges(
    emb_ds,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
):
    """Embedding-cosine near-dup edges within bounded blocks.

    Per block: one normalized gram matrix, emit pairs with
    ``round(cos, 6) >= threshold``.  For unbounded corpora compose with the
    LSH/IVF bucketing from ``stages/ann.py`` instead of a natural block —
    same per-bucket kernel.
    """

    def per_block(group: pd.DataFrame, tile_rows: int = 1024) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V = V / norms
        n = len(ids)
        # Tile the gram matrix: peak extra memory is O(tile_rows · n), not
        # O(n²), and only the (rare) above-threshold entries are gathered —
        # a 15k-row block costs one ~2 GFLOP dgemm instead of a 1.8 GB
        # triu_indices allocation.
        out1, out2, outs = [], [], []
        for lo in range(0, n, tile_rows):
            hi = min(lo + tile_rows, n)
            sims = np.round(V[lo:hi] @ V.T, 6)  # (tile, n)
            keep = sims >= threshold
            # upper triangle only: column index must exceed global row index
            keep &= np.arange(n)[None, :] > np.arange(lo, hi)[:, None]
            r, c = np.nonzero(keep)
            out1.append(ids[r + lo])
            out2.append(ids[c])
            outs.append(sims[r, c])
        i1 = np.concatenate(out1) if out1 else np.array([], dtype=ids.dtype)
        i2 = np.concatenate(out2) if out2 else np.array([], dtype=ids.dtype)
        cs = np.concatenate(outs) if outs else np.array([], dtype=np.float64)
        return pd.DataFrame(
            {
                block_col: group[block_col].iloc[0],
                "id1": i1,
                "id2": i2,
                "cos_sim": cs,
            }
        )

    return as_arrow(
        emb_ds.groupby(block_col).map_groups(per_block, batch_format="pandas")
    )
