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
    texts: list, dim: int, seed: int
) -> np.ndarray:
    """(n_docs, dim) float64: L2-normalized sqrt-count hashed token features."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    toks_per_doc = [(t or "").lower().split() for t in texts]
    all_toks = [tok for toks in toks_per_doc for tok in toks]
    if all_toks:
        h = stable64_array(all_toks, seed=seed)
        buckets = (h % np.uint64(dim)).astype(np.int64)
        # signed hashing (Weinberger et al. '09): a second hash bit gives
        # each token ±1, so E[dot] = 0 for disjoint token sets — without
        # the sign, small dims saturate and unrelated docs read similar
        signs = (((h >> np.uint64(32)) & np.uint64(1)).astype(np.float64) * 2.0) - 1.0
        doc_idx = np.repeat(
            np.arange(len(texts)), [len(t) for t in toks_per_doc]
        )
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
):
    """documents → Dataset(id[, keep_cols…], embedding list<double>).

    Stateless vectorized map; ``keep_cols`` ride along so downstream
    blocking needs no join (Acero rejects list-typed join payloads anyway).
    """

    def f(batch: pa.Table) -> pa.Table:
        vecs = hashed_embedding_batch(batch[text_col].to_pylist(), dim, seed)
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

    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V = V / norms
        sims = np.round(V @ V.T, 6)
        i1, i2 = np.triu_indices(len(ids), 1)
        keep = sims[i1, i2] >= threshold
        return pd.DataFrame(
            {
                block_col: group[block_col].iloc[0],
                "id1": ids[i1[keep]],
                "id2": ids[i2[keep]],
                "cos_sim": sims[i1[keep], i2[keep]],
            }
        )

    return as_arrow(
        emb_ds.groupby(block_col).map_groups(per_block, batch_format="pandas")
    )
