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


def _tiled_cosine_pairs(
    ids: np.ndarray, V: np.ndarray, threshold: float, tile_rows: int = 1024
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (id1 < id2, cos) pairs with round(cos,6) >= threshold.

    Tiles the gram matrix: peak extra memory is O(tile_rows · n), not
    O(n²), and only the (rare) above-threshold entries are gathered — a
    15k-row block costs one ~2 GFLOP dgemm instead of a 1.8 GB
    triu_indices allocation.  ``ids`` must be sorted ascending so the
    positional upper triangle is the id-ordered pair set.
    """
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    V = V / norms
    n = len(ids)
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
    dt = ids.dtype if n else np.int64
    return (
        np.concatenate(out1) if out1 else np.array([], dtype=dt),
        np.concatenate(out2) if out2 else np.array([], dtype=dt),
        np.concatenate(outs) if outs else np.array([], dtype=np.float64),
    )


def cosine_dup_edges(
    emb_ds,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
):
    """Embedding-cosine near-dup edges within bounded blocks.

    Per block: one tiled normalized gram pass, emit pairs with
    ``round(cos, 6) >= threshold``.  For corpora with no bounded natural
    block use :func:`cosine_dup_edges_lsh` — the same kernel under
    multi-table hyperplane-LSH bucketing.
    """

    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        i1, i2, cs = _tiled_cosine_pairs(ids, V, threshold)
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


def cosine_dup_edges_lsh(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 10,
    n_tables: int = 16,
    seed: int = 42,
    num_partitions: int = 32,
):
    """Embedding-cosine near-dup edges with NO natural block — the
    unbounded-corpus scale path.

    Multi-table hyperplane-LSH replaces the block: each vector joins one
    bucket per table (``n_tables`` narrow replicas through ONE hash
    shuffle on (table, signature)), each bucket runs the same tiled gram
    kernel as :func:`cosine_dup_edges`, and a second narrow shuffle on
    (id1, id2) dedups pairs found by several tables (keeping one cos).
    Exact-bucket matching (no multiprobe): at the defaults a cos≥0.97
    near-dup pair collides in ≥1 of 16 tables w.p. ~0.9999; recall decays
    toward the threshold (cos 0.9 → ~0.98) — the standard LSH-dedup trade,
    asserted on planted pairs in tests.  Total shuffle volume is
    n_tables × the (id, vector) width — vectors never fan out
    quadratically, and no bucket needs more memory than its own gram tile.
    """
    from dedup_ray.stages.ann import hyperplane_signatures
    from dedup_ray.util.exchange import exchange_group_apply

    def explode_tables(batch: pa.Table) -> pa.Table:
        V = _batch_matrix(batch[vec_col])
        parts = []
        for t in range(n_tables):
            sig = hyperplane_signatures(
                V, n_planes, V.shape[1], seed ^ (t * 0x9E37)
            )
            parts.append(
                pa.table(
                    {
                        "__bucket": pa.array(
                            (np.int64(t) << np.int64(n_planes)) | sig
                        ),
                        id_col: batch[id_col],
                        vec_col: batch[vec_col],
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = emb_ds.map_batches(explode_tables, batch_format="pyarrow")

    def bucket_pairs(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        out1, out2, outs = [], [], []
        for _b, g in df.groupby("__bucket"):
            if len(g) < 2:
                continue
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            V = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
            i1, i2, cs = _tiled_cosine_pairs(ids, V, threshold)
            out1.append(i1)
            out2.append(i2)
            outs.append(cs)
        if not out1:
            return pa.table(
                {
                    "id1": pa.array([], pa.int64()),
                    "id2": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "id1": pa.array(np.concatenate(out1)),
                "id2": pa.array(np.concatenate(out2)),
                "cos_sim": pa.array(np.concatenate(outs), pa.float64()),
            }
        )

    pairs = exchange_group_apply(
        exploded, "__bucket", bucket_pairs, num_partitions=num_partitions
    )

    def dedup(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["id1", "id2"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return exchange_group_apply(
        pairs, ["id1", "id2"], dedup, num_partitions=num_partitions
    )


def _batch_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_pylist(), dtype=np.float64)


def jl_project(ds, id_col: str = "vec_id", vec_col: str = "embedding",
               out_dim: int = 8):
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims via a
    deterministic Rademacher sign matrix (Achlioptas 2003: ±1 entries
    preserve pairwise distances with the same JL guarantee as Gaussian
    draws, database-friendly because the matrix is {−1,+1}):
    ``y_j = Σ_i x_i · s_ij / √out_dim`` with
    ``s_ij = +1 iff the first hex digit of md5(i ':' j) is even``
    (1-based i, j) — no RNG state, every sign replayable in SQL, the
    same keyed-md5 determinism the samplers use.

    Shuffle-free: the sign matrix is built ONCE PER ACTOR from (d ×
    out_dim) md5 calls — never per batch, never per row — and each batch
    is one float64 matmul.  Long output ``(id, j, y)`` (j 1-based) so the
    oracle compares cell-for-cell via unnest.  float32 inputs are
    promoted to float64 before the matmul on both engines (exact), so
    the 6-dp round is the only comparison tolerance."""
    import hashlib

    class Project:
        def __init__(self):
            self.signs: np.ndarray | None = None  # built on first batch

        def _matrix(self, d: int) -> np.ndarray:
            if self.signs is None or self.signs.shape[0] != d:
                s = np.empty((d, out_dim), dtype=np.float64)
                for i in range(d):
                    for j in range(out_dim):
                        h = hashlib.md5(f"{i + 1}:{j + 1}".encode()).hexdigest()
                        s[i, j] = 1.0 if int(h[0], 16) % 2 == 0 else -1.0
                self.signs = s
            return self.signs

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            x = _batch_matrix(t[vec_col])
            y = (x @ self._matrix(x.shape[1])) / np.sqrt(float(out_dim))
            n = len(ids)
            return pa.table({
                id_col: ids.take(pa.array(np.repeat(np.arange(n), out_dim))),
                "j": pa.array(np.tile(np.arange(1, out_dim + 1), n),
                              pa.int64()),
                "y": pa.array(np.round(y, 6).ravel(), pa.float64()),
            })

    return ds.map_batches(Project, concurrency=4, batch_format="pyarrow")
