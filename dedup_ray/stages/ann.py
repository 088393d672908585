"""Similarity search over an embedding column (``list<float>``).

Two paths:

- :func:`knn_cosine` — exact brute-force top-k: the query matrix is
  broadcast once (``ray.put``), every batch computes a vectorized matmul
  against it and emits its batch-local top-k per query, and a final
  ``groupby(query_id)`` reduces to the global top-k.  Per-batch partial
  top-k bounds the shuffle to O(n_queries · k · n_blocks) rows.
- :func:`knn_cosine_lsh` — scale path 1: random-hyperplane signatures
  bucket both sides; each query searches only its bucket (and optionally
  neighboring multiprobe buckets).  Approximate, deterministic, documented.
- :func:`knn_cosine_ivf` — scale path 2: coarse k-means centroids trained
  on a bounded sample, vectors assigned per batch, queries probe their
  ``nprobe`` nearest lists.  Recall/cost dial = ``nprobe / n_lists``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.util.dsutil import as_arrow


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_embeddings(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_pylist(), dtype=np.float64)


def knn_cosine(
    embeddings_ds,
    query_ids: list,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact top-k cosine neighbors for each query vector.

    Returns Dataset(query_id, neighbor_id, cos_sim) with cos_sim rounded to
    6dp; global order resolved by (cos_sim desc, neighbor_id asc) so results
    are deterministic under ties.
    """
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    ref = ray.put((list(query_ids), q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(ref)
        emb = _normalize(_batch_embeddings(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist())
        sims = qm @ emb.T  # (n_queries, batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else (
                np.arange(len(row))
            )
            for j in top:
                if exclude_self and ids[j] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_s.append(round(float(row[j]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True]
        ).head(k)

    return as_arrow(
        partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    )


def train_ivf_centroids(
    sample: np.ndarray, n_lists: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample → IVF centroids.

    Seeded init (random rows), fixed iteration count, cosine assignment on
    normalized vectors.  Training is driver-side numpy on the SAMPLE only —
    the standard IVF recipe (train small, assign streamed).
    """
    X = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(X)
    rng = np.random.default_rng(seed ^ 0x1BF)
    cents = X[rng.choice(n, size=min(n_lists, n), replace=False)].copy()
    for _ in range(iters):
        assign = (X @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def knn_cosine_ivf(
    embeddings_ds,
    query_ids: list,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    nprobe: int = 4,
    train_sample: int = 10_000,
    seed: int = 42,
):
    """IVF approximate top-k — the clustered scale path next to the
    hyperplane-LSH one.

    1. train coarse centroids on a ``limit(train_sample)`` sample (bounded
       driver collect, the only materialization);
    2. broadcast (queries, centroids, per-query probe lists) once;
    3. each batch assigns its vectors to nearest centroid and scores only
       the vectors landing in a probed list — per-batch cost shrinks
       ~``nprobe / n_lists`` vs brute force;
    4. per-batch partial top-k → ``groupby(query_id)`` global top-k, same
       bounded shuffle as :func:`knn_cosine`.
    """
    import ray

    sample = _batch_embeddings(
        pa.Table.from_pandas(
            embeddings_ds.limit(train_sample).to_pandas()[[vec_col]]
        ),
        vec_col,
    )
    cents = train_ivf_centroids(sample, n_lists, seed=seed)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, : min(nprobe, len(cents))]
    ref = ray.put((list(query_ids), q, cents, probes))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, cm, pr = ray.get(ref)
        emb = _normalize(_batch_embeddings(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist())
        assign = (emb @ cm.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            row = qm[qi] @ emb[mask].T
            sub_ids = ids[mask]
            kk = min(k + 1, len(row))
            top = (
                np.argpartition(-row, kk - 1)[:kk]
                if kk < len(row)
                else np.arange(len(row))
            )
            for j in top:
                if sub_ids[j] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(sub_ids[j])
                out_s.append(round(float(row[j]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True]
        ).head(k)

    return as_arrow(
        partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    )


def hyperplane_signatures(mat: np.ndarray, n_planes: int, dim: int, seed: int
                          ) -> np.ndarray:
    rng = np.random.default_rng(seed ^ 0xA11)
    planes = rng.standard_normal((n_planes, dim))
    bits = (mat @ planes.T) > 0
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    return (bits * weights).sum(axis=1).astype(np.int64)


def knn_cosine_lsh(
    embeddings_ds,
    query_ids: list,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 16,
    probe_radius: int = 1,
    seed: int = 42,
):
    """Approximate top-k: multi-table, multiprobe random-hyperplane LSH.

    ``n_tables`` independent hash tables of ``n_planes`` sign bits each; a
    vector is a candidate for a query if, in ANY table, its signature lies
    within hamming distance ``probe_radius`` of the query's (vectorized:
    clear the ``radius`` lowest set bits of ``sig XOR qsig`` and test zero —
    no bucket enumeration).  Recall/cost dial = (n_planes ↓, n_tables ↑,
    radius ↑); candidate fraction ≈ n_tables · P(hamming ≤ r | cos 0), so at
    the defaults ~16% of the corpus is scored instead of 100%.  On
    isotropic (structureless) embeddings no LSH separates neighbors well —
    that regime's measured recall is pinned by the sf0.01 oracle."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qsigs = np.stack(
        [
            hyperplane_signatures(q, n_planes, q.shape[1], seed ^ (t * 0x9E37))
            for t in range(n_tables)
        ]
    )  # (n_tables, n_queries)
    ref = ray.put((list(query_ids), q, qsigs))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, qs = ray.get(ref)
        emb_raw = _batch_embeddings(batch, vec_col)
        emb = _normalize(emb_raw)
        sigs = np.stack(
            [
                hyperplane_signatures(
                    emb, n_planes, emb.shape[1], seed ^ (t * 0x9E37)
                )
                for t in range(n_tables)
            ]
        )  # (n_tables, n_batch)
        ids = np.asarray(batch[id_col].to_pylist())
        out_q, out_n, out_s = [], [], []
        for qi in range(qm.shape[0]):
            x = sigs ^ qs[:, qi : qi + 1]  # (n_tables, n_batch)
            for _ in range(probe_radius):  # clear r lowest set bits:
                x &= x - 1  # zero ⇔ hamming ≤ r
            mask = (x == 0).any(axis=0)
            if not mask.any():
                continue
            row = qm[qi] @ emb[mask].T
            sub_ids = ids[mask]
            kk = min(k + 1, len(row))
            top = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else (
                np.arange(len(row))
            )
            for j in top:
                if sub_ids[j] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(sub_ids[j])
                out_s.append(round(float(row[j]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True]
        ).head(k)

    return as_arrow(
        partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    )


def train_pq_codebooks(sample: np.ndarray, n_sub: int, n_cent: int,
                       seed: int = 42) -> np.ndarray:
    """Per-subspace k-means codebooks: ``(n_sub, n_cent, dim/n_sub)``.
    Each subspace trains independently with the same seeded Lloyd loop
    the IVF path uses (bounded sample, deterministic)."""
    dim = sample.shape[1]
    dsub = dim // n_sub
    books = np.empty((n_sub, n_cent, dsub), np.float64)
    for s in range(n_sub):
        books[s] = train_ivf_centroids(
            np.ascontiguousarray(sample[:, s * dsub:(s + 1) * dsub]),
            n_cent, seed=seed + s)
    return books


def knn_cosine_pq(
    embeddings_ds,
    query_ids: list,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
    n_cent: int = 16,
    rerank: int = 4,
    train_sample: int = 10_000,
    seed: int = 42,
):
    """Product-quantization ANN with in-batch exact re-rank — the
    compressed-memory scale path next to LSH and IVF: codes are
    ``n_sub`` bytes/vector (64x smaller than a float64 row), so a
    10^12-vector index fits where raw vectors cannot.

    1. train per-subspace codebooks on a bounded seeded sample;
    2. broadcast (queries, codebooks, per-query ADC lookup tables
       ``T[q, s, c] = q_s · codebook[s, c]`` — precomputed ONCE, so the
       batch scan is a pure table gather);
    3. per batch: encode vectors (nearest centroid per subspace),
       ADC-score every query against the codes, keep the top
       ``rerank·k`` candidates and re-score them EXACTLY against the
       raw in-batch vectors — emitted scores are true cosines, PQ only
       decides who gets scored;
    4. same bounded per-query top-k shuffle as :func:`knn_cosine`.
    """
    import ray

    sample = _batch_embeddings(
        pa.Table.from_pandas(
            embeddings_ds.limit(train_sample).to_pandas()[[vec_col]]
        ),
        vec_col,
    )
    books = train_pq_codebooks(_normalize(sample), n_sub, n_cent, seed)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dsub = q.shape[1] // n_sub
    # ADC tables: T[qi, s, c]
    T = np.einsum("qsd,scd->qsc",
                  q.reshape(len(q), n_sub, dsub), books)
    ref = ray.put((list(query_ids), q, books, T))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, bks, tab = ray.get(ref)
        emb = _normalize(_batch_embeddings(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist())
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        sub = emb.reshape(n, n_sub, dsub)
        # encode: nearest centroid per subspace (L2 == max dot - half norm)
        codes = np.empty((n, n_sub), np.int32)
        for s in range(n_sub):
            d = sub[:, s, :] @ bks[s].T  # (n, n_cent)
            d -= 0.5 * (bks[s] ** 2).sum(axis=1)
            codes[:, s] = d.argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        m = min(rerank * k + 1, n)
        for qi in range(qm.shape[0]):
            adc = tab[qi][np.arange(n_sub), codes].sum(axis=1)
            cand = (np.argpartition(-adc, m - 1)[:m]
                    if m < n else np.arange(n))
            row = qm[qi] @ emb[cand].T  # exact re-rank
            for j in range(len(cand)):
                if ids[cand[j]] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(ids[cand[j]])
                out_s.append(round(float(row[j]), 6))
        return pa.table({
            "query_id": pa.array(out_q),
            "neighbor_id": pa.array(out_n),
            "cos_sim": pa.array(out_s, pa.float64()),
        })

    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True]
        ).head(k)

    return as_arrow(
        partials.groupby("query_id").map_groups(final_topk,
                                                batch_format="pandas")
    )


def scalar_quantize_codes(ds, id_col: str = "vec_id",
                          vec_col: str = "embedding"):
    """SQ8 scalar quantization — the third compressed-memory path next to
    PQ codes and LSH signatures (the FAISS ``SQ8`` recipe): per dimension
    an affine map of the corpus range onto 0..255, one byte per
    coordinate (8× float32 / 4× smaller than PQ-free float64 pipelines),
    with distance error bounded by half a quantization step per dim.

    Two passes, zero shuffles at any corpus size:

    1. per-dim global min/max — per-batch (d-long min, max) partials
       reduce on the driver (driver state = 2·d floats, never rows);
    2. codes — the (min, max) vectors broadcast via ``ray.put``; each
       batch maps ``code = floor((x − mn)·255/(mx − mn) + 0.5)``
       (``floor(z+0.5)`` rather than banker's rounding so the SQL twin is
       bit-identical), constant dims code to 0.

    Output is long-form ``(id_col, dim, code)`` with 1-based ``dim`` —
    directly comparable against the SQL replay; the production layout
    packs the same codes to a ``binary`` column (one ``tobytes()`` per
    row on this output).
    """
    import ray

    def mm_partial(t: pa.Table) -> pa.Table:
        x = _batch_embeddings(t, vec_col)
        if x.size == 0:
            return pa.table({"mn": pa.array([], pa.list_(pa.float64())),
                             "mx": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "mn": pa.array([x.min(axis=0).tolist()],
                           pa.list_(pa.float64())),
            "mx": pa.array([x.max(axis=0).tolist()],
                           pa.list_(pa.float64())),
        })

    parts = ds.map_batches(mm_partial, batch_format="pyarrow").take_all()
    mn = np.min(np.stack([np.asarray(p["mn"]) for p in parts]), axis=0)
    mx = np.max(np.stack([np.asarray(p["mx"]) for p in parts]), axis=0)
    ref = ray.put((mn, mx))

    def codes(t: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        x = _batch_embeddings(t, vec_col)
        n, d = (x.shape[0], len(lo)) if x.size else (0, len(lo))
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64())})
        span = hi - lo
        safe = np.where(span == 0, 1.0, span)
        z = np.floor((x - lo) * 255.0 / safe + 0.5)
        z = np.where(span == 0, 0.0, z).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1), n), pa.int64()),
            "code": pa.array(z.reshape(-1), pa.int64()),
        })

    return ds.map_batches(codes, batch_format="pyarrow")


def hard_negatives(
    embeddings_ds,
    anchor_ids: list,
    anchor_vecs: np.ndarray,
    anchor_labels: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
):
    """Hard-negative mining for contrastive training: for each anchor,
    the single most-cosine-similar corpus vector carrying a DIFFERENT
    label (the "hardest" negative — highest-similarity wrong-class
    example; the standard in-batch-negatives upgrade, cf. Xiong et al.
    2021 ANCE's corpus-level negatives).

    Same streaming champion shape as :func:`knn_cosine` — the bounded
    ANCHOR set broadcasts once (hard negatives are mined per training
    batch, never all-vs-all), the corpus streams through a per-batch
    vectorized masked-argmax partial, and the global winner is one
    bounded ``groupby(anchor)`` reduce.  Ties resolve by (cos_sim
    rounded 6dp DESC, neighbor id ASC), the catalog's deterministic
    ANN convention.

    Returns Dataset ``(id_col, neg_id, cos_sim)``.
    """
    import ray

    q = _normalize(np.asarray(anchor_vecs, dtype=np.float64))
    alab = np.asarray(anchor_labels)
    ref = ray.put((list(anchor_ids), alab, q))

    def partial(batch: pa.Table) -> pa.Table:
        aids, albl, qm = ray.get(ref)
        emb = _normalize(_batch_embeddings(batch, vec_col))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        lbl = np.asarray(batch[label_col].to_pylist())
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "neg_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        sims = np.round(qm @ emb.T, 6)           # (anchors, batch)
        mask = albl[:, None] != lbl[None, :]     # different label only
        sims = np.where(mask, sims, -np.inf)
        best = sims.max(axis=1)
        has = np.isfinite(best)
        # min neighbor id among the rounded-cosine champions
        nid = np.where(sims == best[:, None], ids[None, :],
                       np.iinfo(np.int64).max).min(axis=1)
        out_a = np.asarray(aids, dtype=np.int64)[has]
        return pa.table({id_col: pa.array(out_a, pa.int64()),
                         "neg_id": pa.array(nid[has], pa.int64()),
                         "cos_sim": pa.array(best[has], pa.float64())})

    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["cos_sim", "neg_id"], ascending=[False, True]).head(1)

    return as_arrow(
        partials.groupby(id_col).map_groups(final, batch_format="pandas")
    )
