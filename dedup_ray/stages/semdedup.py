"""SemDeDup-style semantic pruning over an embedding column.

Public method (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): cluster
normalized embeddings into coarse k-means cells, then within each cell
prune *semantic duplicates* — members of a ``cos >= tau`` threshold-graph
component — keeping ONE member per component.  The keeper is the member
with the LOWEST cosine to its cell centroid (the paper's "keep examples
with low similarity to the centroid" policy: of a redundant group, retain
the most atypical example); ties break to the smaller id so the decision
is deterministic at any parallelism.

Relation to the rest of the engine (reference parity): this is the
embedding analog of the exact/MinHash keep-one-per-component policies
(``venue_bag.py:11-15`` A4 exact-key collect, G6 CC clustering) with a
learned-representation similarity instead of token overlap — the operator
a training-data pipeline runs between near-dup removal and mixing.

Scale shape:
- centroid training is driver-side numpy on a ``limit(train_sample)``
  sample only (the IVF recipe, shared with ``stages/ann.py``);
- centroids broadcast once via ``ray.put``; cell assignment is one
  vectorized ``map_batches`` pass;
- ONE hash exchange on ``cell`` moves each (id, vector) row once —
  vectors never fan out quadratically;
- per-cell work is the tiled gram kernel (peak memory O(tile · m), not
  O(m²)) + a union-find over the rare above-threshold pairs.  Cells are
  disjoint, so components never span cells and NO global CC round is
  needed.  Skew note: expected cell size is n/n_cells under spherical
  k-means; a pathologically hot cell degrades to quadratic *work* (memory
  stays tiled) — size ``n_cells`` ∝ corpus so cells stay ~10⁴-row bounded,
  the same knob the paper tunes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.stages.ann import train_ivf_centroids, _batch_embeddings, _normalize
from dedup_ray.stages.cc import _UnionFind
from dedup_ray.stages.embed import _tiled_cosine_pairs
from dedup_ray.util.dsutil import as_arrow
from dedup_ray.util.exchange import exchange_group_apply


def _prune_cell(
    ids: np.ndarray, cents_cos: np.ndarray, V: np.ndarray, tau: float
) -> np.ndarray:
    """→ keep mask for one cell: one keeper per cos>=tau component.

    ``ids`` must be sorted ascending (the tiled kernel's pair contract).
    Keeper = argmin (round(cent_cos, 6), id) over the component.
    """
    i1, i2, _ = _tiled_cosine_pairs(ids, V, tau)
    keep = np.ones(len(ids), dtype=bool)
    if not len(i1):
        return keep
    uf = _UnionFind()
    for a, b in zip(i1.tolist(), i2.tolist()):
        uf.union(a, b)
    pos = {v: i for i, v in enumerate(ids.tolist())}
    best: dict = {}  # root -> (cent_cos, id)
    cc6 = np.round(cents_cos, 6)
    for v, i in pos.items():
        if v in uf.parent:
            root = uf.find(v)
            cand = (cc6[i], v)
            if root not in best or cand < best[root]:
                best[root] = cand
    keepers = {v for _, v in best.values()}
    for v, i in pos.items():
        if v in uf.parent and v not in keepers:
            keep[i] = False
    return keep


def semdedup(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    tau: float = 0.95,
    train_sample: int = 10_000,
    seed: int = 42,
    num_partitions: int = 32,
):
    """→ Dataset(id, cell, cent_cos, keep) — the full pruning decision table.

    Downstream: ``filter(keep)`` for the pruned corpus, or join ``keep``
    back onto the document table by id.
    """
    import ray

    sample_df = emb_ds.limit(train_sample).to_pandas()
    if vec_col not in sample_df.columns or not len(sample_df):
        # entirely-empty corpus: nothing to train on, nothing to prune
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "cent_cos": pa.array([], pa.float64()),
                    "keep": pa.array([], pa.bool_()),
                }
            )
        )
    sample = _batch_embeddings(
        pa.Table.from_pandas(sample_df[[vec_col]]), vec_col
    )
    cents = train_ivf_centroids(sample, n_cells, seed=seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(cents_ref)
        V = _normalize(_batch_embeddings(batch, vec_col))
        sims = V @ cm.T
        cell = sims.argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                "id": batch[id_col],
                "cell": pa.array(cell),
                "cent_cos": pa.array(np.round(sims.max(axis=1), 6)),
                vec_col: batch[vec_col],
            }
        )

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow")

    def per_cell(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "cell": pa.array([], type=pa.int64()),
                    "cent_cos": pa.array([], type=pa.float64()),
                    "keep": pa.array([], type=pa.bool_()),
                }
            )
        df = part.to_pandas()
        outs = []
        for cell, g in df.groupby("cell"):
            g = g.sort_values("id")
            ids = g["id"].to_numpy()
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in g[vec_col]]
            )
            keep = _prune_cell(ids, g["cent_cos"].to_numpy(), V, tau)
            outs.append(
                pd.DataFrame(
                    {
                        "id": ids,
                        "cell": np.int64(cell),
                        "cent_cos": g["cent_cos"].to_numpy(),
                        "keep": keep,
                    }
                )
            )
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True), preserve_index=False
        )

    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("cell", pa.int64()),
            ("cent_cos", pa.float64()),
            (vec_col, pa.list_(pa.float32())),
        ]
    )
    return as_arrow(
        exchange_group_apply(
            assigned,
            "cell",
            per_cell,
            num_partitions=num_partitions,
            empty_schema=schema,
        )
    )
