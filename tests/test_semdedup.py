"""SemDeDup semantic pruning: planted redundancy, keeper policy, parity."""

import numpy as np
import pandas as pd
import ray.data as rd

from dedup_ray.stages.ann import train_ivf_centroids, _normalize
from dedup_ray.stages.semdedup import _prune_cell, semdedup


def _planted(seed: int = 5, n_groups: int = 6, copies: int = 4, dim: int = 16):
    """Groups of near-identical vectors (cos ~0.999) + lone singletons."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    truth = []  # group id per vector, -1 = singleton
    for g in range(n_groups):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(copies):
            v = base + rng.normal(scale=0.01, size=dim)
            rows.append((vid, v.astype(np.float32)))
            truth.append(g)
            vid += 1
    for _ in range(10):
        v = rng.normal(size=dim)
        rows.append((vid, v.astype(np.float32)))
        truth.append(-1)
        vid += 1
    df = pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
    )
    return df, np.array(truth)


def test_semdedup_planted_groups():
    df, truth = _planted()
    out = (
        semdedup(
            rd.from_pandas(df), n_cells=8, tau=0.95, num_partitions=4, seed=3
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(out) == len(df)
    kept = out[out["keep"]]["id"].to_numpy()
    # every planted redundant group collapses to exactly one keeper
    # (copies at cos ~0.999 share the argmax cell for any centroid set)
    for g in range(truth.max() + 1):
        members = np.flatnonzero(truth == g)
        assert np.isin(members, kept).sum() == 1
    # singletons are never pruned
    singles = np.flatnonzero(truth == -1)
    assert np.isin(singles, kept).all()


def test_semdedup_keeper_is_farthest_from_centroid():
    df, truth = _planted(seed=11)
    out = semdedup(
        rd.from_pandas(df), n_cells=4, tau=0.95, num_partitions=2, seed=3
    ).to_pandas()
    pruned_groups = out[~out["keep"]]
    assert len(pruned_groups)
    for g in range(truth.max() + 1):
        members = out[np.isin(out["id"], np.flatnonzero(truth == g))]
        if members["keep"].sum() == 1 and len(members) > 1:
            keeper = members[members["keep"]].iloc[0]
            # keeper minimizes (cent_cos, id) over its cell's group members
            cellmates = members[members["cell"] == keeper["cell"]]
            best = cellmates.sort_values(["cent_cos", "id"]).iloc[0]
            assert best["id"] == keeper["id"]


def test_semdedup_parity_with_local_reference():
    """Distributed result == straight-line numpy over the whole table."""
    df, _ = _planted(seed=23)
    n_cells, tau, seed = 8, 0.95, 3
    got = (
        semdedup(
            rd.from_pandas(df),
            n_cells=n_cells,
            tau=tau,
            num_partitions=5,
            seed=seed,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    V = _normalize(np.stack([np.asarray(v, np.float64) for v in df["embedding"]]))
    cents = train_ivf_centroids(V, n_cells, seed=seed)
    sims = V @ cents.T
    cell = sims.argmax(axis=1)
    cent_cos = np.round(sims.max(axis=1), 6)
    ids = df["vec_id"].to_numpy()
    keep = np.ones(len(ids), dtype=bool)
    for c in np.unique(cell):
        m = np.flatnonzero(cell == c)
        order = m[np.argsort(ids[m])]
        keep[order] = _prune_cell(ids[order], cent_cos[order], V[order], tau)
    want = (
        pd.DataFrame(
            {"id": ids, "cell": cell.astype("int64"),
             "cent_cos": cent_cos, "keep": keep}
        )
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_semdedup_partition_invariance():
    df, _ = _planted(seed=31)
    a = (
        semdedup(rd.from_pandas(df), n_cells=8, tau=0.95, num_partitions=2)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    b = (
        semdedup(rd.from_pandas(df), n_cells=8, tau=0.95, num_partitions=13)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_semdedup_empty_corpus():
    import pyarrow as pa

    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    out = semdedup(empty, n_cells=4)
    # Ray's to_pandas drops columns at 0 rows; the Dataset schema is the
    # contract that survives unions/joins downstream (verify.empty_edges).
    assert out.schema().names == ["id", "cell", "cent_cos", "keep"]
    assert out.count() == 0


def test_semdedup_hot_cell_extreme_skew():
    """Pathological skew: hundreds of near-identical vectors.  k-means over
    an all-alike blob yields near-identical centroids that fragment it
    across cells arbitrarily, and pruning is CELL-LOCAL by design (the
    paper's trade: redundancy spanning cells is not pruned) — so the
    contract is one keeper PER TOUCHED CELL, bounded by n_cells, not one
    global keeper.  The tiled kernel keeps the dense-gram memory bounded
    throughout."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    V = base + rng.normal(scale=0.005, size=(400, 16))
    df = pd.DataFrame(
        {"vec_id": range(400), "embedding": [v.astype(np.float32) for v in V]}
    )
    out = semdedup(
        rd.from_pandas(df), n_cells=8, tau=0.95, num_partitions=4
    ).to_pandas()
    assert len(out) == 400
    kept = out[out["keep"]]
    assert 1 <= len(kept) <= 8
    # exactly one keeper per touched cell: within a cell everything is
    # one cos>=tau component here
    assert (out.groupby("cell")["keep"].sum() == 1).all()
