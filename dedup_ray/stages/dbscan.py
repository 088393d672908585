"""Grid-bucketed DBSCAN over a low-dimensional deterministic projection.

Density clustering for embedding columns at corpus scale: raw 64-dim
eps-neighbor search can't be grid-bucketed (3^64 neighbor cells), so the
operator FIRST projects to ``out_dim`` (default 4) dims with the same
md5-parity Rademacher matrix as :func:`dedup_ray.stages.embed.jl_project`
and clusters IN THE PROJECTED SPACE — a defined, deterministic operator
(grid DBSCAN over the projection) rather than an approximation whose
recall nobody measured.  Semantics (classic DBSCAN, Ester et al. 1996):

- eps-NEIGHBORS: L2 distance ≤ eps between 6-dp-ROUNDED projections —
  rounding in both engines makes the threshold comparison run on
  identical doubles, so the pair set can never diverge at the boundary;
- CORE point: ≥ ``min_pts`` neighbors counting itself;
- CLUSTER: connected component of the core-core eps-graph, labeled by
  min member id (exact CC — `stages/cc.py`);
- BORDER point: non-core with ≥1 core neighbor — joins the smallest
  cluster id among its core neighbors; everything else is NOISE (-1).

Scale shape: each point lands in its eps-grid cell and PROBES the 40
lexicographically-positive neighbor offsets (half of 3^4−1, so each
cross-cell pair materializes in exactly one cell); per-cell work is a
tiled numpy distance block.  Candidate volume is bounded by cell
occupancy — the documented skew knob is eps itself (cells are eps-sized).
Degrees fold through one id-keyed exchange; CC and the border join run
on the edge set, never the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _sign_matrix(d: int, out_dim: int) -> np.ndarray:
    s = np.empty((d, out_dim), dtype=np.float64)
    for i in range(d):
        for j in range(out_dim):
            h = hashlib.md5(f"{i + 1}:{j + 1}".encode()).hexdigest()
            s[i, j] = 1.0 if int(h[0], 16) % 2 == 0 else -1.0
    return s


# lexicographically-positive neighbor offsets in {-1,0,1}^4: each
# cross-cell unordered pair is generated exactly once, at the larger cell
_OFFSETS4 = [
    o for o in
    (tuple((k // 3**j) % 3 - 1 for j in range(4)) for k in range(81))
    if o > (0, 0, 0, 0)
]


def dbscan_grid(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                eps: float = 1.5, min_pts: int = 4, out_dim: int = 4,
                num_partitions: int = 16):
    """Returns ``(id_col, cluster)`` for every input point (noise = −1).

    ``out_dim`` must be 4 (the probe offset table is 4-d); projections
    are rounded to 6 dp before ANY distance math — the cross-engine
    determinism contract."""
    import pyarrow.compute as pc

    from dedup_ray.stages.cc import component_labels
    from dedup_ray.stages.embed import _batch_matrix
    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    if out_dim != 4:
        raise ValueError("dbscan_grid is wired for out_dim=4")

    class Project:
        def __init__(self):
            self.signs: np.ndarray | None = None

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _batch_matrix(t[vec_col])
            if self.signs is None or self.signs.shape[0] != x.shape[1]:
                self.signs = _sign_matrix(x.shape[1], out_dim)
            y = np.round((x @ self.signs) / np.sqrt(float(out_dim)), 6)
            cells = np.floor(y / eps).astype(np.int64)
            ids = t[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            n = len(ids)
            # home copy + 40 probe copies, cell key packed as one string
            reps = 1 + len(_OFFSETS4)
            rep_ids = ids.take(pa.array(np.repeat(np.arange(n), reps)))
            ys = np.repeat(y, reps, axis=0)
            cell_mat = np.repeat(cells, reps, axis=0)
            off = np.tile(
                np.vstack([np.zeros(4, np.int64)]
                          + [np.array(o, np.int64) for o in _OFFSETS4]),
                (n, 1))
            cell_mat = cell_mat + off
            kind = np.tile(
                np.r_[np.int64(0), np.ones(len(_OFFSETS4), np.int64)], n)
            key = pd.Series(map(
                "|".join,
                cell_mat.astype(str).tolist())).to_numpy()
            return pa.table({
                id_col: rep_ids,
                "cell": pa.array(key, pa.string()),
                "kind": pa.array(kind, pa.int64()),
                "y1": pa.array(ys[:, 0], pa.float64()),
                "y2": pa.array(ys[:, 1], pa.float64()),
                "y3": pa.array(ys[:, 2], pa.float64()),
                "y4": pa.array(ys[:, 3], pa.float64()),
            })

    sch = dict(zip(ds.schema().names, ds.schema().types))
    id_type = sch[id_col]
    if not isinstance(id_type, pa.DataType):
        d = np.dtype(id_type)
        id_type = pa.string() if d == object else pa.from_numpy_dtype(d)

    points = ds.map_batches(Project, concurrency=4,
                            batch_format="pyarrow")

    edge_schema = pa.schema([("id1", id_type), ("id2", id_type)])
    rep_schema = pa.schema([(id_col, id_type), ("cell", pa.string()),
                            ("kind", pa.int64()), ("y1", pa.float64()),
                            ("y2", pa.float64()), ("y3", pa.float64()),
                            ("y4", pa.float64())])

    eps2 = eps * eps

    def cell_pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return edge_schema.empty_table()
        df = part.to_pandas()
        out1, out2 = [], []
        for _, sub in df.groupby("cell", sort=False):
            home = sub[sub["kind"] == 0]
            if not len(home):
                continue
            hy = home[["y1", "y2", "y3", "y4"]].to_numpy()
            hid = home[id_col].to_numpy()
            # home-home pairs, id1 < id2
            if len(home) > 1:
                d2 = ((hy[:, None, :] - hy[None, :, :]) ** 2).sum(axis=2)
                iu, ju = np.triu_indices(len(home), k=1)
                keep = d2[iu, ju] <= eps2
                a, b = hid[iu[keep]], hid[ju[keep]]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                out1.append(lo)
                out2.append(hi)
            probe = sub[sub["kind"] == 1]
            if len(probe):
                py = probe[["y1", "y2", "y3", "y4"]].to_numpy()
                pid = probe[id_col].to_numpy()
                d2 = ((py[:, None, :] - hy[None, :, :]) ** 2).sum(axis=2)
                pi, hj = np.nonzero(d2 <= eps2)
                a, b = pid[pi], hid[hj]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                out1.append(lo)
                out2.append(hi)
        if not out1:
            return edge_schema.empty_table()
        return pa.table({"id1": pa.array(np.concatenate(out1), id_type),
                         "id2": pa.array(np.concatenate(out2), id_type)})

    edges = exchange_group_apply(
        points, ["cell"], cell_pairs, num_partitions,
        empty_schema=rep_schema,
    ).materialize()

    # neighbor degrees (both directions) -> core flags
    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t["id1"].combine_chunks(),
                                  t["id2"].combine_chunks()])
        g = pa.table({"id": nodes}).group_by("id").aggregate(
            [([], "count_all")])
        return g.rename_columns(["id", "d"])

    def deg_fold(part: pa.Table) -> pa.Table:
        g = part.group_by("id").aggregate([("d", "sum")])
        return g.rename_columns(["id", "d"])

    deg = exchange_group_apply(
        edges.map_batches(deg_partial, batch_format="pyarrow"), ["id"],
        deg_fold, num_partitions,
        empty_schema=pa.schema([("id", id_type), ("d", pa.int64())]),
    ).materialize()

    core = deg.map_batches(
        lambda t: pa.table({"id": t["id"].filter(
            pc.greater_equal(t["d"], min_pts - 1))}),
        batch_format="pyarrow",
    ).materialize()

    # core-core subgraph -> exact CC (cluster = min member id)
    cc_edges = exchange_join(
        exchange_join(edges, core.map_batches(
            lambda t: t.rename_columns(["id1"]), batch_format="pyarrow"),
            on="id1", how="semi", num_partitions=num_partitions,
            empty_schema=edge_schema),
        core.map_batches(lambda t: t.rename_columns(["id2"]),
                         batch_format="pyarrow"),
        on="id2", how="semi", num_partitions=num_partitions,
        empty_schema=edge_schema,
    )
    labels = component_labels(cc_edges)  # (id, cluster_id) or None

    out_schema = pa.schema([(id_col, id_type), ("cluster", pa.int64())])
    all_ids = ds.select_columns([id_col])
    if labels is None:
        # no core-core edge: isolated cores form singleton clusters
        labels = core.map_batches(
            lambda t: pa.table({
                "id": t["id"],
                "cluster_id": pc.cast(t["id"], pa.int64())})
            if t.num_rows else pa.table(
                {"id": pa.array([], id_type),
                 "cluster_id": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    else:
        # cores not in any core-core edge are singleton clusters too
        lab_ids = labels.map_batches(
            lambda t: t.select(["id"]), batch_format="pyarrow")
        singles = exchange_join(
            core, lab_ids, on="id", how="anti",
            num_partitions=num_partitions,
            empty_schema=pa.schema([("id", id_type)]),
        ).map_batches(
            lambda t: pa.table({
                "id": t["id"],
                "cluster_id": pc.cast(t["id"], pa.int64())})
            if t.num_rows else pa.table(
                {"id": pa.array([], id_type),
                 "cluster_id": pa.array([], pa.int64())}),
            batch_format="pyarrow")
        labels = labels.union(singles)

    labels = labels.materialize()

    # border points: non-core endpoints adjacent to a core -> min core
    # neighbor's cluster.  Build (non-core endpoint, core neighbor) rows.
    def orient_both(t: pa.Table) -> pa.Table:
        return pa.table({
            "p": pa.concat_arrays([t["id1"].combine_chunks(),
                                   t["id2"].combine_chunks()]),
            "q": pa.concat_arrays([t["id2"].combine_chunks(),
                                   t["id1"].combine_chunks()]),
        })

    adj = edges.map_batches(orient_both, batch_format="pyarrow")
    # q must be core (has a label), p gets min cluster among such q
    qlab = exchange_join(
        adj, labels.map_batches(
            lambda t: t.rename_columns(["q", "cluster_id"]),
            batch_format="pyarrow"),
        on="q", num_partitions=num_partitions,
        empty_schema=pa.schema([("p", id_type), ("q", id_type),
                                ("cluster_id", pa.int64())]),
    )

    def min_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"p": pa.array([], id_type),
                             "cluster_id": pa.array([], pa.int64())})
        g = part.group_by("p").aggregate([("cluster_id", "min")])
        return g.rename_columns(["p", "cluster_id"])

    reach = exchange_group_apply(
        qlab.map_batches(lambda t: t.select(["p", "cluster_id"]),
                         batch_format="pyarrow"),
        ["p"], min_fold, num_partitions,
        empty_schema=pa.schema([("p", id_type), ("q", id_type),
                                ("cluster_id", pa.int64())]),
    )

    # assemble: core label wins, else border reach, else noise
    assigned = exchange_join(
        exchange_join(
            all_ids, labels.map_batches(
                lambda t: t.rename_columns([id_col, "core_cluster"]),
                batch_format="pyarrow"),
            on=id_col, how="left", num_partitions=num_partitions,
            empty_schema=pa.schema([(id_col, id_type),
                                    ("core_cluster", pa.int64())])),
        reach.map_batches(
            lambda t: t.rename_columns([id_col, "border_cluster"]),
            batch_format="pyarrow"),
        on=id_col, how="left", num_partitions=num_partitions,
        empty_schema=pa.schema([(id_col, id_type),
                                ("core_cluster", pa.int64()),
                                ("border_cluster", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        cc_ = t["core_cluster"].to_numpy(zero_copy_only=False)
        bc = t["border_cluster"].to_numpy(zero_copy_only=False)
        cl = np.where(~pd.isna(cc_), cc_,
                      np.where(~pd.isna(bc), bc, -1)).astype(np.int64)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(cl, pa.int64())})

    return assigned.map_batches(finish, batch_format="pyarrow")
