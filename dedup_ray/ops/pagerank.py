"""Distributed PageRank by power iteration on the raw-task exchange.

The reference's graph family (SURVEY.md §2.7) derives features from block-
local graphs (shortest path ``shortpath.py:56-77``, components
``subgraph.py:56-72``); its global-graph analog for a web corpus is link
authority — PageRank — which Ray Data has no native operator for.  This is
the custom-operator case (c) shape from the build rules: an iterative
all-to-all that ``map_batches``/``groupby`` cannot express without one
driver-side barrier per iteration anyway, so each iteration is two narrow
hash exchanges:

  1. contributions: co-partition ``edges`` on ``src`` with ``ranks`` on
     ``node``; per partition, one vectorized join + ``rank/outdeg`` +
     partial sum by ``dst``  →  (dst, partial) rows;
  2. combine: co-partition the partials on ``dst`` with the node table on
     ``node``; per partition, sum partials, left-join nodes, apply
     teleport + dangling mass  →  the next rank vector.

Partitioning assumptions (documented per SURVEY §2.12): the rank vector is
O(nodes) rows × 24 bytes and never touches the driver; the edge stream —
the heavy side at web scale — is pre-partitioned by ``src`` ONCE, so the
per-iteration wave-1 re-split of an edge partition is an identity
(hash(src) % P maps every row back to its own partition): per iteration the
only cross-partition movement is the two narrow rank/partial streams.
Dangling mass (nodes with out-degree 0) is a per-iteration global scalar,
reduced tree-style from O(P) per-partition sums.

Floating point: contributions are summed in partition-local order, so two
runs at different parallelism agree only to ~1 ulp per term; callers that
hash-compare output (the DuckDB oracle) round at the emit point via
``round_to``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from dedup_ray.util.exchange import exchange_group_apply, hash_exchange

_RANK_SCHEMA = pa.schema(
    [("node", pa.int64()), ("pr", pa.float64()), ("outdeg", pa.int64())]
)
_PARTIAL_SCHEMA = pa.schema([("dst", pa.int64()), ("c", pa.float64())])
_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _table_or_empty(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Void-block guard: an entirely-empty partition arrives column-less."""
    if t.num_rows == 0 and not t.column_names:
        return schema.empty_table()
    return t


@ray.remote
def _dangling_sum(t: pa.Table) -> float:
    if t.num_rows == 0 or "outdeg" not in t.column_names:
        return 0.0
    df = t.select(["pr", "outdeg"]).to_pandas()
    return float(df.loc[df["outdeg"] == 0, "pr"].sum())


def pagerank(
    nodes_ds,
    edges_ds,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 8,
    num_partitions: int = 16,
    round_to: int | None = 9,
    seed_nodes: list | None = None,
):
    """PageRank over ``edges_ds(src, dst)`` for every node in
    ``nodes_ds(node)``; returns a Dataset ``(node, pagerank)``.

    Multi-edges contribute once per occurrence (out-degree counts edge
    rows, matching ``SUM(rank/outdeg)`` over an edge multiset in SQL);
    nodes with no out-edges redistribute their mass uniformly (standard
    dangling-node treatment).  ``r0 = 1/N`` uniform;
    ``r_{k+1}(v) = (1-d)/N + d·(Σ_{u→v} r_k(u)/outdeg(u) + dangling_k/N)``.

    ``seed_nodes`` switches to PERSONALIZED PageRank (random walk with
    restart): the teleport distribution concentrates on the seed set
    (``p(v) = 1/|S|`` for seeds, 0 elsewhere), ``r0 = p``, and dangling
    mass restarts at the seeds — authority relative to a trusted set
    (seed-biased host ranking, topic-local relevance) instead of global.
    The seed set broadcasts once; per-node work is one vectorized isin.
    """
    nodes = nodes_ds.select_columns([node_col])
    if node_col != "node":
        from dedup_ray.util.dsutil import rename_columns

        nodes = rename_columns(nodes, {node_col: "node"})
    edges = edges_ds.select_columns([src_col, dst_col])
    if (src_col, dst_col) != ("src", "dst"):
        from dedup_ray.util.dsutil import rename_columns

        edges = rename_columns(edges, {src_col: "src", dst_col: "dst"})

    n_total = nodes.count()
    if n_total == 0:
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64()), ("pagerank", pa.float64())])
            .empty_table()
        )
    teleport = (1.0 - damping) / n_total
    seed_arr = None
    if seed_nodes is not None:
        if not seed_nodes:
            raise ValueError("seed_nodes must be non-empty when given")
        seed_arr = ray.put(np.asarray(sorted(set(seed_nodes))))
        p_seed = 1.0 / len(set(seed_nodes))

    # Pre-partition the heavy stream once: per-iteration re-splits of these
    # partitions are identity movement (same hash, same modulus).
    edge_refs = exchange_group_apply(
        edges,
        "src",
        lambda t: _table_or_empty(t, _EDGE_SCHEMA),
        num_partitions=num_partitions,
        return_refs=True,
    )

    # rank rows carry outdeg so the contribution join needs no third stream.
    def init_ranks(e: pa.Table, nd: pa.Table) -> pa.Table:
        e = _table_or_empty(e, _EDGE_SCHEMA)
        nd = _table_or_empty(nd, pa.schema([("node", pa.int64())]))
        deg = (
            e.select(["src"])
            .to_pandas()
            .groupby("src")
            .size()
            .rename("outdeg")
        )
        out = nd.to_pandas().join(deg, on="node")
        out["outdeg"] = out["outdeg"].fillna(0).astype("int64")
        if seed_arr is not None:
            out["pr"] = np.where(
                out["node"].isin(ray.get(seed_arr)), p_seed, 0.0)
        else:
            out["pr"] = 1.0 / n_total
        return pa.Table.from_pandas(
            out[["node", "pr", "outdeg"]], preserve_index=False
        ).cast(_RANK_SCHEMA)

    rank_refs = hash_exchange(
        [edge_refs, nodes],
        ["src", "node"],
        init_ranks,
        num_partitions=num_partitions,
        return_refs=True,
    )

    def contribute(e: pa.Table, r: pa.Table) -> pa.Table:
        e = _table_or_empty(e, _EDGE_SCHEMA)
        r = _table_or_empty(r, _RANK_SCHEMA)
        ed = e.to_pandas()
        rd = r.to_pandas()
        rd = rd[rd["outdeg"] > 0]
        j = ed.merge(rd, left_on="src", right_on="node", how="inner")
        j["c"] = j["pr"] / j["outdeg"]
        out = j.groupby("dst", as_index=False)["c"].sum()
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            _PARTIAL_SCHEMA
        )

    for _ in range(iters):
        dl = sum(ray.get([_dangling_sum.remote(ref) for ref in rank_refs]))
        if seed_arr is not None:
            # personalized: teleport AND dangling mass restart at seeds
            base = None
            base_seed = ((1.0 - damping) + damping * dl) * p_seed
        else:
            base = teleport + damping * dl / n_total
            base_seed = None

        def combine(
            r: pa.Table, c: pa.Table, _base=base, _base_seed=base_seed
        ) -> pa.Table:
            r = _table_or_empty(r, _RANK_SCHEMA)
            c = _table_or_empty(c, _PARTIAL_SCHEMA)
            sums = c.to_pandas().groupby("dst")["c"].sum()
            out = r.to_pandas()
            contrib = out["node"].map(sums).fillna(0.0).to_numpy(
                dtype=np.float64)
            if _base is None:
                restart = np.where(
                    out["node"].isin(ray.get(seed_arr)), _base_seed, 0.0)
                out["pr"] = restart + damping * contrib
            else:
                out["pr"] = _base + damping * contrib
            return pa.Table.from_pandas(
                out[["node", "pr", "outdeg"]], preserve_index=False
            ).cast(_RANK_SCHEMA)

        contrib_refs = hash_exchange(
            [edge_refs, rank_refs],
            ["src", "node"],
            contribute,
            num_partitions=num_partitions,
            return_refs=True,
        )
        rank_refs = hash_exchange(
            [rank_refs, contrib_refs],
            ["node", "dst"],
            combine,
            num_partitions=num_partitions,
            return_refs=True,
        )

    def finish(t: pa.Table) -> pa.Table:
        pr = t["pr"]
        if round_to is not None:
            import pyarrow.compute as pc

            pr = pc.round(pr, ndigits=round_to)
        return pa.table({"node": t["node"], "pagerank": pr})

    return ray.data.from_arrow_refs(rank_refs).map_batches(
        finish, batch_format="pyarrow"
    )


def pagerank_reference(
    n: int,
    edges: list[tuple[int, int]],
    damping: float = 0.85,
    iters: int = 8,
) -> np.ndarray:
    """Dense NumPy oracle for tests: identical semantics, O(n²) memory."""
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dl = r[outdeg == 0].sum()
        nxt = np.full(n, (1.0 - damping) / n + damping * dl / n)
        for s, d in edges:
            nxt[d] += damping * r[s] / outdeg[s]
        r = nxt
    return r


def ppr_reference(
    n: int,
    edges: list[tuple[int, int]],
    seeds: list[int],
    damping: float = 0.85,
    iters: int = 8,
) -> np.ndarray:
    """Dense NumPy oracle for personalized PageRank tests."""
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[s] += 1
    p = np.zeros(n)
    p[sorted(set(seeds))] = 1.0 / len(set(seeds))
    r = p.copy()
    for _ in range(iters):
        dl = r[outdeg == 0].sum()
        nxt = ((1.0 - damping) + damping * dl) * p
        for s, d in edges:
            nxt[d] += damping * r[s] / outdeg[s]
        r = nxt
    return r


def hits(edges_ds, src_col: str = "src", dst_col: str = "dst",
         iters: int = 4, num_partitions: int = 16,
         round_to: int = 9):
    """HITS hubs & authorities (Kleinberg 1999) — the mutual-
    reinforcement ranking next to PageRank: a good hub links to good
    authorities, a good authority is linked by good hubs.  Directory/
    index pages (hubs) and canonical content pages (authorities)
    separate where PageRank conflates them.

    ``a_{k+1}(v) = Σ_{u→v} h_k(u)``, ``h_{k+1}(u) = Σ_{u→v} a_{k+1}(v)``,
    each L2-normalized.  Per iteration two co-partitioned exchange joins
    of the score stream against the SAME pre-split edge refs (keyed on
    src for the authority push, on dst for the hub pull) and two
    tree-reduced scalars (the norms); the score vector never touches
    the driver.  Scores start at 1.0 for every node appearing in any
    edge.  Deterministic; results rounded to ``round_to`` so the
    unrolled-CTE oracle hashes identically.  Output:
    ``(node, hub, authority)``.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import (
        exchange_group_apply,
        exchange_join,
    )

    edges = edges_ds.select_columns([src_col, dst_col]).materialize()

    def nodes_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            t[src_col].combine_chunks().cast(pa.int64()),
            t[dst_col].combine_chunks().cast(pa.int64()),
        ])
        return pa.table({"node": pc.unique(both)})

    def dedup_nodes(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "node" not in part.column_names:
            return pa.table({"node": pa.array([], pa.int64())})
        return pa.table({"node": pc.unique(part["node"].combine_chunks())})

    nodes = exchange_group_apply(
        edges.map_batches(nodes_partial, batch_format="pyarrow"),
        "node", dedup_nodes, num_partitions).materialize()

    def init_scores(t: pa.Table) -> pa.Table:
        ones = np.ones(t.num_rows, np.float64)
        return pa.table({"node": t["node"],
                         "hub": pa.array(ones),
                         "auth": pa.array(ones)})

    scores = nodes.map_batches(init_scores,
                               batch_format="pyarrow").materialize()

    def sq_sum(ds_, col):
        part = ds_.map_batches(
            lambda t, c=col: pa.table({
                "s": pa.array([
                    float(np.square(
                        t[c].to_numpy(zero_copy_only=False)).sum())
                    if t.num_rows and c in t.column_names else 0.0])}),
            batch_format="pyarrow")
        return float(part.sum("s") or 0.0)

    sch = pa.schema([("node", pa.int64()), ("hub", pa.float64()),
                     ("auth", pa.float64())])

    for _ in range(iters):
        # authority push: h(src) flows along each edge to dst
        def push(s: pa.Table) -> pa.Table:
            return pa.table({
                "node": s[dst_col] if dst_col in s.column_names
                else pa.array([], pa.int64()),
                "contrib": s["hub"] if "hub" in s.column_names
                else pa.array([], pa.float64()),
            })

        flowed = exchange_join(
            edges.map_batches(
                lambda t: t.rename_columns(["node", dst_col]),
                batch_format="pyarrow"),
            scores, on="node", num_partitions=num_partitions,
            post=push,
            empty_schema=pa.schema([("node", pa.int64()),
                                    ("contrib", pa.float64())]),
        )

        def sum_contrib(part: pa.Table) -> pa.Table:
            if part.num_rows == 0 or "node" not in part.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "auth_new": pa.array([], pa.float64())})
            g = part.group_by("node").aggregate([("contrib", "sum")])
            return g.rename_columns(["node", "auth_new"])

        auth_new = exchange_group_apply(
            flowed, "node", sum_contrib, num_partitions)
        nrm = np.sqrt(sq_sum(auth_new, "auth_new")) or 1.0

        def merge_auth(s: pa.Table, a: pa.Table, _n=nrm) -> pa.Table:
            if s.num_rows == 0 or "node" not in s.column_names:
                return sch.empty_table()
            st = s.join(a, keys="node", join_type="left outer")
            av = st["auth_new"].to_numpy(zero_copy_only=False)
            av = np.nan_to_num(av, nan=0.0) / _n
            return pa.table({"node": st["node"], "hub": st["hub"],
                             "auth": pa.array(av)}).cast(sch)

        from dedup_ray.ops.relational import cogroup

        scores = cogroup(
            [scores, auth_new], ["node", "node"], merge_auth,
            num_partitions,
            empty_schemas=[sch, pa.schema([("node", pa.int64()),
                                           ("auth_new", pa.float64())])],
        ).materialize()

        # hub pull: a(dst) flows back along each edge to src
        def pull(s: pa.Table) -> pa.Table:
            return pa.table({
                "node": s[src_col] if src_col in s.column_names
                else pa.array([], pa.int64()),
                "contrib": s["auth"] if "auth" in s.column_names
                else pa.array([], pa.float64()),
            })

        flowed_h = exchange_join(
            edges.map_batches(
                lambda t: pa.table({src_col: t[src_col],
                                    "node": t[dst_col]}),
                batch_format="pyarrow"),
            scores, on="node", num_partitions=num_partitions,
            post=pull,
            empty_schema=pa.schema([("node", pa.int64()),
                                    ("contrib", pa.float64())]),
        )

        def sum_hub(part: pa.Table) -> pa.Table:
            if part.num_rows == 0 or "node" not in part.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "hub_new": pa.array([], pa.float64())})
            g = part.group_by("node").aggregate([("contrib", "sum")])
            return g.rename_columns(["node", "hub_new"])

        hub_new = exchange_group_apply(
            flowed_h, "node", sum_hub, num_partitions)
        nrm_h = np.sqrt(sq_sum(hub_new, "hub_new")) or 1.0

        def merge_hub(s: pa.Table, h: pa.Table, _n=nrm_h) -> pa.Table:
            if s.num_rows == 0 or "node" not in s.column_names:
                return sch.empty_table()
            st = s.join(h, keys="node", join_type="left outer")
            hv = st["hub_new"].to_numpy(zero_copy_only=False)
            hv = np.nan_to_num(hv, nan=0.0) / _n
            return pa.table({"node": st["node"],
                             "hub": pa.array(hv),
                             "auth": st["auth"]}).cast(sch)

        scores = cogroup(
            [scores, hub_new], ["node", "node"], merge_hub,
            num_partitions,
            empty_schemas=[sch, pa.schema([("node", pa.int64()),
                                           ("hub_new", pa.float64())])],
        ).materialize()

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "hub": pc.round(t["hub"], ndigits=round_to),
            "authority": pc.round(t["auth"], ndigits=round_to),
        })

    return scores.map_batches(final, batch_format="pyarrow")
