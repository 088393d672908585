"""Per-block graph features (SURVEY.md G1-G4).

The reference builds a similarity graph per name block and derives pair
features from it: edge weight ``1/sim`` for ``sim > 0`` and feature
``1/shortest_path_distance`` (``shortpath.py:45-77``), or a same-connected-
component indicator (``subgraph.py:56-72``).  Here the block graph is
re-expressed as ``groupby(block).map_groups`` — one task per block, the ST5
stateful-block shape from SURVEY.md §2.3.

Partitioning assumption (documented per the custom-operator rule): a block
must fit one task.  Blocks are bounded by construction upstream (LSH band
caps / reference name blocks); a pathological block should be capped or
salted before this operator, not inside it.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dedup_ray.util.dsutil import as_arrow


def _dijkstra(adj: dict, src) -> dict:
    """Single-source shortest path over a dict adjacency {u: [(v, w)]}."""
    dist = {src: 0.0}
    heap = [(0.0, src)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def shortest_path_pairs(df: pd.DataFrame, sim_col: str = "sim") -> pd.DataFrame:
    """One block's pair sims → all canonical pair rows with ``sp`` feature.

    Reference semantics (``shortpath.py:45-77``): nodes = every id seen in a
    pair; edges only where ``sim > 0`` with weight ``1/sim``; feature
    ``sp = 1/dist`` for reachable pairs else 0.  Pairs enumerate in the
    canonical (id1 < id2) order over the sorted node set (SURVEY.md §1.3).
    """
    adj: dict = defaultdict(list)
    nodes = set()
    for i1, i2, s in zip(df["id1"], df["id2"], df[sim_col]):
        nodes.add(i1)
        nodes.add(i2)
        if s > 0:
            w = 1.0 / float(s)
            adj[i1].append((i2, w))
            adj[i2].append((i1, w))
    ids = sorted(nodes)
    out1, out2, sp = [], [], []
    for a_idx, a in enumerate(ids):
        dist = _dijkstra(adj, a)
        for b in ids[a_idx + 1 :]:
            d = dist.get(b, 0.0)
            out1.append(a)
            out2.append(b)
            sp.append(1.0 / d if d > 0 else 0.0)
    return pd.DataFrame({"id1": out1, "id2": out2, "sp": sp})


def same_component_pairs(df: pd.DataFrame, sim_col: str = "sim") -> pd.DataFrame:
    """One block's pair sims → canonical pairs flagged 1.0 when the two ids
    share a connected component of the sim>0 graph (``subgraph.py:56-72``)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for i1, i2, s in zip(df["id1"], df["id2"], df[sim_col]):
        nodes.add(i1)
        nodes.add(i2)
        if s > 0:
            ra, rb = find(i1), find(i2)
            if ra != rb:
                parent[rb] = ra
    ids = sorted(nodes)
    out1, out2, flag = [], [], []
    for a_idx, a in enumerate(ids):
        for b in ids[a_idx + 1 :]:
            out1.append(a)
            out2.append(b)
            flag.append(1.0 if find(a) == find(b) else 0.0)
    return pd.DataFrame({"id1": out1, "id2": out2, "same_comp": flag})


def bipartite_token_distance(
    ds,
    block_col: str,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df: int = 3,
    max_dist: int = 16,
):
    """G3: degree-filtered doc–token bipartite distance
    (reference ``short_path.R:27-28,65-84``).

    Per block: the "coauthor" nodes are the block's distinct tokens with
    document frequency in ``[min_df, max_df]`` (the reference's
    ``1 < count < 4`` node filter); edges connect each doc to its retained
    tokens PLUS retained tokens co-occurring in one doc to each other (the
    reference's per-publication coauthor clique edges).  BFS doc-pair
    distances → ``coau_dist = 2/dist`` (0.0 when unreachable or beyond
    ``max_dist`` — the reference's ``2/Inf``), ``coau_dummy = (dist == 2)``
    i.e. the pair shares a retained token.

    Partitioning assumption: one block per task (ST5 shape, bounded blocks).
    """
    import itertools as it
    from collections import Counter

    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        doc_toks = [
            set((t or "").split(" ")) - {""} for t in g[text_col]
        ]
        df_count = Counter(tok for s in doc_toks for tok in s)
        retained = {t for t, c in df_count.items() if min_df <= c <= max_df}
        adj: dict = defaultdict(set)
        for i, toks in enumerate(doc_toks):
            r = sorted(toks & retained)
            for t in r:
                adj[("d", i)].add(("t", t))
                adj[("t", t)].add(("d", i))
            for a, b in it.combinations(r, 2):
                adj[("t", a)].add(("t", b))
                adj[("t", b)].add(("t", a))
        rows = []
        for i in range(len(ids)):
            dist = {("d", i): 0}
            frontier = [("d", i)]
            d = 0
            while frontier and d < max_dist:
                d += 1
                nxt = []
                for u in frontier:
                    for v in adj[u]:
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                frontier = nxt
            for j in range(i + 1, len(ids)):
                dd = dist.get(("d", j))
                rows.append(
                    (
                        ids[i],
                        ids[j],
                        round(2.0 / dd, 6) if dd else 0.0,
                        1.0 if dd == 2 else 0.0,
                    )
                )
        out = pd.DataFrame(
            rows, columns=["id1", "id2", "coau_dist", "coau_dummy"]
        )
        out.insert(0, block_col, group[block_col].iloc[0])
        return out

    return as_arrow(
        ds.groupby(block_col).map_groups(per_block, batch_format="pandas")
    )


def block_graph_features(
    pairs_ds,
    block_col: str,
    sim_col: str = "sim",
    kind: str = "shortest_path",
):
    """Distributed driver: pair rows (block, id1, id2, sim) → per-block graph
    feature rows via ``groupby(block).map_groups``."""
    fn = shortest_path_pairs if kind == "shortest_path" else same_component_pairs

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        out = fn(group, sim_col=sim_col)
        out.insert(0, block_col, group[block_col].iloc[0])
        return out

    return as_arrow(pairs_ds.groupby(block_col).map_groups(apply, batch_format="pandas"))


def triangle_count(edges_ds, a_col: str = "a", b_col: str = "b",
                   num_partitions: int = 16, max_degree: int | None = None):
    """Distributed triangle counting via the wedge join (compact-forward
    shape): orient every edge low->high, emit each low-endpoint's
    neighbor pairs as wedges (one grouped pass; per-group work is
    C(deg, 2)), then close wedges against the edge set with one
    semi-join on the packed (x, y) key.  Each triangle is counted exactly
    once, at its minimum vertex.  Returns the scalar count as a 1-row
    ``pa.Table``.

    By default the count is EXACT and there is no skew bound: one
    high-degree vertex materializes all C(deg, 2) wedges in its task.
    ``max_degree`` is the optional skew cap (same policy as the LSH
    bucket caps): each vertex's forward-neighbor list is truncated to
    its ``max_degree`` smallest-id neighbors (deterministic), which
    UNDERCOUNTS triangles through hotter vertices — an explicit
    approximation trade for bounded per-task memory on skewed graphs.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    def pack(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return (x.astype(np.int64) << np.int64(32)) | y.astype(np.int64)

    def orient(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False)
        b = t[b_col].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                         "ab": pa.array(pack(lo, hi))})

    # materialized: consumed by BOTH the wedge exchange and the closing
    # semi-join — lazy, a caller's edge-build chain would run twice
    edges = edges_ds.map_batches(orient, batch_format="pyarrow") \
        .materialize()

    def wedges(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"ab": pa.array([], pa.int64())})
        a = part["a"].to_numpy(zero_copy_only=False)
        b = part["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, a[1:] != a[:-1]]
        if max_degree is not None:
            # rank within each a-group (b-sorted): keep the max_degree
            # smallest-id neighbors per vertex — the documented skew cap
            grp = np.cumsum(first) - 1
            starts0 = np.flatnonzero(first)
            rank = np.arange(len(a)) - starts0[grp]
            keep = rank < max_degree
            a, b = a[keep], b[keep]
            first = np.r_[True, a[1:] != a[:-1]] if len(a) else \
                np.array([], bool)
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(a)])
        xs, ys = [], []
        for d in np.unique(lens):
            if d < 2:
                continue
            rows = starts[lens == d]
            # all C(d,2) neighbor pairs for every degree-d group at once
            iu, ju = np.triu_indices(d, k=1)
            xs.append(b[(rows[:, None, None] + iu[None, :, None])
                        .reshape(-1)])
            ys.append(b[(rows[:, None, None] + ju[None, :, None])
                        .reshape(-1)])
        if not xs:
            return pa.table({"ab": pa.array([], pa.int64())})
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        return pa.table({"ab": pa.array(pack(x, y))})

    wedge_ds = exchange_group_apply(edges, "a", wedges, num_partitions)
    closed = exchange_join(
        wedge_ds, edges.map_batches(
            lambda t: t.select(["ab"]), batch_format="pyarrow"),
        on="ab", how="semi", num_partitions=num_partitions,
        empty_schema=pa.schema([("ab", pa.int64())]),
    )
    n = closed.count()
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def k_core(edges_ds, k: int = 2, a_col: str = "a", b_col: str = "b",
           max_rounds: int = 8, num_partitions: int = 16,
           local_edge_limit: int = 2_000_000):
    """k-core decomposition by distributed peeling (bounded rounds).

    Each round: undirected degrees via one grouped count, then edges
    touching any node of degree < k are dropped through the size-gated
    membership join (broadcast ``pc.is_in`` while the weak set is small,
    partitioned anti join above the limit).  Stops early when a round
    removes nothing — at that point every node in the surviving edge set has
    degree ≥ k, i.e. the exact k-core; ``max_rounds`` bounds wall time
    on adversarial chains (a path graph peels one layer per round), and
    a removal-free round makes all later rounds no-ops, so a
    fixed-round replay (the oracle) produces the identical edge set
    whether or not convergence happened earlier.

    Returns the surviving ``(a_col, b_col)`` edge Dataset.  The web-
    graph use: spam/link-farm cores and the dense backbone of a host
    graph survive; tendrils and isolated chains peel away.
    """
    import pyarrow.compute as pc
    import ray.data

    from dedup_ray.ops.relational import anti_join

    edges = edges_ds.select_columns([a_col, b_col]).materialize()

    # Local fast path (cc_local convention): under the edge cap the
    # bounded-round peel is a numpy loop over factorized endpoints —
    # the distributed loop pays ~4 plan launches per round of fixed
    # latency each.  Byte-identical result: same round count, same
    # weak-node rule, so the bounded-replay oracle contract holds.
    if edges.count() <= local_edge_limit:
        t = pa.concat_tables(
            [b for b in edges.iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
        ) if edges.count() else None
        if t is None or t.num_rows == 0:
            return edges
        a = t[a_col].to_numpy(zero_copy_only=False)
        b = t[b_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(np.concatenate([a, b]))
        ca, cb = codes[: len(a)], codes[len(a):]
        live = np.ones(len(a), bool)
        for _ in range(max_rounds):
            deg = np.bincount(
                np.concatenate([ca[live], cb[live]]), minlength=len(uniq))
            weak = deg < k
            if not weak.any() or not (weak[ca] | weak[cb])[live].any():
                break
            live &= ~(weak[ca] | weak[cb])
        keep = pa.table({a_col: pa.array(a[live]),
                         b_col: pa.array(b[live])})
        return ray.data.from_arrow(keep)

    for _ in range(max_rounds):
        def deg_partial(t: pa.Table) -> pa.Table:
            nodes = pa.concat_arrays([
                t[a_col].combine_chunks(),
                t[b_col].combine_chunks(),
            ])
            g = pa.table({"node": nodes}).group_by("node").aggregate(
                [([], "count_all")])
            return pa.table({"node": g["node"], "d": g["count_all"]})

        weak = (
            edges.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("node").sum("d")
            .map_batches(
                lambda t: pa.table({"node": t["node"]}).filter(
                    pc.less(t["sum(d)"], k)),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if weak.count() == 0:
            break
        kept = anti_join(
            anti_join(edges, weak.map_batches(
                lambda t: t.rename_columns([a_col]),
                batch_format="pyarrow"), a_col,
                cols=[a_col, b_col], num_partitions=num_partitions),
            weak.map_batches(
                lambda t: t.rename_columns([b_col]),
                batch_format="pyarrow"), b_col,
            cols=[a_col, b_col], num_partitions=num_partitions,
        )
        edges = kept.materialize()
    return edges


def resolve_pointers(edges_ds, src_col: str = "src", dst_col: str = "dst",
                     rounds: int = 6, num_partitions: int = 16):
    """Functional-graph chain resolution by pointer doubling: follow a
    (src → dst) mapping — redirect chains, alias tables, symlink graphs —
    to its terminal in ``rounds`` exchange-join hops, covering chains up
    to ``2^rounds`` long (the log-rounds trick; per-hop, every pointer
    jumps to its pointer's pointer).  Each round co-partitions the CURRENT
    mapping with the ORIGINAL mapping (same block refs, shipped once per
    round) and rewrites ``ptr → map[ptr]`` where an entry exists.

    Input must be functional (one outgoing edge per ``src``) and acyclic
    for "terminal" to be well defined; a cycle never resolves and keeps
    its in-cycle pointer (no livelock — rounds are fixed).  Output:
    ``(src_col, final)`` one row per input src.  Driver holds only block
    refs; the mapping never materializes whole.  Rounds chain on raw refs
    (``return_refs=True``) — no plan-execution barrier between hops.
    """
    from dedup_ray.util.exchange import (
        _block_refs,
        hash_exchange,
    )

    base = edges_ds.schema().base_schema
    id_type = base.field(src_col).type  # not hardcoded int64 (string urls)

    def jump(cur: pa.Table, mapping: pa.Table) -> pa.Table:
        # cur: (src, ptr) keyed on ptr; mapping: the SAME relation keyed
        # on src — so ptr jumps to ptr's pointer (2^r steps after round r)
        if cur.num_rows == 0 or "ptr" not in cur.column_names:
            return pa.table({src_col: pa.array([], id_type),
                             "ptr": pa.array([], id_type)})
        ptr = cur["ptr"].to_numpy(zero_copy_only=False)
        if mapping.num_rows and src_col in mapping.column_names:
            ms = mapping[src_col].to_numpy(zero_copy_only=False)
            md = mapping["ptr"].to_numpy(zero_copy_only=False)
            order = np.argsort(ms, kind="stable")
            ms_s, md_s = ms[order], md[order]
            pos = np.searchsorted(ms_s, ptr)
            pos_c = np.minimum(pos, len(ms_s) - 1)
            hit = ms_s[pos_c] == ptr
            new_ptr = np.where(hit, md_s[pos_c], ptr)
        else:
            new_ptr = ptr
        return pa.table({src_col: cur[src_col],
                         "ptr": pa.array(new_ptr, cur["ptr"].type)})

    def to_cur(t: pa.Table) -> pa.Table:
        return pa.table({src_col: t[src_col], "ptr": t[dst_col]})

    import ray.data

    cur = edges_ds.map_batches(to_cur, batch_format="pyarrow")
    cur_refs = _block_refs(cur)
    for _ in range(rounds):
        cur_refs = hash_exchange(
            [cur_refs, cur_refs], ["ptr", src_col], jump,
            num_partitions, return_refs=True,
        )
    out = ray.data.from_arrow_refs(cur_refs)
    return out.map_batches(
        lambda t: t.rename_columns([src_col, "final"]),
        batch_format="pyarrow",
    )


def multi_source_bfs(edges_ds, seeds_ds, node_col: str = "node",
                     src_col: str = "src", dst_col: str = "dst",
                     max_hops: int = 4, num_partitions: int = 16,
                     local_edge_limit: int = 2_000_000):
    """Hop distance from a seed SET over a directed edge stream — the
    TrustRank-style distance pass (Gyöngyi et al. 2004 use a seed set of
    vetted hosts; hop distance is the discrete analog of their
    propagated trust): spam scoring by link distance from curated seeds,
    crawl-frontier depth labels, "within k clicks of a hub" cohorts.

    Classic distributed frontier expansion: per hop ONE co-partitioned
    join of the frontier against the edge stream (keyed on ``src``) plus
    one grouped distinct and one anti join against the settled set —
    every node is settled at its FIRST discovery, so each node crosses
    the exchanges once over the whole run, not once per hop.  Stops
    early when a hop discovers nothing; ``max_hops`` bounds wall time,
    and a discovery-free hop is a no-op, so a fixed-hop replay (the
    oracle) yields the identical table whether or not convergence came
    earlier.  Output: ``(node, dist)`` for every node within
    ``max_hops`` of any seed (seeds at 0).  Unreachable nodes are
    absent, matching SQL semantics.

    Under ``local_edge_limit`` edges the whole walk runs as a
    vectorized numpy loop on the driver (``cc_local`` convention — the
    distributed loop pays ~4 plan launches of fixed latency per hop,
    which dominates at small graph sizes); byte-identical output by
    construction (same first-discovery rule, same hop cap).
    """
    import pyarrow.compute as pc

    from dedup_ray.ops.relational import anti_join
    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    node_t = seeds_ds.schema().base_schema.field(node_col).type

    def dedup_nodes(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or node_col not in part.column_names:
            return pa.table({node_col: pa.array([], node_t)})
        return pa.table({node_col: pc.unique(
            part[node_col].combine_chunks())})

    def drop_null_edges(t: pa.Table) -> pa.Table:
        # a null endpoint is a malformed edge, not a node: drop it in
        # BOTH paths so local and distributed walks stay byte-identical
        keep = pc.and_(pc.is_valid(t[src_col]), pc.is_valid(t[dst_col]))
        return t.filter(keep)

    def drop_null_seeds(t: pa.Table) -> pa.Table:
        # same policy as drop_null_edges: a null seed is malformed, not a
        # node.  Without this the local path's pd.factorize maps the null
        # to code -1 and dist[cseed]=0 silently seeds the LAST factorized
        # node (numpy -1 indexing), corrupting the whole walk.
        return t.filter(pc.is_valid(t[node_col]))

    seeds_ds = seeds_ds.select_columns([node_col]).map_batches(
        drop_null_seeds, batch_format="pyarrow")

    edges = edges_ds.select_columns([src_col, dst_col]) \
        .map_batches(drop_null_edges, batch_format="pyarrow") \
        .materialize()

    if edges.count() <= local_edge_limit:
        import ray.data as _rd

        et = pa.concat_tables(
            [b for b in edges.iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
        ) if edges.count() else pa.table(
            {src_col: pa.array([], node_t), dst_col: pa.array([], node_t)})
        st = pa.concat_tables(
            [b for b in seeds_ds.select_columns([node_col]).iter_batches(
                batch_size=None, batch_format="pyarrow")]
        ) if seeds_ds.count() else pa.table(
            {node_col: pa.array([], node_t)})
        s = et[src_col].to_numpy(zero_copy_only=False)
        d = et[dst_col].to_numpy(zero_copy_only=False)
        sd = st[node_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(np.concatenate([s, d, sd]))
        cs, cd = codes[: len(s)], codes[len(s): len(s) + len(d)]
        cseed = np.unique(codes[len(s) + len(d):])
        dist = np.full(len(uniq), -1, np.int64)
        dist[cseed] = 0
        frontier = cseed
        for h in range(1, max_hops + 1):
            if len(frontier) == 0:
                break
            on = np.zeros(len(uniq), bool)
            on[frontier] = True
            new = np.unique(cd[on[cs]])
            new = new[dist[new] < 0]
            if len(new) == 0:
                break
            dist[new] = h
            frontier = new
        hit = dist >= 0
        vals = np.asarray(uniq)[hit]
        return _rd.from_arrow(pa.table({
            node_col: pa.array(vals).cast(node_t),
            "dist": pa.array(dist[hit], pa.int64()),
        }))

    seeds = exchange_group_apply(
        seeds_ds.select_columns([node_col]), node_col, dedup_nodes,
        num_partitions,
    ).materialize()

    def with_dist(h):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                node_col: t[node_col],
                "dist": pa.array(
                    np.full(t.num_rows, h, np.int64), pa.int64()),
            })
        return f

    levels = [seeds.map_batches(with_dist(0), batch_format="pyarrow")
              .materialize()]
    settled = seeds
    frontier = seeds
    for h in range(1, max_hops + 1):
        as_src = frontier.map_batches(
            lambda t: t.rename_columns([src_col]), batch_format="pyarrow")
        reached = exchange_join(
            as_src, edges, on=src_col, num_partitions=num_partitions,
            post=lambda t: pa.table(
                {node_col: t[dst_col]} if dst_col in t.column_names
                else {node_col: pa.array([], node_t)}),
            empty_schema=pa.schema([(node_col, node_t)]),
        )
        reached = exchange_group_apply(
            reached, node_col, dedup_nodes, num_partitions)
        new = anti_join(
            reached, settled, on=node_col, cols=[node_col],
            num_partitions=num_partitions,
        ).materialize()
        if new.count() == 0:
            break
        levels.append(new.map_batches(with_dist(h), batch_format="pyarrow")
                      .materialize())
        settled = settled.union(new).materialize()
        frontier = new
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def bipartite_project(edges_ds, src_col: str = "src", dst_col: str = "dst",
                      max_degree: int | None = 64,
                      num_partitions: int = 16):
    """Bipartite projection: (src → dst) edges become a weighted
    dst–dst co-occurrence graph — hosts co-linked by the same documents
    (co-citation), tokens co-occurring in the same docs, products in the
    same baskets.  The host-similarity pass downstream of the outbound
    link extractor.

    One exchange on ``src`` co-locates each source's neighbor set; its
    sorted-unique pairs (``dst1 < dst2``) are emitted vectorized per
    partition (per-src work is C(deg, 2) — ``max_degree`` is the same
    skew cap as ``triangle_count``: a source's neighbor list truncates
    to its smallest ``max_degree`` dsts, an explicit undercount trade
    for bounded tasks on hub sources); a second grouped-sum exchange
    counts each pair's common sources.  Output:
    ``(dst1, dst2, n_common)``.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply

    dst_t = edges_ds.schema().base_schema.field(dst_col).type

    def per_src(part: pa.Table) -> pa.Table:
        empty = pa.table({"dst1": pa.array([], dst_t),
                          "dst2": pa.array([], dst_t),
                          "c": pa.array([], pa.int64())})
        if part.num_rows == 0 or src_col not in part.column_names:
            return empty
        df = part.select([src_col, dst_col]).to_pandas() \
            .drop_duplicates().sort_values([src_col, dst_col],
                                           kind="stable")
        s = df[src_col].to_numpy()
        d = df[dst_col].to_numpy()
        new = np.r_[True, s[1:] != s[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(s)]
        o1, o2 = [], []
        for a, b in zip(starts, ends):
            nb = d[a:b]
            if max_degree is not None and len(nb) > max_degree:
                nb = nb[:max_degree]  # sorted: smallest dsts kept
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            o1.append(nb[i])
            o2.append(nb[j])
        if not o1:
            return empty
        d1 = np.concatenate(o1)
        d2 = np.concatenate(o2)
        t = pa.table({"dst1": pa.array(d1, dst_t),
                      "dst2": pa.array(d2, dst_t),
                      "one": pa.array(np.ones(len(d1), np.int64))})
        g = t.group_by(["dst1", "dst2"]).aggregate([("one", "sum")])
        return g.rename_columns(["dst1", "dst2", "c"])

    pairs = exchange_group_apply(edges_ds, src_col, per_src,
                                 num_partitions)

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "dst1" not in part.column_names:
            return pa.table({"dst1": pa.array([], dst_t),
                             "dst2": pa.array([], dst_t),
                             "n_common": pa.array([], pa.int64())})
        g = part.group_by(["dst1", "dst2"]).aggregate([("c", "sum")])
        return pa.table({"dst1": g["dst1"], "dst2": g["dst2"],
                         "n_common": pc.cast(g["c_sum"], pa.int64())})

    return exchange_group_apply(pairs, ["dst1", "dst2"], final,
                                num_partitions)


def label_propagation(edges_ds, rounds: int = 4, a_col: str = "a",
                      b_col: str = "b", num_partitions: int = 16):
    """Deterministic synchronous label propagation (Raghavan et al.
    2007, deterministic variant): community detection one step softer
    than connected components — dense groups converge to one label while
    weak bridges between them do not force a merge the way CC does.

    Semantics (stated exactly so a fixed-round SQL unroll is the oracle):
    edges are undirected (symmetrized internally, multiplicity kept);
    every node starts with its own id as label; each synchronous round a
    node adopts the most frequent label among its neighbors' CURRENT
    labels plus ONE self-vote for its own current label, ties broken by
    the smallest label.  A converged round is a fixed point, so replaying
    exactly ``rounds`` rounds is deterministic whether or not convergence
    came earlier.

    Per round: ONE co-partitioned join of the label table against the
    static symmetrized edge stream (keyed on the source endpoint) and one
    grouped vote — counts are vectorized per partition over ALL nodes
    (pandas groupby, no per-node dispatch).  Label state is one row per
    node, never on the driver.  Output: ``(node, label)``.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    node_t = edges_ds.schema().base_schema.field(a_col).type

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([
                t[a_col].combine_chunks().cast(node_t),
                t[b_col].combine_chunks().cast(node_t)]),
            "dst": pa.concat_arrays([
                t[b_col].combine_chunks().cast(node_t),
                t[a_col].combine_chunks().cast(node_t)]),
        })

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()

    def init_labels(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "src" not in part.column_names:
            return pa.table({"node": pa.array([], node_t),
                             "label": pa.array([], node_t)})
        u = pc.unique(part["src"].combine_chunks())
        return pa.table({"node": u, "label": u})

    labels = exchange_group_apply(edges, "src", init_labels,
                                  num_partitions).materialize()

    def vote(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "node" not in part.column_names:
            return pa.table({"node": pa.array([], node_t),
                             "label": pa.array([], node_t)})
        df = part.select(["node", "label"]).to_pandas()
        c = df.groupby(["node", "label"], sort=False).size() \
              .reset_index(name="c")
        c = c.sort_values(["node", "c", "label"],
                          ascending=[True, False, True], kind="stable")
        first = c.drop_duplicates("node")
        return pa.table({
            "node": pa.array(first["node"].to_numpy(), node_t),
            "label": pa.array(first["label"].to_numpy(), node_t),
        })

    msg_schema = pa.schema([("node", node_t), ("label", node_t)])
    for _ in range(rounds):
        as_src = labels.map_batches(
            lambda t: t.rename_columns(["src", "label"]),
            batch_format="pyarrow")
        msgs = exchange_join(
            as_src, edges, on="src", num_partitions=num_partitions,
            post=lambda t: pa.table(
                {"node": t["dst"], "label": t["label"]}
                if "dst" in t.column_names
                else {"node": pa.array([], node_t),
                      "label": pa.array([], node_t)}),
            empty_schema=msg_schema,
        )
        labels = exchange_group_apply(
            msgs.union(labels), "node", vote, num_partitions,
        ).materialize()
    return labels


def reciprocal_edges(edges_ds, src_col: str = "src", dst_col: str = "dst",
                     weight_col: str | None = None,
                     num_partitions: int = 16):
    """Mutual-edge detection: pairs linked in BOTH directions.

    Reciprocal host links are a classic link-farm / mirror-ring signal
    (organic web links are overwhelmingly one-way; a dense mutual core is
    machine-made), and the mutual subgraph is the usual input to
    mirror-site collapse.  Orientation trick: key every edge by its
    UNORDERED pair (``least, greatest``) with a direction bit, so one
    hash exchange co-locates both directions; a vectorized per-partition
    groupby keeps pairs whose two direction-sums are both positive.
    Self-loops are excluded (no direction to reciprocate).  Output:
    ``(a, b, w_ab, w_ba)`` with ``a < b``.
    """
    import numpy as np
    import pandas as pd

    from dedup_ray.util.exchange import exchange_group_apply

    def orient(t: pa.Table) -> pa.Table:
        s, d = t[src_col], t[dst_col]
        lo, hi = pc.min_element_wise(s, d), pc.max_element_wise(s, d)
        fwd = pc.cast(pc.equal(s, lo), pa.int64())  # 1 = low->high
        w = (pc.cast(t[weight_col], pa.float64()) if weight_col
             else pa.array(np.ones(t.num_rows)))
        keep = pc.not_equal(s, d)
        return pa.table({"a": lo, "b": hi, "fwd": fwd, "w": w}).filter(keep)

    def reduce(part: pa.Table) -> pa.Table:
        key_t = (part.schema.field("a").type if "a" in part.column_names
                 else pa.string())
        schema = pa.schema([("a", key_t), ("b", key_t),
                            ("w_ab", pa.float64()), ("w_ba", pa.float64())])
        if part.num_rows == 0:
            return schema.empty_table()
        df = part.to_pandas()
        df["w_ab"] = df["w"] * df["fwd"]
        df["w_ba"] = df["w"] * (1 - df["fwd"])
        g = df.groupby(["a", "b"], sort=False)[["w_ab", "w_ba"]].sum()
        g = g[(g["w_ab"] > 0) & (g["w_ba"] > 0)].reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).cast(schema)

    oriented = edges_ds.map_batches(orient, batch_format="pyarrow")
    return exchange_group_apply(oriented, ["a", "b"], reduce,
                                num_partitions=num_partitions)


def random_walks(edges_ds, n_steps: int = 4, seed: str = "walk",
                 num_partitions: int = 8):
    """Deterministic random walks over an edge stream — the corpus
    generator for DeepWalk/node2vec-style graph embeddings, replayable
    bit-for-bit: at step ``t`` a walk at node ``u`` moves to the
    neighbor whose dst-sorted rank is ``md5(f"{seed}:{u}:{t}")[:8] %
    deg(u)``.  Same-node-same-step walks move together; a dead-end node
    ends the walk (inner join drops it).

    One exchange per step: the walk frontier (one row per live walk)
    co-partitions with the edge table on the current node, the reduce
    picks each walk's ranked neighbor vectorized (rank via grouped
    cumcount, pick via merge).  Frontier volume = #walks, never edges;
    the edge table is re-split per step (at scale, pre-partition the
    edges once with ``return_refs=True`` and reuse).  Starts = every
    distinct src.  Returns ``(walk_id, step, node)`` for steps 1..n.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import hash_exchange
    from dedup_ray.util.hashing import content_digest

    def dedupe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        df = t.select(["src", "dst"]).to_pandas().drop_duplicates()
        return pa.table({"src": pa.array(df["src"], pa.string()),
                         "dst": pa.array(df["dst"], pa.string())})

    edges = hash_exchange([edges_ds], ["src"], dedupe,
                          num_partitions=num_partitions)

    def starts(t: pa.Table) -> pa.Table:
        u = pc.unique(t["src"])
        return pa.table({"walk_id": u, "node": u})

    frontier = edges.map_batches(starts, batch_format="pyarrow")
    out_steps = []
    for t_step in range(1, n_steps + 1):
        def step(fr: pa.Table, ed: pa.Table, t_step=t_step) -> pa.Table:
            empty = pa.table({"walk_id": pa.array([], pa.string()),
                              "node": pa.array([], pa.string())})
            if fr.num_rows == 0 or ed.num_rows == 0:
                return empty
            edf = ed.select(["src", "dst"]).to_pandas().drop_duplicates()
            edf = edf.sort_values(["src", "dst"], kind="mergesort")
            edf["rk"] = edf.groupby("src", sort=False).cumcount()
            deg = edf.groupby("src", sort=False)["dst"].size()
            fdf = fr.select(["walk_id", "node"]).to_pandas()
            fdf = fdf[fdf["node"].isin(deg.index)]
            if len(fdf) == 0:
                return empty
            d = deg.loc[fdf["node"]].to_numpy()
            dg = content_digest(
                [f"{seed}:{n}:{t_step}" for n in fdf["node"]], algo="md5")
            fdf = fdf.assign(
                rk=np.array([int(h[:8], 16) for h in dg], np.int64) % d)
            got = fdf.merge(edf, left_on=["node", "rk"],
                            right_on=["src", "rk"])
            return pa.table({
                "walk_id": pa.array(got["walk_id"], pa.string()),
                "node": pa.array(got["dst"], pa.string())})

        frontier = hash_exchange([frontier, edges], ["node", "src"], step,
                                 num_partitions=num_partitions)
        out_steps.append(frontier.map_batches(
            lambda t, s=t_step: t.append_column(
                "step", pa.array([s] * t.num_rows, pa.int64())),
            batch_format="pyarrow"))

    out = out_steps[0]
    for nxt in out_steps[1:]:
        out = out.union(nxt)
    return out.select_columns(["walk_id", "step", "node"])


def maximal_independent_set(edges_ds, seed: str = "mis",
                            num_partitions: int = 8,
                            max_rounds: int = 64):
    """Deterministic Luby MIS: a maximal independent vertex set — no two
    selected vertices adjacent, every unselected vertex adjacent to a
    selected one.  The distributed primitive for "pick non-conflicting
    representatives" (one keeper per overlapping near-dup neighborhood,
    non-adjacent seeds for clustering, conflict-free schedules).

    Luby's algorithm (1986) with md5 priorities instead of per-round
    RNG, so the output is a pure function of the graph: each round every
    live vertex whose priority ``md5(f"{seed}:{v}")`` (hex16; node id
    breaks the measure-zero tie) beats all live neighbors joins the MIS
    and its closed neighborhood dies.  O(log n) rounds w.h.p.; each
    round is a constant number of exchanges (attach neighbor
    priorities → per-vertex min → winner filter → neighborhood
    removal), frontier-sized, never corpus-sized.  Edges are treated
    as undirected.  Returns ``(node, mis_round)``.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_join, hash_exchange
    from dedup_ray.util.hashing import content_digest

    def undirect(t: pa.Table) -> pa.Table:
        a = pc.cast(t["src"], pa.string())
        b = pc.cast(t["dst"], pa.string())
        tt = pa.table({"u": pa.concat_arrays([a.combine_chunks()
                                              if isinstance(a, pa.ChunkedArray)
                                              else a,
                                              b.combine_chunks()
                                              if isinstance(b, pa.ChunkedArray)
                                              else b]),
                       "v": pa.concat_arrays([b.combine_chunks()
                                              if isinstance(b, pa.ChunkedArray)
                                              else b,
                                              a.combine_chunks()
                                              if isinstance(a, pa.ChunkedArray)
                                              else a])})
        return tt.filter(pc.not_equal(tt["u"], tt["v"]))

    def dedupe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], pa.string()),
                             "v": pa.array([], pa.string())})
        df = t.select(["u", "v"]).to_pandas().drop_duplicates()
        return pa.table({"u": pa.array(df["u"], pa.string()),
                         "v": pa.array(df["v"], pa.string())})

    edges = hash_exchange([edges_ds.map_batches(undirect,
                                                batch_format="pyarrow")],
                          ["u"], dedupe, num_partitions=num_partitions)

    def vertices(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "pri": pa.array([], pa.string())})
        u = pc.unique(t["u"]).to_pylist()
        pri = [d[:16] for d in content_digest(
            [f"{seed}:{n}" for n in u], algo="md5")]
        return pa.table({"node": pa.array(u, pa.string()),
                         "pri": pa.array(pri, pa.string())})

    alive = hash_exchange([edges], ["u"], lambda t: vertices(t),
                          num_partitions=num_partitions)

    _ALIVE = pa.schema([("node", pa.string()), ("pri", pa.string())])
    _EDGE = pa.schema([("u", pa.string()), ("v", pa.string())])
    _WIN = pa.schema([("node", pa.string()), ("mis_round", pa.int64())])

    mis_parts: list = []
    for rnd in range(1, max_rounds + 1):
        if alive.count() == 0:
            break
        # neighbor priorities: edges (u, v) ⋈ alive(v) → per-u min pri
        ev = edges.map_batches(
            lambda t: t.rename_columns(["u", "node"]),
            batch_format="pyarrow")
        withpri = exchange_join(ev, alive, on="node",
                                num_partitions=num_partitions,
                                empty_schema=pa.schema(
                                    [("u", pa.string()),
                                     ("node", pa.string()),
                                     ("pri", pa.string())]))

        def minpri(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], pa.string()),
                                 "nbr_min": pa.array([], pa.string())})
            g = t.select(["u", "pri"]).group_by("u").aggregate(
                [("pri", "min")])
            return g.rename_columns(["node", "nbr_min"])

        nbrmin = hash_exchange([withpri], ["u"], minpri,
                               num_partitions=num_partitions)

        def winners_fn(av: pa.Table, nm: pa.Table) -> pa.Table:
            if av.num_rows == 0 or "node" not in av.column_names:
                return _WIN.empty_table()
            import pandas as pd

            adf = av.select(["node", "pri"]).to_pandas()
            if nm.num_rows and "node" in nm.column_names:
                ndf = nm.select(["node", "nbr_min"]).to_pandas()
                adf = adf.merge(ndf, on="node", how="left")
            else:
                adf["nbr_min"] = None
            # win on (pri, node) < (nbr_min, ·): hex16 strings compare
            # numerically; a vertex with NO live neighbor wins outright
            win = adf["nbr_min"].isna() | (adf["pri"] < adf["nbr_min"])
            w = adf.loc[win, ["node"]]
            return pa.table({"node": pa.array(w["node"], pa.string()),
                             "mis_round": pa.array(
                                 np.full(len(w), rnd, np.int64))})

        winners = hash_exchange([alive, nbrmin], ["node", "node"],
                                winners_fn, num_partitions=num_partitions)
        mis_parts.append(winners)

        # closed neighborhood of winners dies: neighbors...
        wn = winners.map_batches(
            lambda t: t.select(["node"]) if "node" in t.column_names
            else pa.table({"node": pa.array([], pa.string())}),
            batch_format="pyarrow")
        ew = edges.map_batches(
            lambda t: t.rename_columns(["node", "v"]),
            batch_format="pyarrow")
        dead_nbrs = exchange_join(
            ew, wn, on="node", how="semi",
            num_partitions=num_partitions,
            empty_schema=pa.schema([("node", pa.string()),
                                    ("v", pa.string())])
        ).map_batches(
            lambda t: pa.table({"node": (t["v"] if "v" in t.column_names
                                         else pa.array([], pa.string()))}),
            batch_format="pyarrow")
        dead = wn.union(dead_nbrs)
        alive = exchange_join(alive, dead, on="node", how="anti",
                              num_partitions=num_partitions,
                              empty_schema=_ALIVE)
        # keep only edges with both ends alive (neighbor mins must see
        # live vertices only)
        e1 = exchange_join(
            edges.map_batches(lambda t: t.rename_columns(["node", "v"]),
                              batch_format="pyarrow"),
            alive, on="node", how="semi", num_partitions=num_partitions,
            empty_schema=pa.schema([("node", pa.string()),
                                    ("v", pa.string())]))
        e2 = exchange_join(
            e1.map_batches(lambda t: t.rename_columns(["u", "node"]),
                           batch_format="pyarrow"),
            alive, on="node", how="semi", num_partitions=num_partitions,
            empty_schema=pa.schema([("u", pa.string()),
                                    ("node", pa.string())]))
        edges = e2.map_batches(lambda t: t.rename_columns(["u", "v"]),
                               batch_format="pyarrow")

    out = mis_parts[0]
    for nxt in mis_parts[1:]:
        out = out.union(nxt)

    def clean(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return _WIN.empty_table()
        return t.select(["node", "mis_round"])

    return out.map_batches(clean, batch_format="pyarrow")


def strongly_connected_components(edges_ds, num_partitions: int = 8,
                                  seed: str = "scc", max_outer: int = 64,
                                  max_inner: int = 256,
                                  local_edge_limit: int = 2_000_000):
    """Distributed SCC via the coloring algorithm (Orzan 2004 / the
    FW-BW family): the DIRECTED counterpart of the flagship's CC —
    mutual-reachability clusters for redirect rings, mirror loops and
    link farms, where weak connectivity over-merges.

    Outer round (each removes ≥ 1 whole SCC):
      1. FORWARD fixpoint: every live vertex carries a color =
         the max md5-priority vertex that reaches it (color(v) =
         max(own, colors of in-neighbors)); propagate until no vertex
         changes — each step is one frontier exchange.
      2. Each color class's ROOT (the vertex whose priority IS the
         color) can reach the whole class; the SCC of the root is the
         subset that reaches BACK to it inside its color class:
         BACKWARD BFS from roots along same-color edges.
      3. Emit (node, scc_root) for reached vertices, remove them,
         filter edges, repeat.

    Deterministic (md5 priorities), vertex-state exchanges only (no
    corpus-sized driver state); worst case (a path graph) degenerates
    to O(n) rounds like every label-propagation SCC — the documented
    trade vs. Tarjan, which cannot be distributed.  Returns
    ``(node, scc_id)`` with ``scc_id`` = the root vertex's id.
    """
    import pandas as pd
    import pyarrow.compute as pc

    import ray.data

    from dedup_ray.util.exchange import exchange_join, hash_exchange
    from dedup_ray.util.hashing import content_digest

    # Local fast path (the cc_local convention): under the edge cap the
    # whole digraph fits one task trivially, and iterative Tarjan is
    # O(V+E) where the coloring rounds pay ~8 sequential exchange
    # launches of fixed latency each.  scc_id = the max-md5-priority
    # member — IDENTICAL to the distributed root election, verified by
    # the forced-distributed parity test.
    if edges_ds.count() <= local_edge_limit:
        pairs = [(str(r["src"]), str(r["dst"]))
                 for r in edges_ds.take_all()]
        return ray.data.from_arrow(_scc_local_table(pairs, seed))

    _E = pa.schema([("src", pa.string()), ("dst", pa.string())])
    _C = pa.schema([("node", pa.string()), ("cpri", pa.string()),
                    ("croot", pa.string())])
    _OUT = pa.schema([("node", pa.string()), ("scc_id", pa.string())])

    def dedupe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _E.empty_table()
        df = t.select(["src", "dst"]).to_pandas().drop_duplicates()
        df = df[df["src"] != df["dst"]]
        return pa.table({"src": pa.array(df["src"], pa.string()),
                         "dst": pa.array(df["dst"], pa.string())})

    def to_str(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t["src"], pa.string()),
                         "dst": pc.cast(t["dst"], pa.string())})

    edges = hash_exchange(
        [edges_ds.map_batches(to_str, batch_format="pyarrow")],
        ["src"], dedupe, num_partitions=num_partitions)

    def init_color(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _C.empty_table()
        u = sorted(set(t["src"].to_pylist()) | set(t["dst"].to_pylist()))
        pri = [d[:16] for d in content_digest(
            [f"{seed}:{n}" for n in u], algo="md5")]
        return pa.table({"node": pa.array(u, pa.string()),
                         "cpri": pa.array(pri, pa.string()),
                         "croot": pa.array(u, pa.string())})

    # vertices must dedupe GLOBALLY (a node may appear in many blocks)
    both = edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t["src"].combine_chunks(), t["dst"].combine_chunks()])}),
        batch_format="pyarrow")

    def uniq_nodes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _C.empty_table()
        u = sorted(set(t["node"].to_pylist()))
        pri = [d[:16] for d in content_digest(
            [f"{seed}:{n}" for n in u], algo="md5")]
        return pa.table({"node": pa.array(u, pa.string()),
                         "cpri": pa.array(pri, pa.string()),
                         "croot": pa.array(u, pa.string())})

    alive = hash_exchange([both], ["node"], uniq_nodes,
                          num_partitions=num_partitions)
    out_parts: list = []

    for _outer in range(max_outer):
        if alive.count() == 0:
            break
        color = alive

        # --- 1. forward color fixpoint -------------------------------
        for _inner in range(max_inner):
            # messages: color(src) flows along src -> dst
            ev = edges.map_batches(
                lambda t: t.rename_columns(["node", "dst"]),
                batch_format="pyarrow")
            msgs = exchange_join(
                ev, color, on="node", num_partitions=num_partitions,
                empty_schema=pa.schema([("node", pa.string()),
                                        ("dst", pa.string()),
                                        ("cpri", pa.string()),
                                        ("croot", pa.string())])
            ).map_batches(
                lambda t: pa.table({
                    "node": t["dst"] if "dst" in t.column_names
                    else pa.array([], pa.string()),
                    "mpri": t["cpri"] if "cpri" in t.column_names
                    else pa.array([], pa.string()),
                    "mroot": t["croot"] if "croot" in t.column_names
                    else pa.array([], pa.string())}),
                batch_format="pyarrow")

            def merge_color(cv: pa.Table, mv: pa.Table) -> pa.Table:
                if cv.num_rows == 0 or "node" not in cv.column_names:
                    return pa.schema([("node", pa.string()),
                                      ("cpri", pa.string()),
                                      ("croot", pa.string()),
                                      ("changed", pa.int64())]).empty_table()
                cdf = cv.select(["node", "cpri", "croot"]).to_pandas()
                if mv.num_rows and "node" in mv.column_names:
                    mdf = mv.to_pandas()
                    best = mdf.sort_values(["node", "mpri"]) \
                        .groupby("node", sort=False).tail(1)
                    cdf = cdf.merge(best, on="node", how="left")
                else:
                    cdf["mpri"] = None
                    cdf["mroot"] = None
                take = cdf["mpri"].notna() & (cdf["mpri"] > cdf["cpri"])
                cdf.loc[take, "cpri"] = cdf.loc[take, "mpri"]
                cdf.loc[take, "croot"] = cdf.loc[take, "mroot"]
                return pa.table({
                    "node": pa.array(cdf["node"], pa.string()),
                    "cpri": pa.array(cdf["cpri"], pa.string()),
                    "croot": pa.array(cdf["croot"], pa.string()),
                    "changed": pa.array(take.to_numpy().astype(np.int64)),
                })

            merged = hash_exchange([color, msgs], ["node", "node"],
                                   merge_color,
                                   num_partitions=num_partitions)
            merged = merged.materialize()
            n_changed = merged.sum("changed") or 0
            color = merged.drop_columns(["changed"])
            if n_changed == 0:
                break

        # --- 2. backward reach from roots inside color classes -------
        def roots(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.schema([("node", pa.string()),
                                  ("croot", pa.string())]).empty_table()
            m = pc.equal(t["node"], t["croot"])
            return t.filter(m).select(["node", "croot"])

        visited = color.map_batches(roots, batch_format="pyarrow")
        # backward frontier loop: u joins the visited set when some edge
        # u -> v has v visited AND color(u) == color(v); the target's
        # root rides the frontier join so the check stays co-partitioned
        for _inner in range(max_inner):
            ev = edges.map_batches(
                lambda t: t.rename_columns(["src", "node"]),
                batch_format="pyarrow")
            into_visited = exchange_join(
                ev, visited, on="node", num_partitions=num_partitions,
                empty_schema=pa.schema([("src", pa.string()),
                                        ("node", pa.string()),
                                        ("croot", pa.string())]))
            cand = into_visited.map_batches(
                lambda t: pa.table({
                    "node": t["src"] if "src" in t.column_names
                    else pa.array([], pa.string()),
                    "vroot": t["croot"] if "croot" in t.column_names
                    else pa.array([], pa.string())}),
                batch_format="pyarrow")

            def grow(cd: pa.Table, cl: pa.Table, vis: pa.Table) -> pa.Table:
                empty = pa.schema([("node", pa.string()),
                                   ("croot", pa.string())]).empty_table()
                if cd.num_rows == 0 or "node" not in cd.column_names:
                    return empty
                cdf = cd.to_pandas().drop_duplicates()
                cldf = cl.select(["node", "croot"]).to_pandas() \
                    if cl.num_rows and "node" in cl.column_names \
                    else pd.DataFrame(columns=["node", "croot"])
                seen = set(vis["node"].to_pylist()) \
                    if vis.num_rows and "node" in vis.column_names else set()
                cdf = cdf.merge(cldf, on="node", how="inner")
                cdf = cdf[cdf["croot"] == cdf["vroot"]]
                cdf = cdf[~cdf["node"].isin(seen)]
                cdf = cdf.drop_duplicates(subset=["node"])
                return pa.table({
                    "node": pa.array(cdf["node"], pa.string()),
                    "croot": pa.array(cdf["croot"], pa.string())})

            new = hash_exchange([cand, color, visited],
                                ["node", "node", "node"], grow,
                                num_partitions=num_partitions)
            new = new.materialize()
            if new.count() == 0:
                break
            visited = visited.union(new).materialize()

        out_parts.append(visited.map_batches(
            lambda t: pa.table({
                "node": t["node"] if "node" in t.column_names
                else pa.array([], pa.string()),
                "scc_id": t["croot"] if "croot" in t.column_names
                else pa.array([], pa.string())}),
            batch_format="pyarrow").materialize())

        # remove the finished SCCs; filter edges to survivors.  Colors
        # RESET for the next round: cpri must be the vertex's OWN md5
        # priority again, not the propagated max (keeping the propagated
        # value would make every survivor its own root next round and
        # shatter the remaining SCCs into singletons).
        def reset_color(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return _C.empty_table()
            nodes_ = t["node"].to_pylist()
            pri = [d[:16] for d in content_digest(
                [f"{seed}:{n}" for n in nodes_], algo="md5")]
            return pa.table({"node": pa.array(nodes_, pa.string()),
                             "cpri": pa.array(pri, pa.string()),
                             "croot": pa.array(nodes_, pa.string())})

        alive = exchange_join(
            color.map_batches(reset_color, batch_format="pyarrow"),
            visited, on="node", how="anti",
            num_partitions=num_partitions, empty_schema=_C).materialize()
        e1 = exchange_join(
            edges.map_batches(lambda t: t.rename_columns(["node", "dst"]),
                              batch_format="pyarrow"),
            alive, on="node", how="semi", num_partitions=num_partitions,
            empty_schema=pa.schema([("node", pa.string()),
                                    ("dst", pa.string())]))
        e2 = exchange_join(
            e1.map_batches(lambda t: t.rename_columns(["src", "node"]),
                           batch_format="pyarrow"),
            alive, on="node", how="semi", num_partitions=num_partitions,
            empty_schema=pa.schema([("src", pa.string()),
                                    ("node", pa.string())]))
        edges = e2.map_batches(lambda t: t.rename_columns(["src", "dst"]),
                               batch_format="pyarrow").materialize()

    if not out_parts:
        return ray_empty(_OUT)
    out = out_parts[0]
    for nxt in out_parts[1:]:
        out = out.union(nxt)

    def clean(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return _OUT.empty_table()
        return t.select(["node", "scc_id"])

    return out.map_batches(clean, batch_format="pyarrow")


def ray_empty(schema: pa.Schema):
    import ray.data

    return ray.data.from_arrow(schema.empty_table())


def _argmax_dist(bfs_ds, node_col: str = "node", dist_col: str = "dist"):
    """(max dist, node achieving it with smallest id) via per-batch
    partial maxima + a driver combine over ≤ n_batches rows."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({node_col: pa.array([], pa.int64()),
                             dist_col: pa.array([], pa.int64())})
        d = t[dist_col].to_numpy(zero_copy_only=False)
        n = t[node_col].to_numpy(zero_copy_only=False)
        best = d.max()
        cand = n[d == best]
        return pa.table({node_col: pa.array([int(cand.min())], pa.int64()),
                         dist_col: pa.array([int(best)], pa.int64())})

    parts = bfs_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return None, None
    best = parts[dist_col].max()
    node = parts[parts[dist_col] == best][node_col].min()
    return int(best), int(node)


def diameter_double_sweep(edges_ds, src_col: str = "src",
                          dst_col: str = "dst", max_hops: int = 24,
                          num_partitions: int = 16):
    """Diameter lower bound by the classic double-sweep BFS (Magnien,
    Latapy & Habib 2009): BFS from the minimum node id, then BFS from
    the farthest node found — that second eccentricity is a tight
    diameter lower bound on most real graphs at the cost of two BFS
    passes instead of all-pairs.

    Edges are taken as given (symmetrize upstream for undirected
    semantics).  Both sweeps are :func:`multi_source_bfs` frontier
    expansions (each node crosses the exchanges once per sweep); the
    start node, the peak pick (max dist, tie → min node) and the hop
    cap are all deterministic, so a fixed-hop SQL replay reproduces the
    result exactly.  Driver state: per-batch partial maxima, never the
    distance table.  Output: one row ``(start_node, peak_node,
    diameter_lb)``.
    """
    import ray.data

    edges = edges_ds.select_columns([src_col, dst_col]).materialize()

    def min_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        s = t[src_col].to_numpy(zero_copy_only=False)
        d = t[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array(
            [int(min(s.min(), d.min()))], pa.int64())})

    mins = edges.map_batches(min_partial, batch_format="pyarrow") \
        .to_pandas()
    if mins.empty:
        return ray.data.from_arrow(pa.table({
            "start_node": pa.array([], pa.int64()),
            "peak_node": pa.array([], pa.int64()),
            "diameter_lb": pa.array([], pa.int64())}))
    start = int(mins["m"].min())

    def seed_ds(node: int):
        return ray.data.from_arrow(
            pa.table({"node": pa.array([node], pa.int64())}))

    bfs1 = multi_source_bfs(edges, seed_ds(start), src_col=src_col,
                            dst_col=dst_col, max_hops=max_hops,
                            num_partitions=num_partitions)
    _, peak = _argmax_dist(bfs1)
    bfs2 = multi_source_bfs(edges, seed_ds(peak), src_col=src_col,
                            dst_col=dst_col, max_hops=max_hops,
                            num_partitions=num_partitions)
    ecc, _ = _argmax_dist(bfs2)
    return ray.data.from_arrow(pa.table({
        "start_node": pa.array([start], pa.int64()),
        "peak_node": pa.array([peak], pa.int64()),
        "diameter_lb": pa.array([ecc], pa.int64())}))


def link_predict(edges_ds, a_col: str = "a", b_col: str = "b",
                 max_degree: int | None = None, num_partitions: int = 16):
    """Link prediction over an undirected graph: common-neighbor count
    and Adamic–Adar score (Liben-Nowell & Kleinberg 2003; Adamic & Adar
    2003) for every NON-adjacent pair with at least one common neighbor
    — the "which hosts will interlink / which entities co-refer next"
    ranker next to the co-citation projection.

    Wedge-centric, same shape as :func:`triangle_count`: one exchange on
    the center node co-locates each node's DISTINCT neighbor set (degree
    taken from the full set); each center emits its C(deg, 2) neighbor
    pairs ``u < v`` carrying weight ``1/ln(deg)`` — constant per degree
    class, so emission is fully vectorized per class — pre-aggregated
    per partition, then a grouped-sum exchange on the packed ``(u, v)``
    key totals ``cn`` and ``aa``; finally existing edges are struck with
    a packed-key anti join so only genuinely absent links score.
    ``max_degree`` is the hub skew cap (same policy as
    ``triangle_count``): pair emission per center truncates to its
    ``max_degree`` smallest-id neighbors (documented undercount); the
    AA weight keeps the TRUE degree either way.  Node ids must be
    non-negative ints < 2^32 (packed-key assumption, as
    ``triangle_count``).  Output: ``(u, v, cn, aa)`` with ``aa``
    rounded to 6 decimals.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    def pack(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return (x.astype(np.int64) << np.int64(32)) | y.astype(np.int64)

    def symm(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"node": pa.array(np.r_[a, b]),
                         "nb": pa.array(np.r_[b, a])})

    sym = edges_ds.map_batches(symm, batch_format="pyarrow")

    empty = pa.table({"uv": pa.array([], pa.int64()),
                      "cn": pa.array([], pa.int64()),
                      "aa": pa.array([], pa.float64())})

    def wedges(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "node" not in part.column_names:
            return empty
        z = part["node"].to_numpy(zero_copy_only=False)
        nb = part["nb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, z))
        z, nb = z[order], nb[order]
        dup = np.r_[False, (z[1:] == z[:-1]) & (nb[1:] == nb[:-1])]
        z, nb = z[~dup], nb[~dup]  # distinct neighbor sets
        first = np.r_[True, z[1:] != z[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(z)])
        uvs, ws = [], []
        for d in np.unique(lens):
            if d < 2:
                continue
            rows = starts[lens == d]
            m = min(int(d), max_degree) if max_degree is not None \
                else int(d)
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, k=1)
            u = nb[(rows[:, None] + iu[None, :]).reshape(-1)]
            v = nb[(rows[:, None] + ju[None, :]).reshape(-1)]
            uvs.append(pack(u, v))  # nb sorted within group: u < v
            ws.append(np.full(len(u), 1.0 / np.log(float(d))))
        if not uvs:
            return empty
        t = pa.table({"uv": pa.array(np.concatenate(uvs)),
                      "cn": pa.array(np.ones(sum(map(len, uvs)), np.int64)),
                      "aa": pa.array(np.concatenate(ws))})
        g = t.group_by(["uv"]).aggregate([("cn", "sum"), ("aa", "sum")])
        return g.rename_columns(["uv", "cn", "aa"])

    partial = exchange_group_apply(sym, "node", wedges, num_partitions)

    def total(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "uv" not in part.column_names:
            return empty
        g = part.group_by(["uv"]).aggregate([("cn", "sum"), ("aa", "sum")])
        return g.rename_columns(["uv", "cn", "aa"])

    scored = exchange_group_apply(partial, "uv", total, num_partitions)

    def orient(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"uv": pa.array(pack(np.minimum(a, b),
                                             np.maximum(a, b)))})

    def unpack(t: pa.Table) -> pa.Table:
        uv = t["uv"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(uv >> np.int64(32)),
            "v": pa.array(uv & np.int64(0xFFFFFFFF)),
            "cn": t["cn"],
            "aa": pc.round(t["aa"], ndigits=6),
        })

    non_edges = exchange_join(
        scored, edges_ds.map_batches(orient, batch_format="pyarrow"),
        on="uv", how="anti", num_partitions=num_partitions,
        post=unpack,
        empty_schema=pa.schema([("u", pa.int64()), ("v", pa.int64()),
                                ("cn", pa.int64()),
                                ("aa", pa.float64())]),
    )
    return non_edges


def k_truss(edges_ds, k: int = 4, a_col: str = "a", b_col: str = "b",
            max_rounds: int = 5, num_partitions: int = 16):
    """k-truss decomposition by distributed support peeling (bounded
    rounds): each round computes per-edge SUPPORT (triangles containing
    the edge) with the same wedge-join shape as :func:`triangle_count`
    — wedges carry all THREE edge keys, close against the edge set with
    one semi join, and one count exchange folds supports — then drops
    every edge with support < k−2.  A removal-free round is a no-op, so
    a fixed-round replay (the oracle) produces the identical edge set
    whether or not the fixpoint arrived earlier; ``max_rounds`` bounds
    adversarial cascades (a triangle strip peels one layer per round).

    The truss is the community-robust core: unlike k-core (degree),
    membership requires TRIANGLES, so link farms of stars peel away
    while genuinely clustered hosts survive.  Node ids must fit int32
    (packed (lo,hi) int64 wedge keys — same convention as
    ``triangle_count``); returns the surviving ``(a_col, b_col)`` edges.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    def pack(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return (x.astype(np.int64) << np.int64(32)) | y.astype(np.int64)

    def orient(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False)
        b = t[b_col].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        return pa.table({"a": pa.array(lo, pa.int64()),
                         "b": pa.array(hi, pa.int64()),
                         "ab": pa.array(pack(lo, hi))})

    def dedup(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["ab"])
        return pa.Table.from_pandas(df, preserve_index=False)

    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("ab", pa.int64())])
    edges = exchange_group_apply(
        edges_ds.select_columns([a_col, b_col])
        .map_batches(orient, batch_format="pyarrow"),
        ["ab"], dedup, num_partitions, empty_schema=edge_schema,
    ).materialize()

    wedge_schema = pa.schema([("ab", pa.int64()), ("e1", pa.int64()),
                              ("e2", pa.int64())])

    def wedges(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return wedge_schema.empty_table()
        a = part["a"].to_numpy(zero_copy_only=False)
        b = part["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, a[1:] != a[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(a)])
        roots, xs, ys = [], [], []
        for d in np.unique(lens):
            if d < 2:
                continue
            rows = starts[lens == d]
            iu, ju = np.triu_indices(d, k=1)
            roots.append(a[np.repeat(rows, len(iu))])
            xs.append(b[(rows[:, None] + iu[None, :]).reshape(-1)])
            ys.append(b[(rows[:, None] + ju[None, :]).reshape(-1)])
        if not xs:
            return wedge_schema.empty_table()
        u = np.concatenate(roots)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        return pa.table({"ab": pa.array(pack(x, y)),
                         "e1": pa.array(pack(u, x)),
                         "e2": pa.array(pack(u, y))})

    thresh = k - 2
    for _ in range(max_rounds):
        n_before = edges.count()
        if n_before == 0:
            break
        wedge_ds = exchange_group_apply(
            edges, "a", wedges, num_partitions, empty_schema=edge_schema)
        closed = exchange_join(
            wedge_ds,
            edges.map_batches(lambda t: t.select(["ab"]),
                              batch_format="pyarrow"),
            on="ab", how="semi", num_partitions=num_partitions,
            empty_schema=wedge_schema,
        )

        def sup_emit(t: pa.Table) -> pa.Table:
            keys = pa.concat_arrays([
                t["ab"].combine_chunks(), t["e1"].combine_chunks(),
                t["e2"].combine_chunks(),
            ])
            g = pa.table({"ab": keys}).group_by("ab").aggregate(
                [([], "count_all")])
            return g.rename_columns(["ab", "s"])

        def sup_fold(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return pa.table({"ab": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            g = part.group_by("ab").aggregate([("s", "sum")])
            g = g.rename_columns(["ab", "s"])
            return g.filter(pc.greater_equal(g["s"], thresh))

        strong = exchange_group_apply(
            closed.map_batches(sup_emit, batch_format="pyarrow"),
            ["ab"], sup_fold, num_partitions,
            empty_schema=pa.schema([("ab", pa.int64()),
                                    ("s", pa.int64())]),
        )
        kept = exchange_join(
            edges, strong.map_batches(
                lambda t: t.select(["ab"]), batch_format="pyarrow"),
            on="ab", how="semi", num_partitions=num_partitions,
            empty_schema=edge_schema,
        ).materialize()
        if kept.count() == n_before:
            edges = kept
            break
        edges = kept

    return edges.map_batches(
        lambda t: t.select(["a", "b"]).rename_columns([a_col, b_col]),
        batch_format="pyarrow")


def modularity(edges_ds, labels_ds, a_col: str = "a", b_col: str = "b",
               node_col: str = "node", label_col: str = "label",
               num_partitions: int = 16):
    """Newman modularity ``Q = Σ_c (e_c/m − (d_c/2m)²)`` of a node
    partition over an undirected edge list (self-loops dropped; each
    row one edge): the standard community-quality score for an LPA /
    Louvain-style labeling.  Two label joins tag each edge's endpoints
    (exchange co-partitioning), a narrow per-community fold collects
    intra-edge counts and degree masses, and only the community-bounded
    table reaches the final one-row reduce.  Output:
    ``(q, m, n_communities)`` at 6 dp."""
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_join, exchange_group_apply

    edges = edges_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t[a_col], t[b_col]))
                   .select([a_col, b_col]),
        batch_format="pyarrow",
    ).materialize()
    m = edges.count()

    # materialized: joined against BOTH endpoints — lazy, the caller's
    # label-build chain would execute twice
    lab = labels_ds.select_columns([node_col, label_col]).materialize()
    ea = exchange_join(
        edges, lab.map_batches(
            lambda t: t.rename_columns([a_col, "la"]),
            batch_format="pyarrow"),
        on=a_col, num_partitions=num_partitions,
        empty_schema=pa.schema([(a_col, pa.int64()), (b_col, pa.int64()),
                                ("la", pa.int64())]),
    )
    eab = exchange_join(
        ea, lab.map_batches(
            lambda t: t.rename_columns([b_col, "lb"]),
            batch_format="pyarrow"),
        on=b_col, num_partitions=num_partitions,
        empty_schema=pa.schema([(a_col, pa.int64()), (b_col, pa.int64()),
                                ("la", pa.int64()), ("lb", pa.int64())]),
    )

    # per-community partials: intra-edge count from tagged edges; degree
    # mass from BOTH endpoints' labels (every edge contributes 1 to each
    # endpoint's community degree sum)
    def partial(t: pa.Table) -> pa.Table:
        intra = t.filter(pc.equal(t["la"], t["lb"]))
        gi = pa.table({"label": intra["la"]}).group_by("label") \
            .aggregate([([], "count_all")]).rename_columns(["label", "ec"])
        both = pa.concat_arrays([t["la"].combine_chunks(),
                                 t["lb"].combine_chunks()])
        gd = pa.table({"label": both}).group_by("label") \
            .aggregate([([], "count_all")]).rename_columns(["label", "dc"])
        gi = gi.append_column("dc", pa.array([0] * gi.num_rows, pa.int64()))
        gd = gd.append_column("ec", pa.array([0] * gd.num_rows, pa.int64()))
        return pa.concat_tables([gi.select(["label", "ec", "dc"]),
                                 gd.select(["label", "ec", "dc"])])

    comm_schema = pa.schema([("label", pa.int64()), ("ec", pa.int64()),
                             ("dc", pa.int64())])
    out_schema = pa.schema([("q", pa.float64()), ("m", pa.int64()),
                            ("n_communities", pa.int64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or m == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("label", sort=True).sum()
        q = float((df["ec"] / m - (df["dc"] / (2.0 * m)) ** 2).sum())
        return pa.table({
            "q": pa.array([round(q, 6)], pa.float64()),
            "m": pa.array([m], pa.int64()),
            "n_communities": pa.array([len(df)], pa.int64()),
        })

    # partials are community-bounded per block — one gather suffices
    return exchange_group_apply(
        eab.map_batches(partial, batch_format="pyarrow"), ["label"],
        reduce_fn, num_partitions=1, empty_schema=comm_schema,
    )


def degree_assortativity(edges_ds, a_col: str = "a", b_col: str = "b",
                         num_partitions: int = 16):
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the DIRECTED doubling of the
    undirected edge list (each edge contributes (k_a,k_b) and
    (k_b,k_a)) — positive on social-style graphs, negative on hub-and-
    spoke webs.  One grouped degree count, two co-partitioning joins to
    tag endpoints, then the five Pearson partial sums reach the driver
    (scale shape identical to the A8 Pearson screen).  Output one row
    ``(assortativity, m)`` at 6 dp; degenerate (zero-variance) degree
    distributions emit no row."""
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_join

    edges = edges_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t[a_col], t[b_col]))
                   .select([a_col, b_col]),
        batch_format="pyarrow",
    ).materialize()
    m = edges.count()

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t[a_col].combine_chunks(),
                                  t[b_col].combine_chunks()])
        g = pa.table({"node": nodes}).group_by("node").aggregate(
            [([], "count_all")])
        return g.rename_columns(["node", "k"])

    # materialized: joined against BOTH endpoints — lazy, the degree
    # groupby (an all-to-all) would execute twice
    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").sum("k")
           .map_batches(lambda t: t.rename_columns(["node", "k"]),
                        batch_format="pyarrow")).materialize()

    ea = exchange_join(
        edges, deg.map_batches(
            lambda t: t.rename_columns([a_col, "ka"]),
            batch_format="pyarrow"),
        on=a_col, num_partitions=num_partitions,
        empty_schema=pa.schema([(a_col, pa.int64()), (b_col, pa.int64()),
                                ("ka", pa.int64())]),
    )
    eab = exchange_join(
        ea, deg.map_batches(
            lambda t: t.rename_columns([b_col, "kb"]),
            batch_format="pyarrow"),
        on=b_col, num_partitions=num_partitions,
        empty_schema=pa.schema([(a_col, pa.int64()), (b_col, pa.int64()),
                                ("ka", pa.int64()), ("kb", pa.int64())]),
    )

    def sums(t: pa.Table) -> pa.Table:
        ka = t["ka"].to_numpy(zero_copy_only=False).astype(np.float64)
        kb = t["kb"].to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.concatenate([ka, kb])  # directed doubling
        y = np.concatenate([kb, ka])
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([float(x.sum())], pa.float64()),
            "sy": pa.array([float(y.sum())], pa.float64()),
            "sxy": pa.array([float((x * y).sum())], pa.float64()),
            "sxx": pa.array([float((x * x).sum())], pa.float64()),
            "syy": pa.array([float((y * y).sum())], pa.float64()),
        })

    import ray.data

    p = eab.map_batches(sums, batch_format="pyarrow").to_pandas()
    out_schema = pa.schema([("assortativity", pa.float64()),
                            ("m", pa.int64())])
    if not len(p) or p["n"].sum() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    n = float(p["n"].sum())
    sx, sy = p["sx"].sum(), p["sy"].sum()
    sxy, sxx, syy = p["sxy"].sum(), p["sxx"].sum(), p["syy"].sum()
    num = sxy - sx * sy / n
    den = np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    if den == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow(pa.table({
        "assortativity": pa.array([round(float(num / den), 6)],
                                  pa.float64()),
        "m": pa.array([m], pa.int64()),
    }))


def _scc_local_table(pairs: list, seed: str) -> pa.Table:
    """Iterative Tarjan over (src, dst) string pairs; scc_id = the
    member with the maximum ``md5(seed ':' node)[:16]`` priority —
    the same root the distributed coloring elects."""
    from collections import defaultdict

    from dedup_ray.util.hashing import content_digest

    adj = defaultdict(list)
    nodes = set()
    for a, b in pairs:
        if a != b:
            adj[a].append(b)
        nodes.update((a, b))
    nodes = sorted(nodes)

    index: dict = {}
    low: dict = {}
    on: set = set()
    stack: list = []
    comps: list = []
    counter = [0]

    for start in nodes:
        if start in index:
            continue
        # explicit DFS stack: (vertex, iterator position)
        work = [(start, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            neigh = adj.get(v, ())
            while pi < len(neigh):
                w = neigh[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                comps.append(comp)
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    out_node, out_id = [], []
    for comp in comps:
        pris = [d[:16] for d in content_digest(
            [f"{seed}:{n}" for n in comp], algo="md5")]
        root = comp[max(range(len(comp)), key=lambda i: (pris[i],
                                                         comp[i]))]
        for n in comp:
            out_node.append(n)
            out_id.append(root)
    order = np.argsort(np.asarray(out_node, dtype=object))
    return pa.table({
        "node": pa.array(np.asarray(out_node, dtype=object)[order],
                         pa.string()),
        "scc_id": pa.array(np.asarray(out_id, dtype=object)[order],
                           pa.string()),
    })
