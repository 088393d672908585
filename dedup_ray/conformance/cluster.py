"""Reference clustering baselines + per-block Kruskal/likelihood oracle.

- all-in-one baseline (``baseline.py:9`` M11);
- exact-key bag clustering (``venue_bag.py:11-15`` / ``org_bag.py:20-21`` A4)
  — via :func:`dedup_ray.ops.relational.group_collect`;
- chain-graph glue + connected components (``uni_glue_baseline.R:49-116``
  G5/G6): per block, members sharing a key are chained and CC runs over the
  union of the chain graphs;
- per-block Kruskal merge trace + Bernoulli-likelihood cut
  (``MT_Kruskal.R:101-185`` G7 + ``likelihood.R:30-93`` G8) as a
  driver-checkable function and a ``map_groups`` stage; the constrained
  (cannot-link, duplicated-id) branch of MT_Kruskal.R:101-146 is
  :func:`kruskal_constrained_block` / :func:`kruskal_constrained_cluster`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dedup_ray.util.dsutil import as_arrow


def all_in_one(ds, block_col: str = "name", id_col: str = "id"):
    """M11: every block → one cluster (cluster_rep = min id)."""

    def f(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].drop_duplicates().sort_values()
        return pd.DataFrame(
            {block_col: group[block_col].iloc[0], id_col: ids,
             "cluster_rep": ids.iloc[0]}
        )

    return as_arrow(ds.groupby(block_col).map_groups(f, batch_format="pandas"))


def chain_glue_components(
    ds, block_col: str, id_col: str, key_cols: list[str]
):
    """G5+G6: for each key column, chain same-key members; CC over the union.

    The chain ``(v[1],v[2]), (v[2],v[3]), …`` is the reference's sparse
    clique encoding (``uni_glue_baseline.R:54-56``); empty keys glue nothing
    (matching :31's filter of empty org).
    """

    def f(group: pd.DataFrame) -> pd.DataFrame:
        name = group[block_col].iloc[0]
        g = group.drop_duplicates(subset=[id_col])
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

        for i in g[id_col]:
            find(i)
        for kc in key_cols:
            for key, sub in g.groupby(kc):
                if key is None or key == "":
                    continue
                ids = sub[id_col].sort_values().tolist()
                for a, b in zip(ids[:-1], ids[1:]):
                    union(a, b)
        roots = {i: find(i) for i in g[id_col]}
        mins: dict = {}
        for i, r in roots.items():
            mins[r] = min(mins.get(r, i), i)
        return pd.DataFrame(
            {
                block_col: name,
                id_col: list(roots),
                "cluster_rep": [mins[roots[i]] for i in roots],
            }
        )

    return as_arrow(ds.groupby(block_col).map_groups(f, batch_format="pandas"))


def kruskal_likelihood_block(pairs: pd.DataFrame) -> pd.DataFrame:
    """G7+G8 for one block: (id1, id2, sim) → (id, cluster_rep).

    1. weight = 1 − sim; edges sorted ascending (``MT_Kruskal.R:149,106``),
       ties broken by (id1, id2) for determinism;
    2. Kruskal accepts acyclic edges; after each accept, the partition over
       touched nodes is a merge-trace step (:162-183);
    3. the Bernoulli log-likelihood of step i counts Σ log(sim) over
       intra-cluster pairs + Σ log(1−sim) over all other pairs
       (``likelihood.R:30-51``); the reference's binary search finds the
       last step with positive forward difference (:58-66);
    4. untouched nodes become singletons (:91-93).
    """
    eps = 1e-12
    p = pairs.copy()
    p["w"] = 1.0 - p["sim"]
    p = p.sort_values(["w", "id1", "id2"], kind="mergesort").reset_index(drop=True)
    nodes = sorted(set(p["id1"]) | set(p["id2"]))
    log_s = np.log(np.clip(p["sim"].values, eps, 1.0))
    log_d = np.log(np.clip(1.0 - p["sim"].values, eps, 1.0))

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    accepted: list[tuple] = []
    for _, row in p.iterrows():
        a, b = row["id1"], row["id2"]
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
            accepted.append((a, b))

    if not accepted:
        return pd.DataFrame({"id": nodes, "cluster_rep": nodes})

    # partition after the first i accepted edges (over touched nodes only)
    def partition_at(i: int) -> dict:
        par: dict = {}

        def f2(x):
            par.setdefault(x, x)
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        for a, b in accepted[:i]:
            ra, rb = f2(a), f2(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                par[rb] = ra
        return {x: f2(x) for x in par}

    id1 = p["id1"].values
    id2 = p["id2"].values

    def loglik(i: int) -> float:
        lab = partition_at(i)
        intra = np.fromiter(
            (x in lab and y in lab and lab[x] == lab[y] for x, y in zip(id1, id2)),
            dtype=bool,
            count=len(id1),
        )
        return float(log_s[intra].sum() + log_d[~intra].sum())

    # binary search of likelihood.R:58-66
    n_steps = len(accepted)
    lo, hi = 1, n_steps
    while hi > lo + 1:
        m = (hi + lo) // 2
        if loglik(m) - loglik(m - 1) > 0:
            lo = m
        else:
            hi = m
    best = lo

    lab = partition_at(best)
    mins: dict = {}
    for x, r in lab.items():
        mins[r] = min(mins.get(r, x), x)
    out_ids, reps = [], []
    for x in nodes:
        out_ids.append(x)
        reps.append(mins[lab[x]] if x in lab else x)
    return pd.DataFrame({"id": out_ids, "cluster_rep": reps})


def kruskal_constrained_block(
    pairs: pd.DataFrame,
    cannot_link: set | frozenset = frozenset(),
    dup: int = 0,
) -> pd.DataFrame:
    """G7 constrained branch (``MT_Kruskal.R:101-146``): Kruskal with
    cannot-link nodes and a duplicate allowance.

    The reference's ``msTreeKruskal_new(nodes, arcs, disam, dup)``: edges
    sorted by weight ascending (weight = 1 − sim, :149); an edge is accepted
    iff it joins two components AND the merged forest still keeps every
    ``disam`` (cannot-link) node in its own distinct component (:124-126 —
    the tentative-merge component count over disam equals ``len(disam)``);
    the loop stops once ``n_nodes − 1 − dup`` edges are accepted (:113),
    i.e. the final forest is allowed ``1 + dup`` components even without
    constraints.  Output: (id, cluster_rep) with min-id representatives;
    nodes touched by no accepted edge are singletons.
    """
    p = pairs.copy()
    p["w"] = 1.0 - p["sim"]
    p = p.sort_values(["w", "id1", "id2"], kind="mergesort").reset_index(drop=True)
    nodes = sorted(set(p["id1"]) | set(p["id2"]))
    target = len(nodes) - 1 - dup

    parent: dict = {}
    n_disam: dict = {}  # root → count of cannot-link members

    def find(x):
        parent.setdefault(x, x)
        if x not in n_disam:
            n_disam[x] = 1 if x in cannot_link else 0
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    accepted = 0
    for a, b in zip(p["id1"].values, p["id2"].values):
        if accepted >= max(target, 0):
            break
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        # cannot-link: reject a merge that would co-locate two disam nodes
        if n_disam[ra] >= 1 and n_disam[rb] >= 1:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
        n_disam[ra] += n_disam[rb]
        accepted += 1

    labels = {x: find(x) for x in nodes}
    mins: dict = {}
    for x, r in labels.items():
        mins[r] = min(mins.get(r, x), x)
    return pd.DataFrame(
        {"id": nodes, "cluster_rep": [mins[labels[x]] for x in nodes]}
    )


def kruskal_constrained_cluster(
    pairs_ds,
    cannot_link: dict[str, set] | None = None,
    block_col: str = "name",
    dup: int = 0,
):
    """Distributed constrained Kruskal: per-block map_groups, cannot-link
    sets broadcast once via ``ray.put`` (J5 shape — the per-block disam sets
    are tiny; a shuffle join would be wasteful)."""
    import ray

    cl_ref = ray.put(cannot_link or {})

    def f(group: pd.DataFrame) -> pd.DataFrame:
        blk = group[block_col].iloc[0]
        cl = ray.get(cl_ref).get(blk, frozenset())
        out = kruskal_constrained_block(group[["id1", "id2", "sim"]], cl, dup)
        out.insert(0, block_col, blk)
        return out

    return as_arrow(pairs_ds.groupby(block_col).map_groups(f, batch_format="pandas"))


def affinity_propagation_block(
    pairs: pd.DataFrame,
    preference: float | None = None,
    damping: float = 0.9,
    max_iter: int = 500,
    conv_iter: int = 50,
) -> pd.DataFrame:
    """G9: affinity propagation over one block's pair similarities.

    Reference shape: ``ap_cluster.R:16-34`` — per-name pair predictions are
    spread into a dense similarity matrix and handed to ``apcluster``.  This
    is the standard Frey–Dueck message-passing algorithm (Science 315, 2007)
    vectorized in numpy: responsibilities ``r(i,k) = s(i,k) − max_{k'≠k}
    (a(i,k') + s(i,k'))`` and availabilities ``a(i,k) = min(0, r(k,k) +
    Σ_{i'∉{i,k}} max(0, r(i',k)))`` with damping, exemplars where
    ``a(k,k)+r(k,k) > 0``.  Defaults mirror apcluster: preference = median
    of the observed similarities, damping 0.9.  Missing pairs (the matrix is
    built from an id1<id2 edge list) get a similarity below the observed
    range, the dense analog of apcluster's sparse −Inf.

    Deterministic: no jitter is added (ties break toward the lower index),
    so repeated runs and different parallelism give identical clusters.

    Input columns: ``id1, id2, sim``.  Output: ``(id, cluster_rep)`` with
    ``cluster_rep`` = the exemplar's id.  Dense O(n²) state per block — the
    same per-name locality assumption the reference makes; blocks must stay
    bounded (SURVEY.md §4 skew note).
    """
    ids = np.unique(
        np.concatenate([pairs["id1"].to_numpy(), pairs["id2"].to_numpy()])
    )
    n = len(ids)
    if n == 0:
        return pd.DataFrame({"id": ids, "cluster_rep": ids})
    if n == 1:
        return pd.DataFrame({"id": ids, "cluster_rep": ids})
    pos = {v: i for i, v in enumerate(ids)}
    sims = pairs["sim"].to_numpy(dtype=np.float64)
    if preference is None:
        preference = float(np.median(sims)) if len(sims) else 0.0
    lo = float(sims.min()) if len(sims) else 0.0
    hi = float(sims.max()) if len(sims) else 0.0
    fill = lo - (hi - lo) - 1.0
    S = np.full((n, n), fill, dtype=np.float64)
    i1 = np.fromiter((pos[v] for v in pairs["id1"]), dtype=np.int64, count=len(pairs))
    i2 = np.fromiter((pos[v] for v in pairs["id2"]), dtype=np.int64, count=len(pairs))
    S[i1, i2] = sims
    S[i2, i1] = sims
    np.fill_diagonal(S, preference)

    R = np.zeros((n, n))
    A = np.zeros((n, n))
    idx = np.arange(n)
    last_e = None
    stable = 0
    for _ in range(max_iter):
        # responsibilities
        AS = A + S
        first = AS.argmax(axis=1)
        max1 = AS[idx, first]
        AS[idx, first] = -np.inf
        max2 = AS.max(axis=1)
        Rn = S - max1[:, None]
        Rn[idx, first] = S[idx, first] - max2
        R = damping * R + (1.0 - damping) * Rn
        # availabilities
        Rp = np.maximum(R, 0.0)
        Rp[idx, idx] = R[idx, idx]
        colsum = Rp.sum(axis=0)
        An = np.minimum(0.0, colsum[None, :] - Rp)
        An[idx, idx] = colsum - Rp[idx, idx]
        A = damping * A + (1.0 - damping) * An
        e = (A[idx, idx] + R[idx, idx]) > 0
        if last_e is not None and np.array_equal(e, last_e):
            stable += 1
            if stable >= conv_iter and e.any():
                break
        else:
            stable = 0
        last_e = e
    exemplars = np.flatnonzero((A[idx, idx] + R[idx, idx]) > 0)
    if len(exemplars) == 0:
        exemplars = np.array([int((A[idx, idx] + R[idx, idx]).argmax())])
    assign = exemplars[S[:, exemplars].argmax(axis=1)]
    assign[exemplars] = exemplars
    return pd.DataFrame({"id": ids, "cluster_rep": ids[assign]})


def affinity_propagation_cluster(pairs_ds, block_col: str = "name", **kw):
    """Distributed G9: per-block AP via map_groups (ap_cluster.R's per-name
    loop, one bounded task per block).  Input: Dataset(block, id1, id2, sim).
    """

    def f(group: pd.DataFrame) -> pd.DataFrame:
        out = affinity_propagation_block(group[["id1", "id2", "sim"]], **kw)
        out.insert(0, block_col, group[block_col].iloc[0])
        return out

    return as_arrow(pairs_ds.groupby(block_col).map_groups(f, batch_format="pandas"))


def kruskal_likelihood_cluster(pairs_ds, block_col: str = "name"):
    """Distributed G7+G8: per-block merge-trace clustering via map_groups.

    Blocks are bounded (SURVEY.md §4 skew note) so one group fits one task —
    the same locality assumption the reference's per-name processes make.
    Input: Dataset(block, id1, id2, sim).
    """

    def f(group: pd.DataFrame) -> pd.DataFrame:
        out = kruskal_likelihood_block(group[["id1", "id2", "sim"]])
        out.insert(0, block_col, group[block_col].iloc[0])
        return out

    return as_arrow(pairs_ds.groupby(block_col).map_groups(f, batch_format="pandas"))
