"""Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
"A Theory for Record Linkage", JASA 64).

The classical decision-theoretic form of the reference's pair-scoring
stage (``classifier.py:287-357`` learns the same decision from features;
here the weights are the closed-form likelihood ratios): for each
comparison field ``f`` estimate

- ``m_f`` = P(field agrees | pair is a match)
- ``u_f`` = P(field agrees | pair is a non-match)

from a labeled pair sample, then score every candidate pair with the
log-likelihood ratio ``llr = Σ_f ln(m_f/u_f)`` over agreeing fields plus
``ln((1-m_f)/(1-u_f))`` over disagreeing ones; ``llr > 0`` means the
match hypothesis is more likely.

Distributed shape:

- m/u estimation is a per-batch partial-count pass (4 integers per
  field) summed on the driver — driver state is O(fields), never pairs.
- weights collapse to a ``2^F``-entry pattern table (a pair's score
  depends only on its agreement PATTERN), broadcast to the scoring
  pass, which is one vectorized gather — no per-row Python.

Exactness: probabilities are kept as INTEGER rationals (Laplace
smoothing: ``m = (agree+1)/(n+2)``), so a pattern's likelihood ratio is
one exact fraction ``num/den`` (Python ints — no overflow); the score
is ``floor(ln(num/den)·1e6 + 0.5)/1e6``, reproducible bit-for-bit by a
SQL engine computing the same fraction (HUGEINT) and the same floor
rounding.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _partial_counts(field_cols: list[str], label_col: str,
                    train_col: str):
    def partial(t: pa.Table) -> pa.Table:
        train = t[train_col].to_numpy(zero_copy_only=False).astype(bool)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(bool)
        m_mask, u_mask = train & lab, train & ~lab
        row = {"n_match": [int(m_mask.sum())],
               "n_unmatch": [int(u_mask.sum())]}
        for f in field_cols:
            a = t[f].to_numpy(zero_copy_only=False).astype(bool)
            row[f"am_{f}"] = [int((a & m_mask).sum())]
            row[f"au_{f}"] = [int((a & u_mask).sum())]
        return pa.table(row)

    return partial


def estimate_mu_weights(pairs, field_cols: list[str],
                        label_col: str = "label",
                        train_col: str = "is_train") -> dict:
    """Estimate per-field (m, u) rationals from the labeled training
    pairs and derive the ``2^F`` pattern score table.

    Returns ``{"n_match", "n_unmatch", "fields": {f: (m_num, au_num)},
    "pattern_scores": np.ndarray[2^F]}`` — pattern index bit ``i`` set
    means field ``field_cols[i]`` agrees.
    """
    parts = pairs.map_batches(
        _partial_counts(field_cols, label_col, train_col),
        batch_format="pyarrow").to_pandas()
    nm = int(parts["n_match"].sum())
    nu = int(parts["n_unmatch"].sum())
    md, ud = nm + 2, nu + 2  # Laplace denominators
    mn = {f: int(parts[f"am_{f}"].sum()) + 1 for f in field_cols}
    un = {f: int(parts[f"au_{f}"].sum()) + 1 for f in field_cols}

    n_fields = len(field_cols)
    scores = np.empty(1 << n_fields, dtype=np.float64)
    for pat in range(1 << n_fields):
        num, den = 1, 1
        for i, f in enumerate(field_cols):
            if pat >> i & 1:
                num *= mn[f] * ud
                den *= md * un[f]
            else:
                num *= (md - mn[f]) * ud
                den *= md * (ud - un[f])
        llr = math.log(float(num) / float(den))
        scores[pat] = math.floor(llr * 1e6 + 0.5) / 1e6
    return {"n_match": nm, "n_unmatch": nu,
            "m_num": mn, "u_num": un, "m_den": md, "u_den": ud,
            "pattern_scores": scores}


def fellegi_sunter_score(pairs, field_cols: list[str],
                         label_col: str = "label",
                         train_col: str = "is_train"):
    """Score every pair with the Fellegi–Sunter log-likelihood ratio
    learned from the training subset; ``is_match = llr > 0``.

    Two passes over the pair stream, zero shuffles: a bounded partial
    count pass (driver state = 4·F ints), then a vectorized broadcast
    scoring pass (pattern gather over the 2^F table).
    """
    w = estimate_mu_weights(pairs, field_cols, label_col, train_col)
    scores = w["pattern_scores"]

    def score(t: pa.Table) -> pa.Table:
        pat = np.zeros(t.num_rows, dtype=np.int64)
        for i, f in enumerate(field_cols):
            pat |= (t[f].to_numpy(zero_copy_only=False)
                    .astype(bool).astype(np.int64) << i)
        llr = scores[pat]
        t = t.append_column("llr", pa.array(llr))
        return t.append_column(
            "is_match", pa.array((llr > 0).astype(np.int64)))

    return pairs.map_batches(score, batch_format="pyarrow"), w


def meta_block_pairs(blocks_ds, entity_col: str = "ent",
                     type_col: str = "btype", key_col: str = "bkey",
                     max_block_size: int = 64, num_partitions: int = 16):
    """Meta-blocking with CBS weights and weighted-edge pruning
    (Papadakis et al. 2014, "Meta-Blocking: Taking Entity Resolution to
    the Next Level", TKDE): the blocking graph's edges are candidate
    pairs weighted by HOW MANY blocks they co-occur in; pruning the
    weak half of the graph removes most of the superfluous comparisons
    that redundant blocking schemes create while keeping the
    strongly-corroborated pairs.

    Stages: (1) one (type, key)-keyed exchange PURGES oversized blocks
    (> ``max_block_size`` entities — comparison-count purging, the
    standard skew bound; a purged block's evidence is redundant by
    construction) and emits within-block pairs; (2) one pair-keyed
    exchange folds the CBS weight (# common blocks); (3) WEP discards
    edges STRICTLY BELOW the mean weight (the Papadakis rule — ties
    survive, so a uniform-weight graph passes whole), evaluated as the
    EXACT integer predicate ``w · n_pairs ≥ Σw`` (no float mean, so
    engine and SQL can never disagree at the boundary).  Output:
    ``(id1, id2, w)``.
    """
    import pandas as pd

    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    sch = dict(zip(blocks_ds.schema().names, blocks_ds.schema().types))
    id_type = sch[entity_col]
    if not isinstance(id_type, pa.DataType):
        d = np.dtype(id_type)
        id_type = pa.string() if d == object else pa.from_numpy_dtype(d)

    pair_schema = pa.schema([("id1", id_type), ("id2", id_type),
                             ("w", pa.int64())])

    def emit_pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pair_schema.empty_table()
        df = pd.DataFrame({
            "t": part[type_col].to_pylist(),
            "k": part[key_col].to_pylist(),
            "e": part[entity_col].to_pylist(),
        })
        i1, i2 = [], []
        for _, g in df.groupby(["t", "k"], sort=False):
            ents = sorted(set(g["e"].tolist()))
            if len(ents) < 2 or len(ents) > max_block_size:
                continue  # singleton or purged block
            for a in range(len(ents)):
                for b in range(a + 1, len(ents)):
                    i1.append(ents[a])
                    i2.append(ents[b])
        return pa.table({"id1": pa.array(i1, id_type),
                         "id2": pa.array(i2, id_type),
                         "w": pa.array([1] * len(i1), pa.int64())})

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pair_schema.empty_table()
        g = part.group_by(["id1", "id2"]).aggregate([("w", "sum")])
        return g.rename_columns(["id1", "id2", "w"])

    pairs = exchange_group_apply(
        blocks_ds, [type_col, key_col], emit_pairs, num_partitions,
        empty_schema=pa.schema([(entity_col, id_type),
                                (type_col, pa.string()),
                                (key_col, pa.string())]),
    )
    weighted = exchange_group_apply(
        pairs, ["id1", "id2"], fold, num_partitions,
        empty_schema=pair_schema,
    ).materialize()

    # two int64 scalars to the driver: Σw and pair count
    n_pairs = weighted.count()
    total_w = int(weighted.sum("w") or 0) if n_pairs else 0

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0 or n_pairs == 0:
            return t
        keep = pc.greater_equal(pc.multiply(t["w"], pa.scalar(n_pairs)),
                                pa.scalar(total_w))
        return t.filter(keep)

    return weighted.map_batches(prune, batch_format="pyarrow")


def canopy_cluster(docs, text_col: str = "text", id_col: str = "doc_id",
                   t1: float = 0.15, t2: float = 0.5,
                   num_blocks: int = 512, max_rounds: int = 28,
                   num_partitions: int = 32,
                   block_doc_cap: int | None = 2048):
    """Canopy clustering (McCallum, Nigam & Ungar, KDD 2000) — the
    classic cheap-distance blocking pass that precedes expensive
    record-linkage comparison (the same role the reference's exact
    venue/org groupby blocking plays before pair scoring,
    ``venue_bag.py:11-15`` / ``org_bag.py:14-21``).

    Cheap metric: Jaccard over DISTINCT word-bigram shingles.  Docs are
    first routed to content blocks (md5 of the doc's LEXICOGRAPHICALLY
    SMALLEST shingle, mod ``num_blocks`` — near-dups share almost all
    shingles, so they share the min and land together), then each block
    runs the greedy canopy loop for a FIXED ``max_rounds`` rounds:

    - round k's center = smallest alive doc id,
    - every alive doc with ``jac >= t2`` to the center (and the center)
      leaves the candidate pool,
    - the canopy's MEMBERS are all block docs with ``jac >= t1``
      (canopies overlap by design — t1 is loose, t2 tight).

    Docs still alive after ``max_rounds`` emit as ``center_id = -1``
    (the observable cap, same policy as the LSH bucket caps).

    Distributed shape: one shingle-explode ``map_batches`` pass, ONE
    exchange keyed on the content block, then per-block vectorized work
    (bool doc×shingle matmul for the pairwise intersection counts — no
    per-pair Python).  The greedy loop is inherently sequential, so the
    parallel unit is the block (Mahout's MapReduce canopy makes the
    same per-partition trade); per-block cost is O(B² · shingles).

    Hash-splitting ``num_blocks`` ways spreads distinct MIN-SHINGLES,
    not docs: a template flood (many near-copies sharing one min
    shingle) routes every copy into ONE block, so per-block work is NOT
    bounded by ``num_blocks`` alone.  ``block_doc_cap`` is the explicit
    bound: blocks over the cap keep only their ``block_doc_cap``
    smallest doc ids for the canopy loop and emit the overflow as
    ``center_id = -2`` (observable, same policy as the LSH bucket
    caps; ``-1`` stays the max-rounds leftover marker).  ``None``
    disables the cap — the exact-replay mode the DuckDB oracle checks.

    Returns ``(blk, center_id, doc_id, jac)``; ``jac`` rounded 6dp.
    """
    import hashlib

    from dedup_ray.util.exchange import exchange_group_apply

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_id, out_blk, out_sh = [], [], []
        for did, tx in zip(ids.tolist(), texts):
            toks = [w for w in (tx or "").split(" ") if w]
            if len(toks) >= 2:
                shs = sorted({f"{a} {b}" for a, b in zip(toks, toks[1:])})
            else:
                shs = [str(did)]
            blk = int(hashlib.md5(shs[0].encode()).hexdigest()[:8], 16) \
                % num_blocks
            out_id.extend([did] * len(shs))
            out_blk.extend([blk] * len(shs))
            out_sh.extend(shs)
        return pa.table({"blk": pa.array(out_blk, pa.int64()),
                         id_col: pa.array(out_id, pa.int64()),
                         "sh": pa.array(out_sh, pa.string())})

    out_schema = pa.schema([("blk", pa.int64()), ("center_id", pa.int64()),
                            (id_col, pa.int64()), ("jac", pa.float64())])

    def per_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        rows_blk, rows_c, rows_d, rows_j = [], [], [], []
        for blk, g in df.groupby("blk", sort=True):
            all_dids = np.unique(g[id_col].to_numpy())
            if block_doc_cap is not None and len(all_dids) > block_doc_cap:
                # observable overflow: smallest ids stay, rest emit -2
                kept = set(all_dids[:block_doc_cap].tolist())
                for od in all_dids[block_doc_cap:].tolist():
                    rows_blk.append(blk)
                    rows_c.append(-2)
                    rows_d.append(int(od))
                    rows_j.append(0.0)
                g = g[g[id_col].isin(kept)]
            dids, dinv = np.unique(g[id_col].to_numpy(), return_inverse=True)
            shs, sinv = np.unique(g["sh"].to_numpy(), return_inverse=True)
            a = np.zeros((len(dids), len(shs)), dtype=np.float32)
            a[dinv, sinv] = 1.0
            inter = (a @ a.T).astype(np.float64)  # exact int counts < 2^24
            nt = inter.diagonal().copy()
            union = nt[:, None] + nt[None, :] - inter
            jac = inter / union
            alive = np.ones(len(dids), dtype=bool)
            for _ in range(max_rounds):
                if not alive.any():
                    break
                ci = int(np.flatnonzero(alive)[0])  # min doc id alive
                members = np.flatnonzero(jac[ci] >= t1)
                members = members[members != ci]
                rows_blk.append(blk)
                rows_c.append(int(dids[ci]))
                rows_d.append(int(dids[ci]))
                rows_j.append(1.0)
                for mi in members.tolist():
                    rows_blk.append(blk)
                    rows_c.append(int(dids[ci]))
                    rows_d.append(int(dids[mi]))
                    rows_j.append(float(np.round(jac[ci, mi], 6)))
                alive[ci] = False
                alive &= ~(jac[ci] >= t2)
            for li in np.flatnonzero(alive).tolist():
                rows_blk.append(blk)
                rows_c.append(-1)
                rows_d.append(int(dids[li]))
                rows_j.append(0.0)
        return pa.table({"blk": pa.array(rows_blk, pa.int64()),
                         "center_id": pa.array(rows_c, pa.int64()),
                         id_col: pa.array(rows_d, pa.int64()),
                         "jac": pa.array(rows_j, pa.float64())})

    exploded = docs.map_batches(explode, batch_format="pyarrow")
    return exchange_group_apply(
        exploded, ["blk"], per_block, num_partitions,
        empty_schema=pa.schema([("blk", pa.int64()), (id_col, pa.int64()),
                                ("sh", pa.string())]),
    )
