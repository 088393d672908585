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
