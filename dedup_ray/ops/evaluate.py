"""Pairwise cluster evaluation — faithful to the reference scorer.

The reference expands truth and predicted clusterings into intra-cluster
pair indicator vectors and computes binary pairwise precision/recall/F1
(``evaluate.py:72-128``; macro variant with negative-class correction at
:129-152).  Materializing C(n,2) indicators does not scale, but the same
numbers are three grouped counts:

    total_gt   = Σ_truth-cluster C(n,2)
    total_pred = Σ_pred-cluster  C(n,2)
    correct    = Σ_(truth,pred)-joint-cluster C(n,2)

which is exactly what the indicator dot products compute.  The north-rule
criterion "dup-pair recall >= 0.99" is ``recall`` here restricted to truth
positives — identical to ``evaluate.py:125-128``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pair_count(sizes: pd.Series) -> int:
    return int((sizes * (sizes - 1) // 2).sum())


def pairwise_prf(
    pred: pd.DataFrame, truth: pd.DataFrame, id_col: str = "url",
    average: str = "binary",
) -> dict[str, float]:
    """P/R/F1 of predicted vs truth clusters, both as (id_col, cluster_id).

    ``average='binary'`` reproduces ``evaluate.py`` ``--average binary``;
    ``'macro'`` additionally scores the negative class over the full pair
    universe of the ids present in truth and averages the two F1s
    (``evaluate.py:129-152``).
    """
    m = truth.merge(
        pred, on=id_col, how="left", suffixes=("_gt", "_pred"), validate="m:1"
    )
    # ids missing from the prediction are singletons (never paired)
    m["cluster_id_pred"] = m["cluster_id_pred"].fillna(
        "\x00missing:" + m[id_col].astype(str)
    )
    total_gt = _pair_count(m.groupby("cluster_id_gt").size())
    total_pred_in = _pair_count(m.groupby("cluster_id_pred").size())
    correct = _pair_count(m.groupby(["cluster_id_gt", "cluster_id_pred"]).size())

    def _prf(c: int, tp: int, tg: int) -> tuple[float, float, float]:
        if tg == 0 or tp == 0:
            return 0.0, 0.0, 0.0
        p, r = c / tp, c / tg
        f = 0.0 if (p == 0 or r == 0) else 2 * p * r / (p + r)
        return f, p, r

    f1, precision, recall = _prf(correct, total_pred_in, total_gt)
    out = {"precision": precision, "recall": recall, "f1": f1}
    if average == "macro":
        n = len(m)
        universe = n * (n - 1) // 2
        neg_gt = universe - total_gt
        neg_pred = universe - total_pred_in
        # pairs negative in both = universe - gt - pred + both-positive
        neg_correct = universe - total_gt - total_pred_in + correct
        f1_neg, p_neg, r_neg = _prf(neg_correct, neg_pred, neg_gt)
        out.update(
            {
                "precision_neg": p_neg,
                "recall_neg": r_neg,
                "f1_macro": (f1 + f1_neg) / 2,
            }
        )
    return out


def pairwise_prf_ds(pred_ds, truth_ds, id_col: str = "url",
                    num_partitions: int = 16) -> dict[str, float]:
    """Distributed variant: grouped counts over a join, no pair explosion.

    pred_ds / truth_ds: Dataset(id_col, cluster_id).  The three totals are
    each a groupby().count() over the joined label table; only per-cluster
    counts (tiny) reach the driver.
    """
    import pyarrow as pa

    def rn(suffix):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [id_col if c == id_col else f"{c}{suffix}" for c in batch.column_names]
            )

        return f

    t = truth_ds.map_batches(rn("_gt"), batch_format="pyarrow")
    p = pred_ds.map_batches(rn("_pred"), batch_format="pyarrow")
    # raw-task exchange, not Dataset.join: the aggregator-actor pool a
    # Dataset.join spins up reserves CPU off the whole cluster and
    # DEADLOCKS outright at low CPU counts (observed hanging a 2-CPU run)
    from dedup_ray.util.exchange import exchange_join

    joined = exchange_join(
        t,
        p,
        on=id_col,
        how="left",
        num_partitions=num_partitions,
        empty_schema=pa.schema(
            [
                (id_col, pa.string()),
                ("cluster_id_gt", pa.string()),
                ("cluster_id_pred", pa.string()),
            ]
        ),
    )

    def fill_missing(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        filler = pc.binary_join_element_wise(
            pa.array(["\x00missing:"] * batch.num_rows),
            pc.cast(batch[id_col], pa.string()),
            "",
        )
        cid = pc.coalesce(pc.cast(batch["cluster_id_pred"], pa.string()), filler)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster_id_gt": pc.cast(batch["cluster_id_gt"], pa.string()),
                "cluster_id_pred": cid,
            }
        )

    joined = joined.map_batches(fill_missing, batch_format="pyarrow").materialize()

    def pair_total(sizes_df: pd.DataFrame) -> int:
        s = sizes_df["count()"]
        return int((s * (s - 1) // 2).sum())

    gt_sizes = joined.groupby("cluster_id_gt").count().to_pandas()
    pred_sizes = joined.groupby("cluster_id_pred").count().to_pandas()
    joint_sizes = joined.groupby(["cluster_id_gt", "cluster_id_pred"]).count().to_pandas()
    total_gt = pair_total(gt_sizes)
    total_pred = pair_total(pred_sizes)
    correct = pair_total(joint_sizes)
    if total_gt == 0 or total_pred == 0:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    precision, recall = correct / total_pred, correct / total_gt
    f1 = 0.0 if (precision == 0 or recall == 0) else (
        2 * precision * recall / (precision + recall)
    )
    return {"precision": precision, "recall": recall, "f1": f1}


def bcubed_scores(pred, truth, id_col: str = "doc_id",
                  pred_col: str = "cluster_id", truth_col: str = "truth_id",
                  num_partitions: int = 16,
                  sums: dict | None = None):
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) — the standard
    entity-resolution metric family next to the reference's pairwise F1
    (``evaluate.py:125-128``): per item, precision = |C(i) ∩ T(i)|/|C(i)|
    and recall = |C(i) ∩ T(i)|/|T(i)|, averaged over items.

    Marginals |c| and |t| are computed over the JOINED universe (items
    present in BOTH pred and truth) — evaluation restricted to
    commonly-labeled items, the coherent form when the two tables cover
    different id sets (and identical to the naive form when they
    coincide, which every catalog oracle covers).  API NOTE (ADVICE
    r3): earlier revisions computed marginals over each table's FULL id
    set, so external callers whose pred/truth universes differ will see
    (higher) scores under this form; restrict or pad your tables
    upstream if you need the unrestricted semantics.

    Closed-form over the overlap cells: with n(c,t) items in predicted
    cluster c AND truth cluster t,

        B³P = (1/N) Σ_cells n(c,t)² / |c|
        B³R = (1/N) Σ_cells n(c,t)² / |t|

    so the whole metric is one co-partitioning join + three grouped
    counts + two cell-size joins — no per-item state, cells bounded by
    cluster structure, never materialized to the driver (only the three
    final sums are).  Returns a 1-row ``pa.Table`` rounded to 6dp.
    """
    if sums is None:
        sums = contingency_sums(pred, truth, id_col, pred_col,
                                truth_col, num_partitions)
    n_items = sums["n_items"]
    if n_items == 0:
        p = r = f1 = 0.0
    else:
        p = sums["bcp"] / n_items
        r = sums["bcr"] / n_items
        f1 = 0.0 if p + r == 0 else 2 * p * r / (p + r)
    return pa.table({
        "bcubed_p": pa.array([round(p, 6)], pa.float64()),
        "bcubed_r": pa.array([round(r, 6)], pa.float64()),
        "bcubed_f1": pa.array([round(f1, 6)], pa.float64()),
    })


def ari_score(pred, truth, id_col: str = "doc_id",
              pred_col: str = "cluster_id", truth_col: str = "truth_id",
              num_partitions: int = 16,
                  sums: dict | None = None):
    """Adjusted Rand Index — the chance-corrected form of the pairwise
    agreement the reference scores (``evaluate.py:125-128`` counts
    pair-level TP/FP/FN; ARI corrects the same contingency for the
    agreement two random partitions would reach).

    Closed form over the contingency: with cells n(c,t), row sums a_c,
    col sums b_t and N items,

        ARI = (S_cells - S_a*S_b/S_N) / ((S_a + S_b)/2 - S_a*S_b/S_N)

    where S_x = sum of C(x, 2).  Everything is grouped counts + three
    distributed pair-sums; only four integers reach the driver.  Returns
    a 1-row table ``(ari,)`` rounded to 6dp (1.0 when both partitions
    are identical up to relabeling).
    """
    if sums is None:
        sums = contingency_sums(pred, truth, id_col, pred_col,
                                truth_col, num_partitions)
    s_cells, s_a, s_b = sums["s_cells"], sums["s_a"], sums["s_b"]
    n = int(sums["n_items"])
    s_n = n * (n - 1) // 2
    if s_n == 0:
        ari = 1.0
    else:
        exp = s_a * s_b / s_n
        mx = (s_a + s_b) / 2
        ari = 1.0 if mx == exp else (s_cells - exp) / (mx - exp)
    return pa.table({"ari": pa.array([round(ari, 6)], pa.float64())})


def nmi_score(pred, truth, id_col: str = "doc_id",
              pred_col: str = "cluster_id", truth_col: str = "truth_id",
              num_partitions: int = 16,
                  sums: dict | None = None):
    """Normalized mutual information + V-measure (Rosenberg & Hirschberg
    2007) — the information-theoretic clustering agreement family next to
    pairwise F1 / B³ / ARI (all over the SAME contingency the reference's
    ``evaluate.py:125-128`` pair counts marginalize).

    With cells n(c,t), pred sums a_c, truth sums b_t, N items and natural
    logs:

        I    = Σ_cells (n/N) · ln(N·n / (a_c·b_t))
        H_u  = −Σ_c (a_c/N) ln(a_c/N)        (pred entropy)
        H_v  = −Σ_t (b_t/N) ln(b_t/N)        (truth entropy)

        homogeneity  = I / H_v      (each cluster holds one truth class)
        completeness = I / H_u      (each truth class stays in one cluster)
        v_measure    = 2I / (H_u + H_v)
        nmi          = I / sqrt(H_u · H_v)   (sqrt normalization)

    Everything is grouped counts (the ARI machinery) — cells and marginals
    stay distributed, only three float sums and N reach the driver.
    Degenerate partitions (H = 0, a single cluster) return the sklearn
    convention: 1.0 when both sides are single-cluster, else 0.0.  Returns
    a 1-row table rounded to 6dp.
    """
    import math

    if sums is None:
        sums = contingency_sums(pred, truth, id_col, pred_col,
                                truth_col, num_partitions)
    n = sums["n_items"]
    if n == 0:
        h_u = h_v = i = 0.0
    else:
        # Σ (x/N)ln(x/N) = (Σ x ln x)/N − ln N  because Σx = N
        ln_n = math.log(n)
        h_u = ln_n - sums["nla"] / n
        h_v = ln_n - sums["nlb"] / n
        i = h_u + h_v + (sums["nlc"] / n - ln_n)
    if h_u <= 0.0 and h_v <= 0.0:
        homog = compl = v = nmi = 1.0
    elif h_u <= 0.0 or h_v <= 0.0:
        homog = compl = v = nmi = 0.0
    else:
        homog = i / h_v
        compl = i / h_u
        v = 2 * i / (h_u + h_v)
        nmi = i / math.sqrt(h_u * h_v)
    return pa.table({
        "nmi": pa.array([round(nmi, 6)], pa.float64()),
        "v_measure": pa.array([round(v, 6)], pa.float64()),
        "homogeneity": pa.array([round(homog, 6)], pa.float64()),
        "completeness": pa.array([round(compl, 6)], pa.float64()),
    })


def auc_score(ds, score_col: str, label_col: str,
              num_partitions: int = 8, round_digits: int = 6):
    """Exact ROC AUC via the Mann–Whitney rank statistic — the
    classifier-eval metric beside pairwise F1 / B³ / ARI, computed
    WITHOUT a global sort: per-batch (score, n_pos, n_neg) histogram
    partials → one exchange keyed on the score → a driver combine over
    DISTINCT scores only (the same histogram-bounded-state trade as the
    exact quantile and grouped-median operators).

    ``AUC = (Σ_{positives} midrank − P(P+1)/2) / (P·N)`` with midranks
    (average rank within a tie group) — ties between a positive and a
    negative contribute ½, the standard convention, so the result equals
    SQL's window-function replay digit for digit.  Returns a 1-row table
    ``(auc, n_pos, n_neg)``; degenerate inputs (single class) yield a
    null auc.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.exchange import exchange_group_apply

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"score": pa.array([], pa.float64()),
                             "p": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        s = s + 0.0  # −0.0 → 0.0: hash group_by must not split the tie
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(bool)
        g = pa.table({"score": pa.array(s),
                      "p": pa.array(lab.astype(np.int64)),
                      "n": pa.array((~lab).astype(np.int64))})
        out = g.group_by("score").aggregate([("p", "sum"), ("n", "sum")])
        return out.rename_columns(["score", "p", "n"])

    def combine(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "score" not in part.column_names:
            return pa.table({"score": pa.array([], pa.float64()),
                             "p": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = part.group_by("score").aggregate([("p", "sum"), ("n", "sum")])
        return g.rename_columns(["score", "p", "n"])

    hist = exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        "score", combine, num_partitions,
    ).to_pandas()  # bounded by DISTINCT scores

    if not len(hist):
        return pa.table({"auc": pa.array([None], pa.float64()),
                         "n_pos": pa.array([0], pa.int64()),
                         "n_neg": pa.array([0], pa.int64())})
    hist = hist.sort_values("score", kind="stable")
    cnt = (hist["p"] + hist["n"]).to_numpy(np.float64)
    cum_before = np.r_[0.0, np.cumsum(cnt)[:-1]]
    midrank = cum_before + (cnt + 1) / 2.0
    P = float(hist["p"].sum())
    N = float(hist["n"].sum())
    if P == 0 or N == 0:
        auc = None
    else:
        rank_sum = float((hist["p"].to_numpy(np.float64) * midrank).sum())
        auc = round((rank_sum - P * (P + 1) / 2.0) / (P * N),
                    round_digits)
    return pa.table({"auc": pa.array([auc], pa.float64()),
                     "n_pos": pa.array([int(P)], pa.int64()),
                     "n_neg": pa.array([int(N)], pa.int64())})


def contingency_sums(pred, truth, id_col: str = "doc_id",
                     pred_col: str = "cluster_id",
                     truth_col: str = "truth_id",
                     num_partitions: int = 16) -> dict:
    """One shared pass computing every scalar the clustering-agreement
    family (B³, ARI, NMI/V-measure) needs from the pred/truth
    contingency — THREE exchanges total instead of ~6 plan launches per
    metric:

    1. id-keyed join of the two label tables → (c, t) rows;
    2. pred-keyed exchange: each partition holds its clusters WHOLE, so
       cells n(c,t), row sums a_c, and every pred-side partial
       (ΣC(n,2), ΣC(a,2), Σn²/a, Σn·ln n, Σa·ln a) finish locally;
       emits one narrow (t, n) row per cell with the partials riding
       the first cell of each cluster;
    3. truth-keyed exchange: col sums b_t finish locally → truth-side
       partials (ΣC(b,2), Σn²/b, Σb·ln b) plus N = Σn; the driver folds
       one tiny row per partition.

    Cells/marginals never materialize on the driver — only ~9 floats
    per partition do.
    """
    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    joined = exchange_join(
        pred.select_columns([id_col, pred_col]),
        truth.select_columns([id_col, truth_col]),
        on=id_col, how="inner", num_partitions=num_partitions,
        post=lambda t: (t.select([pred_col, truth_col])
                        if pred_col in t.column_names
                        else pa.table({pred_col: pa.array([], pa.int64()),
                                       truth_col: pa.array([], pa.int64())})),
        empty_schema=pa.schema([(id_col, pa.int64()),
                                (pred_col, pa.int64()),
                                (truth_col, pa.int64())]),
        return_refs=True,
    )

    cell_schema = pa.schema([
        ("t", pa.int64()), ("n", pa.int64()), ("w_cells", pa.int64()),
        ("w_bcp", pa.float64()), ("w_nlc", pa.float64()),
        ("w_a", pa.int64()), ("w_nla", pa.float64()),
    ])

    def by_pred(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cell_schema.empty_table()
        df = t.to_pandas().groupby(
            [pred_col, truth_col], sort=True).size().reset_index(name="n")
        n = df["n"].to_numpy().astype(np.float64)
        a = df.groupby(pred_col, sort=False)["n"].transform("sum") \
            .to_numpy().astype(np.float64)
        first = ~df[pred_col].duplicated()
        ai = a[first.to_numpy()]
        w_a = np.zeros(len(df), np.int64)
        w_a[first.to_numpy()] = (ai * (ai - 1) // 2).astype(np.int64)
        w_nla = np.zeros(len(df))
        w_nla[first.to_numpy()] = ai * np.log(ai)
        return pa.table({
            "t": pa.array(df[truth_col].to_numpy(), pa.int64()),
            "n": pa.array(df["n"].to_numpy(), pa.int64()),
            "w_cells": pa.array((n * (n - 1) // 2).astype(np.int64)),
            "w_bcp": pa.array(n * n / a, pa.float64()),
            "w_nlc": pa.array(n * np.log(n), pa.float64()),
            "w_a": pa.array(w_a),
            "w_nla": pa.array(w_nla, pa.float64()),
        })

    cells = exchange_group_apply(
        joined, [pred_col], by_pred, num_partitions,
        empty_schema=pa.schema([(pred_col, pa.int64()),
                                (truth_col, pa.int64())]),
    )

    def by_truth(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([0.0], pa.float64()) for k in
                             ["s_cells", "s_a", "bcp", "nlc", "nla",
                              "s_b", "bcr", "nlb", "n_items"]})
        df = t.to_pandas()
        n = df["n"].to_numpy().astype(np.float64)
        b = df.groupby("t", sort=False)["n"].transform("sum") \
            .to_numpy().astype(np.float64)
        bv = df.groupby("t", sort=True)["n"].sum().to_numpy() \
            .astype(np.float64)
        return pa.table({
            "s_cells": [float(df["w_cells"].sum())],
            "s_a": [float(df["w_a"].sum())],
            "bcp": [float(df["w_bcp"].sum())],
            "nlc": [float(df["w_nlc"].sum())],
            "nla": [float(df["w_nla"].sum())],
            "s_b": [float((bv * (bv - 1) / 2).sum())],
            "bcr": [float((n * n / b).sum())],
            "nlb": [float((bv * np.log(bv)).sum())],
            "n_items": [float(n.sum())],
        })

    parts = exchange_group_apply(
        cells, ["t"], by_truth, num_partitions,
        empty_schema=cell_schema,
    ).to_pandas()
    return {k: float(parts[k].sum()) for k in parts.columns}
