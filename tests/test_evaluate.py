"""Pairwise P/R/F1 — grouped-count implementation vs brute-force pair sets.

Brute force mirrors the reference scorer (``evaluate.py:72-128``): expand
clusterings to intra-cluster pair sets and compare.
"""

import itertools as it

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup_ray.ops.evaluate import pairwise_prf, pairwise_prf_ds


def pair_set(df: pd.DataFrame) -> set:
    out = set()
    for _, g in df.groupby("cluster_id"):
        ids = sorted(g["url"])
        out.update(it.combinations(ids, 2))
    return out


def brute_prf(pred: pd.DataFrame, truth: pd.DataFrame) -> tuple[float, float]:
    ps, ts = pair_set(pred), pair_set(truth)
    correct = len(ps & ts)
    return correct / len(ps), correct / len(ts)


def make_case():
    truth = pd.DataFrame(
        {
            "url": list("abcdefgh"),
            "cluster_id": ["c1", "c1", "c1", "c2", "c2", "c3", "c4", "c4"],
        }
    )
    pred = pd.DataFrame(
        {
            "url": list("abcdefgh"),
            "cluster_id": ["p1", "p1", "p2", "p2", "p2", "p3", "p4", "p5"],
        }
    )
    return pred, truth


def test_matches_brute_force():
    pred, truth = make_case()
    m = pairwise_prf(pred, truth)
    p, r = brute_prf(pred, truth)
    assert abs(m["precision"] - p) < 1e-12
    assert abs(m["recall"] - r) < 1e-12


def test_missing_ids_are_singletons():
    pred, truth = make_case()
    pred = pred[pred["url"] != "b"]  # id absent from prediction
    m = pairwise_prf(pred, truth)
    ps = pair_set(pred)
    ts = pair_set(truth)
    assert abs(m["recall"] - len(ps & ts) / len(ts)) < 1e-12


def test_perfect_prediction():
    _, truth = make_case()
    m = pairwise_prf(truth, truth, average="macro")
    assert m["f1"] == 1.0 and m["f1_macro"] == 1.0


def test_distributed_matches_pandas():
    pred, truth = make_case()
    m1 = pairwise_prf(pred, truth)
    m2 = pairwise_prf_ds(rd.from_pandas(pred), rd.from_pandas(truth), num_partitions=4)
    for k in ("precision", "recall", "f1"):
        assert abs(m1[k] - m2[k]) < 1e-12


def test_bcubed_handmade():
    import pyarrow as pa
    import ray.data

    from dedup_ray.ops.evaluate import bcubed_scores

    # pred: {1,2},{3}; truth: {1},{2,3}
    pred = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "cluster_id": pa.array([10, 10, 20], pa.int64())}))
    truth = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "truth_id": pa.array([100, 200, 200], pa.int64())}))
    out = bcubed_scores(pred, truth).to_pandas().iloc[0]
    # P_i: 1/2, 1/2, 1 -> 2/3 ; R_i: 1, 1/2, 1/2 -> 2/3
    assert out["bcubed_p"] == round(2 / 3, 6)
    assert out["bcubed_r"] == round(2 / 3, 6)
    assert out["bcubed_f1"] == round(2 / 3, 6)

    # perfect clustering scores 1.0 everywhere
    same = bcubed_scores(pred, rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "truth_id": pa.array([10, 10, 20], pa.int64()),
    }))).to_pandas().iloc[0]
    assert same.tolist() == [1.0, 1.0, 1.0]


def test_ari_handmade():
    import pyarrow as pa
    import ray.data

    from dedup_ray.ops.evaluate import ari_score

    def mk(ids, labels, col):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            col: pa.array(labels, pa.int64())}))

    ids = list(range(6))
    pred = mk(ids, [0, 0, 1, 1, 2, 2], "cluster_id")
    # identical partition up to relabeling -> 1.0
    same = mk(ids, [7, 7, 8, 8, 9, 9], "truth_id")
    assert ari_score(pred, same).to_pandas()["ari"][0] == 1.0
    # known value: pred {01}{23}{45} vs truth {012}{345}
    truth = mk(ids, [0, 0, 0, 1, 1, 1], "truth_id")
    got = ari_score(pred, truth).to_pandas()["ari"][0]
    # cells: (0,0)=2 (1,0)=1 (1,1)=1 (2,1)=2 -> S_cells=2
    # S_a=3, S_b=6, S_N=15; exp=1.2, max=4.5 -> ari=0.8/3.3
    assert got == round((2 - 1.2) / (4.5 - 1.2), 6)


def test_auc_matches_sklearn_style_reference_and_ties():
    from dedup_ray.ops.evaluate import auc_score

    rng = np.random.default_rng(43)
    n = 400
    label = rng.integers(0, 2, size=n)
    # scores correlated with label, quantized to force ties
    score = np.round(label * 1.0 + rng.normal(0, 1.2, size=n), 1)
    ds = rd.from_arrow(pa.table({
        "s": pa.array(score), "l": pa.array(label, pa.int64()),
    })).repartition(5)
    out = auc_score(ds, "s", "l", num_partitions=3).to_pandas()

    # independent midrank reference
    import pandas as pd
    df = pd.DataFrame({"s": score, "l": label})
    df["rank"] = df["s"].rank(method="average")
    P, N = int(label.sum()), int((1 - label).sum())
    want = (df.loc[df.l == 1, "rank"].sum() - P * (P + 1) / 2) / (P * N)
    assert abs(out["auc"].iloc[0] - round(want, 6)) < 1e-12
    assert out["n_pos"].iloc[0] == P and out["n_neg"].iloc[0] == N

    # perfect separation -> 1.0; single class -> null
    perfect = rd.from_arrow(pa.table({
        "s": pa.array([0.1, 0.2, 0.8, 0.9]),
        "l": pa.array([0, 0, 1, 1], pa.int64()),
    }))
    assert auc_score(perfect, "s", "l").to_pandas()["auc"].iloc[0] == 1.0
    mono = rd.from_arrow(pa.table({
        "s": pa.array([0.1, 0.2]), "l": pa.array([1, 1], pa.int64()),
    }))
    assert auc_score(mono, "s", "l").to_pandas()["auc"].isna().all()


def test_nmi_handmade_and_degenerate():
    import math

    import pyarrow as pa

    from dedup_ray.ops.evaluate import nmi_score

    def mk(ids, labels, col):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            col: pa.array(labels, pa.int64())}))

    ids = list(range(6))
    pred = mk(ids, [0, 0, 1, 1, 2, 2], "cluster_id")

    # identical up to relabeling -> all four metrics 1.0
    same = mk(ids, [7, 7, 8, 8, 9, 9], "truth_id")
    row = nmi_score(pred, same).to_pandas().iloc[0]
    assert row.tolist() == [1.0, 1.0, 1.0, 1.0]

    # hand-computed: pred {01}{23}{45} vs truth {012}{345}
    truth = mk(ids, [0, 0, 0, 1, 1, 1], "truth_id")
    row = nmi_score(pred, truth).to_pandas().iloc[0]
    # cells n = [2,1,1,2]; a = [2,2,2]; b = [3,3]; N = 6
    n = 6.0
    h_u = -sum(p * math.log(p) for p in (2 / n, 2 / n, 2 / n))
    h_v = -sum(p * math.log(p) for p in (3 / n, 3 / n))
    i = h_u + h_v + sum(
        (c / n) * math.log(c / n) for c in (2.0, 1.0, 1.0, 2.0))
    assert row["nmi"] == round(i / math.sqrt(h_u * h_v), 6)
    assert row["v_measure"] == round(2 * i / (h_u + h_v), 6)
    assert row["homogeneity"] == round(i / h_v, 6)
    assert row["completeness"] == round(i / h_u, 6)

    # degenerate: one side single-cluster -> 0.0; both single -> 1.0
    mono = mk(ids, [5] * 6, "truth_id")
    assert nmi_score(pred, mono).to_pandas().iloc[0].tolist() == [0.0] * 4
    mono_pred = mk(ids, [5] * 6, "cluster_id")
    assert nmi_score(mono_pred, mono).to_pandas().iloc[0].tolist() == [1.0] * 4
