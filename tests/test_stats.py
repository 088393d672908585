"""ops/stats.py: chi-squared, ACF, KS two-sample, Gini/entropy."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from dedup_ray.ops.stats import acf, chi2_independence, gini_entropy, ks_two_sample


def test_chi2_matches_brute_force():
    rng = np.random.default_rng(7)
    a = rng.choice(["x", "y", "z"], 400)
    b = rng.choice(["p", "q"], 400)
    out = chi2_independence(
        rd.from_pandas(pd.DataFrame({"a": a, "b": b})), "a", "b"
    ).to_pandas()
    # brute force incl. zero cells
    grid = pd.crosstab(pd.Series(a), pd.Series(b)).to_numpy(dtype=float)
    n = grid.sum()
    exp = np.outer(grid.sum(1), grid.sum(0)) / n
    chi2 = ((grid - exp) ** 2 / exp).sum()
    v = np.sqrt(chi2 / (n * (min(grid.shape) - 1)))
    assert out["chi2"].iloc[0] == pytest.approx(round(chi2, 6))
    assert out["dof"].iloc[0] == (grid.shape[0] - 1) * (grid.shape[1] - 1)
    assert out["cramers_v"].iloc[0] == pytest.approx(round(v, 6))
    assert out["n"].iloc[0] == 400


def test_chi2_counts_zero_observed_cells():
    # (a1,b2) never occurs: the full-grid expectation must still be paid
    df = pd.DataFrame({"a": ["a1"] * 10 + ["a2"] * 10,
                       "b": ["b1"] * 10 + ["b1"] * 5 + ["b2"] * 5})
    out = chi2_independence(rd.from_pandas(df), "a", "b").to_pandas()
    grid = np.array([[10.0, 0.0], [5.0, 5.0]])
    exp = np.outer(grid.sum(1), grid.sum(0)) / 20
    assert out["chi2"].iloc[0] == pytest.approx(
        round(((grid - exp) ** 2 / exp).sum(), 6))


def test_acf_matches_pandas_autocorr():
    rng = np.random.default_rng(3)
    n = 200
    x = np.cumsum(rng.normal(size=n))  # random walk: strong lag-1 ACF
    df = pd.DataFrame({
        "g": ["s"] * n,
        "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
        "eid": np.arange(n, dtype=np.int64),
        "v": x,
    })
    out = acf(rd.from_pandas(df), "g", "ts", "v", "eid",
              max_lag=2, num_partitions=2).to_pandas()
    d = x - x.mean()
    den = d @ d
    for k in (1, 2):
        want = round(float(d[:-k] @ d[k:] / den), 6)
        got = out[(out["g"] == "s") & (out["lag"] == k)]["acf"].iloc[0]
        assert got == pytest.approx(want)
    assert out[out["lag"] == 1]["acf"].iloc[0] > 0.8  # random walk


def test_acf_constant_series_emits_nothing():
    df = pd.DataFrame({
        "g": ["c"] * 5,
        "ts": pd.date_range("2024-01-01", periods=5, freq="1h"),
        "eid": np.arange(5, dtype=np.int64),
        "v": np.ones(5),
    })
    out = acf(rd.from_pandas(df), "g", "ts", "v", "eid").to_pandas()
    assert len(out) == 0  # zero denominator: no rows, not NaN


def test_ks_matches_brute_force():
    rng = np.random.default_rng(11)
    v1 = rng.normal(0, 1, 300)
    v2 = rng.normal(0.5, 1.2, 250)
    df = pd.DataFrame({
        "lbl": ["a"] * 300 + ["b"] * 250,
        "v": np.concatenate([v1, v2]),
    })
    out = ks_two_sample(rd.from_pandas(df), "lbl", "v", "a", "b",
                        num_partitions=4).to_pandas()
    # brute force over all distinct values
    allv = np.unique(df["v"].to_numpy())
    d = max(abs((v1 <= x).mean() - (v2 <= x).mean()) for x in allv)
    assert out["ks_d"].iloc[0] == pytest.approx(round(d, 6))
    assert out["n1"].iloc[0] == 300 and out["n2"].iloc[0] == 250


def test_ks_identical_samples_zero():
    v = np.arange(50, dtype=float)
    df = pd.DataFrame({"lbl": ["a"] * 50 + ["b"] * 50,
                       "v": np.concatenate([v, v])})
    out = ks_two_sample(rd.from_pandas(df), "lbl", "v", "a", "b").to_pandas()
    assert out["ks_d"].iloc[0] == 0.0


def test_ks_missing_label_empty():
    df = pd.DataFrame({"lbl": ["a"] * 10, "v": np.arange(10.0)})
    out = ks_two_sample(rd.from_pandas(df), "lbl", "v", "a", "b").to_pandas()
    assert len(out) == 0


def test_gini_entropy_brute_force():
    c = np.array([1, 1, 2, 5, 100], dtype=np.int64)
    out = gini_entropy(
        rd.from_arrow(pa.table({"c": pa.array(c, pa.int64())})), "c"
    ).to_pandas()
    cs = np.sort(c).astype(float)
    k, tot = len(cs), cs.sum()
    gini = 2 * (np.arange(1, k + 1) @ cs) / (k * tot) - (k + 1) / k
    p = cs / tot
    ent = -(p * np.log(p)).sum()
    assert out["gini"].iloc[0] == pytest.approx(round(gini, 6))
    assert out["entropy"].iloc[0] == pytest.approx(round(ent, 6))
    assert out["norm_entropy"].iloc[0] == pytest.approx(
        round(ent / np.log(k), 6))
    assert out["k"].iloc[0] == 5 and out["total"].iloc[0] == 109


def test_gini_uniform_is_zero_entropy_max():
    c = np.full(8, 3, dtype=np.int64)
    out = gini_entropy(
        rd.from_arrow(pa.table({"c": pa.array(c, pa.int64())})), "c"
    ).to_pandas()
    assert out["gini"].iloc[0] == pytest.approx(0.0, abs=1e-9)
    assert out["norm_entropy"].iloc[0] == pytest.approx(1.0)


def test_textrank_hub_token_ranks_first():
    import ray.data as rd

    from dedup_ray.stages.textstats import textrank_keywords

    # "hub" co-occurs with every other token; satellites only with hub
    docs = [f"hub sat{i}" for i in range(10)] * 3
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    out = textrank_keywords(rd.from_pandas(df), top_k=5,
                            num_partitions=2).to_pandas()
    assert out.iloc[0]["token"] == "hub"
    assert out.iloc[0]["rank"] > out.iloc[1]["rank"]


def test_textrank_matches_brute_force():
    import ray.data as rd

    from dedup_ray.stages.textstats import textrank_keywords

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(12)]
    docs = [" ".join(rng.choice(vocab, 20)) for _ in range(15)]
    df = pd.DataFrame({"doc_id": range(15), "text": docs})
    out = textrank_keywords(rd.from_pandas(df), top_k=12, iterations=8,
                            num_partitions=3).to_pandas()

    # brute force: same edges, same fixed-iteration weighted PR
    from collections import Counter
    edges = Counter()
    for d in docs:
        t = d.split()
        for a, b in zip(t[:-1], t[1:]):
            if a != b:
                edges[(min(a, b), max(a, b))] += 1
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    W = np.zeros((len(nodes), len(nodes)))
    for (a, b), n in edges.items():
        W[idx[a], idx[b]] += n
        W[idx[b], idx[a]] += n
    wu = W.sum(axis=1)
    r = np.ones(len(nodes))
    for _ in range(8):
        r = 0.15 + 0.85 * (W / wu[:, None]).T @ r
    want = {v: round(r[idx[v]], 6) for v in nodes}
    got = dict(zip(out["token"], out["rank"]))
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=2e-6)


def test_spearman_matches_scipy_style_brute_force():
    from dedup_ray.ops.stats import spearman

    rng = np.random.default_rng(21)
    x = rng.integers(1, 20, 500).astype(float)   # heavy ties
    y = x * 3 + rng.normal(0, 5, 500)
    df = pd.DataFrame({"x": x, "y": y})
    out = spearman(rd.from_pandas(df), "x", "y", x_bucket=1.0,
                   y_bucket=8.0, num_partitions=4).to_pandas()

    def midranks(v):
        order = np.argsort(v, kind="mergesort")
        r = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return r

    rx, ry = midranks(x), midranks(y)
    want = np.corrcoef(rx, ry)[0, 1]
    assert out["spearman"].iloc[0] == pytest.approx(round(want, 6),
                                                    abs=2e-6)
    assert out["n"].iloc[0] == 500


def test_spearman_perfect_monotone_is_one():
    from dedup_ray.ops.stats import spearman

    x = np.arange(1, 101, dtype=float)
    df = pd.DataFrame({"x": x, "y": np.exp(x / 20)})
    out = spearman(rd.from_pandas(df), "x", "y", x_bucket=10.0,
                   y_bucket=1.0, num_partitions=3).to_pandas()
    assert out["spearman"].iloc[0] == pytest.approx(1.0)


def test_trimmed_mean_matches_brute_force():
    from dedup_ray.ops.relational import grouped_trimmed_mean

    rng = np.random.default_rng(31)
    vals = np.concatenate([rng.normal(10, 2, 97), [1000, -1000, 500]])
    df = pd.DataFrame({"g": ["a"] * 100, "v": vals})
    out = grouped_trimmed_mean(rd.from_pandas(df), "g", "v",
                               trim=0.1, num_partitions=2).to_pandas()
    sv = np.sort(vals)
    want = round(float(sv[10:-10].mean()), 6)
    assert out["trimmed_mean"].iloc[0] == pytest.approx(want)
    # outliers gone: the trimmed mean sits near the bulk
    assert abs(out["trimmed_mean"].iloc[0] - 10) < 1


def test_benford_matches_brute_force():
    from dedup_ray.ops.stats import benford_audit

    rng = np.random.default_rng(41)
    # log-uniform 2-decimal values follow Benford; negatives/zeros drop
    v = np.concatenate([np.round(10 ** rng.uniform(0, 5, 2000), 2),
                        [-5.0, 0.0, 0.001]])
    out = benford_audit(
        rd.from_pandas(pd.DataFrame({"v": v})), "v",
        int_scale=100).to_pandas()
    s = np.round(v[v > 0] * 100).astype(np.int64)
    s = s[s >= 1]
    d = np.array([int(str(x)[0]) for x in s])
    n = len(s)
    exp_p = np.log10(1 + 1 / np.arange(1, 10))
    obs = np.bincount(d, minlength=10)[1:].astype(float)
    chi2 = round(float((((obs - n * exp_p) ** 2) / (n * exp_p)).sum()), 6)
    assert list(out["digit"]) == list(range(1, 10))
    assert list(out["n"]) == list(obs.astype(int))
    assert out["chi2"].iloc[0] == pytest.approx(chi2)
    # log-uniform data passes the Benford screen: chi2 small per digit
    assert chi2 < 30
    assert out["p_obs"].sum() == pytest.approx(1.0, abs=1e-4)


def test_token_class_association_separates_class_markers():
    from dedup_ray.stages.textstats import token_class_association

    rows = []
    for i in range(40):
        rows.append((i, "alpha common filler", "en"))
    for i in range(40, 60):
        rows.append((i, "beta common filler", "de"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    out = token_class_association(rd.from_pandas(df), label_col="lang",
                                  top_k=10, num_partitions=2).to_pandas()
    # 'alpha' marks the majority class, 'beta' the rest: both top by G2
    top2 = set(out["token"].head(2))
    assert top2 == {"alpha", "beta"}
    # shared tokens carry ~zero association
    shared = out[out["token"] == "common"]
    if len(shared):
        assert abs(shared["g2"].iloc[0]) < 1.0
    al = out[out["token"] == "alpha"].iloc[0]
    assert al["n_target"] == 40 and al["n_rest"] == 0
    assert al["mi"] > 0 and al["g2"] > 0


def test_token_class_association_g2_matches_closed_form():
    from dedup_ray.stages.textstats import token_class_association

    df = pd.DataFrame({
        "doc_id": range(10),
        "text": ["x"] * 6 + ["y"] * 4,
        "lang": ["en"] * 5 + ["de"] * 5,
    })
    out = token_class_association(rd.from_pandas(df), label_col="lang",
                                  top_k=5, num_partitions=2).to_pandas()
    # token x: a=5 (all en docs), b=1; n_t=5, n_r=5; +0.5 smoothing
    c = np.array([5.5, 1.5, 0.5, 4.5])
    tot = c.sum()
    r1, r2 = c[0] + c[1], c[2] + c[3]
    k1, k2 = c[0] + c[2], c[1] + c[3]
    e = np.array([r1 * k1, r1 * k2, r2 * k1, r2 * k2]) / tot
    want = round(2 * (c * np.log(c / e)).sum(), 6)
    got = out[out["token"] == "x"]["g2"].iloc[0]
    assert got == pytest.approx(want, abs=2e-6)


def test_kaplan_meier_hand_computed():
    from dedup_ray.ops.stats import kaplan_meier

    # users with lifetimes 0,0,1,2 days (all ending well before censor
    # horizon) and one censored user still active at the end
    base = pd.Timestamp("2024-01-01")
    rows = []
    for u, days in [(1, 0), (2, 0), (3, 1), (4, 2)]:
        rows.append((u, base))
        rows.append((u, base + pd.Timedelta(days=days)))
    rows.append((5, base))
    rows.append((5, base + pd.Timedelta(days=30)))  # corpus end, censored
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = kaplan_meier(rd.from_pandas(df), "user_id", "ts",
                       censor_horizon_days=7,
                       num_partitions=2).to_pandas()
    # deaths at t=0 (2 of 5), t=1 (1 of 3), t=2 (1 of 2); user 5 censored
    got = out.set_index("t_days")
    assert got.loc[0, "at_risk"] == 5 and got.loc[0, "deaths"] == 2
    assert got.loc[0, "survival"] == pytest.approx(round(3 / 5, 6))
    assert got.loc[1, "survival"] == pytest.approx(round(3 / 5 * 2 / 3, 6))
    assert got.loc[2, "survival"] == pytest.approx(
        round(3 / 5 * 2 / 3 * 1 / 2, 6))
    assert 30 not in got.index  # censored user never steps the curve


def test_isotonic_minimax_matches_pava():
    from dedup_ray.ops.stats import isotonic_calibration

    rng = np.random.default_rng(51)
    x = np.round(rng.uniform(0, 1, 300), 2)   # heavy ties
    y = (rng.uniform(0, 1, 300) < x * 0.8 + 0.1).astype(float)
    out = isotonic_calibration(
        rd.from_pandas(pd.DataFrame({"x": x, "y": y})), "x", "y"
    ).to_pandas().sort_values("x").reset_index(drop=True)

    # reference PAVA (pool adjacent violators) on the grouped table
    df = pd.DataFrame({"x": x, "y": y}).groupby("x").agg(
        w=("y", "size"), sy=("y", "sum")).sort_index()
    blocks = [[float(r.sy) / r.w, float(r.w), float(r.sy)]
              for r in df.itertuples()]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-15:
            w = blocks[i][1] + blocks[i + 1][1]
            s = blocks[i][2] + blocks[i + 1][2]
            blocks[i:i + 2] = [[s / w, w, s]]
            i = max(i - 1, 0)
        else:
            i += 1
    want = np.concatenate([[b[0]] * int(b[1]) for b in blocks])
    # expand per distinct x (weights are per-x counts)
    per_x = []
    pos = 0
    for r in df.itertuples():
        per_x.append(want[pos])
        pos += int(r.w)
    assert np.allclose(out["iso"].to_numpy(), np.round(per_x, 6),
                       atol=2e-6)
    # monotone non-decreasing
    assert (np.diff(out["iso"].to_numpy()) >= -1e-9).all()
