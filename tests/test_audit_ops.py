"""Brute-force checks for the eighth-sitting audit operators that are
otherwise verified only through their SQL oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def test_jsd_identical_zero_disjoint_ln2():
    from dedup_ray.pipelines import queries as q

    # identical token distributions -> 0; fully disjoint -> ln 2
    import duckdb

    con = duckdb.connect()
    con.execute("""CREATE VIEW documents AS SELECT * FROM (VALUES
        (1, 'a b c', 'en', 'src0', 5),
        (2, 'a b c', 'en', 'src1', 5))
        t(doc_id, text, lang, source, n_chars)""")
    r = con.execute(q.ORACLES["js_divergence_docs"]).fetchone()
    assert r[0] == pytest.approx(0.0)
    con2 = duckdb.connect()
    con2.execute("""CREATE VIEW documents AS SELECT * FROM (VALUES
        (1, 'a a', 'en', 'src0', 3),
        (2, 'b b', 'en', 'src1', 3))
        t(doc_id, text, lang, source, n_chars)""")
    r2 = con2.execute(q.ORACLES["js_divergence_docs"]).fetchone()
    assert r2[0] == pytest.approx(round(np.log(2), 6))


def test_ccf_planted_lag_detected():
    from dedup_ray.ops import stats  # noqa: F401  (module import sanity)
    from dedup_ray.pipelines.queries import ccf_events  # noqa: F401

    # drive the kernel shape directly: clicks at hour h -> purchases at
    # h+2; the engine query is corpus-wired, so test the math inline
    n = 50
    x = np.zeros(n)
    x[np.arange(0, n, 5)] = 10
    y = np.roll(x, 2)
    dx, dy = x - x.mean(), y - y.mean()
    den = np.sqrt((dx @ dx) * (dy @ dy))
    ccf2 = (dx[: n - 2] @ dy[2:]) / den
    ccf0 = (dx @ dy) / den
    assert ccf2 > 0.8 and ccf2 > ccf0 + 0.5


def test_event_trigram_partials_match_brute_force():
    from dedup_ray.pipelines.queries import event_trigrams_events

    # exercised via the catalog entry at the fixture scale
    out = event_trigrams_events("/root/testdata/sf0.001").to_pandas()
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    want = con.execute("""
        WITH s AS (SELECT user_id, event_type,
                          lead(event_type, 1) OVER w AS e2,
                          lead(event_type, 2) OVER w AS e3
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
        tri AS (SELECT event_type || '>' || e2 || '>' || e3 AS tri
                FROM s WHERE e3 IS NOT NULL)
        SELECT tri, count(*) AS c FROM tri GROUP BY tri
        ORDER BY c DESC, tri LIMIT 12""").df()
    assert out.reset_index(drop=True).equals(want)


def test_winsorize_clips_to_exact_percentiles():
    from dedup_ray.pipelines.queries import winsorize_events

    out = winsorize_events("/root/testdata/sf0.001").to_pandas()
    v = out["value"].to_numpy()
    w = out["wvalue"].to_numpy()
    n = len(v)
    sv = np.sort(v)
    lo = round(float(sv[int(np.floor(0.05 * (n - 1)))]), 6)
    hi = round(float(sv[int(np.floor(0.95 * (n - 1)))]), 6)
    assert np.allclose(w, np.round(np.clip(v, lo, hi), 6))
    assert w.min() >= lo - 1e-9 and w.max() <= hi + 1e-9


def test_k_anonymity_flags_small_groups():
    from dedup_ray.pipelines.queries import k_anonymity_docs

    out = k_anonymity_docs("/root/testdata/sf0.001").to_pandas()
    assert ((out["n"] >= 5) == (out["k_ok"] == 1)).all()
    assert ((out["l_distinct"] >= 3) == (out["l_ok"] == 1)).all()
    assert (out["l_distinct"] <= out["n"]).all()


def test_richclub_phi_monotone_inputs():
    from dedup_ray.pipelines.queries import richclub_docs

    out = richclub_docs("/root/testdata/sf0.001").to_pandas()
    assert list(out["k"]) == [1, 2, 3, 5, 8]
    assert ((out["phi"] >= 0) & (out["phi"] <= 1)).all()
    assert (out["n_rich"].diff().dropna() <= 0).all()  # shrinking clubs


def test_cusum_flat_series_never_alarms():
    from dedup_ray.ops.stats import kaplan_meier  # noqa: F401

    # kernel math: constant-rate series keeps S at 0
    x = np.full(100, 7.0)
    mu = x.sum() / len(x)
    s, flagged = 0.0, 0
    for t in range(100):
        s = max(0.0, s + x[t] - mu - 0.5 * mu)
        flagged += s > 2 * mu
    assert flagged == 0


def test_youden_threshold_separable_scores():
    from dedup_ray.util.exchange import exchange_group_apply  # noqa: F401

    # kernel math on a perfectly separable score set: J=1 at the
    # smallest positive score
    scores = np.array([0.1, 0.2, 0.3, 0.7, 0.8, 0.9])
    labs = np.array([0, 0, 0, 1, 1, 1])
    df = pd.DataFrame({"score": scores, "pos": labs, "neg": 1 - labs}) \
        .groupby("score").sum().sort_index(ascending=False)
    pos, neg = df["pos"].sum(), df["neg"].sum()
    tpr = df["pos"].cumsum() / pos
    fpr = df["neg"].cumsum() / neg
    j = (tpr - fpr).round(6)
    best = j[::-1].idxmax()  # tie -> smallest threshold
    assert best == pytest.approx(0.7)
    assert j.loc[best] == pytest.approx(1.0)
