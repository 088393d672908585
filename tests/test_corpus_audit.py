"""Corpus-audit operators vs brute-force/numpy oracles: sampled dup-rate
estimator, Zipf OLS fit, mixed-language cluster audit."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_dup_rate_estimator_counts_exactly(ray_session):
    from dedup_ray.pipelines.queries import DUP_SAMPLE_BUCKETS
    from dedup_ray.util.dsutil import partitioned_group_apply
    from dedup_ray.util.hashing import content_digest

    # corpus with known dup structure: 90 uniques + 30 copies of 10 texts
    texts = [f"unique text {i}" for i in range(90)]
    texts += [f"dup text {i % 10}" for i in range(30)]
    digs = content_digest(texts)
    in_sample = [d for d in digs if int(d[:2], 16) < DUP_SAMPLE_BUCKETS]
    want_n, want_d = len(in_sample), len(set(in_sample))

    ds = rd.from_pandas(pd.DataFrame({"text": texts}))

    def sample(t: pa.Table) -> pa.Table:
        dig = content_digest(t["text"].to_pylist())
        keep = np.array([int(d[:2], 16) for d in dig]) < DUP_SAMPLE_BUCKETS
        return pa.table({"digest": pa.array(
            np.array(dig, dtype=object)[keep], pa.string())})

    sampled = ds.map_batches(sample, batch_format="pyarrow")

    def part(df):
        return pd.DataFrame({
            "n_rows": np.array([len(df)], np.int64),
            "n_distinct": np.array([df["digest"].nunique()], np.int64)})

    got = partitioned_group_apply(sampled, ["digest"], part).to_pandas()
    assert int(got["n_rows"].sum()) == want_n
    # distinct per digest-partition sums to the global distinct count
    # (each digest lives whole in one partition)
    assert int(got["n_distinct"].sum()) == want_d


def test_zipf_fit_slope_recovers_planted_power_law(ray_session):
    # counts EXACTLY c_r = 10^6 / r^0.8 (rounded) -> slope ~ -0.8
    from dedup_ray.pipelines.queries import ZIPF_TOP

    n = ZIPF_TOP
    counts = np.round(1e6 / np.arange(1, n + 1) ** 0.8).astype(np.int64)
    x = np.log(np.arange(1, n + 1, dtype=float))
    y = np.log(counts.astype(float))
    slope_want = np.polyfit(x, y, 1)[0]
    assert abs(slope_want + 0.8) < 0.01  # sanity on the plant itself


def test_mixed_lang_cluster_audit(ray_session):
    from dedup_ray.util.dsutil import hash_join, partitioned_group_apply

    clusters = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "cluster_id": np.array([0, 0, 0, 3, 3, 5], np.int64),
    })
    langs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "lang": ["en", "en", "de", "fr", "fr", "en"],
    })
    joined = hash_join(rd.from_pandas(clusters), rd.from_pandas(langs),
                       on="doc_id",
                       left_cols=["doc_id", "cluster_id"],
                       right_cols=["doc_id", "lang"], how="inner")

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_id")["lang"]
        out = pd.DataFrame({"n_docs": g.size().astype("int64"),
                            "n_langs": g.nunique().astype("int64")})
        out = out.reset_index()
        out["mixed"] = out["n_langs"] > 1
        return out

    got = partitioned_group_apply(joined, ["cluster_id"], audit) \
        .to_pandas().set_index("cluster_id").sort_index()
    assert got.loc[0, "n_docs"] == 3 and got.loc[0, "n_langs"] == 2
    assert bool(got.loc[0, "mixed"]) and not bool(got.loc[3, "mixed"])
    assert got.loc[5, "n_docs"] == 1 and not bool(got.loc[5, "mixed"])


def test_watermark_late_matches_pandas_expanding_max(ray_session):
    from dedup_ray.stages.ordering import watermark_late

    rng = np.random.default_rng(17)
    n = 5000
    # arrival order 0..n-1; event times wander with occasional big jumps
    # back (the late arrivals)
    base = 1_700_000_000_000_000  # us epoch
    steps = rng.integers(-400_000_000, 500_000_000, n)
    ts_us = base + np.cumsum(steps)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts_us.astype("datetime64[us]"),
    })
    delay = 250_000_000
    wm = pd.Series(ts_us).expanding().max().shift(1)
    gap = wm - delay - ts_us
    want_late = (gap > 0).fillna(False).to_numpy()
    want_by = np.where(want_late, gap.fillna(0).to_numpy(), 0).astype(
        np.int64)

    got = watermark_late(
        rd.from_pandas(df), "event_id", "ts", delay, num_partitions=7
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got["late"].to_numpy().tolist() == want_late.tolist()
    assert got["late_by_us"].to_numpy().tolist() == want_by.tolist()
    # sanity: the plant actually produced late rows
    assert want_late.sum() > 50


def test_cooccurrence_matches_brute_force(ray_session):
    from dedup_ray.ops.relational import cooccurrence

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 150, n),
        "v": [f"v{int(x)}" for x in rng.integers(0, 12, n)],
    })
    dd = df.drop_duplicates()
    expect = {}
    for _, sub in dd.groupby("k"):
        vs = sorted(sub["v"])
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                expect[(vs[i], vs[j])] = expect.get((vs[i], vs[j]), 0) + 1
    got = cooccurrence(rd.from_pandas(df), "k", "v").to_pandas()
    got_map = {(r.v_1, r.v_2): int(r.n_keys) for r in got.itertuples()}
    assert got_map == expect


def test_cooccurrence_max_values_cap(ray_session):
    from dedup_ray.ops.relational import cooccurrence

    # one hot key with 6 values: cap=3 keeps the 3 smallest -> C(3,2)=3
    df = pd.DataFrame({"k": [1] * 6, "v": [f"v{i}" for i in range(6)]})
    got = cooccurrence(rd.from_pandas(df), "k", "v",
                       max_values=3).to_pandas()
    pairs = set(zip(got["v_1"], got["v_2"]))
    assert pairs == {("v0", "v1"), ("v0", "v2"), ("v1", "v2")}
