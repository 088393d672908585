"""Weighted dataset mixing: exact epoch counts, hash-threshold
proportions, determinism across partitionings, and parity with the
generated DuckDB oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dedup_ray.stages.mixing import frac_threshold_hex, mix_sources, mix_sql

N = 2000
WEIGHTS = {"drop": 0.0, "sub": 0.3, "keep": 1.0, "up": 2.25}


def _corpus():
    srcs = ["drop", "sub", "keep", "up"]
    return pa.table(
        {
            "doc_id": pa.array(range(N), pa.int64()),
            "source": pa.array([srcs[i % 4] for i in range(N)], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def mixed(ray_session):
    out = (
        mix_sources(rd.from_arrow(_corpus()), WEIGHTS, seed=7)
        .to_pandas()
        .sort_values(["doc_id", "epoch"])
        .reset_index(drop=True)
    )
    return out


def test_epoch_counts_per_weight(mixed):
    per = mixed.groupby("source").size()
    n = N // 4
    assert "drop" not in per.index                    # w=0: nothing
    assert per["keep"] == n                           # w=1: exactly once
    assert n * 2 <= per["up"] <= n * 3                # w=2.25: 2 + frac
    # fractional membership tracks the threshold (binomial, 5σ slack)
    for s, w in (("sub", 0.3), ("up", 0.25)):
        frac_rows = per[s] - int(WEIGHTS[s]) * n
        sd = (n * w * (1 - w)) ** 0.5
        assert abs(frac_rows - n * w) < 5 * sd, (s, frac_rows)


def test_full_epochs_always_present(mixed):
    up = mixed[mixed["source"] == "up"]
    counts = up.groupby("doc_id")["epoch"].agg(["min", "count"])
    assert (counts["count"] >= 2).all()
    assert (counts["min"] == 0).all()


def test_deterministic_and_partition_independent(ray_session):
    a = mix_sources(
        rd.from_arrow(_corpus()), WEIGHTS, seed=7
    ).to_pandas()
    b = mix_sources(
        rd.from_arrow(_corpus()).repartition(13), WEIGHTS, seed=7
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df.to_numpy()))
    assert key(a) == key(b)
    c = mix_sources(rd.from_arrow(_corpus()), WEIGHTS, seed=8).to_pandas()
    assert key(a) != key(c)  # seed participates


def test_matches_generated_sql_oracle(mixed):
    documents = _corpus()  # noqa: F841 — duckdb reads the local scope
    sql = mix_sql(WEIGHTS, table="documents", seed=7)
    oracle = duckdb.sql(sql).df().sort_values(["doc_id", "epoch"])
    got = mixed[["doc_id", "source", "epoch"]].reset_index(drop=True)
    want = oracle[["doc_id", "source", "epoch"]].reset_index(drop=True)
    assert got.equals(want.astype(got.dtypes.to_dict()))


def test_threshold_hex_bounds():
    assert frac_threshold_hex(1.0) == "00000000"  # no fractional epoch
    assert frac_threshold_hex(0.0) == "00000000"
    assert frac_threshold_hex(0.9999999999) == "ffffffff"
    # monotone in the fraction
    ts = [frac_threshold_hex(w) for w in np.linspace(0, 0.999, 50)]
    assert ts == sorted(ts)


def test_negative_weight_rejected(ray_session):
    with pytest.raises(ValueError, match="nonnegative"):
        mix_sources(rd.from_arrow(_corpus()), {"drop": -1.0})


def test_split_assign_fractions_and_stability():
    """Keyed md5 split: fractions within tolerance, append-stable."""
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.mixing import split_assign

    ids = list(range(5000))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = (
        split_assign(rd.from_pandas(pd.DataFrame({"doc_id": ids})), fr, seed=17)
        .to_pandas()
    )
    counts = out["split"].value_counts(normalize=True)
    for name, f in fr.items():
        assert abs(counts[name] - f) < 0.03
    # append stability: the first 1000 ids get the same split whether or
    # not the other 4000 exist (pure function of id+seed)
    sub = (
        split_assign(
            rd.from_pandas(pd.DataFrame({"doc_id": ids[:1000]})), fr, seed=17
        ).to_pandas()
    )
    merged = out[out["doc_id"] < 1000].sort_values("doc_id").reset_index(drop=True)
    sub = sub.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, sub)


def test_split_assign_bad_fractions():
    import pandas as pd
    import pytest
    import ray.data as rd

    from dedup_ray.stages.mixing import split_assign

    with pytest.raises(ValueError):
        split_assign(
            rd.from_pandas(pd.DataFrame({"doc_id": [1]})),
            {"a": 0.5, "b": 0.2},
        )


def test_cap_per_key_deterministic_and_bounded():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.relational import cap_per_key

    df = pd.DataFrame(
        {
            "host": [f"h{i % 7}" for i in range(300)],
            "doc_id": list(range(300)),
        }
    )
    a = (
        cap_per_key(rd.from_pandas(df), "host", "doc_id", k=5, num_partitions=3)
        .to_pandas().sort_values(["host", "doc_id"]).reset_index(drop=True)
    )
    b = (
        cap_per_key(rd.from_pandas(df), "host", "doc_id", k=5, num_partitions=11)
        .to_pandas().sort_values(["host", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("host").size() <= 5).all()
    assert a.groupby("host").size().sum() == 7 * 5
    # k larger than every group: identity on membership
    full = cap_per_key(
        rd.from_pandas(df), "host", "doc_id", k=1000, num_partitions=3
    ).to_pandas()
    assert len(full) == len(df)


def test_split_sql_single_split_is_valid():
    import duckdb

    from dedup_ray.stages.mixing import split_sql

    duckdb.sql("CREATE OR REPLACE VIEW documents AS SELECT 1 AS doc_id")
    out = duckdb.sql(split_sql({"all": 1.0})).fetchall()
    assert out == [(1, "all")]


def test_pseudonymize_tokens_stable_and_join_safe():
    import hashlib

    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.mixing import pseudonymize

    a = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 2, 1], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64())}))
    out = pseudonymize(a, ["user_id"], "k1").to_pandas()
    assert list(out.columns) == ["user_id_token", "v"]
    t1 = hashlib.md5(b"k1:1").hexdigest()[:16]
    assert out["user_id_token"].tolist() == [
        t1, hashlib.md5(b"k1:2").hexdigest()[:16], t1]
    # different secret -> different token space
    out2 = pseudonymize(a, ["user_id"], "k2").to_pandas()
    assert set(out2["user_id_token"]) != set(out["user_id_token"])


def test_stratified_sample_fractions_and_stability():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.mixing import stratified_sample

    n = 4000
    langs = np.where(np.arange(n) % 2 == 0, "en", "de")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(langs.tolist(), pa.string())}))
    out = stratified_sample(ds, {"en": 0.25, "de": 1.0}, "lang",
                            seed=9).to_pandas()
    en = (out["lang"] == "en").sum()
    de = (out["lang"] == "de").sum()
    assert de == n // 2  # fraction 1.0 keeps everything
    assert abs(en / (n // 2) - 0.25) < 0.05
    # append-stable: the same doc keeps its fate in a superset corpus
    half = ds.limit(2000)
    out_half = stratified_sample(half, {"en": 0.25, "de": 1.0}, "lang",
                                 seed=9).to_pandas()
    kept_ids = set(out[out.doc_id < 2000].doc_id)
    assert set(out_half.doc_id) == kept_ids
    # unlisted group drops
    out2 = stratified_sample(ds, {"en": 0.25}, "lang", seed=9).to_pandas()
    assert (out2["lang"] == "de").sum() == 0


def test_split_leakage_multibatch_dedup():
    """The same (digest, split) arriving from several batches counts as
    one split — exercised by forcing many small blocks."""
    from dedup_ray.pipelines.queries import split_leakage_docs

    out = split_leakage_docs("/root/testdata/sf0.001").to_pandas()
    assert (out["n_splits"] >= 2).all()
    assert (out["n_splits"] <= 3).all()  # only 3 splits exist


def test_weighted_sample_proportionality_and_determinism():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.mixing import weighted_sample

    n = 3000
    # half the docs weigh 10x more; expect them heavily over-represented
    w = np.where(np.arange(n) % 2 == 0, 10.0, 1.0)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "wt": pa.array(w, pa.float64())}))
    out = weighted_sample(ds, 300, "wt", seed=5).to_pandas()
    assert len(out) == 300
    heavy = (out["doc_id"] % 2 == 0).mean()
    assert heavy > 0.75  # 10x weight dominates the sample
    # deterministic + partition-invariant
    out2 = weighted_sample(ds.repartition(7), 300, "wt", seed=5) \
        .to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # zero/negative weights never sampled
    w3 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "wt": pa.array([0.0, -1.0], pa.float64())})
    assert weighted_sample(ray.data.from_arrow(w3), 5, "wt") \
        .count() == 0


def test_waterfill_hits_budget_exactly():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.mixing import waterfill_allocation

    counts = pd.DataFrame({"d": [f"h{i}" for i in range(6)],
                           "t": [5, 10, 20, 40, 100, 1000]})
    budget = 200
    out = waterfill_allocation(rd.from_pandas(counts), "d", "t",
                               budget).to_pandas()
    assert out["alloc"].sum() == pytest.approx(budget)
    # tail kept whole, head capped at a single waterline
    m = out.set_index("d")
    assert m.loc["h0", "alloc"] == 5 and m.loc["h1", "alloc"] == 10
    assert m.loc["h4", "alloc"] == m.loc["h5", "alloc"]  # both capped
    assert (out["alloc"] <= out["t"]).all()


def test_waterfill_budget_above_total_is_identity():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.mixing import waterfill_allocation

    counts = pd.DataFrame({"d": ["a", "b"], "t": [3, 7]})
    out = waterfill_allocation(rd.from_pandas(counts), "d", "t",
                               100).to_pandas()
    assert (out["alloc"] == out["t"]).all()


def test_temperature_weights_flatten_distribution():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.mixing import temperature_weights

    counts = pd.DataFrame({"d": ["tail", "head"], "t": [1, 1000]})
    out = temperature_weights(rd.from_pandas(counts), "d", "t",
                              alpha=0.3).to_pandas().set_index("d")
    raw_share = 1 / 1001
    assert out.loc["tail", "weight"] > raw_share * 10  # tail upweighted
    assert abs(out["weight"].sum() - 1.0) < 1e-5
