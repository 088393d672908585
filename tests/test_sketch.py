"""HyperLogLog sketch: estimate accuracy and merge property."""

import numpy as np
import pyarrow as pa

import ray.data

from dedup_ray.stages.sketch import (
    HLL_M,
    hll_estimate,
    hll_partial,
    hll_token_registers,
)


def _corpus(n_docs, vocab, rng):
    return ray.data.from_arrow(pa.table({
        "text": pa.array(
            [" ".join(rng.choice(vocab, 30)) for _ in range(n_docs)],
            pa.string(),
        )
    }))


def test_hll_estimate_within_expected_error():
    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(2000)]
    ds = _corpus(400, vocab, rng)
    regs = hll_token_registers(ds).to_pandas()
    est = hll_estimate(regs)
    # every vocab word almost surely appears in 400*30 draws; standard HLL
    # error at m=256 is ~6.5%, allow 3 sigma
    exact = 2000
    assert abs(est - exact) / exact < 0.20


def test_hll_small_range_linear_counting():
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(40)]
    est = hll_estimate(hll_token_registers(_corpus(50, vocab, rng)).to_pandas())
    assert abs(est - 40) / 40 < 0.10


def test_hll_registers_merge_by_max():
    toks_a = [f"a{i}" for i in range(500)]
    toks_b = [f"b{i}" for i in range(500)]
    ia, ra = hll_partial(toks_a)
    ib, rb = hll_partial(toks_b)
    iu, ru = hll_partial(toks_a + toks_b)
    merged = np.zeros(HLL_M, np.int64)
    np.maximum.at(merged, ia, ra)
    np.maximum.at(merged, ib, rb)
    union = np.zeros(HLL_M, np.int64)
    np.maximum.at(union, iu, ru)
    assert (merged == union).all()


def test_hll_rho_bounds():
    idx, rho = hll_partial([f"x{i}" for i in range(5000)])
    assert idx.min() >= 0 and idx.max() < HLL_M
    assert rho.min() >= 1 and rho.max() <= 53


def test_bloom_no_false_negatives_and_bounded_fp():
    from dedup_ray.stages.sketch import bloom_build, bloom_contains

    rng = np.random.default_rng(21)
    members = rng.integers(0, 2**63, 20_000, dtype=np.uint64)
    others = rng.integers(0, 2**63, 20_000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    bloom = bloom_build(members, bits_log2=20, k=4)
    assert bloom_contains(bloom, members).all()  # zero false negatives
    fp = bloom_contains(bloom, others).mean()
    # n/m = 20k/1M -> theoretical fp ~ (1-e^(-4*0.02))^4 ~ 3.5e-5
    assert fp < 0.01


def test_decontaminate_bloom_path_matches_exact():
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.webclean import (
        benchmark_gram_bloom,
        benchmark_gram_set,
        decontaminate,
    )

    def docs(texts):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))

    secret = " ".join(f"s{i}" for i in range(8))
    bench = docs([secret])
    train = docs([
        " ".join(f"t{i}" for i in range(20)),
        "pre " + secret + " post",
    ])
    exact = decontaminate(train, benchmark_gram_set(bench)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bloom = decontaminate(train, benchmark_gram_bloom(bench)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert exact.contaminated.tolist() == [0, 1]
    assert bloom.contaminated.tolist() == [0, 1]


def test_dd_sketch_quantile_guarantee():
    """DDSketch bound: every midpoint estimate within rel_err of the exact
    order statistic, over a heavy-tailed distribution spanning 6 orders of
    magnitude; the sketch state stays bounded by bin count."""
    import ray.data as rd

    from dedup_ray.stages.sketch import dd_quantiles, dd_sketch

    rng = np.random.default_rng(19)
    vals = np.exp(rng.normal(0, 3, size=20_000))  # lognormal, ~1e-6..1e6
    ds = rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())}))
    rel = 0.01
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    sk = dd_sketch(ds, "value", rel_err=rel).materialize()
    assert sk.count() < 3000  # bounded state, not corpus-sized
    est = dd_quantiles(sk, qs, rel_err=rel)
    srt = np.sort(vals)
    for q, e in zip(qs, est):
        exact = srt[int(np.floor(q * (len(vals) - 1)))]
        assert abs(e / exact - 1.0) <= rel + 1e-12, (q, e, exact)


def test_dd_sketch_merge_and_parallelism_invariance():
    """Bin assignment is a pure function of the value, so sketches are
    identical at any block structure and shard merges are plain addition."""
    import ray.data as rd

    from dedup_ray.stages.sketch import dd_sketch

    rng = np.random.default_rng(7)
    vals = rng.uniform(0.01, 500.0, size=5_000)
    t = pa.table({"value": pa.array(vals, pa.float64())})

    def rows(ds):
        return sorted(
            map(tuple, dd_sketch(ds, "value").to_pandas().to_numpy())
        )

    one_block = rows(rd.from_arrow(t))
    many_blocks = rows(
        rd.from_arrow([t.slice(i, 137) for i in range(0, len(vals), 137)])
    )
    assert one_block == many_blocks
    # shard-merge = concatenate partials and re-sum (what groupby did)
    import pandas as pd

    a = dd_sketch(rd.from_arrow(t.slice(0, 2500)), "value").to_pandas()
    b = dd_sketch(rd.from_arrow(t.slice(2500)), "value").to_pandas()
    merged = (
        pd.concat([a, b]).groupby("bin", as_index=False)["n"].sum()
    )
    assert sorted(map(tuple, merged.to_numpy())) == one_block


def test_dd_sketch_empty_raises():
    """All-nonpositive input sketches to nothing; quantile extraction must
    fail loudly, not with an opaque IndexError."""
    import pytest
    import ray.data as rd

    from dedup_ray.stages.sketch import dd_quantiles, dd_sketch

    ds = rd.from_arrow(
        pa.table({"value": pa.array([-1.0, 0.0, float("nan")])})
    )
    sk = dd_sketch(ds, "value").materialize()
    with pytest.raises(ValueError, match="empty sketch"):
        dd_quantiles(sk, [0.5])


def test_cms_never_undercounts_and_bounds_overcount():
    """The Count-Min guarantee itself: est >= true for every token, and
    E[overcount] per row ~ N/w — assert a generous 5x bound on the mean."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.sketch import CMS_W, cms_estimate, cms_token_registers

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(1000)]
    # zipf-ish frequencies over a 30k-token corpus
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    toks = rng.choice(vocab, size=30_000, p=weights)
    docs = [" ".join(toks[i: i + 100]) for i in range(0, len(toks), 100)]
    regs = cms_token_registers(
        rd.from_pandas(pd.DataFrame({"text": docs}))
    ).to_pandas()
    exact = pd.Series(toks).value_counts()
    qs = exact.index.tolist()
    est = cms_estimate(regs, qs)
    true = exact.to_numpy()
    assert (est >= true).all()
    n = len(toks)
    assert (est - true).mean() <= 5 * n / CMS_W
    # the heavy hitters are essentially exact (their register dominates)
    assert (est[:10] - true[:10]).max() <= n / 10


def test_cms_registers_merge_by_sum():
    """Sketch of a union == summed sketches of the parts (mergeability)."""
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.sketch import cms_token_registers

    a = ["a b c", "a a d"]
    b = ["c c e", "b"]
    whole = cms_token_registers(
        rd.from_pandas(pd.DataFrame({"text": a + b}))
    ).to_pandas().set_index(["hrow", "bucket"])["cnt"]
    pa_ = cms_token_registers(
        rd.from_pandas(pd.DataFrame({"text": a}))
    ).to_pandas().set_index(["hrow", "bucket"])["cnt"]
    pb_ = cms_token_registers(
        rd.from_pandas(pd.DataFrame({"text": b}))
    ).to_pandas().set_index(["hrow", "bucket"])["cnt"]
    merged = pa_.add(pb_, fill_value=0).astype("int64")
    pd.testing.assert_series_equal(
        whole.sort_index(), merged.sort_index(), check_names=False
    )


def test_hll_grouped_registers_estimates_per_group(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.sketch import hll_estimate, hll_grouped_registers

    rng = np.random.default_rng(77)
    rows = []
    truth = {"a": 50, "b": 400, "c": 3}
    for g, n in truth.items():
        ids = rng.choice(n * 10, n, replace=False)  # n distinct values
        for v in ids:
            for _ in range(rng.integers(1, 4)):  # repeats must not count
                rows.append((g, int(v)))
    rng.shuffle(rows)
    df = pd.DataFrame(rows, columns=["g", "v"])
    regs = hll_grouped_registers(
        rd.from_pandas(df, override_num_blocks=4), "g", "v"
    ).to_pandas()
    for g, n in truth.items():
        mine = regs[regs["g"] == g][["idx", "rho"]]
        est = hll_estimate(mine)
        assert abs(est - n) / n < 0.25, (g, est, n)  # 256 registers ~6.5%
