"""Salted two-phase aggregation == plain groupby, under heavy key skew."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dedup_ray.util.salted import salted_group_agg


def test_salted_agg_matches_pandas_on_skewed_keys():
    rng = np.random.default_rng(13)
    # one pathologically hot key + a long tail
    keys = np.r_[np.repeat("hot", 20_000),
                 rng.choice([f"k{i}" for i in range(50)], 2_000)]
    vals = rng.integers(0, 1000, len(keys)).astype("int64")
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = salted_group_agg(
        ds, ["k"],
        {"n": ("v", "count"), "total": ("v", "sum"),
         "lo": ("v", "min"), "hi": ("v", "max")},
        salt=8, num_partitions=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.groupby("k").agg(
        n=("v", "size"), total=("v", "sum"), lo=("v", "min"), hi=("v", "max")
    ).reset_index().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"n": "int64"}), exp.astype({"n": "int64"})
    )


def test_salted_agg_rejects_non_algebraic():
    ds = ray.data.from_arrow(pa.table({"k": ["a"], "v": [1]}))
    import pytest

    with pytest.raises(ValueError):
        salted_group_agg(ds, ["k"], {"m": ("v", "median")})
