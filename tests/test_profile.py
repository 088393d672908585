"""Table profiler vs hand-computed stats, including nulls, temporal
columns and the empty corpus."""

import numpy as np
import pyarrow as pa
import ray.data

from dedup_ray.ops.profile import profile_table


def test_profile_basic():
    t = pa.table({
        "a": pa.array([1, 2, 2, None, 5], pa.int64()),
        "s": pa.array(["x", None, "y", "x", None], pa.string()),
        "f": pa.array([1.5, np.nan, 2.5, 2.5, -1.0], pa.float64()),
        "ts": pa.array([1000, 2000, 2000, 3000, None],
                       pa.timestamp("us")),
    })
    out = profile_table(ray.data.from_arrow(t).repartition(3),
                        ["a", "s", "f", "ts"]).to_pandas() \
        .set_index("col_name")
    assert out.loc["a", "n_nulls"] == 1 and out.loc["a", "n_distinct"] == 3
    assert out.loc["a", "min_num"] == 1.0 and out.loc["a", "max_num"] == 5.0
    assert out.loc["s", "n_nulls"] == 2 and out.loc["s", "n_distinct"] == 2
    assert np.isnan(out.loc["s", "min_num"])
    # NaN is a float VALUE, not a null
    assert out.loc["f", "n_nulls"] == 0
    assert out.loc["ts", "n_nulls"] == 1
    assert out.loc["ts", "min_num"] == 1000.0
    assert out.loc["ts", "max_num"] == 3000.0
    assert (out["n_rows"] == 5).all()


def test_profile_empty():
    t = pa.table({"a": pa.array([], pa.int64())})
    out = profile_table(ray.data.from_arrow(t), ["a"]).to_pandas()
    assert out["n_rows"].tolist() == [0]
    assert out["n_distinct"].tolist() == [0]
