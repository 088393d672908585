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


def test_validate_rules_planted_violations():
    import pyarrow as pa

    from dedup_ray.ops.profile import validate_rules

    t = pa.table({
        "id": pa.array([1, 2, 2, 3, None, 3], pa.int64()),
        "v": pa.array([5.0, -1.0, 50.0, None, 7.0, 200.0]),
        "lang": pa.array(["en", "de", "EN!", None, "fr", "x"]),
        "src": pa.array(["web", "spam", "web", None, "wiki", "web"]),
    })
    rules = [
        {"name": "id_unique", "kind": "unique", "column": "id"},
        {"name": "v_nn", "kind": "not_null", "column": "v"},
        {"name": "v_range", "kind": "range", "column": "v",
         "lo": 0, "hi": 100},
        {"name": "lang_re", "kind": "regex", "column": "lang",
         "pattern": "[a-z]{2}"},
        {"name": "src_in", "kind": "isin", "column": "src",
         "values": ["web", "wiki"]},
    ]
    out = validate_rules(
        ray.data.from_arrow(t).repartition(3), rules, num_partitions=2
    ).to_pandas().set_index("rule")
    # dup ids: 2 twice, 3 twice, one null -> 5 non-null, 3 distinct -> 2
    assert out.loc["id_unique", "n_violations"] == 2
    assert out.loc["v_nn", "n_violations"] == 1
    assert out.loc["v_range", "n_violations"] == 2      # -1 and 200
    assert out.loc["lang_re", "n_violations"] == 2      # 'EN!' and 'x'
    assert out.loc["src_in", "n_violations"] == 1       # 'spam'
    assert (out["n_rows"] == 6).all()
