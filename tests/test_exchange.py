"""Raw-task hash exchange: join modes, multi-column keys, group apply,
void-block tolerance, ref chaining."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dedup_ray.util.exchange import (
    exchange_group_apply,
    exchange_join,
    hash_exchange,
)


def _left():
    return rd.from_pandas(
        pd.DataFrame(
            {"k": ["a", "b", "c", "a", "d"], "x": [1, 2, 3, 4, 5]}
        )
    )


def _right():
    return rd.from_pandas(
        pd.DataFrame({"k": ["a", "b", "e"], "y": [10, 20, 50]})
    )


def test_inner_left_semi_anti():
    inner = exchange_join(_left(), _right(), on="k", num_partitions=4).to_pandas()
    assert sorted(zip(inner["k"], inner["x"], inner["y"])) == [
        ("a", 1, 10), ("a", 4, 10), ("b", 2, 20)
    ]
    left = exchange_join(
        _left(), _right(), on="k", how="left", num_partitions=4
    ).to_pandas()
    assert len(left) == 5
    assert left.loc[left["k"] == "c", "y"].isna().all()
    semi = exchange_join(
        _left(), _right(), on="k", how="semi", num_partitions=4
    ).to_pandas()
    assert sorted(semi["k"]) == ["a", "a", "b"]
    anti = exchange_join(
        _left(), _right(), on="k", how="anti", num_partitions=4
    ).to_pandas()
    assert sorted(anti["k"]) == ["c", "d"]


def test_left_prep_and_post_run_once_per_partition():
    calls = []

    def prep(t: pa.Table) -> pa.Table:
        calls.append(t.num_rows)
        return t

    out = exchange_join(
        _left(), _right(), on="k", num_partitions=3, left_prep=prep,
        post=lambda t: t.append_column("z", pa.array([0] * t.num_rows)),
    ).to_pandas()
    assert "z" in out.columns


def test_group_apply_multi_key_co_locates_groups():
    df = pd.DataFrame(
        {
            "a": [1, 1, 2, 2, 1, 2] * 10,
            "b": [7, 7, 8, 8, 7, 9] * 10,
            "v": range(60),
        }
    )

    def per_part(t: pa.Table) -> pa.Table:
        # every (a,b) group must be complete within one call
        pdf = t.to_pandas()
        g = pdf.groupby(["a", "b"]).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        exchange_group_apply(
            rd.from_pandas(df), ["a", "b"], per_part, num_partitions=4
        )
        .to_pandas()
        .groupby(["a", "b"])["n"]
        .sum()
    )
    assert out[(1, 7)] == 30 and out[(2, 8)] == 20 and out[(2, 9)] == 10
    # no group split across partitions: each (a,b) appears exactly once
    counts = (
        exchange_group_apply(
            rd.from_pandas(df), ["a", "b"], per_part, num_partitions=4
        )
        .to_pandas()
        .groupby(["a", "b"])
        .size()
    )
    assert (counts == 1).all()


def test_int_key_exchange():
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 2], "x": list("pqrs")}))
    right = rd.from_pandas(pd.DataFrame({"k": [2, 3], "y": ["Y2", "Y3"]}))
    out = exchange_join(left, right, on="k", num_partitions=3).to_pandas()
    assert sorted(zip(out["k"], out["x"], out["y"])) == [
        (2, "q", "Y2"), (2, "s", "Y2"), (3, "r", "Y3")
    ]


def test_ref_chaining():
    refs = exchange_join(
        _left(), _right(), on="k", num_partitions=4, return_refs=True
    )
    assert isinstance(refs, list)
    right2 = rd.from_pandas(pd.DataFrame({"x": [1, 4], "w": ["W1", "W4"]}))
    out = exchange_join(refs, right2, on="x", num_partitions=4).to_pandas()
    assert sorted(zip(out["x"], out["w"])) == [(1, "W1"), (4, "W4")]


def test_void_blocks_with_empty_schema():
    """A stream made entirely of schema-less empty blocks joins cleanly
    when empty_schema is given."""
    import ray

    void = ray.data.from_arrow([pa.table({})])
    schema = pa.schema([("k", pa.string()), ("y", pa.int64())])
    refs = exchange_join(
        void, _right(), on="k", num_partitions=2, empty_schema=schema,
        return_refs=True,
    )
    import ray

    tables = ray.get(refs)
    assert all(t.num_rows == 0 for t in tables)
    assert all(t.schema == schema for t in tables)


def _mk_blocks(n_blocks=9, rows=200, keys=23, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    tables = [
        pa.table(
            {
                "k": pa.array(
                    rng.integers(0, keys, size=rows).astype("int64")
                ),
                "v": pa.array(
                    rng.integers(0, 100, size=rows).astype("int64")
                ),
            }
        )
        for _ in range(n_blocks)
    ]
    expected = (
        pa.concat_tables(tables)
        .to_pandas()
        .groupby("k", as_index=False)["v"]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    return rd.from_arrow(tables), expected


def _group_sum_fn():
    # returned as a closure: module-level functions pickle by reference
    # and workers cannot import the test module
    def group_sum(t: pa.Table) -> pa.Table:
        out = t.to_pandas().groupby("k", as_index=False)["v"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    return group_sum


def test_hierarchical_exchange_matches_flat():
    """Two-level exchange (explicit group size → several block groups)
    produces exactly the flat exchange's partition contents."""
    from dedup_ray.util.exchange import (
        exchange_group_apply,
        hash_exchange_hierarchical,
    )

    ds, expected = _mk_blocks()
    flat = (
        exchange_group_apply(ds, ["k"], _group_sum_fn(), num_partitions=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    hier = (
        hash_exchange_hierarchical(
            [ds], [["k"]], _group_sum_fn(), num_partitions=4, group_blocks=2
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(flat, expected)
    pd.testing.assert_frame_equal(hier, expected)


def test_exchange_auto_routes_hierarchical():
    """A tiny ref_limit forces the flat entry point onto the two-level
    path; results are unchanged."""
    from dedup_ray.util.exchange import hash_exchange

    ds, expected = _mk_blocks(seed=4)
    out = (
        hash_exchange(
            [ds], [["k"]], _group_sum_fn(), num_partitions=4, ref_limit=1
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, expected)


def test_exchange_join_multi_key_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.util.exchange import exchange_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "k1": rng.integers(0, 5, 60),
        "k2": rng.choice(["x", "y", "z"], 60),
        "lv": np.arange(60),
    })
    right = pd.DataFrame({
        "k1": rng.integers(0, 5, 30),
        "k2": rng.choice(["x", "y", "z"], 30),
        "rv": np.arange(30) * 10,
    }).drop_duplicates(subset=["k1", "k2"])
    out = exchange_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on=["k1", "k2"], num_partitions=4,
        empty_schema=pa.schema([("k1", pa.int64()), ("k2", pa.string()),
                                ("lv", pa.int64()), ("rv", pa.int64())]),
    ).to_pandas()
    want = left.merge(right, on=["k1", "k2"])
    key = ["k1", "k2", "lv", "rv"]
    assert sorted(map(tuple, out[key].values.tolist())) == \
        sorted(map(tuple, want[key].values.tolist()))


def test_exchange_left_join_void_right_keeps_value_columns():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.util.exchange import exchange_join

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    # right: an EMPTY dataset whose blocks are void (column-less)
    right = rd.from_arrow(pa.table({})).map_batches(
        lambda t: t, batch_format="pyarrow")
    out = exchange_join(
        rd.from_pandas(left), right, on="k", how="left",
        num_partitions=2,
        empty_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64()),
                                ("rv", pa.int64())]),
    ).to_pandas()
    assert set(out.columns) >= {"k", "lv", "rv"}
    assert len(out) == 3 and out["rv"].isna().all()
