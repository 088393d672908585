"""Raw-task hash exchange: join modes, multi-column keys, group apply,
void-block tolerance, ref chaining."""

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
