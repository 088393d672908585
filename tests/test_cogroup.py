"""cogroup / upsert_latest: the N-ary co-partition primitive and the
MERGE-INTO compaction built on it (ops/relational.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from dedup_ray.ops.relational import cogroup, upsert_latest


def _ds(d: dict, parallelism: int = 3):
    return ray.data.from_arrow(pa.table(d)).repartition(parallelism)


def test_cogroup_full_outer_aggregates():
    ev = _ds({"user_id": [1, 1, 2, 5], "value": [1.0, 2.0, 3.0, 4.0]})
    od = _ds({"o_custkey": [2, 2, 3], "o_totalprice": [10.0, 20.0, 30.0]})

    def per_part(e: pa.Table, o: pa.Table) -> pa.Table:
        eu = e["user_id"].to_numpy(zero_copy_only=False)
        ou = o["o_custkey"].to_numpy(zero_copy_only=False)
        keys = np.union1d(eu, ou)
        n_ev = np.zeros(len(keys), np.int64)
        n_od = np.zeros(len(keys), np.int64)
        if len(eu):
            np.add.at(n_ev, np.searchsorted(keys, eu), 1)
        if len(ou):
            np.add.at(n_od, np.searchsorted(keys, ou), 1)
        return pa.table({"user_id": pa.array(keys, pa.int64()),
                         "n_events": pa.array(n_ev),
                         "n_orders": pa.array(n_od)})

    out = cogroup(
        [ev, od], ["user_id", "o_custkey"], per_part, 4,
        empty_schemas=[
            pa.schema([("user_id", pa.int64()), ("value", pa.float64())]),
            pa.schema([("o_custkey", pa.int64()),
                       ("o_totalprice", pa.float64())]),
        ],
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    expect = pd.DataFrame({
        "user_id": [1, 2, 3, 5],
        "n_events": [2, 1, 0, 1],
        "n_orders": [0, 2, 1, 0],
    })
    pd.testing.assert_frame_equal(out, expect)


def test_cogroup_key_never_splits():
    # every row of one key must reach exactly one per_part call
    ev = _ds({"user_id": list(range(50)) * 3, "value": [1.0] * 150}, 7)
    od = _ds({"o_custkey": list(range(0, 100, 2)), "o_totalprice": [1.0] * 50}, 5)

    def per_part(e, o):
        eu = e["user_id"].to_numpy(zero_copy_only=False)
        ou = o["o_custkey"].to_numpy(zero_copy_only=False)
        keys = np.union1d(eu, ou)
        cnt = np.zeros(len(keys), np.int64)
        if len(eu):
            np.add.at(cnt, np.searchsorted(keys, eu), 1)
        return pa.table({"user_id": pa.array(keys, pa.int64()),
                         "n": pa.array(cnt)})

    out = cogroup(
        [ev, od], ["user_id", "o_custkey"], per_part, 8,
        empty_schemas=[
            pa.schema([("user_id", pa.int64()), ("value", pa.float64())]),
            pa.schema([("o_custkey", pa.int64()),
                       ("o_totalprice", pa.float64())]),
        ],
    ).to_pandas()
    # one output row per key overall (key wholly in one partition)
    assert out["user_id"].is_unique
    counts = out.set_index("user_id")["n"]
    for k in range(50):
        assert counts[k] == 3


@pytest.mark.parametrize("parallelism", [1, 5])
def test_upsert_latest(parallelism):
    base = _ds({"doc_id": [1, 2, 3, 4],
                "version": [1, 1, 1, 1],
                "n_chars": [10, 20, 30, 40]}, parallelism)
    upd = _ds({"doc_id": [2, 4, 9],
               "version": [2, 1, 1],
               "n_chars": [21, 41, 90]}, parallelism)
    out = upsert_latest(base, upd, "doc_id", "version") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    expect = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 9],
        "version": [1, 2, 1, 1, 1],
        # doc 4: same version on both sides -> update stream wins
        "n_chars": [10, 21, 30, 41, 90],
    })
    pd.testing.assert_frame_equal(out, expect)


def test_upsert_empty_updates():
    base = _ds({"doc_id": [1, 2], "version": [1, 1], "n_chars": [5, 6]})
    upd = _ds({"doc_id": [1], "version": [2], "n_chars": [7]}) \
        .filter(lambda r: False)
    out = upsert_latest(base, upd, "doc_id", "version") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_chars"]) == [5, 6]
