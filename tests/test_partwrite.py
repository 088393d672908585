"""Partition-granular resumable output: committed buckets are skipped."""

import os

import pandas as pd
import ray.data as rd

from dedup_ray.state.partwrite import (
    committed_buckets,
    read_output,
    resumable_write,
)


def _corpus(n=200):
    return pd.DataFrame(
        {"url": [f"https://x.test/{i}" for i in range(n)],
         "cluster_id": [f"c{i % 37}" for i in range(n)]}
    )


def test_write_then_resume_skips_committed(tmp_path):
    root = str(tmp_path / "out")
    df = _corpus()
    r1 = resumable_write(rd.from_pandas(df), root, key_col="url", num_buckets=8)
    assert sorted(r1["written"]) == sorted(committed_buckets(root))
    assert r1["skipped"] == []
    total = read_output(root).count()
    assert total == len(df)

    # simulate a mid-run death: remove two committed buckets
    import shutil

    victims = r1["written"][:2]
    for b in victims:
        shutil.rmtree(os.path.join(root, f"bucket={b:04d}"))

    r2 = resumable_write(rd.from_pandas(df), root, key_col="url", num_buckets=8)
    assert sorted(r2["written"]) == sorted(victims)  # only missing work redone
    assert sorted(r2["skipped"]) == sorted(set(r1["written"]) - set(victims))
    out = read_output(root).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == len(df)
    assert set(out["url"]) == set(df["url"])


def test_inflight_tmp_cleaned(tmp_path):
    root = str(tmp_path / "out")
    os.makedirs(os.path.join(root, "_tmp.bucket=0001.999"), exist_ok=True)
    assert committed_buckets(root) == set()
    assert not os.path.exists(os.path.join(root, "_tmp.bucket=0001.999"))


def test_deterministic_bucketing(tmp_path):
    """Same rows land in the same buckets at any parallelism/run."""
    root1, root2 = str(tmp_path / "a"), str(tmp_path / "b")
    df = _corpus(100)
    resumable_write(
        rd.from_pandas(df).repartition(2), root1, key_col="url", num_buckets=8
    )
    resumable_write(
        rd.from_pandas(df).repartition(7), root2, key_col="url", num_buckets=8
    )
    assert committed_buckets(root1) == committed_buckets(root2)
    for b in committed_buckets(root1):
        a = read_output(os.path.join(root1, f"bucket={b:04d}")).to_pandas()
        c = read_output(os.path.join(root2, f"bucket={b:04d}")).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("url").reset_index(drop=True),
            c.sort_values("url").reset_index(drop=True),
        )
