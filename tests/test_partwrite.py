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


def test_gc_checkpoints_policy(tmp_path):
    import json
    import os
    import time

    from dedup_ray.state.manifest import gc_checkpoints

    root = tmp_path / "ckpt"

    def mk_stage(name, cfg_hash, written_at=None, with_tmp=False,
                 meta=True, parquet=True):
        d = root / name / "data"
        d.mkdir(parents=True)
        if parquet:
            (d / "part-0.parquet").write_bytes(b"x" * 100)
        if with_tmp:
            (root / name / "data.tmp").mkdir()
            (root / name / "data.tmp" / "p.parquet").write_bytes(b"y" * 50)
            (d / "_tmp.part-3").mkdir()
        if meta:
            (root / name / "manifest.json").write_text(json.dumps({
                "stage": name, "config_hash": cfg_hash,
                "written_at": written_at or time.time(),
            }))

    mk_stage("live", "CUR", with_tmp=True)
    mk_stage("stale", "OLD")
    mk_stage("ancient", "CUR", written_at=time.time() - 10_000)
    mk_stage("orphan_empty", "X", meta=False, parquet=False)
    mk_stage("orphan_data", "X", meta=False, parquet=True)

    # dry run deletes nothing
    rep = gc_checkpoints(str(root), keep_config_hashes={"CUR"},
                         dry_run=True)
    assert (root / "stale").exists()
    assert any("stale" in p for p in rep["removed"])
    assert rep["bytes_freed"] > 0

    rep = gc_checkpoints(str(root), keep_config_hashes={"CUR"})
    names = {os.path.basename(p) for p in rep["removed"]}
    assert "stale" in names and "orphan_empty" in names
    assert not (root / "stale").exists()
    # live stage kept, but its in-flight debris is gone
    assert (root / "live" / "data" / "part-0.parquet").exists()
    assert not (root / "live" / "data.tmp").exists()
    assert not (root / "live" / "data" / "_tmp.part-3").exists()
    # committed data without metadata is conservatively kept
    assert (root / "orphan_data").exists()
    # age-only policy
    rep2 = gc_checkpoints(str(root), max_age_sec=5_000)
    assert any("ancient" in p for p in rep2["removed"])
    assert (root / "live").exists()
    # hash+age must BOTH hold when both given: live is CUR and fresh
    rep3 = gc_checkpoints(str(root), keep_config_hashes={"CUR"},
                          max_age_sec=5_000)
    assert (root / "live").exists()
