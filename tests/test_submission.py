"""S8 zip submission sink: round-trip, determinism, reference JSON shape."""

import json
import zipfile

import pandas as pd
import ray.data as rd

from dedup_ray.state.submission import read_submission_zip, write_submission_zip


def _clusters():
    # two blocks, interleaved cluster membership, unsorted input order
    rows = []
    for i in range(40):
        rows.append(
            {"id": f"p{39 - i}", "cluster_id": f"c{(39 - i) % 5}",
             "name": "alice" if i % 2 else "bob"}
        )
    return pd.DataFrame(rows)


def test_round_trip_and_shape(tmp_path):
    path = str(tmp_path / "sub.zip")
    df = _clusters()
    res = write_submission_zip(
        rd.from_pandas(df), path, id_col="id", cluster_col="cluster_id",
        block_col="name",
    )
    assert res["blocks"] == 2 and res["ids"] == 40
    parsed = read_submission_zip(path)
    # reference shape (lfilter.py:7-12): {block: [[id, ...], ...]}
    assert set(parsed) == {"alice", "bob"}
    for block, clusters in parsed.items():
        want = df[df["name"] == block]
        got_ids = sorted(i for c in clusters for i in c)
        assert got_ids == sorted(want["id"])
        # cluster partition matches the (block, cluster_id) grouping
        want_sets = {
            frozenset(g["id"]) for _, g in want.groupby("cluster_id")
        }
        assert {frozenset(c) for c in clusters} == want_sets


def test_byte_reproducible_and_ordered(tmp_path):
    p1, p2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    df = _clusters()
    write_submission_zip(rd.from_pandas(df), p1, block_col="name")
    # shuffled input order must produce the identical archive
    shuf = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    write_submission_zip(rd.from_pandas(shuf), p2, block_col="name")
    assert open(p1, "rb").read() == open(p2, "rb").read()
    with zipfile.ZipFile(p1) as zf:
        body = zf.read("result.json").decode()
    # blocks sorted, clusters ordered by first id, ids sorted within cluster
    parsed = json.loads(body)
    assert list(parsed) == sorted(parsed)
    for clusters in parsed.values():
        assert clusters == sorted(clusters, key=lambda c: c[0])
        for c in clusters:
            assert c == sorted(c)


def test_default_single_block(tmp_path):
    path = str(tmp_path / "all.zip")
    df = _clusters().drop(columns=["name"])
    res = write_submission_zip(rd.from_pandas(df), path)
    assert res["blocks"] == 1
    parsed = read_submission_zip(path)
    assert set(parsed) == {"all"}
    assert sum(len(c) for c in parsed["all"]) == 40
