"""Similarity join semantics (ops/simjoin.py) on planted corpora."""

import pyarrow as pa

import ray.data

from dedup_ray.ops.simjoin import similarity_join


def _mk(rows, id_name="id"):
    return ray.data.from_arrow(
        pa.table(
            {
                id_name: pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _words(seed, n):
    return " ".join(f"w{seed}x{i}" for i in range(n))


def test_truncation_neardup_found(ray_session):
    base = _words(1, 50)
    left = _mk([(1, base), (2, _words(2, 50))])
    right = _mk([(10, " ".join(base.split(" ")[:40]))])
    got = similarity_join(
        left, right, "id", "id", num_partitions=4
    ).to_pandas()
    assert set(zip(got["id_l"], got["id_r"])) == {(1, 10)}
    row = got.iloc[0]
    # 48 left shingles, 38 right shingles, all right ones shared
    assert row["inter"] == 38 and row["n_l"] == 48 and row["n_r"] == 38
    assert row["jaccard"] == 38 / 48


def test_tau_excludes_weak_overlap(ray_session):
    a = _words(1, 30) + " " + _words(9, 30)
    b = _words(2, 30) + " " + _words(9, 30)  # share only the suffix half
    got = similarity_join(
        _mk([(1, a)]), _mk([(2, b)]), "id", "id", tau=0.6, num_partitions=4
    ).to_pandas()
    assert len(got) == 0
    got = similarity_join(
        _mk([(1, a)]), _mk([(2, b)]), "id", "id", tau=0.3, num_partitions=4
    ).to_pandas()
    assert set(zip(got["id_l"], got["id_r"])) == {(1, 2)}


def test_df_cap_blocks_boilerplate_only_pairs(ray_session):
    # every left doc shares ONLY the boilerplate run with right doc 99;
    # with max_df small the boilerplate shingles can't block
    boiler = _words(7, 20)
    left = _mk([(i, _words(i, 30) + " " + boiler) for i in range(1, 9)])
    right = _mk([(99, boiler)])
    got = similarity_join(
        left, right, "id", "id", tau=0.1, max_df=4, num_partitions=4
    ).to_pandas()
    assert len(got) == 0
    # raising the cap lets the shared shingles block again
    got = similarity_join(
        left, right, "id", "id", tau=0.1, max_df=16, num_partitions=4
    ).to_pandas()
    assert len(got) == 8


def test_short_and_empty_docs_never_join(ray_session):
    left = _mk([(1, "a b"), (2, ""), (3, None), (4, _words(4, 40))])
    right = _mk([(1, "a b"), (4, _words(4, 40))])
    got = similarity_join(left, right, "id", "id", num_partitions=4).to_pandas()
    assert set(zip(got["id_l"], got["id_r"])) == {(4, 4)}
