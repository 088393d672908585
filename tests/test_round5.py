"""Round-5 unit coverage: index_listing parity, the vectorized
triangle explode, cap semantics of the minimizer/FastSS pair explodes,
and the bench memo-consumer map staying in sync with the catalog."""

import os

import numpy as np
import pyarrow as pa


def test_index_listing_matches_per_probe_walk(tmp_path):
    # the one-walk listing must yield exactly the files the per-probe
    # os.listdir walk yields, for every table and bucket subset
    from dedup_ray.state.dedupindex import _bucket_files, index_listing

    root = str(tmp_path)
    made = {}
    for tbl in ("digests", "bands", "sigs"):
        for b in (0, 3, 17):
            d = os.path.join(root, tbl, f"bucket={b:04d}")
            os.makedirs(d)
            for fn in ("b.parquet", "a.parquet", "junk.txt"):
                open(os.path.join(d, fn), "w").close()
            made.setdefault(tbl, []).append(b)
    # an empty bucket dir and a missing table must both be tolerated
    os.makedirs(os.path.join(root, "bands", "bucket=0042"))

    listing = index_listing(root)
    for tbl, buckets in made.items():
        for ids in ([], [0], [3, 17], [0, 3, 17, 99]):
            assert _bucket_files(root, tbl, ids, listing) == _bucket_files(
                root, tbl, ids, None
            ), (tbl, ids)
    assert _bucket_files(root, "chunks", [0, 1], listing) == []
    assert 42 not in listing["bands"]  # empty bucket dir not listed


def test_triangle_pairs_grouped_order_and_cap():
    # the vectorized explode must emit the exact row-major triangle per
    # run (the order the np.triu_indices implementation produced) and
    # honor the truncating cap
    from dedup_ray.stages.lsh import triangle_pairs_grouped

    key = np.array(["a", "a", "a", "b", "c", "c"], dtype=object)
    i1, i2 = triangle_pairs_grouped(key)
    assert i1.tolist() == [0, 0, 1, 4]
    assert i2.tolist() == [1, 2, 2, 5]
    i1, i2 = triangle_pairs_grouped(key, cap=2)
    assert i1.tolist() == [0, 4]
    assert i2.tolist() == [1, 5]
    e1, e2 = triangle_pairs_grouped(np.array([], dtype=object))
    assert len(e1) == 0 and len(e2) == 0
    s1, s2 = triangle_pairs_grouped(np.array(["x"], dtype=object))
    assert len(s1) == 0 and len(s2) == 0


def test_minimizer_pairs_skips_oversized_buckets():
    # max_bucket keeps the historical SKIP semantics (whole bucket
    # dropped — observable undercount), not a truncating cap
    import ray.data as rd

    from dedup_ray.stages.shingle import minimizer_pairs

    # 4 docs sharing one 8-gram block: every pair shares its minimizers
    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([base + str(i) for i in range(4)]),
        }
    )
    uncapped = minimizer_pairs(
        rd.from_arrow(docs), "doc_id", "text", min_shared=1,
        num_partitions=2, max_bucket=None,
    ).to_pandas()
    assert len(uncapped) == 6  # full 4-clique
    capped = minimizer_pairs(
        rd.from_arrow(docs), "doc_id", "text", min_shared=1,
        num_partitions=2, max_bucket=3,
    ).to_pandas()
    # every shared minimizer bucket holds all 4 docs -> all skipped
    assert len(capped) == 0


def test_bench_memo_users_exist_in_catalog():
    # the cache-assisted annotation map must not drift from the catalog
    import bench
    from dedup_ray.pipelines import queries as Q

    for name, memos in bench._MEMO_USERS.items():
        assert name in Q.QUERIES, name
        for m in memos:
            assert m in (
                "chain_cc", "eval_sums", "simjoin_truth", "nb_model",
                "canopy",
            ), (name, m)
    # every memo consumer that bench times is annotated
    assert set(bench._MEMO_USERS) >= (
        {"similarity_self_join_docs", "blocking_quality_docs",
         "canopy_docs"} & set(bench.BENCH_QUERIES)
    )
