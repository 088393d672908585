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
    # an empty bucket dir, a missing table, a stray FILE named bucket=*,
    # and a non-numeric bucket suffix must all be tolerated, not fatal
    os.makedirs(os.path.join(root, "bands", "bucket=0042"))
    open(os.path.join(root, "digests", "bucket=0007.tmp"), "w").close()
    os.makedirs(os.path.join(root, "sigs", "bucket=junk"))

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
    # skip_over DROPS oversized runs entirely (cap truncates them)
    i1, i2 = triangle_pairs_grouped(key, skip_over=2)
    assert i1.tolist() == [4]
    assert i2.tolist() == [5]
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


def test_bench_memo_users_match_actual_consumption():
    # the cache-assisted annotation map must equal what the catalog
    # functions ACTUALLY consume (AST-derived), so a memo added or
    # removed in queries.py cannot silently misattribute bench timings
    import ast
    import inspect

    import bench
    from dedup_ray.pipelines import queries as Q

    calls = {"_simjoin_truth": "simjoin_truth", "_canopy": "canopy",
             "_chain_cc": "chain_cc", "_eval_sums": "eval_sums",
             "_nb_model": "nb_model"}
    src = inspect.getsource(Q)
    derived: dict = {}
    for node in ast.parse(src).body:
        if isinstance(node, ast.FunctionDef) and node.name in Q.QUERIES:
            names = {n.id for n in ast.walk(node)
                     if isinstance(n, ast.Name)}
            memos = {v for k, v in calls.items() if k in names}
            if memos:
                derived[node.name] = memos
    # the _eval_sums builder itself consumes _chain_cc: its consumers
    # are assisted only when both memos are warm
    for name in list(derived):
        if "eval_sums" in derived[name]:
            derived[name].add("chain_cc")
    assert {k: set(v) for k, v in bench._MEMO_USERS.items()} == derived
