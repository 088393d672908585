"""Worker-crash resilience: a task attempt dying mid-exchange must not
lose or duplicate rows.

At 100-TB scale preemptions and OOM-kills are routine; the engine's own
all-to-all primitive (``util/exchange.py`` raw tasks) and Ray Data's
``map_batches`` both lean on Ray core's task retry (worker death →
re-execute, default ``max_retries``).  These tests simulate a preemption
with ``os._exit(1)`` on exactly ONE task attempt (an ``O_CREAT|O_EXCL``
flag file elects the victim) and assert the job completes with results
identical to an uninjected run — i.e. the reducers are idempotent and a
retry re-derives its partition from the immutable wave-1 objects.
"""

import numpy as np
import pandas as pd
import pyarrow as pa


def _expected(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.groupby("k", as_index=False)["v"]
        .sum()
        .astype({"k": "int64", "v": "int64"})
        .sort_values("k")
        .reset_index(drop=True)
    )


def _input_frame(n=4000, keys=37) -> pd.DataFrame:
    rng = np.random.default_rng(11)
    return pd.DataFrame(
        {
            "k": rng.integers(0, keys, size=n).astype("int64"),
            "v": rng.integers(0, 100, size=n).astype("int64"),
        }
    )


def test_exchange_reducer_survives_worker_crash(tmp_path):
    import ray.data as rd

    from dedup_ray.util.exchange import exchange_group_apply

    df = _input_frame()
    flag = str(tmp_path / "crashed-exchange")

    # self-contained closure: worker processes cannot import the test
    # module, so the injection logic lives inside the UDF
    def reducer(part: pa.Table) -> pa.Table:
        import os

        try:
            os.close(os.open(flag, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            os._exit(1)  # simulate preemption; Ray retries the task
        except FileExistsError:
            pass
        out = (
            part.to_pandas().groupby("k", as_index=False)["v"].sum()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    out = (
        exchange_group_apply(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            ["k"],
            reducer,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _expected(df))
    import os

    assert os.path.exists(flag)  # the injection really fired


def test_map_batches_survives_worker_crash(tmp_path):
    import ray.data as rd

    df = _input_frame()
    flag = str(tmp_path / "crashed-map")

    def double(batch: pa.Table) -> pa.Table:
        import os

        try:
            os.close(os.open(flag, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            os._exit(1)  # simulate preemption; Ray retries the task
        except FileExistsError:
            pass
        import pyarrow.compute as pc

        return batch.set_column(
            1, "v", pc.multiply(batch["v"], pa.scalar(2, pa.int64()))
        )

    out = (
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .map_batches(double, batch_format="pyarrow", batch_size=256)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = df.assign(v=df["v"] * 2).sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
    import os

    assert os.path.exists(flag)


def test_multi_source_bfs_survives_worker_crash(tmp_path):
    """An iterative exchange operator (frontier ⋈ edges per hop) must
    produce the identical distance table when one task attempt dies:
    the hop chain re-derives from immutable upstream objects."""
    import ray.data as rd

    from dedup_ray.ops.graph import multi_source_bfs

    rng = np.random.default_rng(13)
    src = rng.integers(0, 80, size=200).astype(np.int64)
    dst = rng.integers(0, 80, size=200).astype(np.int64)
    flag = str(tmp_path / "crashed-bfs")

    def mk_edges(crash: bool):
        def f(t: pa.Table) -> pa.Table:
            import os

            if crash:
                try:
                    os.close(os.open(flag,
                                     os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                    os._exit(1)
                except FileExistsError:
                    pass
            return t
        return f

    edges_tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    seeds = rd.from_arrow(pa.table({"node": pa.array([0, 40],
                                                     pa.int64())}))

    # local_edge_limit=0 forces the distributed hop chain — the code
    # path whose crash recovery this test exists to exercise
    clean = multi_source_bfs(
        rd.from_arrow(edges_tbl).repartition(4), seeds, max_hops=3,
        num_partitions=3, local_edge_limit=0).to_pandas()
    injected = multi_source_bfs(
        rd.from_arrow(edges_tbl).repartition(4)
        .map_batches(mk_edges(True), batch_format="pyarrow"),
        seeds, max_hops=3, num_partitions=3,
        local_edge_limit=0).to_pandas()

    a = dict(zip(clean["node"], clean["dist"]))
    b = dict(zip(injected["node"], injected["dist"]))
    assert a == b
