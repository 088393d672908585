"""Catalog invariants: every query has an oracle, names are unique and
stable, and the bench slice only references real entries."""


def test_every_query_has_an_oracle_and_vice_versa():
    from dedup_ray.pipelines.queries import ORACLES, QUERIES

    assert set(QUERIES) == set(ORACLES)
    assert all(callable(f) for f in QUERIES.values())
    assert all(isinstance(s, str) and s.strip() for s in ORACLES.values())


def test_bench_slice_is_a_subset_of_the_catalog():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "benchmod", pathlib.Path(__file__).parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from dedup_ray.pipelines.queries import QUERIES

    missing = [q for q in bench.BENCH_QUERIES if q not in QUERIES]
    assert missing == []
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_driver_entrypoints_expose_the_catalog():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "raymod", pathlib.Path(__file__).parent.parent / "__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = mod.queries()
    o = mod.oracle_sql()
    from dedup_ray.pipelines.queries import QUERIES

    assert set(q) == set(QUERIES)
    assert set(o) <= set(q)
