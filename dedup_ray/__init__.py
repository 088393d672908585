"""dedup_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference pipeline (``heroxbd/dedup``, see SURVEY.md) on idiomatic Ray Data:

- ``sources``     : Parquet/pages readers + deterministic synthetic corpora
- ``stages``      : batch transforms (extract, shingle, MinHash, LSH, SimHash,
                    CDC substring + ExactSubstr coverage/cut, verification,
                    connected components, text stats, BPE train/encode,
                    ANN (brute/LSH/IVF/PQ), sketches, web cleaning,
                    mixing/packing/ordering, multimodal plumbing)
- ``ops``         : relational building blocks (joins, pair generation,
                    grouped collect, pairwise-cluster evaluation, PageRank,
                    similarity joins, table profiling, snapshot diff)
- ``conformance`` : reference-faithful operators (normalizers, token features,
                    labels, bag/glue clusterings) used as small-scale oracles
- ``pipelines``   : end-to-end near-dup dedup pipeline
- ``state``       : per-stage lineage manifests for resumable runs

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (tests, bench.py, or the driver).
"""

def _stabilize_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import race-free.

    Ray's parquet path resolution probes that module on EVERY read/write
    plan, catching only ``ModuleNotFoundError``.  Here aiohttp is absent, so
    the module raises partway through execution; two driver threads planning
    concurrently (parallel branch/part materialization) can race the import
    machinery and leave a half-initialized module in ``sys.modules`` — later
    probes then die with a bare ``ImportError: cannot import name
    'HTTPFileSystem'`` that Ray does not catch.  Installing a stub module
    (with an ``HTTPFileSystem`` class nothing will ever be an instance of)
    makes every subsequent probe deterministic: ``_is_http_filesystem``'s
    isinstance checks simply return False.
    """
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import fsspec.implementations

        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # noqa: N801 - mirrors the real class name
            def __init__(self, *a, **kw):
                raise ImportError("aiohttp is not available in this environment")

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub
        fsspec.implementations.http = stub


_stabilize_fsspec_http()

from dedup_ray.config import DedupConfig  # noqa: E402

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
