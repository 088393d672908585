"""dedup_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference pipeline (``heroxbd/dedup``, see SURVEY.md) on idiomatic Ray Data:

- ``sources``     : Parquet/pages readers + deterministic synthetic corpora
- ``stages``      : batch transforms (extract, shingle, MinHash, LSH, SimHash,
                    suffix-array, verification, connected components, text stats,
                    ANN, multimodal plumbing)
- ``ops``         : relational building blocks (joins, pair generation,
                    grouped collect, pairwise-cluster evaluation)
- ``conformance`` : reference-faithful operators (normalizers, token features,
                    labels, bag/glue clusterings) used as small-scale oracles
- ``pipelines``   : end-to-end near-dup dedup pipeline
- ``state``       : per-stage lineage manifests for resumable runs

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (tests, bench.py, or the driver).
"""

from dedup_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
