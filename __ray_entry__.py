"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the ``dedup_ray`` library) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → pages
    (HTML-wrapped, 2× amplified with planted dups) → extract → exact +
    MinHash/LSH + CDC-substring dedup → connected components → clusters."""
    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline
    from dedup_ray.sources.pages import pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001", amplify=2)
    cfg = DedupConfig(minhash_concurrency=4, num_partitions=8)
    clusters, _ = dedup_pipeline(pages, cfg)
    return clusters


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator family from SURVEY.md §2.

    See ``dedup_ray/pipelines/queries.py`` for the catalog.  EVERY key
    has an ``oracle_sql`` entry: the non-SQL-expressible operators
    (keyed-hash SimHash/fingerprints, weighted APSP, the iterative
    fixed points and the zlib screen) carry pinned measured-at-sf0.01
    oracles (``tools/gen_pinned_oracles.py``), valid at sf0.01 only."""
    from dedup_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dedup_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
