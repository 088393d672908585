"""dedup_tier_report: per-tier union attribution on a planted corpus.

The tier-separable corpus (``pages_tiered``) plants per qualifying doc an
exact mirror (only the exact tier can claim it) and an append-one-token
near-dup (only a near tier can); cumulative component counting then makes
each tier's contribution exact.  The test corpus adds one cross-document
near-dup pair, which must land in the MinHash tier's count.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_documents(tmp_path, n_docs=10):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    texts = [
        " ".join(rng.choice(vocab, size=60)) for _ in range(n_docs)
    ]
    # one genuine cross-document near-dup pair: doc 1 = doc 0 with one
    # token replaced (true Jaccard ~0.95 >> the 0.5 verify threshold)
    toks = texts[0].split(" ")
    toks[30] = "xreplaced"
    texts[1] = " ".join(toks)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n_docs, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return n_docs


def test_tier_attribution(tmp_path):
    from dedup_ray.pipelines.queries import dedup_tier_report

    n = _write_documents(tmp_path)
    t = dedup_tier_report(str(tmp_path)).to_pandas().set_index("tier")

    # exact tier: one mirror union per doc, nothing else (all texts distinct)
    assert t.loc["exact", "n_unions"] == n
    assert t.loc["exact", "components_after"] == 2 * n
    # minhash tier: one planted near-dup per doc + the one cross-doc pair
    assert t.loc["near_minhash", "n_unions"] == n + 1
    assert t.loc["near_minhash", "components_after"] == n - 1
    # later tiers arrive after connectivity is complete
    assert t.loc["near_simhash", "n_unions"] == 0
    assert t.loc["substring", "n_unions"] == 0
    assert t.loc["substring", "components_after"] == n - 1


def test_tier_edges_out_population():
    """The pipeline hook exposes one pinned edge Dataset per enabled tier."""
    import ray.data as rd

    from dedup_ray import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline
    from dedup_ray.sources.pages import planted_pages

    pages, _ = planted_pages(n_base=30, seed=5)
    tiers = {}
    clusters, _ = dedup_pipeline(
        rd.from_arrow(pages),
        DedupConfig(minhash_concurrency=2, num_partitions=4),
        tier_edges_out=tiers,
    )
    assert set(tiers) == {"exact", "near_minhash", "near_simhash", "substring"}
    total_edges = sum(ds.count() for ds in tiers.values())
    assert total_edges > 0
    # every tier dataset is (id1, id2) with the corpus id dtype (schema()
    # is None for a tier that found nothing — planted corpus guarantees
    # the exact and minhash tiers are non-empty)
    for name in ("exact", "near_minhash"):
        sch = tiers[name].schema()
        assert sch.names == ["id1", "id2"]


def test_tier_edges_only_requires_out_dict():
    import pytest
    import ray.data as rd

    from dedup_ray import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline
    from dedup_ray.sources.pages import planted_pages

    pages, _ = planted_pages(n_base=5, seed=1)
    with pytest.raises(ValueError, match="tier_edges_only"):
        dedup_pipeline(
            rd.from_arrow(pages), DedupConfig(), tier_edges_only=True
        )
