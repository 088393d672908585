"""Degenerate-corpus robustness for the round-2 fourth-sitting operators:
an empty events table and a documents table where NO document qualifies
for the tier corpus (all below min_tokens) must flow through every new
query — including the full tiered pipeline, whose exchanges then see
zero-row VOID-SCHEMA blocks in every reducer (the guard this exercises
in lsh/simhash/substring).
"""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_degenerate(tmp_path):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["short text"], pa.string()),
                "lang": pa.array(["en"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_event_queries_on_empty_events(tmp_path):
    import ray.data

    from dedup_ray.pipelines import queries as Q

    _write_degenerate(tmp_path)
    for name in (
        "asof_join_events",
        "range_join_events",
        "topk_per_user_events",
        "rolling_mean_events",
        "pivot_event_counts",
    ):
        r = Q.QUERIES[name](str(tmp_path))
        n = r.count() if isinstance(r, ray.data.Dataset) else r.num_rows
        assert n == 0, name


def test_tier_report_on_unqualified_corpus(tmp_path):
    """No doc reaches min_tokens → the pipeline runs over ZERO pages and
    every tier reports zero unions over zero components."""
    from dedup_ray.pipelines.queries import dedup_tier_report

    _write_degenerate(tmp_path)
    df = dedup_tier_report(str(tmp_path)).to_pandas()
    assert len(df) == 4
    assert (df["n_unions"] == 0).all()
    assert (df["components_after"] == 0).all()


def test_empty_corpus_int64_ids():
    """Zero-row pipeline input with INT64 ids: the exchange void-schema
    substitution must carry the caller's id dtype — a hardcoded string
    empty would crash the downstream Acero signature join on mismatched
    key types even at zero rows."""
    import ray.data as rd

    from dedup_ray import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
            "text": pa.array([], pa.large_string()),
            "lang": pa.array([], pa.string()),
        }
    )
    clusters, _ = dedup_pipeline(
        rd.from_arrow(empty),
        DedupConfig(minhash_concurrency=2, num_partitions=4),
        id_col="doc_id",
    )
    assert clusters.count() == 0
