"""End-to-end dedup pipeline: recall/precision on planted duplicates + resume."""

import pyarrow.compute as pc
import pytest
import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.ops.evaluate import pairwise_prf_ds
from dedup_ray.pipelines.dedup import dedup_and_score, dedup_pipeline
from dedup_ray.sources.pages import planted_pages

CFG = DedupConfig(minhash_concurrency=2, batch_size=256, num_partitions=4)


@pytest.fixture(scope="module")
def corpus():
    pages, truth = planted_pages(n_base=80, seed=42)
    return pages, truth


def test_full_pipeline_recall_and_precision(corpus):
    """North-rule criterion: dup-pair recall >= 0.99 on planted truth.

    All three candidate paths (exact digest, MinHash/LSH, CDC-substring)
    feed the edge union; precision is protected by per-pair verification +
    boilerplate/containment rules.
    """
    pages, truth = corpus
    clusters, metrics = dedup_and_score(
        rd.from_arrow(pages), rd.from_arrow(truth), CFG
    )
    assert metrics["recall"] >= 0.99, metrics
    assert metrics["precision"] >= 0.97, metrics


def test_boilerplate_does_not_merge(corpus):
    """Docs sharing only the cookie-banner paragraph must stay separate."""
    pages, truth = corpus
    clusters, _ = dedup_pipeline(rd.from_arrow(pages), CFG)
    df = clusters.to_pandas()
    # base docs i%7==0 share the banner; they are distinct clusters in truth
    tdf = truth.to_pandas()
    m = df.merge(tdf, on="url")
    banner_bases = m[m["url"].str.contains("/p/0$|/p/7$|/p/14$|/p/21$")]
    # distinct truth clusters must not be collapsed into one predicted cluster
    grouped = banner_bases.groupby("cluster_id_x")["cluster_id_y"].nunique()
    assert (grouped == 1).all()


def test_resume_skips_completed_stages(tmp_path, corpus):
    pages, _ = corpus
    ckpt = str(tmp_path / "ckpt")
    c1, ctx1 = dedup_pipeline(rd.from_arrow(pages), CFG, checkpoint_dir=ckpt)
    df1 = c1.to_pandas().sort_values("url").reset_index(drop=True)
    assert ctx1.hits == [] and len(ctx1.misses) >= 5
    c2, ctx2 = dedup_pipeline(rd.from_arrow(pages), CFG, checkpoint_dir=ckpt)
    df2 = c2.to_pandas().sort_values("url").reset_index(drop=True)
    assert ctx2.misses == [] and set(ctx2.hits) == set(ctx1.misses)
    assert df1.equals(df2)
    # config change invalidates lineage
    cfg2 = DedupConfig(
        minhash_concurrency=2, batch_size=256, num_partitions=4, jaccard_threshold=0.6
    )
    _, ctx3 = dedup_pipeline(rd.from_arrow(pages), cfg2, checkpoint_dir=ckpt)
    assert ctx3.hits == []


def test_part_granular_signature_resume(tmp_path, corpus):
    """Kill mid-signature-stage: committed parts are not recomputed.

    Four input parts; part 0001's loader raises on the first run (the
    'kill').  The rerun must re-invoke ONLY the uncommitted part's loader,
    and the final clustering must equal a plain whole-input run.
    """
    pages, _ = corpus
    ckpt = str(tmp_path / "ckpt")
    n = pages.num_rows
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    slices = [pages.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(4)]
    calls: list[str] = []
    fail_once = {"0001": True}

    def make_part(pid, sl):
        def fn():
            calls.append(pid)
            if fail_once.get(pid):
                fail_once[pid] = False
                raise RuntimeError("simulated mid-stage death")
            return rd.from_arrow(sl)

        return fn

    parts = [(f"{i:04d}", make_part(f"{i:04d}", sl)) for i, sl in enumerate(slices)]

    with pytest.raises(RuntimeError, match="mid-stage death"):
        dedup_pipeline(
            rd.from_arrow(pages), CFG, checkpoint_dir=ckpt, pages_parts=parts
        )
    first_run_calls = list(calls)
    assert "0001" in first_run_calls

    calls.clear()
    c2, ctx2 = dedup_pipeline(
        rd.from_arrow(pages), CFG, checkpoint_dir=ckpt, pages_parts=parts
    )
    # only parts that had not committed were recomputed
    assert "0001" in calls
    recomputed = set(calls)
    committed_before = set(first_run_calls) - {"0001"}
    assert recomputed.isdisjoint(committed_before)
    assert {h.split("/")[1] for h in ctx2.part_hits} == committed_before

    plain, _ = dedup_pipeline(rd.from_arrow(pages), CFG)
    da = c2.to_pandas().sort_values("url").reset_index(drop=True)
    db = plain.to_pandas().sort_values("url").reset_index(drop=True)
    assert da.equals(db)

    # third run: whole-stage manifest hit, no part loaders invoked
    calls.clear()
    _, ctx3 = dedup_pipeline(
        rd.from_arrow(pages), CFG, checkpoint_dir=ckpt, pages_parts=parts
    )
    assert calls == [] and "signatures" in ctx3.hits


def test_deterministic_across_parallelism(corpus):
    """Same clusters regardless of batch/block layout (stand-in for N vs 4N)."""
    pages, _ = corpus
    a, _ = dedup_pipeline(rd.from_arrow(pages).repartition(2), CFG)
    b, _ = dedup_pipeline(rd.from_arrow(pages).repartition(13), CFG)
    da = a.to_pandas().sort_values("url").reset_index(drop=True)
    db = b.to_pandas().sort_values("url").reset_index(drop=True)
    assert da.equals(db)


def test_distributed_cc_path_matches_local(corpus):
    """cc_local_edge_limit=0 forces the distributed Large-Star/Small-Star
    component path end-to-end; the clustering must equal the driver
    union-find result (content-derived min-id labels are unique)."""
    pages, truth = corpus
    cfg_dist = DedupConfig(
        minhash_concurrency=2,
        batch_size=256,
        num_partitions=4,
        cc_local_edge_limit=0,
    )
    a, _ = dedup_pipeline(rd.from_arrow(pages), CFG)
    b, _ = dedup_pipeline(rd.from_arrow(pages), cfg_dist)
    da = a.to_pandas().sort_values("url").reset_index(drop=True)
    db = b.to_pandas().sort_values("url").reset_index(drop=True)
    assert (da["url"] == db["url"]).all()
    assert (da["cluster_id"] == db["cluster_id"]).all()


def test_simhash_path_enabled(corpus):
    """All four candidate paths on (exact, MinHash, SimHash, substring):
    recall must hold and precision must not collapse — SimHash edges are
    hamming-verified, so near-identical docs merge but distinct don't."""
    pages, truth = corpus
    cfg = DedupConfig(
        minhash_concurrency=2, batch_size=256, num_partitions=4
    )
    clusters, _ = dedup_pipeline(
        rd.from_arrow(pages), cfg, use_simhash=True
    )
    m = pairwise_prf_ds(
        clusters.materialize(), rd.from_arrow(truth), id_col="url",
        num_partitions=4,
    )
    assert m["recall"] >= 0.99, m
    assert m["precision"] >= 0.95, m


def test_part_layout_change_wipes_stale_parts(tmp_path, corpus):
    """Rerunning with a DIFFERENT part split must not mix stale committed
    part dirs into the stage output (duplicated rows)."""
    pages, _ = corpus
    ckpt = str(tmp_path / "ckpt")
    n = pages.num_rows
    halves = [pages.slice(0, n // 2), pages.slice(n // 2, n - n // 2)]
    quarters = [pages.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4)
                for i in range(4)]

    fail = {"0001": True}

    def part(pid, sl):
        def fn():
            if fail.get(pid):
                fail[pid] = False
                raise RuntimeError("die")
            return rd.from_arrow(sl)
        return fn

    four = [(f"{i:04d}", part(f"{i:04d}", sl)) for i, sl in enumerate(quarters)]
    with pytest.raises(RuntimeError):
        dedup_pipeline(rd.from_arrow(pages), CFG, checkpoint_dir=ckpt,
                       pages_parts=four)
    # rerun with a 2-part split: stale 4-way part dirs must be wiped
    two = [(f"{i:04d}", part(f"h{i}", sl)) for i, sl in enumerate(halves)]
    c2, _ = dedup_pipeline(rd.from_arrow(pages), CFG, checkpoint_dir=ckpt,
                           pages_parts=two)
    plain, _ = dedup_pipeline(rd.from_arrow(pages), CFG)
    da = c2.to_pandas().sort_values("url").reset_index(drop=True)
    db = plain.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(da) == pages.num_rows and da.equals(db)


def test_int64_id_corpus_full_pipeline(corpus):
    """Every stage must carry the corpus's NATIVE id dtype: documents
    tables are int64-keyed (doc_id) while page corpora are string-keyed
    (url).  Regression: edge/label schemas were once hardcoded string and
    the Acero joins failed on int64 ids."""
    import pyarrow as pa

    pages, truth = corpus
    # same planted corpus, re-keyed by int64 row number
    id_map = {u: i for i, u in enumerate(pages["url"].to_pylist())}
    pages_i = pages.drop_columns(["url"]).append_column(
        "doc_id", pa.array([id_map[u] for u in pages["url"].to_pylist()],
                           pa.int64())
    )
    clusters, _ = dedup_pipeline(rd.from_arrow(pages_i), CFG, id_col="doc_id")
    df = clusters.to_pandas()
    assert len(df) == pages.num_rows
    assert str(df["doc_id"].dtype) == "int64"
    # same partition as the string-keyed run (dtype must not change results)
    base, _ = dedup_pipeline(rd.from_arrow(pages), CFG)
    bdf = base.to_pandas()
    bdf["doc_id"] = bdf["url"].map(id_map)
    got = {frozenset(g["doc_id"]) for _, g in df.groupby("cluster_id")}
    want = {frozenset(g["doc_id"]) for _, g in bdf.groupby("cluster_id")}
    assert got == want


def test_extra_edges_merge_into_clusters():
    """extra_edges is the pipeline-level extension point: a caller-supplied
    edge merges two otherwise-unrelated documents' clusters."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline
    from dedup_ray.sources.pages import planted_pages

    pages, _ = planted_pages(n_base=30, seed=9)
    cfg = DedupConfig(minhash_concurrency=2, num_partitions=4)
    base, _ = dedup_pipeline(rd.from_arrow(pages), cfg)
    base = base.to_pandas()
    # pick two docs in different clusters and bridge them
    reps = base.groupby("cluster_id")["url"].min().tolist()
    assert len(reps) >= 2
    a, b = sorted(reps)[:2]
    bridge = rd.from_arrow(
        pa.table({"id1": pa.array([a]), "id2": pa.array([b])})
    )
    merged, _ = dedup_pipeline(
        rd.from_arrow(pages), cfg, extra_edges=[bridge]
    )
    merged = merged.to_pandas().set_index("url")["cluster_id"]
    assert merged[a] == merged[b]
    # everything else unchanged up to relabeling: same number of clusters
    # minus the one merge
    assert merged.nunique() == base["cluster_id"].nunique() - 1
