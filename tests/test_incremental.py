"""Incremental dedup against a persisted index.

Covers: index build/append round-trip, exact + near anchoring of a new
shard to existing clusters, fresh docs forming their own clusters,
cluster-merge recording + chain resolution across shards, and the
partition-equivalence invariant: (base run → index → incremental shard)
groups shard docs the same way as one batch run over base ∪ shard.
"""

import pyarrow as pa
import pytest

import ray.data as rd

from dedup_ray.config import DedupConfig
from dedup_ray.pipelines.dedup import compact_signature_table, dedup_pipeline
from dedup_ray.pipelines.incremental import dedup_against_index
from dedup_ray.sources.pages import planted_pages
from dedup_ray.state.dedupindex import build_index, load_manifest, load_merges

CFG = DedupConfig(
    minhash_concurrency=2, num_partitions=4, sign_batch_size=256
)


def _mutate(text: str, frac: float = 0.02) -> str:
    """Deterministic ~frac token edit (near-duplicate generator)."""
    toks = text.split()
    step = max(2, int(1 / frac))
    for i in range(0, len(toks), step):
        toks[i] = toks[i] + "x"
    return " ".join(toks)


def _fresh(i: int) -> str:
    return " ".join(f"fresh{i}tok{j}q{(i * 31 + j * 7) % 97}" for j in range(120))


@pytest.fixture(scope="module")
def base_index(tmp_path_factory):
    """Base corpus run (minhash+exact only) → clusters + persisted index."""
    root = str(tmp_path_factory.mktemp("dedupindex"))
    pages, _ = planted_pages(n_base=40, seed=7)
    clusters, _ = dedup_pipeline(
        rd.from_arrow(pages), CFG, use_simhash=False, use_substring=False
    )
    clusters = clusters.materialize()
    compact = compact_signature_table(
        rd.from_arrow(pages), CFG, "url", extract=True,
        with_simhash=False, with_chunks=False,
    )
    man = build_index(compact, clusters, root, CFG, id_col="url",
                      num_buckets=16)
    return root, pages, clusters.to_pandas(), man


def test_index_manifest(base_index):
    root, pages, clusters, man = base_index
    # every table is per DISTINCT TEXT (digest representative): exact
    # copies collapse, so sigs == digests < docs on a planted corpus
    n_reps = man["rows"]["sigs"]
    assert 0 < n_reps < pages.num_rows
    assert man["rows"]["digests"] == n_reps
    assert man["rows"]["bands"] == n_reps * CFG.bands
    assert load_manifest(root)["semantic_hash"] == CFG.semantic_hash()


def test_config_mismatch_rejected(base_index):
    root, *_ = base_index
    shard = rd.from_arrow(
        pa.table({"url": ["s://x"], "text": [_fresh(0)], "lang": ["en"]})
    )
    with pytest.raises(ValueError, match="different DedupConfig"):
        dedup_against_index(shard, root, DedupConfig(num_perms=64, bands=16))


def test_shard_anchors_and_fresh_docs(base_index):
    root, pages, clusters, _ = base_index
    texts = pages["text"].to_pylist()
    urls = pages["url"].to_pylist()
    cl = dict(zip(clusters["url"], clusters["cluster_id"]))

    # shard: exact copy of base doc 0, near-dup of base doc 1, two fresh
    # docs that duplicate each other, one fresh singleton
    shard = pa.table(
        {
            "url": ["s://exact", "s://near", "s://pair-a", "s://pair-b",
                     "s://solo"],
            "text": [texts[0], _mutate(texts[1]), _fresh(1), _fresh(1),
                      _fresh(2)],
            "lang": ["en"] * 5,
        }
    )
    out, report = dedup_against_index(
        rd.from_arrow(shard), root, CFG, extract=False
    )
    got = dict(zip(*(out.to_pandas()[c] for c in ("url", "cluster_id"))))

    assert got["s://exact"] == cl[urls[0]]          # digest-path anchor
    assert got["s://near"] == cl[urls[1]]           # band-path anchor
    assert got["s://pair-a"] == got["s://pair-b"]   # in-shard dedup
    assert got["s://pair-a"] == "s://pair-a"        # fresh cluster, min id
    assert got["s://solo"] == "s://solo"            # untouched singleton
    assert report["n_docs"] == 5
    assert report["digest_hits"] >= 1
    assert report["merges"] == 0


def test_bridge_merge(tmp_path):
    """Two distinct base clusters; a shard doc near-dups both → single
    component with two anchors → min-anchor wins, merge recorded, and the
    retired id resolves through load_merges for the NEXT shard."""
    root = str(tmp_path / "idx")
    # Calibrated geometry (shingle_k=3, est-Jaccard τ=0.5): A and B share
    # half their shingles (J(A,B)≈1/3 < τ → distinct clusters); bridge
    # C = A ∪ B superset (J(C,A)=|A|/|C|≈0.5+ε… superset Jaccard =
    # |A|/|A∪B| = 1/2).  MinHash ESTIMATES hover at the threshold for
    # J=0.5, so push overlap: A and B share 40%, C = A∪B gives
    # J(C,A)=J(C,B)≈0.7 ≥ τ while J(A,B)≈0.25 < τ.
    shared = [f"common{j}w{j % 13}" for j in range(40)]
    only_a = [f"alpha{j}u{j % 11}" for j in range(60)]
    only_b = [f"beta{j}v{j % 11}" for j in range(60)]
    text_a = " ".join(shared + only_a)
    text_b = " ".join(shared + only_b)
    text_c = " ".join(shared + only_a + only_b)

    base = pa.table(
        {
            "url": ["b://a", "b://b"],
            "text": [text_a, text_b],
            "lang": ["en", "en"],
        }
    )
    clusters, _ = dedup_pipeline(
        rd.from_arrow(base), CFG, extract=False,
        use_simhash=False, use_substring=False,
    )
    cdf = clusters.to_pandas()
    assert cdf["cluster_id"].nunique() == 2, "base clusters must be distinct"
    compact = compact_signature_table(
        rd.from_arrow(base), CFG, "url", extract=False,
        with_simhash=False, with_chunks=False,
    )
    build_index(compact, clusters, root, CFG, id_col="url", num_buckets=8)

    shard1 = pa.table(
        {"url": ["s://bridge"], "text": [text_c], "lang": ["en"]}
    )
    out1, rep1 = dedup_against_index(
        rd.from_arrow(shard1), root, CFG, extract=False, update_index=True
    )
    d1 = out1.to_pandas()
    assert d1["cluster_id"].iloc[0] == "b://a"  # min of the two anchors
    assert rep1["merges"] == 1
    assert load_merges(root) == {"b://b": "b://a"}

    # next shard: exact dup of text_b — its index digest row predates the
    # merge and carries the RETIRED id; the anchor remap must resolve it
    shard2 = pa.table(
        {"url": ["s://late"], "text": [text_b], "lang": ["en"]}
    )
    out2, rep2 = dedup_against_index(
        rd.from_arrow(shard2), root, CFG, extract=False
    )
    d2 = out2.to_pandas()
    assert d2["cluster_id"].iloc[0] == "b://a"
    assert rep2["digest_hits"] >= 1


def _long_text(tag: str, n: int = 150) -> str:
    return " ".join(f"{tag}{j}m{(j * 13) % 89}" for j in range(n))


@pytest.fixture(scope="module")
def chunked_index(tmp_path_factory):
    """Index WITH the substring extension (chunks/chunkblobs tables)."""
    root = str(tmp_path_factory.mktemp("chunkidx"))
    base = pa.table(
        {
            "url": [f"b://doc{i}" for i in range(6)],
            "text": [_long_text(f"base{i}") for i in range(6)],
            "lang": ["en"] * 6,
        }
    )
    clusters, _ = dedup_pipeline(
        rd.from_arrow(base), CFG, extract=False,
        use_simhash=False, use_substring=False,
    )
    compact = compact_signature_table(
        rd.from_arrow(base), CFG, "url", extract=False,
        with_simhash=False, with_chunks=True,
    )
    man = build_index(compact, clusters, root, CFG, id_col="url",
                      num_buckets=8)
    return root, base, man


def test_chunked_manifest(chunked_index):
    root, base, man = chunked_index
    assert man["has_chunks"] is True
    assert man["rows"]["chunkblobs"] == base.num_rows
    assert man["rows"]["chunks"] > 0
    assert load_manifest(root)["has_chunks"] is True


def test_substring_containment_anchor(chunked_index):
    """A shard page CONTAINING an indexed doc verbatim anchors through the
    chunk tables even though MinHash misses (superset Jaccard < 0.5) and
    the digest differs."""
    root, base, _ = chunked_index
    inner = base["text"][1].as_py()
    shard = pa.table(
        {
            "url": ["s://superset", "s://unrelated"],
            # padding >> inner so shingle Jaccard ~ |inner|/|superset| < 0.5
            "text": [
                _long_text("pad-a", 200) + " " + inner + " "
                + _long_text("pad-b", 200),
                _long_text("nothing-shared", 180),
            ],
            "lang": ["en"] * 2,
        }
    )
    out, report = dedup_against_index(rd.from_arrow(shard), root, CFG)
    got = dict(zip(*(out.to_pandas()[c] for c in ("url", "cluster_id"))))
    assert report["substring_edges"] >= 1
    assert got["s://superset"] == "b://doc1"
    assert got["s://unrelated"] == "s://unrelated"
    # forcing the substring path off loses the containment anchor
    out2, rep2 = dedup_against_index(
        rd.from_arrow(shard), root, CFG, with_substring=False
    )
    got2 = dict(zip(*(out2.to_pandas()[c] for c in ("url", "cluster_id"))))
    assert got2["s://superset"] == "s://superset"
    assert "substring_edges" not in rep2


def test_boilerplate_chunks_do_not_anchor(tmp_path):
    """Many indexed docs share a cookie banner; a shard doc sharing ONLY
    the banner must not anchor — its chunks exceed the df bound and are
    excluded from pair emission and run scoring."""
    root = str(tmp_path / "bidx")
    banner = " ".join(
        "this website uses cookies accept decline privacy policy "
        "terms of service contact imprint newsletter subscribe "
        "follow us on social media all rights reserved".split()
    )
    n = 12  # > boilerplate_max_df=8 docs carry the banner
    base = pa.table(
        {
            "url": [f"b://page{i}" for i in range(n)],
            "text": [_long_text(f"body{i}", 120) + " " + banner
                     for i in range(n)],
            "lang": ["en"] * n,
        }
    )
    clusters, _ = dedup_pipeline(
        rd.from_arrow(base), CFG, extract=False,
        use_simhash=False, use_substring=False,
    )
    compact = compact_signature_table(
        rd.from_arrow(base), CFG, "url", extract=False,
        with_simhash=False, with_chunks=True,
    )
    build_index(compact, clusters, root, CFG, id_col="url", num_buckets=8)

    shard = pa.table(
        {
            "url": ["s://banner-only"],
            "text": [_long_text("fresh-body", 120) + " " + banner],
            "lang": ["en"],
        }
    )
    out, report = dedup_against_index(rd.from_arrow(shard), root, CFG)
    got = out.to_pandas()
    assert got["cluster_id"].iloc[0] == "s://banner-only"
    assert report["substring_edges"] == 0
    assert report["hot_chunks_excluded"] > 0


def test_substring_update_index_round_trip(tmp_path):
    """update_index appends the shard's chunk tables too: a later shard
    that CONTAINS an earlier shard's fresh text anchors to it."""
    root = str(tmp_path / "uidx")
    base = pa.table(
        {
            "url": ["b://only"],
            "text": [_long_text("seed", 120)],
            "lang": ["en"],
        }
    )
    clusters, _ = dedup_pipeline(
        rd.from_arrow(base), CFG, extract=False,
        use_simhash=False, use_substring=False,
    )
    compact = compact_signature_table(
        rd.from_arrow(base), CFG, "url", extract=False,
        with_simhash=False, with_chunks=True,
    )
    build_index(compact, clusters, root, CFG, id_col="url", num_buckets=8)

    fresh = _long_text("wave1", 150)
    shard1 = pa.table(
        {"url": ["s1://fresh"], "text": [fresh], "lang": ["en"]}
    )
    _, rep1 = dedup_against_index(
        rd.from_arrow(shard1), root, CFG, update_index=True
    )
    assert load_manifest(root)["rows"]["chunkblobs"] == 2

    shard2 = pa.table(
        {
            "url": ["s2://contains-wave1"],
            "text": [_long_text("pad2", 200) + " " + fresh + " "
                     + _long_text("pad3", 200)],
            "lang": ["en"],
        }
    )
    out2, rep2 = dedup_against_index(rd.from_arrow(shard2), root, CFG)
    assert rep2["substring_edges"] >= 1
    assert out2.to_pandas()["cluster_id"].iloc[0] == "s1://fresh"


def test_chunk_mismatch_append_rejected(chunked_index):
    """Appending chunk-less signatures to a chunked index is an error —
    later shards would silently lose substring coverage of this one."""
    from dedup_ray.state.dedupindex import append_index

    root, *_ = chunked_index
    shard = pa.table(
        {"url": ["s://x"], "text": [_long_text("mm", 80)], "lang": ["en"]}
    )
    compact = compact_signature_table(
        rd.from_arrow(shard), CFG, "url", extract=False,
        with_simhash=False, with_chunks=False,
    )
    clusters = rd.from_arrow(
        pa.table({"url": ["s://x"], "cluster_id": ["s://x"]})
    )
    with pytest.raises(ValueError, match="substring extension mismatch"):
        append_index(compact, clusters, root, CFG)


def test_empty_shard(base_index):
    """An empty crawl slice (everything filtered upstream) returns an empty
    typed result and a zeroed report instead of crashing on schema=None."""
    root, *_ = base_index
    shard = pa.schema(
        [("url", pa.string()), ("text", pa.large_string()),
         ("lang", pa.string())]
    ).empty_table()
    out, report = dedup_against_index(rd.from_arrow(shard), root, CFG)
    assert out.count() == 0
    assert out.schema().names == ["url", "cluster_id"]
    assert report["n_docs"] == 0 and report["merges"] == 0


def test_incremental_matches_batch_partition(base_index):
    """(base → index → shard incremental) and (batch over base ∪ shard)
    must induce the same partition over the SHARD docs (labels differ —
    incremental keeps old ids stable; sets must not)."""
    root, pages, clusters, _ = base_index
    texts = pages["text"].to_pylist()
    urls = pages["url"].to_pylist()

    shard_rows = []
    for i in range(0, 12):
        if i % 3 == 0:
            shard_rows.append((f"s://{i:03d}", texts[i]))          # exact
        elif i % 3 == 1:
            shard_rows.append((f"s://{i:03d}", _mutate(texts[i]))) # near
        else:
            shard_rows.append((f"s://{i:03d}", _fresh(100 + i)))   # fresh
    shard = pa.table(
        {
            "url": [u for u, _ in shard_rows],
            "text": [t for _, t in shard_rows],
            "lang": ["en"] * len(shard_rows),
        }
    )

    inc, _ = dedup_against_index(rd.from_arrow(shard), root, CFG, extract=False)
    inc_df = inc.to_pandas()

    both = pa.table(
        {
            "url": urls + shard["url"].to_pylist(),
            "text": texts + shard["text"].to_pylist(),
            "lang": ["en"] * (len(urls) + shard.num_rows),
        }
    )
    batch, _ = dedup_pipeline(
        rd.from_arrow(both), CFG, extract=False,
        use_simhash=False, use_substring=False,
    )
    batch_df = batch.to_pandas()

    # compare partitions restricted to (shard ∪ base) docs: group sets of
    # shard docs together with which base docs they joined
    def groups(df):
        out = {}
        for u, c in zip(df.iloc[:, 0], df["cluster_id"]):
            out.setdefault(c, set()).add(u)
        return {frozenset(g) for g in out.values() if any(
            m.startswith("s://") for m in g)}

    # incremental output covers shard docs only; expand with the base
    # members of each anchored cluster from the base run
    base_members = {}
    for u, c in zip(clusters["url"], clusters["cluster_id"]):
        base_members.setdefault(c, set()).add(u)
    inc_groups = {}
    for u, c in zip(inc_df["url"], inc_df["cluster_id"]):
        inc_groups.setdefault(c, set()).add(u)
    inc_sets = set()
    for c, g in inc_groups.items():
        inc_sets.add(frozenset(g | base_members.get(c, set())))

    assert inc_sets == groups(batch_df)


def test_syndicated_clique_near_dup_anchors(tmp_path):
    """A near-dup of content with MORE exact copies than max_band_group
    must still anchor.  The index holds one band row per DISTINCT TEXT
    (digest representatives), so a syndicated clique can never make its
    own band buckets hot; with per-doc banding every bucket of the clique
    would exceed the cap, cross_reduce would drop them all, and the digest
    path cannot catch a near-dup — the doc would silently form a fresh
    cluster."""
    cfg = DedupConfig(
        minhash_concurrency=2, num_partitions=4, sign_batch_size=256,
        max_band_group=4, hot_window=1,
    )
    root = str(tmp_path / "hotidx")
    syndicated = " ".join(f"story{j}syn{(j * 17) % 71}" for j in range(150))
    n_copies = 10  # > max_band_group
    base = pa.table(
        {
            "url": [f"b://mirror{i}" for i in range(n_copies)] + ["b://other"],
            "text": [syndicated] * n_copies + [_fresh(55)],
            "lang": ["en"] * (n_copies + 1),
        }
    )
    clusters, _ = dedup_pipeline(
        rd.from_arrow(base), cfg, extract=False,
        use_simhash=False, use_substring=False,
    )
    compact = compact_signature_table(
        rd.from_arrow(base), cfg, "url", extract=False,
        with_simhash=False, with_chunks=False,
    )
    man = build_index(compact, clusters, root, cfg, id_col="url",
                      num_buckets=8)
    assert man["rows"]["bands"] == 2 * cfg.bands  # 2 distinct texts

    shard = pa.table(
        {
            "url": ["s://nearmirror"],
            "text": [_mutate(syndicated)],
            "lang": ["en"],
        }
    )
    out, report = dedup_against_index(
        rd.from_arrow(shard), root, cfg, extract=False
    )
    assert report["hot_buckets_dropped"] == 0
    assert out.to_pandas()["cluster_id"].iloc[0] == "b://mirror0"


def test_execution_knobs_do_not_invalidate_index(base_index):
    """An index is a long-lived artifact read by differently-sized
    clusters: execution knobs (partitions, concurrency, batch sizes) must
    not fail the manifest check — only signature semantics are compared."""
    from dataclasses import replace

    root, pages, clusters, _ = base_index
    retuned = replace(
        CFG, num_partitions=2, minhash_concurrency=1, batch_size=128,
        sign_batch_size=32, cc_local_edge_limit=10,
    )
    shard = pa.table(
        {
            "url": ["s://retuned-exact"],
            "text": [pages["text"][0].as_py()],
            "lang": ["en"],
        }
    )
    out, report = dedup_against_index(
        rd.from_arrow(shard), root, retuned, extract=False
    )
    assert report["digest_hits"] >= 1
    got = out.to_pandas()
    assert got["cluster_id"].iloc[0] == dict(
        zip(clusters["url"], clusters["cluster_id"])
    )[pages["url"][0].as_py()]


def test_compact_index_folds_journal_and_defragments(tmp_path):
    """After a bridge merge: compaction empties the journal, rewrites the
    retired anchor into the bucket files (a later exact-dup shard still
    anchors to the surviving cluster), coalesces every bucket to one
    part file, and a second run (simulating crash-repair) is a no-op."""
    from dedup_ray.state.dedupindex import compact_index

    root = str(tmp_path / "idx")
    shared = [f"common{j}w{j % 13}" for j in range(40)]
    only_a = [f"alpha{j}u{j % 11}" for j in range(60)]
    only_b = [f"beta{j}v{j % 11}" for j in range(60)]
    text_a = " ".join(shared + only_a)
    text_b = " ".join(shared + only_b)
    text_c = " ".join(shared + only_a + only_b)

    base = pa.table({
        "url": ["b://a", "b://b"],
        "text": [text_a, text_b],
        "lang": ["en", "en"],
    })
    clusters, _ = dedup_pipeline(
        rd.from_arrow(base), CFG, extract=False,
        use_simhash=False, use_substring=False,
    )
    compact = compact_signature_table(
        rd.from_arrow(base), CFG, "url", extract=False,
        with_simhash=False, with_chunks=False,
    )
    build_index(compact, clusters, root, CFG, id_col="url", num_buckets=8)

    shard1 = pa.table(
        {"url": ["s://bridge"], "text": [text_c], "lang": ["en"]})
    _, rep1 = dedup_against_index(
        rd.from_arrow(shard1), root, CFG, extract=False, update_index=True)
    assert rep1["merges"] == 1
    assert load_merges(root) == {"b://b": "b://a"}

    report = compact_index(root)
    assert report["merges_applied"] == 1
    assert report["journal_parts_cleared"] >= 1
    assert load_merges(root) == {}

    # retired id is gone from the persisted anchor columns
    import os

    import pyarrow.parquet as pq

    for table in ("digests", "sigs"):
        tdir = os.path.join(root, table)
        for b in sorted(os.listdir(tdir)):
            bd = os.path.join(tdir, b)
            parts = [f for f in os.listdir(bd) if f.endswith(".parquet")]
            assert len(parts) <= 1, f"{bd} not defragmented"
            for p in parts:
                t = pq.read_table(os.path.join(bd, p))
                assert "b://b" not in set(t["cluster_id"].to_pylist())

    # reader behavior unchanged: an exact dup of text_b (whose digest row
    # was written BEFORE the merge) still anchors to the survivor
    shard2 = pa.table(
        {"url": ["s://late"], "text": [text_b], "lang": ["en"]})
    out2, rep2 = dedup_against_index(
        rd.from_arrow(shard2), root, CFG, extract=False)
    assert out2.to_pandas()["cluster_id"].iloc[0] == "b://a"
    assert rep2["digest_hits"] >= 1

    # idempotent: a re-run applies zero merges and drops zero rows
    report2 = compact_index(root)
    assert report2["merges_applied"] == 0
    for table, s in report2["tables"].items():
        assert s["rows"] == s["rows_before"], (table, s)
