"""Ninth-sitting operators: canopy blocking and friends."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from dedup_ray.ops.linkage import canopy_cluster


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


BASE = ("the quick brown fox jumps over the lazy dog while the "
        "keen red hen pecks near the old barn door today")


def test_canopy_planted_dups_share_canopy():
    near = BASE.replace("today", "tonight")
    other = ("completely different subject matter entirely about "
             "ships sails harbors tides storms anchors ropes decks")
    ds = _docs([(0, BASE), (1, near), (2, other)])
    out = canopy_cluster(ds, num_blocks=8, max_rounds=4,
                         num_partitions=2).to_pandas()
    # 0 and 1 share their min bigram -> same block; jac >> t2 so one
    # canopy centered at 0 holds both; 2 is its own singleton canopy
    c01 = out[(out.doc_id.isin([0, 1])) & (out.center_id == 0)]
    assert set(c01.doc_id) == {0, 1}
    assert (out[out.doc_id == 2].center_id == 2).all()
    assert not (out.center_id == -1).any()


def test_canopy_t1_membership_overlaps_without_t2_removal():
    # b shares ~half its shingles with a (>= t1, < t2): member of a's
    # canopy AND still alive to found its own
    half = BASE + " entirely new trailing words follow here making " \
                  "shared fraction moderate not high for this pair"
    ds = _docs([(0, BASE), (1, half)])
    out = canopy_cluster(ds, t1=0.2, t2=0.9, num_blocks=4,
                         max_rounds=4, num_partitions=2).to_pandas()
    assert len(out[(out.center_id == 0) & (out.doc_id == 1)]) == 1
    assert len(out[(out.center_id == 1) & (out.doc_id == 1)]) == 1


def test_canopy_round_cap_flags_leftovers():
    texts = [(i, f"unique{i} token{i} stream{i} alpha{i} beta{i}")
             for i in range(6)]
    ds = _docs(texts)
    out = canopy_cluster(ds, num_blocks=1, max_rounds=2,
                         num_partitions=1).to_pandas()
    # 6 mutually-dissimilar docs, one block, 2 rounds -> 2 singleton
    # canopies + 4 capped leftovers, deterministically the smallest ids
    assert sorted(out[out.center_id >= 0].doc_id) == [0, 1]
    left = out[out.center_id == -1]
    assert sorted(left.doc_id) == [2, 3, 4, 5]
    assert (left.jac == 0.0).all()


def test_canopy_empty_corpus():
    ds = _docs([])
    out = canopy_cluster(ds, num_partitions=2)
    # Ray's to_pandas drops columns at 0 rows; the Dataset schema is
    # the downstream contract (house convention, see test_semdedup)
    assert out.schema().names == ["blk", "center_id", "doc_id", "jac"]
    assert out.count() == 0


def test_canopy_single_token_docs_get_sentinel_shingle():
    ds = _docs([(7, "solo"), (8, "")])
    out = canopy_cluster(ds, num_partitions=2).to_pandas()
    # sentinel shingle = str(doc_id): unique per doc -> two singletons
    assert sorted(out.doc_id) == [7, 8]
    assert (out.center_id == out.doc_id).all()


def test_kneser_ney_continuation_correction():
    from dedup_ray.stages.selection import kneser_ney_score

    # 'x' follows many contexts; 'y' is frequent but context-locked
    # (only ever after 'k'). Docs probing p(x|q) vs p(y|q) — both
    # unseen-ish continuations of q, same bigram count: the KN
    # continuation term must favor x.
    corpus = [
        (0, "a x b x c x d x"),
        (1, "k y k y k y k y"),
        (2, "q x"),
        (3, "q y"),
        (4, "solo"),
    ]
    ds = _docs(corpus)
    out = kneser_ney_score(ds, num_partitions=2).to_pandas() \
        .set_index("doc_id")
    assert out.loc[4, "n_bigrams"] == 0
    assert np.isnan(out.loc[4, "kn_lp"])
    assert out.loc[2, "kn_lp"] > out.loc[3, "kn_lp"]


def test_kneser_ney_repeated_bigram_scores_higher():
    from dedup_ray.stages.selection import kneser_ney_score

    corpus = [(0, "a b a b a b"), (1, "c d e f g h")]
    ds = _docs(corpus)
    out = kneser_ney_score(ds, num_partitions=2).to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "kn_lp"] > out.loc[1, "kn_lp"]
    assert out.loc[0, "n_bigrams"] == 5


def test_plsa_two_vocab_corpus_separates_topics():
    from dedup_ray.stages.topics import plsa_topics

    a = "alpha beta gamma delta alpha beta gamma delta"
    b = "omega sigma tau rho omega sigma tau rho"
    ds = _docs([(i, a) for i in range(5)]
               + [(i + 5, b) for i in range(5)]
               + [(10, "")])
    out, (vocab, model) = plsa_topics(ds, k=3, rounds=2)
    df = out.to_pandas().set_index("doc_id")
    # zero-token doc is excluded; posteriors sum to 1
    assert 10 not in df.index and len(df) == 10
    sums = df[["pz0", "pz1", "pz2"]].sum(axis=1)
    assert np.allclose(sums, 1.0, atol=1e-4)
    # all A-docs agree on an argmax topic, all B-docs on a different one
    am = df[["pz0", "pz1", "pz2"]].to_numpy().argmax(axis=1)
    assert len(set(am[:5])) == 1 and len(set(am[5:])) == 1
    assert am[0] != am[5]
    assert model.shape == (len(vocab), 3)
    assert np.allclose(model.sum(axis=0), 1.0)


def test_hard_negatives_picks_best_wrong_label():
    from dedup_ray.stages.ann import hard_negatives

    # anchor 0 (label 0): id 1 is nearly parallel but SAME label
    # (excluded); id 2 is the best different-label vector; id 3 ortho.
    vecs = {0: [1.0, 0.0], 1: [0.99, 0.01], 2: [0.9, 0.1],
            3: [0.0, 1.0]}
    labels = {0: 0, 1: 0, 2: 1, 3: 1}
    tbl = pa.table({
        "vec_id": pa.array(list(vecs), pa.int64()),
        "embedding": pa.array([vecs[i] for i in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([labels[i] for i in vecs], pa.int32()),
    })
    ds = ray.data.from_arrow(tbl)
    out = hard_negatives(ds, [0], np.array([vecs[0]]), [0]).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["neg_id"] == 2
    assert out.iloc[0]["cos_sim"] > 0.99  # cos(0,2) ~ 0.9938


def test_hard_negatives_tie_breaks_to_smaller_id():
    from dedup_ray.stages.ann import hard_negatives

    tbl = pa.table({
        "vec_id": pa.array([0, 5, 4], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1, 1], pa.int32()),
    })
    ds = ray.data.from_arrow(tbl)
    out = hard_negatives(ds, [0], np.array([[1.0, 0.0]]), [0]).to_pandas()
    assert out.iloc[0]["neg_id"] == 4


def test_wand_equals_bm25_and_prunes():
    from dedup_ray.ops.retrieval import bm25_topk, wand_topk

    docs = []
    for i in range(60):
        if i % 20 == 0:
            docs.append((i, "rare common filler words here rare"))
        else:
            docs.append((i, "common filler words here again and again"))
    ds = _docs(docs)
    stats = {}
    # k = number of rare docs: theta lands on a rare-doc score, so the
    # common-only docs' tiny upper bound falls below it
    got = wand_topk(ds, ["rare", "common"], k=3,
                    stats_out=stats).to_pandas()
    want = bm25_topk(ds, ["rare", "common"], k=3).to_pandas()
    assert got.values.tolist() == want.values.tolist()
    # every doc has 'common', only 3 have 'rare': theta comes from the
    # rare docs, so most common-only docs must be pruned
    assert stats["scored"] < stats["total"]
    assert stats["theta"] > 0


def test_wand_no_prune_fallback_small_corpus():
    from dedup_ray.ops.retrieval import bm25_topk, wand_topk

    ds = _docs([(0, "a b c"), (1, "b c d")])
    got = wand_topk(ds, ["b"], k=5).to_pandas()
    want = bm25_topk(ds, ["b"], k=5).to_pandas()
    assert got.values.tolist() == want.values.tolist()


def test_facility_location_planted_clusters():
    from dedup_ray.stages.selection import facility_location_select

    # two tight clusters (sizes 6 and 3) + one outlier; pool = all.
    # FL round 1 must pick from the BIG cluster (max coverage), round 2
    # from the small cluster; coverage is monotone non-decreasing.
    vecs = ([[1.0, 0.0, 0.0]] * 6 + [[0.0, 1.0, 0.0]] * 3
            + [[0.0, 0.0, 1.0]])
    tbl = pa.table({
        "vec_id": pa.array(list(range(10)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    out = facility_location_select(ds, k=3, pool=10).to_pandas()
    assert out.iloc[0]["sel_id"] == 0      # big cluster rep, min id
    assert out.iloc[1]["sel_id"] == 6      # small cluster rep
    assert out.iloc[2]["sel_id"] == 9      # outlier last
    assert (np.diff(out["coverage"]) >= -1e-9).all()
    assert out.iloc[2]["coverage"] == 10.0  # full coverage at k=3


def test_mmr_demotes_near_duplicate_results():
    from dedup_ray.ops.retrieval import mmr_rerank

    # docs 0,1 both contain the query term twice (tied top relevance)
    # and share an identical embedding; doc 2 matches once with an
    # orthogonal embedding.  Pure BM25 ranks (0, 1, 2); MMR must demote
    # the duplicate 1 below the diverse 2.
    docs = _docs([(0, "term term pad"), (1, "term term pad"),
                  (2, "term pad pad"), (3, "pad pad pad")])
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.5, 0.5]],
            pa.list_(pa.float32())),
    }))
    out = mmr_rerank(docs, emb, ["term"], k_pool=4, k_out=3,
                     lam=0.5).to_pandas()
    assert out["doc_id"].tolist() == [0, 2, 1]
    # mmr scores non-increasing is NOT guaranteed across rounds, but
    # rank order must be deterministic; rank 0 is the pure-rel champion
    assert out.iloc[0]["rank"] == 0


def test_holt_tracks_linear_trend():
    from dedup_ray.ops.stats import holt_forecast

    # a perfectly linear hourly count series: Holt locks on with the
    # exact init (l0=x0, b0=x1-x0) and the forecast equals the next
    # true value at every step
    base = 1_600_000_000_000_000  # us
    rows = []
    eid = 0
    for h in range(6):
        for _ in range(2 + 3 * h):  # counts 2,5,8,11,14,17
            rows.append((eid, base + h * 3_600_000_000 + eid % 1000))
            eid += 1
    tbl = pa.table({
        "event_type": pa.array(["a"] * len(rows), pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(tbl)
    out = holt_forecast(ds, "event_type", "ts").to_pandas() \
        .sort_values("hour").reset_index(drop=True)
    assert len(out) == 6
    # on a linear series level == x and trend == slope at every hour
    assert np.allclose(out["level"], [2, 5, 8, 11, 14, 17])
    assert np.allclose(out["trend"], 3.0)
    assert np.allclose(out["forecast"][:5], out["level"][1:])


def test_bfs_local_fast_path_matches_distributed():
    from dedup_ray.ops.graph import multi_source_bfs

    rng = np.random.RandomState(7)
    src = rng.randint(0, 60, 300)
    dst = rng.randint(0, 60, 300)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    }))
    seeds = ray.data.from_arrow(pa.table({
        "node": pa.array([0, 3, 3], pa.int64())}))
    loc = multi_source_bfs(edges, seeds, max_hops=3) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    dist = multi_source_bfs(edges, seeds, max_hops=3,
                            local_edge_limit=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert loc.values.tolist() == dist.values.tolist()


def test_bfs_local_fast_path_string_nodes_and_isolated_seed():
    from dedup_ray.ops.graph import multi_source_bfs

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(["a", "b"], pa.string()),
        "dst": pa.array(["b", "c"], pa.string()),
    }))
    seeds = ray.data.from_arrow(pa.table({
        "node": pa.array(["a", "zzz"], pa.string())}))
    out = multi_source_bfs(edges, seeds, max_hops=4).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    # isolated seed still emits at dist 0 (distributed semantics)
    assert got == {"a": 0, "b": 1, "c": 2, "zzz": 0}


def test_quantile_normalize_maps_both_sources_to_pooled():
    from dedup_ray.stages.mixing import quantile_normalize

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
        "n_chars": pa.array([1, 2, 3, 100, 200, 300], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    out = quantile_normalize(ds, num_partitions=2).to_pandas()
    # both 3-doc sources map rank 1/2/3 onto pooled ranks 0/3/5
    for src in ("a", "b"):
        sub = out[out.source == src].sort_values("n_chars")
        assert sub["qnorm"].tolist() == [1, 100, 300]


def test_quantile_normalize_single_doc_source_gets_median():
    from dedup_ray.stages.mixing import quantile_normalize

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "source": pa.array(["a", "a", "a", "a", "solo"], pa.string()),
        "n_chars": pa.array([10, 20, 30, 40, 999], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    out = quantile_normalize(ds, num_partitions=2).to_pandas()
    # N=5 -> global median position (5-1)//2 = 2 -> pooled value 30
    assert out[out.source == "solo"]["qnorm"].tolist() == [30]


def test_source_cover_greedy_on_planted_vocab():
    from dedup_ray.stages.selection import greedy_source_cover

    # src A: grams over tokens a1..a9 (8 distinct trigrams);
    # src B: subset of A's text (0 new); src C: 3 distinct trigrams
    a = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    b = "a1 a2 a3 a4 a5"
    c = "c1 c2 c3 c4 c5"
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "source": pa.array(["A", "B", "C"], pa.string()),
        "text": pa.array([a, b, c], pa.string()),
    })
    ds = ray.data.from_arrow(tbl)
    out = greedy_source_cover(ds, k=3, num_partitions=2).to_pandas()
    # A first (8 grams), then C (3 new); B adds nothing -> loop breaks
    assert out["sel_source"].tolist() == ["A", "C"]
    assert out["new_grams"].tolist() == [8, 3]
    assert out["cum_grams"].tolist() == [8, 11]


def test_t_closeness_integer_predicate_on_skewed_group():
    from dedup_ray.pipelines.queries import QUERIES

    out = QUERIES["t_closeness_docs"]("/root/testdata/sf0.001") \
        .to_pandas()
    assert len(out) > 0
    # flag must equal the exact integer predicate everywhere
    lhs = (out["tvd"] <= 0.3 + 1e-12)
    assert (out["t_close"].astype(bool) == lhs).all()
    # tvd is a genuine distance: within [0, 1]
    assert out["tvd"].between(0, 1).all()


def test_blocking_quality_perfect_completeness_on_testdata():
    from dedup_ray.pipelines.queries import QUERIES

    out = QUERIES["blocking_quality_docs"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    row = df.iloc[0]
    # canopy blocking catches ~all sim-join truth pairs on this corpus
    # (18/20 at sf0.001 — two pairs just under the shared-min-shingle
    # route) at a huge reduction ratio; the scorecard itself is
    # oracle-checked, this test pins the qualitative shape
    assert row["pair_completeness"] >= 0.85
    assert row["reduction_ratio"] > 0.99
    assert row["n_truth"] >= row["n_caught"] > 0
    assert row["n_cand"] >= row["n_caught"]


def test_wasserstein_identical_and_shifted_sources():
    from dedup_ray.pipelines.queries import QUERIES

    # synthetic check through the catalog entry machinery is covered by
    # the oracle; here pin the metric's math on a hand construction
    import pyarrow as pa

    import ray.data as rd

    tbl = pa.table({
        "source": pa.array(["a"] * 4 + ["b"] * 4, pa.string()),
        "n_chars": pa.array([0, 0, 10, 10, 0, 0, 10, 10], pa.int64()),
    })
    # both sources equal the pool -> W1 = 0 for each
    import dedup_ray.pipelines.queries as q
    import unittest.mock as mock
    with mock.patch.object(q, "_read",
                           lambda sf, t, columns=None: rd.from_arrow(tbl)):
        out = q.wasserstein_sources_docs("ignored")
    df = out.to_pandas()
    assert (df["w1"] == 0.0).all()

    tbl2 = pa.table({
        "source": pa.array(["a"] * 2 + ["b"] * 2, pa.string()),
        "n_chars": pa.array([0, 0, 10, 10], pa.int64()),
    })
    # pool F at v=0 is 1/2; source a has F=1, b has F=0; gap 10
    # -> W1 = |1 - 0.5| * 10 = 5 for both
    with mock.patch.object(q, "_read",
                           lambda sf, t, columns=None: rd.from_arrow(tbl2)):
        out2 = q.wasserstein_sources_docs("ignored")
    df2 = out2.to_pandas().set_index("source")
    assert df2.loc["a", "w1"] == 5.0
    assert df2.loc["b", "w1"] == 5.0


def test_self_bleu_template_vs_unique():
    from dedup_ray.stages.textstats import self_bleu_probe

    # doc 0 is a verbatim copy of docs 2..4's template: self-BLEU 1.0;
    # doc 1 is entirely novel vocabulary: self-BLEU 0.0
    tpl = "the same template text repeated again and again here"
    ds = _docs([(0, tpl), (1, "zonal quixotic vapors drift unseen"),
                (2, tpl), (3, tpl), (4, tpl)])
    out = self_bleu_probe(ds, [0, 1], num_partitions=2).to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "self_bleu2"] == 1.0
    assert out.loc[1, "self_bleu2"] == 0.0
    assert out.loc[1, "p1"] == 0.0


def test_platt_scaling_learns_separable_direction():
    import unittest.mock as mock

    import ray.data as rd

    import dedup_ray.pipelines.queries as q

    # strongly separable: y=1 at x=+1, y=0 at x=-1 -> GD pushes a UP
    n = 100
    xs = [1.0 if i % 2 == 0 else -1.0 for i in range(n)]
    tbl = pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([[x, 0.0] for x in xs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 2 for i in range(n)], pa.int32()),
    })
    with mock.patch.object(q, "_read",
                           lambda sf, t, columns=None: rd.from_arrow(tbl)):
        out = q.platt_scaling_embeddings("ignored").to_pandas()
    row = out.iloc[0]
    assert row["a"] > 1.0          # slope grows toward separation
    assert abs(row["b"]) < 0.05    # symmetric classes -> tiny bias
    assert 0 < row["mean_nll"] < 0.693  # better than chance ln(2)


def test_new_ops_empty_corpus_robustness():
    """Every ninth-sitting operator survives a zero-row corpus (Ray's
    to_pandas drops columns at 0 rows — the classic driver-side trap)."""
    import ray.data as rd

    from dedup_ray.stages.mixing import quantile_normalize
    from dedup_ray.stages.selection import (facility_location_select,
                                            greedy_source_cover,
                                            kneser_ney_score)
    from dedup_ray.stages.textstats import self_bleu_probe
    from dedup_ray.stages.topics import plsa_topics
    from dedup_ray.ops.retrieval import wand_topk

    edocs = _docs([])
    eemb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32())}))
    esrc = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    eqn = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}))

    assert kneser_ney_score(edocs, num_partitions=2).count() == 0
    assert plsa_topics(edocs, k=3, rounds=2)[0].count() == 0
    assert wand_topk(edocs, ["a"], k=3).count() == 0
    assert self_bleu_probe(edocs, [0], num_partitions=2).num_rows == 0
    assert facility_location_select(eemb, k=2, pool=4).count() == 0
    assert greedy_source_cover(esrc, k=2, num_partitions=2).count() == 0
    assert quantile_normalize(eqn, num_partitions=2).count() == 0


def test_mmr_empty_pool_and_missing_embeddings():
    from dedup_ray.ops.retrieval import mmr_rerank

    docs = _docs([(0, "alpha beta"), (1, "gamma delta")])
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([900, 901], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
    }))
    # no doc contains the term -> empty BM25 pool
    assert mmr_rerank(docs, emb, ["zzz"], k_pool=4).count() == 0
    # pool non-empty but no pool doc has an embedding row
    assert mmr_rerank(docs, emb, ["alpha"], k_pool=4).count() == 0


def test_bfs_null_endpoint_edges_dropped_both_paths():
    from dedup_ray.ops.graph import multi_source_bfs

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 2, 0], pa.int64()),
        "dst": pa.array([1, 3, None], pa.int64()),
    }))
    seeds = ray.data.from_arrow(pa.table({
        "node": pa.array([0], pa.int64())}))
    loc = multi_source_bfs(edges, seeds, max_hops=3).to_pandas()
    dist = multi_source_bfs(edges, seeds, max_hops=3,
                            local_edge_limit=0).to_pandas()
    got_l = dict(zip(loc["node"], loc["dist"]))
    got_d = dict(zip(dist["node"], dist["dist"]))
    # the malformed null edge contributes nothing; node 3 unreachable
    assert got_l == {0: 0, 1: 1}
    assert got_l == got_d


def test_phash_dedup_brightness_invariance_and_blocks():
    from dedup_ray.pipelines.queries import QUERIES

    out = QUERIES["phash_dedup_docs"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    # 500 docs -> 125 planted 4-blocks; the per-doc brightness jitter
    # must never split a block (dHash keys on gradients)
    assert len(df) == 125
    assert (df["n_copies"] == 4).all()
    assert (df["keep_id"] % 4 == 0).all()


def test_audio_fingerprint_phase_invariance_and_blocks():
    from dedup_ray.pipelines.queries import QUERIES

    out = QUERIES["audio_fingerprint_docs"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    # the per-doc phase shift must never split a 4-block (window length
    # is a multiple of the waveform period -> energies exactly equal)
    assert len(df) == 125
    assert (df["n_copies"] == 4).all()
    assert (df["keep_id"] % 4 == 0).all()


def test_video_fingerprint_trio_blocks_intact():
    from dedup_ray.pipelines.queries import QUERIES

    out = QUERIES["video_fingerprint_docs"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) == 125
    assert (df["n_copies"] == 4).all()
    # tuple key actually uses all three sampled frames
    assert {"h0", "h2", "h4"} <= set(df.columns)
