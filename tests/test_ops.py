"""Relational ops, text stats, ANN, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup_ray.ops.relational import (
    anti_join,
    broadcast_left_join,
    distinct_rows,
    grouped_mode,
    semi_join,
)
from dedup_ray.stages.ann import knn_cosine, knn_cosine_lsh
from dedup_ray.stages.multimodal import decode_images, make_media_table
from dedup_ray.stages.textstats import (
    fingerprint_docs,
    idf_table,
    lang_id,
    quality_stats,
    tokenize_explode,
)


def docs_ds():
    return rd.from_items(
        [
            {"doc_id": 0, "text": "the cat sat on the mat"},
            {"doc_id": 1, "text": "der hund ist nicht hier und der ist gut"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "the the the"},
        ]
    )


def test_tokenize_sentinel_and_idf():
    toks = tokenize_explode(docs_ds()).to_pandas()
    # doc 2 is empty -> its own id as sentinel token
    assert toks[toks["doc_id"] == 2]["token"].tolist() == ["2"]
    total = len(toks)
    idf = idf_table(rd.from_pandas(toks)).to_pandas().set_index("token")["idf"]
    assert np.isclose(idf["the"], round(total / 5, 6))  # 'the' x5
    assert np.isclose(idf["2"], float(total))


def test_quality_stats():
    q = quality_stats(docs_ds()).to_pandas().set_index("doc_id")
    assert q.loc[0, "n_tokens"] == 6
    assert np.isclose(q.loc[0, "stopword_ratio"], round(2 / 6, 6))
    assert q.loc[2, "n_tokens"] == 0 and q.loc[2, "avg_token_len"] == 0.0


def test_lang_id_heuristic():
    out = lang_id(docs_ds(), concurrency=1).to_pandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[1, "lang_pred"] == "de"
    assert out.loc[2, "lang_pred"] == "en"  # no signal -> default


def test_fingerprint_winnowing_stable_under_single_edit():
    """True winnowing: one token edit perturbs ≤ shingle_k + window - 1
    windows, so nearly all fingerprints survive; disjoint texts share none."""
    base = [f"w{i}" for i in range(200)]
    edited = list(base)
    edited[97] = "XX"
    other = [f"z{i}" for i in range(200)]
    ds = rd.from_items(
        [
            {"doc_id": 0, "text": " ".join(base)},
            {"doc_id": 1, "text": " ".join(edited)},
            {"doc_id": 2, "text": " ".join(other)},
        ]
    )
    fp = fingerprint_docs(ds).to_pandas()
    sets = {d: set(g["fingerprint"]) for d, g in fp.groupby("doc_id")}
    inter = len(sets[0] & sets[1])
    union = len(sets[0] | sets[1])
    assert inter / union >= 0.7  # most fingerprints stable under 1 edit
    assert len(sets[0]) > 5  # several fingerprints per doc (not a global min)
    assert not (sets[0] & sets[2])  # disjoint text shares nothing


def test_fingerprint_shared_run_guarantee():
    """A shared run of >= shingle_k + window - 1 tokens yields >= 1 common
    fingerprint (the winnowing window guarantee)."""
    shared = [f"s{i}" for i in range(20)]  # 20 >= 8 + 4 - 1
    a = [f"a{i}" for i in range(50)] + shared + [f"A{i}" for i in range(50)]
    b = [f"b{i}" for i in range(30)] + shared + [f"B{i}" for i in range(70)]
    ds = rd.from_items(
        [{"doc_id": 0, "text": " ".join(a)}, {"doc_id": 1, "text": " ".join(b)}]
    )
    fp = fingerprint_docs(ds).to_pandas()
    sets = {d: set(g["fingerprint"]) for d, g in fp.groupby("doc_id")}
    assert sets[0] & sets[1]


def test_semi_anti_broadcast_joins():
    left = rd.from_items([{"k": i, "v": i * 10} for i in range(6)])
    keys = rd.from_items([{"k": 1}, {"k": 3}, {"k": 9}])
    assert sorted(r["k"] for r in semi_join(left, keys, "k").take_all()) == [1, 3]
    assert sorted(r["k"] for r in anti_join(left, keys, "k").take_all()) == [
        0, 2, 4, 5,
    ]
    small = pd.DataFrame({"k": [1, 3], "label": ["a", "b"]})
    out = broadcast_left_join(left, small, "k").to_pandas()
    assert out.set_index("k")["label"].dropna().to_dict() == {1: "a", 3: "b"}


def test_semi_anti_partitioned_fallback_matches_broadcast():
    """Forcing the key side over the broadcast limit must route through the
    partitioned hash join with identical output (the 100-TB path)."""
    left = rd.from_items([{"k": i, "v": i * 10} for i in range(50)])
    keys = rd.from_items([{"k": i} for i in range(0, 50, 3)] + [{"k": 999}])
    for fn in (semi_join, anti_join):
        broad = fn(left, keys, "k", cols=["k", "v"]).to_pandas()
        part = fn(
            left, keys, "k", cols=["k", "v"], broadcast_key_limit=0
        ).to_pandas()
        assert sorted(map(tuple, part.to_numpy().tolist())) == sorted(
            map(tuple, broad.to_numpy().tolist())
        )


def test_left_join_partitioned_fallback_matches_broadcast():
    from dedup_ray.ops.relational import left_join

    big = rd.from_items([{"k": i % 7, "v": i} for i in range(40)])
    small = rd.from_items([{"k": i, "label": f"L{i}"} for i in range(5)])
    broad = left_join(
        big, small, "k", big_cols=["k", "v"], small_cols=["k", "label"]
    ).to_pandas()
    part = left_join(
        big, small, "k", big_cols=["k", "v"], small_cols=["k", "label"],
        broadcast_row_limit=0,
    ).to_pandas()
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df.fillna("∅")[["k", "v", "label"]].to_numpy().tolist())
    )
    assert key(part) == key(broad)
    assert broad["label"].isna().sum() > 0  # unmatched keys null-filled


def test_grouped_mode_and_distinct():
    ds = rd.from_items(
        [{"g": "x", "v": "p"}, {"g": "x", "v": "p"}, {"g": "x", "v": "q"},
         {"g": "y", "v": "r"}, {"g": "y", "v": "q"}]  # y: tie r/q -> q (asc)
    )
    m = grouped_mode(ds, "g", "v").to_pandas().set_index("g")["v"].to_dict()
    assert m == {"x": "p", "y": "q"}
    d = distinct_rows(ds, ["g", "v"]).to_pandas()
    assert len(d) == 4


def brute_knn(emb, ids, q, k):
    qn = q / np.linalg.norm(q)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = en @ qn
    order = sorted(range(len(ids)), key=lambda j: (-round(sims[j], 6), ids[j]))
    return [(ids[j], round(float(sims[j]), 6)) for j in order[:k]]


def test_knn_cosine_exact():
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((200, 16))
    ids = list(range(200))
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": [list(r) for r in emb]})
    )
    q = emb[5]
    out = knn_cosine(ds, [5], np.array([q]), k=5).to_pandas()
    got = list(zip(out["neighbor_id"], out["cos_sim"]))
    want = [x for x in brute_knn(emb, ids, q, 6) if x[0] != 5][:5]
    assert got == want


def test_knn_lsh_targets_own_bucket():
    rng = np.random.default_rng(8)
    emb = rng.standard_normal((300, 16))
    # plant a near-duplicate of vector 0
    emb[1] = emb[0] + 0.01 * rng.standard_normal(16)
    ids = list(range(300))
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": [list(r) for r in emb]})
    )
    out = knn_cosine_lsh(ds, [0], emb[[0]], k=5, n_planes=6).to_pandas()
    assert 1 in set(out["neighbor_id"])  # near-dup lands in the same bucket


def test_multimodal_decode_plumbing():
    media = make_media_table(n=10)
    out = decode_images(rd.from_arrow(media), concurrency=1).to_pandas()
    assert len(out) == 10
    assert all(len(m) == 3 for m in out["rgb_mean"])
    # deterministic across runs
    out2 = decode_images(rd.from_arrow(media), concurrency=1).to_pandas()
    a = [tuple(m) for m in out.sort_values("media_id")["rgb_mean"]]
    b = [tuple(m) for m in out2.sort_values("media_id")["rgb_mean"]]
    assert a == b


def test_image_resize_chain_into_decode():
    from dedup_ray.stages.multimodal import (
        decode_images,
        make_media_table,
        resize_images,
    )

    media = rd.from_arrow(make_media_table(n=6, width=8, height=8))
    resized = resize_images(media, out_w=4, out_h=4, concurrency=1)
    out = decode_images(resized, concurrency=1).to_pandas()
    assert len(out) == 6
    assert all(len(m) == 3 for m in out["rgb_mean"])
    # nearest-neighbor of a constant-ish image keeps channel means in range
    assert out["rgb_mean"].map(lambda m: all(0 <= v <= 255 for v in m)).all()


def test_video_frame_sampling_fan_out():
    from dedup_ray.stages.multimodal import make_video_table, sample_video_frames

    vids = rd.from_arrow(make_video_table(n=3, n_frames=6))
    frames = sample_video_frames(vids, every=2, concurrency=1).to_pandas()
    assert len(frames) == 3 * 3  # frames 0, 2, 4 per video
    assert sorted(frames["frame_idx"].unique()) == [0, 2, 4]
    # each sampled frame is a full raw image payload
    assert frames["payload"].map(len).eq(8 * 8 * 3).all()


def test_audio_windows_rms():
    from dedup_ray.stages.multimodal import make_audio_table, window_audio

    audio = rd.from_arrow(make_audio_table(n=4, n_samples=4096))
    wins = window_audio(audio, window_samples=1024, concurrency=1).to_pandas()
    assert len(wins) == 4 * 4
    assert (wins["rms"] > 0).all()
    # deterministic: same fixture → same energies
    wins2 = window_audio(
        rd.from_arrow(make_audio_table(n=4, n_samples=4096)),
        window_samples=1024, concurrency=1,
    ).to_pandas()
    assert wins.sort_values(["media_id", "window_idx"])["rms"].tolist() == \
        wins2.sort_values(["media_id", "window_idx"])["rms"].tolist()


def test_fingerprint_md5_matches_bruteforce():
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.textstats import fingerprint_docs_md5

    texts = ["a b c d e f g h i j k l m n", "one two three", None,
             "a b c d e f g h i j k l m n o p q r"]
    K, W = 8, 4

    def brute(s):
        toks = [t for t in (s or "").split(" ") if t]
        m = len(toks) - K + 1
        if m < 1:
            return []
        hs = [hashlib.md5(" ".join(toks[i:i + K]).encode())
              .hexdigest()[:16] for i in range(m)]
        if m <= W:
            return [min(hs)]
        picked, out = None, []
        for s0 in range(m - W + 1):
            win = hs[s0:s0 + W]
            p = s0 + int(np.argmin(win))
            if p != picked:
                out.append(hs[p])
                picked = p
        return out

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    out = fingerprint_docs_md5(ds).to_pandas()
    for i, s in enumerate(texts):
        got = sorted(out[out.doc_id == i].fingerprint)
        assert got == sorted(brute(s)), i


def test_union_evolve():
    import pyarrow as pa
    import pytest
    import ray.data

    from dedup_ray.util.dsutil import union_evolve

    a = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64())}))
    b = ray.data.from_arrow(pa.table({
        "id": pa.array([3], pa.int64()),
        "lang": pa.array(["en"], pa.string())}))
    out = union_evolve([a, b]).to_pandas().sort_values("id")
    assert out["id"].tolist() == [1, 2, 3]
    assert out["lang"].tolist()[:2] == [None, None]
    assert out["lang"].tolist()[2] == "en"
    # conflicting type for a shared column must raise, not cast
    c = ray.data.from_arrow(pa.table({
        "id": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError):
        union_evolve([a, c])


def test_table_checksum_order_invariant():
    import pyarrow as pa
    import ray.data

    from dedup_ray.util.dsutil import table_checksum

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array(["a", "b", "c"], pa.string())})
    rev = t.take(pa.array([2, 0, 1]))
    a = table_checksum(ray.data.from_arrow(t), ["id", "s"])
    b = table_checksum(ray.data.from_arrow(rev).repartition(3),
                       ["id", "s"])
    assert a.equals(b)
    # any value change moves the checksum
    t2 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                   "s": pa.array(["a", "b", "X"], pa.string())})
    c = table_checksum(ray.data.from_arrow(t2), ["id", "s"])
    assert c["checksum"][0] != a["checksum"][0]
    assert c["n_rows"][0] == a["n_rows"][0]


def test_sniff_content_type_edges():
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.multimodal import sniff_content_type

    payloads = [b"%PDF-1.4 binary \x00\xff rest", b"<!DOCTYPE html><p>",
                b"<html>", b"<?xml version='1.0'?>", b"<ht",  # short
                None, b"", b"plain words"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })).repartition(2)
    out = sniff_content_type(ds).to_pandas().sort_values("doc_id")
    assert out["content_type"].tolist() == [
        "pdf", "html", "html", "xml", "other", "other", "other", "other"]


def test_skew_inner_join_matches_pandas(ray_session):
    from dedup_ray.ops.relational import skew_inner_join

    rng = np.random.default_rng(17)
    # one viral key (0) holding ~70% of rows, a few cold keys
    keys = np.where(rng.random(3000) < 0.7, 0, rng.integers(1, 6, 3000))
    left = pd.DataFrame({"k": keys, "x": np.arange(3000)})
    right = pd.DataFrame({
        "k": np.repeat(np.arange(6), 3),
        "tag": [f"t{i}" for i in range(18)],
    })
    expected = left.merge(right, on="k").sort_values(
        ["k", "x", "tag"]).reset_index(drop=True)

    got = skew_inner_join(
        rd.from_pandas(left, override_num_blocks=6),
        rd.from_pandas(right, override_num_blocks=2),
        "k", ["k", "x"], ["k", "tag"],
        hot_row_threshold=500, salt=4, num_partitions=4,
    ).to_pandas().sort_values(["k", "x", "tag"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(expected.dtypes.to_dict()), expected)


def test_skew_inner_join_no_hot_keys_path(ray_session):
    from dedup_ray.ops.relational import skew_inner_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, 3, 5], "tag": ["a", "b", "c"]})
    got = skew_inner_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", ["k", "x"], ["k", "tag"],
        hot_row_threshold=100, num_partitions=2,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    expected = left.merge(right, on="k").sort_values("k").reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got.astype(expected.dtypes.to_dict()),
                                  expected)


def test_skew_inner_join_all_hot(ray_session):
    from dedup_ray.ops.relational import skew_inner_join

    left = pd.DataFrame({"k": [7] * 50, "x": np.arange(50)})
    right = pd.DataFrame({"k": [7, 7], "tag": ["a", "b"]})
    got = skew_inner_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", ["k", "x"], ["k", "tag"],
        hot_row_threshold=10, salt=3, num_partitions=2,
    ).to_pandas()
    assert len(got) == 100  # 50 rows x 2 right matches
    assert set(got["tag"]) == {"a", "b"}
    assert sorted(got["x"]) == sorted(list(range(50)) * 2)


def test_bloom_semi_join_equals_exact(ray_session):
    from dedup_ray.ops.relational import bloom_semi_join, semi_join

    rng = np.random.default_rng(23)
    big = pd.DataFrame({
        "k": rng.integers(0, 1000, 5000),
        "x": np.arange(5000),
    })
    keys = pd.DataFrame({"k": rng.choice(1000, 200, replace=False)})
    got = bloom_semi_join(
        rd.from_pandas(big, override_num_blocks=4),
        rd.from_pandas(keys), "k", ["k", "x"],
        bits_log2=12, num_partitions=4,  # small filter => real FPs to kill
    ).to_pandas().sort_values("x").reset_index(drop=True)
    expected = semi_join(
        rd.from_pandas(big), rd.from_pandas(keys), "k"
    ).to_pandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(expected.dtypes.to_dict()), expected)


def test_bloom_semi_join_string_keys_and_empty(ray_session):
    from dedup_ray.ops.relational import bloom_semi_join

    big = pd.DataFrame({"k": ["a", "b", "c", "d"], "x": [1, 2, 3, 4]})
    keys = pd.DataFrame({"k": ["b", "d", "zzz"]})
    got = bloom_semi_join(
        rd.from_pandas(big), rd.from_pandas(keys), "k", ["k", "x"],
        bits_log2=10, num_partitions=2,
    ).to_pandas().sort_values("x")
    assert list(got["k"]) == ["b", "d"]
    empty = bloom_semi_join(
        rd.from_pandas(big),
        rd.from_pandas(keys).filter(lambda r: False),
        "k", ["k", "x"], num_partitions=2,
    ).to_pandas()
    assert len(empty) == 0


def test_bm25_topk_matches_reference(ray_session):
    import math

    from dedup_ray.ops.retrieval import bm25_topk

    rng = np.random.default_rng(31)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60), "text": texts})
    terms, k1, b, k = ["alpha", "gamma"], 1.2, 0.75, 7

    # independent reference implementation
    toks = [t.split(" ") for t in texts]
    n = len(toks)
    avgdl = sum(len(x) for x in toks) / n
    dfreq = {t: sum(t in x for x in toks) for t in terms}
    idf = {t: math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
           for t in terms}
    scores = []
    for i, x in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = x.count(t)
            if tf:
                s += idf[t] * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(x) / avgdl))
        scores.append((round(s, 6), i))
    expected = sorted(
        [(s, i) for s, i in scores if s > 0],
        key=lambda p: (-p[0], p[1]))[:k]

    got = bm25_topk(
        rd.from_pandas(df, override_num_blocks=5), terms, k=k, k1=k1, b=b,
    ).to_pandas()
    assert [(s, i) for s, i in zip(got["score"], got["doc_id"])] == expected


def test_levenshtein_batch_matches_scalar_reference():
    import random

    from dedup_ray.stages.textstats import levenshtein_batch

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            ndp = [i]
            for j, cb in enumerate(b, 1):
                ndp.append(min(ndp[-1] + 1, dp[j] + 1,
                               dp[j - 1] + (ca != cb)))
            dp = ndp
        return dp[-1]

    random.seed(5)
    pairs = [
        ("".join(random.choices("abcde", k=random.randint(0, 12))),
         "".join(random.choices("abcdef", k=random.randint(0, 10))))
        for _ in range(200)
    ] + [("", ""), ("", "abc"), ("xyz", ""), ("same", "same"),
         ("héllo", "hello"), ("kitten", "sitting")]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == [lev(a, b) for a, b in pairs]


def test_rollup_aggregate_matches_pandas():
    from dedup_ray.ops.relational import rollup_aggregate

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], size=n),
        "b": rng.integers(0, 4, size=n).astype(np.int64),
        "v": np.round(rng.normal(10, 3, size=n), 3),
    })
    out = rollup_aggregate(
        rd.from_pandas(df).repartition(6), ["a", "b"], "v",
        num_partitions=4,
    ).to_pandas()

    lvl2 = df.groupby(["a", "b"])["v"].agg(["sum", "size"]).reset_index()
    lvl1 = df.groupby("a")["v"].agg(["sum", "size"]).reset_index()
    want_n = len(lvl2) + len(lvl1) + 1
    assert len(out) == want_n
    # grand total
    g0 = out[out.lvl == 0]
    assert len(g0) == 1 and g0.n.iloc[0] == n
    assert abs(g0.sum_value.iloc[0] - round(df.v.sum(), 4)) < 1e-9
    assert g0.a.isna().all() and g0.b.isna().all()
    # level 1 rows match per-a sums; b is null
    g1 = out[out.lvl == 1].set_index("a")
    assert g1.b.isna().all()
    for _, r in lvl1.iterrows():
        assert g1.loc[r.a, "n"] == r["size"]
        assert abs(g1.loc[r.a, "sum_value"] - round(r["sum"], 4)) < 1e-9
    # level 2 exact
    g2 = out[out.lvl == 2].set_index(["a", "b"])
    for _, r in lvl2.iterrows():
        assert g2.loc[(r.a, r.b), "n"] == r["size"]


def test_rollup_aggregate_empty():
    from dedup_ray.ops.relational import rollup_aggregate

    empty = rd.from_arrow(pa.table({
        "a": pa.array([], pa.string()), "b": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64()),
    }))
    out = rollup_aggregate(empty, ["a", "b"], "v", num_partitions=2)
    assert out.count() == 0


def test_cube_aggregate_matches_pandas():
    from dedup_ray.ops.relational import cube_aggregate

    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], size=n),
        "b": rng.choice(["p", "q"], size=n),
        "v": np.round(rng.normal(5, 2, size=n), 3),
    })
    out = cube_aggregate(
        rd.from_pandas(df).repartition(5), ["a", "b"], "v",
        num_partitions=4,
    ).to_pandas()

    both = df.groupby(["a", "b"])["v"].agg(["sum", "size"]).reset_index()
    only_a = df.groupby("a")["v"].agg(["sum", "size"]).reset_index()
    only_b = df.groupby("b")["v"].agg(["sum", "size"]).reset_index()
    assert len(out) == len(both) + len(only_a) + len(only_b) + 1

    g0 = out[out.gset == 0].set_index(["a", "b"])     # both live
    for _, r in both.iterrows():
        assert g0.loc[(r.a, r.b), "n"] == r["size"]
        assert abs(g0.loc[(r.a, r.b), "sum_value"] - round(r["sum"], 4)) < 1e-9
    g1 = out[out.gset == 1].set_index("a")            # b collapsed
    assert g1.b.isna().all()
    for _, r in only_a.iterrows():
        assert g1.loc[r.a, "n"] == r["size"]
    g2 = out[out.gset == 2].set_index("b")            # a collapsed
    assert g2.a.isna().all()
    for _, r in only_b.iterrows():
        assert g2.loc[r.b, "n"] == r["size"]
    g3 = out[out.gset == 3]                           # grand total
    assert len(g3) == 1 and g3.n.iloc[0] == n
    assert abs(g3.sum_value.iloc[0] - round(df.v.sum(), 4)) < 1e-9


def test_cube_aggregate_empty_and_cap():
    import pytest as _pytest

    from dedup_ray.ops.relational import cube_aggregate

    empty = rd.from_arrow(pa.table({
        "a": pa.array([], pa.string()), "b": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64()),
    }))
    assert cube_aggregate(empty, ["a", "b"], "v", num_partitions=2).count() == 0
    five = rd.from_arrow(pa.table({c: pa.array(["x"]) for c in "abcde"}
                                  | {"v": pa.array([1.0])}))
    with _pytest.raises(ValueError):
        cube_aggregate(five, list("abcde"), "v")


def test_melt_columns_round_trips_pandas_melt():
    from dedup_ray.ops.relational import melt_columns

    df = pd.DataFrame({
        "id": [1, 2, 3], "x": [1.25, None, 3.5], "y": [10, 20, 30],
    })
    out = melt_columns(
        rd.from_pandas(df), ["id"], ["x", "y"],
    ).to_pandas().sort_values(["metric", "id"]).reset_index(drop=True)
    want = df.melt(id_vars=["id"], value_vars=["x", "y"],
                   var_name="metric", value_name="val")
    want["val"] = want["val"].astype(float).round(6)
    want = want.sort_values(["metric", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["id", "metric", "val"]], want)


def test_grouped_linreg_matches_numpy_and_degenerates():
    from dedup_ray.ops.relational import grouped_linreg

    rng = np.random.default_rng(13)
    rows = []
    for g, slope, icpt in [("a", 2.0, 1.0), ("b", -0.5, 3.0)]:
        x = rng.uniform(0, 20, size=120)
        y = icpt + slope * x + rng.normal(0, 0.3, size=120)
        rows.append(pd.DataFrame({"g": g, "x": x, "y": y}))
    # degenerate: constant x (slope null), single point
    rows.append(pd.DataFrame({"g": "constx", "x": 5.0,
                              "y": rng.normal(size=10)}))
    rows.append(pd.DataFrame({"g": "single", "x": [1.0], "y": [2.0]}))
    df = pd.concat(rows, ignore_index=True)

    out = grouped_linreg(
        rd.from_pandas(df).repartition(5), "g", "x", "y", num_partitions=3
    ).to_pandas().set_index("g")

    for g in ("a", "b"):
        sub = df[df.g == g]
        want = np.polyfit(sub.x, sub.y, 1)
        assert abs(out.loc[g, "slope"] - want[0]) < 1e-4
        assert abs(out.loc[g, "intercept"] - want[1]) < 1e-4
        r = np.corrcoef(sub.x, sub.y)[0, 1]
        assert abs(out.loc[g, "r2"] - r * r) < 1e-4
        assert out.loc[g, "n"] == 120
    assert np.isnan(out.loc["constx", "slope"])
    assert np.isnan(out.loc["single", "slope"])
    assert out.loc["single", "n"] == 1


def test_grouped_median_odd_even_and_duplicates():
    from dedup_ray.ops.relational import grouped_median

    df = pd.DataFrame({
        "g": (["odd"] * 5 + ["even"] * 6 + ["dups"] * 7 + ["one"]),
        "v": ([5.0, 1.0, 3.0, 2.0, 4.0]          # median 3
              + [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]   # median 3.5
              + [2.0, 2.0, 2.0, 9.0, 9.0, 1.0, 2.0]  # median 2
              + [7.5]),
    })
    out = grouped_median(
        rd.from_pandas(df).repartition(4), "g", "v", num_partitions=3
    ).to_pandas().set_index("g")
    assert out.loc["odd", "median"] == 3.0 and out.loc["odd", "n"] == 5
    assert out.loc["even", "median"] == 3.5
    assert out.loc["dups", "median"] == 2.0
    assert out.loc["one", "median"] == 7.5 and out.loc["one", "n"] == 1
    # random parity vs numpy
    rng = np.random.default_rng(2)
    big = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=501),
        "v": np.round(rng.normal(0, 10, size=501), 2),
    })
    got = grouped_median(
        rd.from_pandas(big).repartition(6), "g", "v", num_partitions=4
    ).to_pandas().set_index("g")
    for g, sub in big.groupby("g"):
        assert abs(got.loc[g, "median"] - np.median(sub.v)) < 1e-9


def test_group_zscore_matches_numpy_and_degenerates():
    from dedup_ray.ops.relational import group_zscore

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "id": np.arange(150, dtype=np.int64),
        "g": list(rng.choice(["a", "b"], size=148)) + ["const", "const"],
        "v": np.r_[rng.normal(5, 2, 148), [7.0, 7.0]],
    })
    out = group_zscore(
        rd.from_pandas(df).repartition(4), "g", "v", "id"
    ).to_pandas().set_index("id")
    for g in ("a", "b"):
        sub = df[df.g == g]
        mu, sd = sub.v.mean(), sub.v.std(ddof=0)
        want = np.round((sub.v - mu) / sd, 6)
        got = out.loc[sub.id, "z"].to_numpy()
        assert np.allclose(got, want.to_numpy(), atol=1e-9)
    # zero-variance group -> null z
    assert out.loc[df[df.g == "const"].id, "z"].isna().all()


def test_json_extract_cols_types_and_malformed():
    from dedup_ray.stages.textstats import json_extract_cols

    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "j": pa.array([
            '{"a": 7, "b": "x", "c": 1.5}',
            '{"a": null, "b": "y"}',
            'not json at all',
            None,
            '[1, 2]',                      # non-dict top level -> nulls
        ]),
    })
    out = json_extract_cols(
        rd.from_arrow(t).repartition(2), "j",
        {"a": ("a", pa.int64()), "b": ("b", pa.string()),
         "c": ("c", pa.float64())},
        keep_cols=["id"],
    ).to_pandas().set_index("id").sort_index()
    assert out.loc[1, "a"] == 7 and out.loc[1, "b"] == "x"
    assert out.loc[1, "c"] == 1.5
    assert pd.isna(out.loc[2, "a"]) and out.loc[2, "b"] == "y"
    for i in (3, 4, 5):
        assert pd.isna(out.loc[i, "a"]) and pd.isna(out.loc[i, "b"])


def test_grouped_rolling_matches_brute_force():
    from dedup_ray.ops.relational import grouped_rolling

    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n),
        "ts": rng.permutation(n),
        "id": np.arange(n),
        "v": np.round(rng.normal(10, 3, n), 3),
    })
    out = (grouped_rolling(rd.from_pandas(df), "k", ["ts", "id"], "v",
                           window=3, num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))

    # brute force: per key, sorted by (ts, id), window of 3 rows
    exp_avg, exp_delta = {}, {}
    for k, g in df.sort_values(["ts", "id"]).groupby("k"):
        vals = g["v"].to_numpy()
        ids = g["id"].to_numpy()
        for i, rid in enumerate(ids):
            w = vals[max(0, i - 2):i + 1]
            exp_avg[rid] = round(float(w.mean()), 6)
            exp_delta[rid] = (round(float(vals[i] - vals[i - 1]), 6)
                              if i > 0 else None)
    got_avg = dict(zip(out["id"], out["roll_avg"]))
    got_delta = dict(zip(out["id"], out["delta"]))
    assert got_avg == exp_avg
    for rid, d in exp_delta.items():
        if d is None:
            assert pd.isna(got_delta[rid])
        else:
            assert got_delta[rid] == d


def test_grouped_rolling_window_one_and_singletons():
    from dedup_ray.ops.relational import grouped_rolling

    df = pd.DataFrame({"k": [1, 2], "ts": [0, 0], "id": [0, 1],
                       "v": [5.0, 7.0]})
    out = (grouped_rolling(rd.from_pandas(df), "k", ["ts", "id"], "v",
                           window=1, num_partitions=2)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["roll_avg"].tolist() == [5.0, 7.0]
    assert out["roll_sum"].tolist() == [5.0, 7.0]
    assert out["delta"].isna().all()


def test_phrase_search_adjacency_and_repeats(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.ops.retrieval import phrase_search

    texts = [
        "x a b c y a b c",    # two matches of "a b c" at pos 2 and 6
        "a b x c",            # terms present but NOT adjacent -> no match
        "c b a",              # wrong order -> no match
        "a a a a",            # repeated-word phrase probe target
        None,                 # null text
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = phrase_search(ds, ["a", "b", "c"], num_partitions=3).to_pandas()
    got = got.set_index("doc_id").sort_index()
    assert got.index.tolist() == [0]
    assert got.loc[0, "n_matches"] == 2 and got.loc[0, "first_pos"] == 2

    # repeated word in the phrase: "a a" matches overlapping occurrences
    got2 = phrase_search(ds, ["a", "a"], num_partitions=3).to_pandas()
    got2 = got2.set_index("doc_id").sort_index()
    assert got2.loc[3, "n_matches"] == 3  # positions 1,2,3
    assert got2.loc[3, "first_pos"] == 1


def test_vocab_growth_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.textstats import vocab_growth

    # bucket_docs=2 -> buckets {0,1}: docs 0-1, docs 2-3
    texts = ["a b", "b c", "c d a", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = vocab_growth(ds, bucket_docs=2).to_pandas().set_index("bucket")
    # bucket 0: tokens a,b,b,c -> new types {a,b,c}=3, 4 tokens
    # bucket 1: tokens c,d,a + sentinel '3' -> new {d,'3'}=2, 4 tokens
    assert got.loc[0].tolist() == [3, 3, 4, 4]
    assert got.loc[1].tolist() == [2, 5, 4, 8]


def test_grouped_mad_hand_case_and_numpy_parity(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.ops.relational import grouped_mad

    # hand case: g=a values 1..7 plus outlier 100 -> median 4.5,
    # dev = [3.5,2.5,1.5,.5,.5,1.5,2.5,95.5], MAD = 2.0, 100 is > 3*MAD
    df = pd.DataFrame({
        "g": ["a"] * 8 + ["b"] * 3,
        "v": [1.0, 2, 3, 4, 5, 6, 7, 100.0] + [5.0, 5.0, 5.0],
    })
    out = grouped_mad(
        rd.from_pandas(df).repartition(3), "g", "v", k=3.0,
        num_partitions=3).to_pandas().set_index("g")
    assert out.loc["a", "median"] == 4.5
    assert out.loc["a", "mad"] == 2.0
    assert out.loc["a", "n_outliers"] == 1 and out.loc["a", "n"] == 8
    # constant group: MAD 0, nothing strictly exceeds 3*0... except
    # nothing deviates at all
    assert out.loc["b", "mad"] == 0.0 and out.loc["b", "n_outliers"] == 0

    rng = np.random.default_rng(7)
    big = pd.DataFrame({
        "g": rng.choice(["x", "y"], size=400),
        "v": np.round(rng.normal(0, 5, size=400), 2),
    })
    got = grouped_mad(
        rd.from_pandas(big).repartition(5), "g", "v", k=3.0,
        num_partitions=4).to_pandas().set_index("g")
    for g, sub in big.groupby("g"):
        med = np.median(sub.v)
        mad = np.median(np.abs(sub.v - med))
        assert abs(got.loc[g, "median"] - med) < 1e-9
        assert abs(got.loc[g, "mad"] - mad) < 1e-9
        assert got.loc[g, "n_outliers"] == int(
            (np.abs(sub.v - med) > 3.0 * mad).sum())


def test_recency_decay_scores_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.ops.relational import recency_decay_scores

    rng = np.random.default_rng(11)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 30 * 86400_000_000, size=300).astype(
        "timedelta64[us]")
    df = pd.DataFrame({
        "u": rng.integers(0, 9, size=300).astype(np.int64),
        "ts": pd.Series(ts),
    })
    out = recency_decay_scores(
        rd.from_pandas(df).repartition(4), "u", "ts", tau_days=7.0,
        num_partitions=3).to_pandas().set_index("u")
    ref = ts.max().astype("datetime64[us]").astype(np.int64)
    days = (ref - ts.astype("datetime64[us]").astype(np.int64)) / 86400e6
    w = np.exp(-(days / 7.0))
    for u, sub in df.groupby("u"):
        assert out.loc[u, "n"] == len(sub)
        assert abs(out.loc[u, "recency"] - w[sub.index].sum()) < 1e-5
    # the newest event weighs exactly 1.0: a user holding it scores >= 1
    newest_u = df.loc[days.argmin(), "u"]
    assert out.loc[newest_u, "recency"] >= 1.0


def test_frontier_schedule_slots_per_host(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.urlnorm import frontier_schedule

    t = pa.table({
        "url_id": pa.array([5, 1, 3, 2, 4, 6], pa.int64()),
        "host": pa.array(["a", "a", "a", "b", "b", "c"]),
        "delay_ms": pa.array([100, 100, 100, 250, 250, 50], pa.int64()),
    })
    out = frontier_schedule(rd.from_arrow(t).repartition(3),
                            num_partitions=3).to_pandas()
    out = out.set_index("url_id").sort_index()
    # host a in id order 1,3,5 -> seq 0,1,2
    assert out.loc[1, "seq"] == 0 and out.loc[3, "seq"] == 1
    assert out.loc[5, "seq"] == 2 and out.loc[5, "fetch_at_ms"] == 200
    assert out.loc[4, "seq"] == 1 and out.loc[4, "fetch_at_ms"] == 250
    assert out.loc[6, "fetch_at_ms"] == 0
    assert len(out) == 6


def test_interarrival_stats_burstiness(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.ops.relational import interarrival_stats

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # user 1: perfectly periodic (gap 10s) -> sd 0, B = -1, cv 0
    per = base + (np.arange(5) * 10_000_000).astype("timedelta64[us]")
    # user 2: gaps 1s and 9s -> mu 5, sd 4, B = -1/9
    burst = base + np.array([0, 1_000_000, 10_000_000]).astype(
        "timedelta64[us]")
    # user 3: single event -> dropped
    df = pd.DataFrame({
        "u": [1] * 5 + [2] * 3 + [3],
        "ts": pd.Series(np.r_[per, burst, [base]]),
    })
    out = interarrival_stats(
        rd.from_pandas(df).repartition(3), "u", "ts",
        num_partitions=3).to_pandas().set_index("u")
    assert 3 not in out.index
    assert out.loc[1, "n_gaps"] == 4
    assert out.loc[1, "mean_gap_s"] == 10.0
    assert out.loc[1, "cv"] == 0.0 and out.loc[1, "burstiness"] == -1.0
    assert out.loc[2, "mean_gap_s"] == 5.0
    assert abs(out.loc[2, "cv"] - 0.8) < 1e-9
    assert abs(out.loc[2, "burstiness"] - (-1.0 / 9.0)) < 1e-6


def test_meta_block_pairs_cbs_and_wep():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.linkage import meta_block_pairs

    # entities 1,2 share two blocks (w=2); 1-3 and 2-3 share one (w=1)
    blocks = pd.DataFrame({
        "ent": [1, 2, 1, 2, 3, 3],
        "btype": ["a", "a", "b", "b", "a", "c"],
        "bkey": ["k", "k", "k", "k", "k", "k"],
    })
    out = meta_block_pairs(rd.from_pandas(blocks),
                           num_partitions=2).to_pandas()
    got = {(r.id1, r.id2): r.w for r in out.itertuples()}
    # weights: (1,2)=2, (1,3)=1, (2,3)=1 -> mean 4/3 -> only (1,2) kept
    assert got == {(1, 2): 2}


def test_meta_block_pairs_purges_oversized_blocks():
    import pandas as pd
    import ray.data as rd

    from dedup_ray.ops.linkage import meta_block_pairs

    big = pd.DataFrame({"ent": range(100), "btype": ["a"] * 100,
                        "bkey": ["k"] * 100})
    small = pd.DataFrame({"ent": [200, 201], "btype": ["b", "b"],
                          "bkey": ["k", "k"]})
    out = meta_block_pairs(
        rd.from_pandas(pd.concat([big, small], ignore_index=True)),
        max_block_size=64, num_partitions=2).to_pandas()
    # the 100-entity block is purged; only the small block's pair remains
    assert len(out) == 1
    assert (out.iloc[0]["id1"], out.iloc[0]["id2"]) == (200, 201)
