"""Hashed text embeddings + embedding-cosine near-dup edges."""

import numpy as np
import pandas as pd
import ray.data as rd

from dedup_ray.stages.embed import (
    cosine_dup_edges,
    embed_docs,
    hashed_embedding_batch,
)


def test_hashed_embedding_geometry():
    base = " ".join(f"w{i}" for i in range(100))
    near = " ".join(f"w{i}" for i in range(95)) + " x1 x2 x3 x4 x5"
    far = " ".join(f"z{i}" for i in range(100))
    V = hashed_embedding_batch([base, near, far, ""], dim=64, seed=42)
    # unit norm (empty doc stays zero)
    assert np.allclose(np.linalg.norm(V[:3], axis=1), 1.0)
    assert np.linalg.norm(V[3]) == 0.0
    cos_near = V[0] @ V[1]
    cos_far = V[0] @ V[2]
    assert cos_near > 0.85
    assert abs(cos_far) < 0.4  # signed hashing: disjoint sets ~orthogonal
    # deterministic
    assert np.array_equal(V, hashed_embedding_batch([base, near, far, ""], 64, 42))


def test_embed_docs_and_cosine_edges():
    rows = [
        {"doc_id": 0, "source": "s1",
         "text": " ".join(f"w{i}" for i in range(50))},
        {"doc_id": 1, "source": "s1",
         "text": " ".join(f"w{i}" for i in range(48)) + " a b"},
        {"doc_id": 2, "source": "s1",
         "text": " ".join(f"q{i}" for i in range(50))},
        {"doc_id": 3, "source": "s2",
         "text": " ".join(f"w{i}" for i in range(50))},
    ]
    ds = rd.from_items(rows)
    emb = embed_docs(ds, dim=64).to_pandas()
    src = pd.DataFrame(rows)[["doc_id", "source"]]
    joined = rd.from_pandas(emb.merge(src, on="doc_id"))
    edges = cosine_dup_edges(
        joined, "source", id_col="doc_id", threshold=0.9
    ).to_pandas()
    got = set(zip(edges["id1"], edges["id2"]))
    assert (0, 1) in got  # near-dup pair within block
    assert all(e[0] != 2 and e[1] != 2 for e in got)  # disjoint text excluded
    assert all(3 not in e for e in got)  # cross-block never paired


def test_ngram_embedding_discrimination_and_layout():
    """3-gram features: near-dups stay close, topically-overlapping but
    distinct docs go near-orthogonal (the unigram common-word floor is the
    failure mode this guards), and hashes never depend on batch layout."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]  # SHARED vocab across docs
    docs = [" ".join(rng.choice(vocab, size=80)) for _ in range(6)]
    near = docs[0].split()
    near[10] = "edited"
    near[50] = "tokens"
    texts = docs + [" ".join(near), "a b", ""]
    V1 = hashed_embedding_batch(texts, dim=64, seed=42, ngram=3)
    # unigram bags of shared-vocab docs are highly similar (the trap) …
    U = hashed_embedding_batch(texts, dim=64, seed=42, ngram=1)
    assert U[0] @ U[1] > 0.5
    # … 3-gram features separate them
    assert abs(V1[0] @ V1[1]) < 0.35
    assert V1[0] @ V1[6] > 0.85  # 2 edits in 80 tokens: still a near-dup
    # short doc (< ngram tokens) embeds from its own tokens, unit norm
    assert np.isclose(np.linalg.norm(V1[7]), 1.0)
    assert np.linalg.norm(V1[8]) == 0.0
    # layout independence: splitting the batch reproduces identical rows
    V2a = hashed_embedding_batch(texts[:4], dim=64, seed=42, ngram=3)
    V2b = hashed_embedding_batch(texts[4:], dim=64, seed=42, ngram=3)
    assert np.array_equal(V1, np.vstack([V2a, V2b]))


def test_cosine_dup_edges_lsh_matches_blocked():
    """The unbounded-corpus LSH path finds the same near-dup pairs as the
    exhaustive blocked kernel on a corpus where all true pairs are well
    above threshold (planted ~2%-edit near-dups of 100-token docs)."""
    from dedup_ray.stages.embed import cosine_dup_edges_lsh

    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        toks = [f"w{v}" for v in rng.integers(0, 1_000_000, size=100)]
        rows.append({"vec_id": 2 * i, "block": "all", "text": " ".join(toks)})
        near = list(toks)
        near[5] = "edited"
        near[60] = "tokens"
        rows.append(
            {"vec_id": 2 * i + 1, "block": "all", "text": " ".join(near)}
        )
    ds = rd.from_items(rows)
    emb = embed_docs(
        ds, id_col="vec_id", dim=128, ngram=3, keep_cols=("block",)
    )
    blocked = cosine_dup_edges(
        emb, "block", id_col="vec_id", threshold=0.8
    ).to_pandas()
    lsh = cosine_dup_edges_lsh(
        emb.select_columns(["vec_id", "embedding"]),
        id_col="vec_id",
        threshold=0.8,
        num_partitions=4,
    ).to_pandas()
    want = set(zip(blocked["id1"], blocked["id2"]))
    got = set(zip(lsh["id1"], lsh["id2"]))
    assert want == got  # exhaustive truth recovered exactly (no dupes)
    assert {(2 * i, 2 * i + 1) for i in range(60)} <= got
    # cos values agree with the blocked kernel
    merged = blocked.merge(lsh, on=["id1", "id2"], suffixes=("_b", "_l"))
    assert np.allclose(merged["cos_sim_b"], merged["cos_sim_l"])


def test_jl_project_preserves_distance_structure():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.embed import jl_project

    rng = np.random.default_rng(5)
    # two well-separated blobs: the structure JL must keep at k=8
    c = np.zeros(64)
    c[:8] = 12.0
    X = np.vstack([rng.normal(size=(20, 64)),
                   rng.normal(size=(20, 64)) + c])
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(40), "embedding": list(X),
    }))
    out = jl_project(ds, out_dim=8).to_pandas()
    Y = (out.pivot(index="vec_id", columns="j", values="y")
         .sort_index().to_numpy())
    assert Y.shape == (40, 8)
    within = np.linalg.norm(Y[:20, None] - Y[None, :20], axis=2)[
        np.triu_indices(20, 1)]
    between = np.linalg.norm(Y[:20, None] - Y[None, 20:], axis=2).ravel()
    assert within.mean() < between.mean()
    # determinism: a second run produces identical cells
    out2 = jl_project(ds, out_dim=8).to_pandas()
    m = out.merge(out2, on=["vec_id", "j"])
    assert (m["y_x"] == m["y_y"]).all()
