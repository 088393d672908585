"""SimHash fingerprints: similarity monotonicity + banding guarantee."""

import numpy as np

from dedup_ray.config import DedupConfig
from dedup_ray.stages.shingle import shingle_hash_batch
from dedup_ray.stages.simhash import hamming, simhash_from_shingles

CFG = DedupConfig()


def fp_of(texts, ids):
    v, o = shingle_hash_batch(texts, ids, CFG.shingle_k, CFG.seed)
    return simhash_from_shingles(v, o)


def test_identical_docs_identical_fp():
    fps = fp_of(["the quick brown fox jumps over the dog"] * 2, ["a", "b"])
    assert fps[0] == fps[1]


def test_similar_closer_than_dissimilar():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    base_toks = list(rng.choice(vocab, 400))
    near_toks = list(base_toks)
    for i in rng.choice(400, 2, replace=False):  # 0.5% edits: SimHash's regime
        near_toks[i] = "zz" + str(i)
    far_toks = list(rng.choice(vocab, 400))
    fps = fp_of(
        [" ".join(base_toks), " ".join(near_toks), " ".join(far_toks)],
        ["a", "b", "c"],
    )
    d_near = hamming(fps[:1], fps[1:2])[0]
    d_far = hamming(fps[:1], fps[2:3])[0]
    assert d_near < d_far
    assert d_near <= CFG.simhash_max_hamming


def test_hamming_popcount():
    a = np.array([0b1011, 0], dtype=np.int64)
    b = np.array([0b0010, -1], dtype=np.int64)
    assert hamming(a, b).tolist() == [2, 64]


def _flip(fp: int, bits) -> int:
    for b in bits:
        fp ^= 1 << b
    return fp


def test_simhash_edges_planted_hamming():
    """End-to-end banded path: pairs at hamming ≤ max found, > max rejected.

    Includes the adversarial case of a hamming-4 pair that DOES share three
    exact bands (all 4 flips inside one 16-bit band) — it must be emitted as
    a candidate and rejected by the inline verification.
    """
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.simhash import simhash_edges

    base = 0x0F0F_1234_ABCD_5678
    fps = {
        "d0": base,
        "d1": _flip(base, [5]),            # h(d0)=1
        "d2": _flip(base, [5, 20, 40]),    # h(d0)=3, h(d1)=2
        "d3": _flip(base, list(range(8))),  # h(d0)=8: far
        "d4": _flip(base, list(range(8)) + [50]),  # h(d3)=1
        "d5": _flip(base, [0, 1, 2, 3]),   # h(d0)=4, shares bands 1-3 with d0
    }
    tbl = pa.table(
        {
            "url": list(fps),
            "simhash": pa.array(
                [np.uint64(v).astype(np.int64) for v in fps.values()], pa.int64()
            ),
        }
    )
    cfg = DedupConfig(num_partitions=4)
    edges = simhash_edges(rd.from_arrow(tbl), cfg, id_col="url").to_pandas()
    got = {tuple(r) for r in edges[["id1", "id2"]].itertuples(index=False)}
    expect = {("d0", "d1"), ("d0", "d2"), ("d1", "d2"), ("d3", "d4")}
    assert got == expect
    ham = dict(zip(zip(edges["id1"], edges["id2"]), edges["hamming"]))
    assert ham[("d0", "d1")] == 1
    assert ham[("d0", "d2")] == 3
    assert ham[("d3", "d4")] == 1


def test_simhash_md5_properties():
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.simhash import simhash_md5_docs

    base = "the quick brown fox jumps over the lazy dog " * 4
    edit = base.replace("lazy", "hasty")  # every occurrence
    far = "completely unrelated words about entirely other topics now"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([base, base, edit, "", far], pa.string()),
    })).repartition(2)
    out = simhash_md5_docs(ds).to_pandas().set_index("doc_id")["simhex"]
    assert out[0] == out[1]  # identical text, any partitioning
    ham_near = bin(int(out[0], 16) ^ int(out[2], 16)).count("1")
    ham_far = bin(int(out[0], 16) ^ int(out[4], 16)).count("1")
    assert ham_near <= 16  # one-word swap stays near in hamming space
    assert ham_far > ham_near  # unrelated text lands farther
    assert out[3] == "f" * 16  # empty doc: all-ones by the >=0 tie rule
