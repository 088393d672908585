"""Similarity join semantics (ops/simjoin.py) on planted corpora."""

import numpy as np
import pyarrow as pa

import ray.data

from dedup_ray.ops.simjoin import similarity_join


def _mk(rows, id_name="id"):
    return ray.data.from_arrow(
        pa.table(
            {
                id_name: pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _words(seed, n):
    return " ".join(f"w{seed}x{i}" for i in range(n))


def test_truncation_neardup_found(ray_session):
    base = _words(1, 50)
    left = _mk([(1, base), (2, _words(2, 50))])
    right = _mk([(10, " ".join(base.split(" ")[:40]))])
    got = similarity_join(
        left, right, "id", "id", num_partitions=4
    ).to_pandas()
    assert set(zip(got["id_l"], got["id_r"])) == {(1, 10)}
    row = got.iloc[0]
    # 48 left shingles, 38 right shingles, all right ones shared
    assert row["inter"] == 38 and row["n_l"] == 48 and row["n_r"] == 38
    assert row["jaccard"] == 38 / 48


def test_tau_excludes_weak_overlap(ray_session):
    a = _words(1, 30) + " " + _words(9, 30)
    b = _words(2, 30) + " " + _words(9, 30)  # share only the suffix half
    got = similarity_join(
        _mk([(1, a)]), _mk([(2, b)]), "id", "id", tau=0.6, num_partitions=4
    ).to_pandas()
    assert len(got) == 0
    got = similarity_join(
        _mk([(1, a)]), _mk([(2, b)]), "id", "id", tau=0.3, num_partitions=4
    ).to_pandas()
    assert set(zip(got["id_l"], got["id_r"])) == {(1, 2)}


def test_df_cap_blocks_boilerplate_only_pairs(ray_session):
    # every left doc shares ONLY the boilerplate run with right doc 99;
    # with max_df small the boilerplate shingles can't block
    boiler = _words(7, 20)
    left = _mk([(i, _words(i, 30) + " " + boiler) for i in range(1, 9)])
    right = _mk([(99, boiler)])
    got = similarity_join(
        left, right, "id", "id", tau=0.1, max_df=4, num_partitions=4
    ).to_pandas()
    assert len(got) == 0
    # raising the cap lets the shared shingles block again
    got = similarity_join(
        left, right, "id", "id", tau=0.1, max_df=16, num_partitions=4
    ).to_pandas()
    assert len(got) == 8


def _brute_force_pairs(rows, k=3, tau=0.5):
    """Independent reference: all-pairs distinct-shingle Jaccard."""
    sets = {}
    for i, txt in rows:
        toks = (txt or "").split(" ")
        if len(toks) >= k:
            sets[i] = {
                " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
            }
    ids = sorted(sets)
    out = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            sa, sb = sets[ids[a]], sets[ids[b]]
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= tau:
                out.add((ids[a], ids[b]))
    return out


def test_self_join_equals_brute_force(ray_session):
    from dedup_ray.ops.simjoin import similarity_self_join
    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for i in range(40):
        rows.append((i, " ".join(rng.choices(vocab, k=25))))
    # planted near-dup: copy with small edits
    base = rows[5][1].split(" ")
    base[3] = "EDIT"
    rows.append((100, " ".join(base)))
    got = similarity_self_join(
        _mk(rows), "id", tau=0.5, num_partitions=4
    ).to_pandas()
    assert set(zip(got["id1"], got["id2"])) == _brute_force_pairs(rows)
    assert (5, 100) in set(zip(got["id1"], got["id2"]))


def test_self_join_tau_sweep_recall_exact(ray_session):
    from dedup_ray.ops.simjoin import similarity_self_join
    import random

    rng = random.Random(11)
    vocab = [f"u{i}" for i in range(12)]  # tiny vocab -> many shared shingles
    rows = [(i, " ".join(rng.choices(vocab, k=15))) for i in range(30)]
    for tau in (0.2, 0.4, 0.7):
        got = similarity_self_join(
            _mk(rows), "id", tau=tau, num_partitions=4
        ).to_pandas()
        # Ray's to_pandas drops the schema when every block is empty
        pairs = (
            set() if got.empty else set(zip(got["id1"], got["id2"]))
        )
        assert pairs == _brute_force_pairs(rows, tau=tau), f"tau={tau}"


def test_short_and_empty_docs_never_join(ray_session):
    left = _mk([(1, "a b"), (2, ""), (3, None), (4, _words(4, 40))])
    right = _mk([(1, "a b"), (4, _words(4, 40))])
    got = similarity_join(left, right, "id", "id", num_partitions=4).to_pandas()
    assert set(zip(got["id_l"], got["id_r"])) == {(4, 4)}


def test_containment_join_excerpt_detection():
    from dedup_ray.ops.simjoin import containment_join

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(400)]
    sources = [" ".join(rng.choice(vocab, size=60)) for _ in range(10)]
    rows_l, rows_r = [], []
    for i, s in enumerate(sources):
        rows_r.append((100 + i, s))
    # excerpts: first 12 tokens of sources 0..4 (contained), plus one
    # unrelated short doc (not contained anywhere)
    for i in range(5):
        rows_l.append((i, " ".join(sources[i].split(" ")[:12])))
    rows_l.append((9, " ".join(rng.choice(vocab, size=12))))

    left = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows_l], pa.int64()),
        "text": pa.array([r[1] for r in rows_l]),
    }))
    right = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows_r], pa.int64()),
        "text": pa.array([r[1] for r in rows_r]),
    }))
    out = containment_join(left, right, "doc_id", "doc_id", tau=0.9,
                           max_df=4, num_partitions=3).to_pandas()
    got = set(zip(out["id_l"], out["id_r"]))
    assert {(i, 100 + i) for i in range(5)} <= got
    assert all(l != 9 for l, _ in got)
    full = out.set_index(["id_l", "id_r"])
    for i in range(5):
        assert full.loc[(i, 100 + i), "containment"] == 1.0


def _brute_force_cosine(rows, tau):
    """Reference tf-cosine pairs (id1 < id2, cos >= tau) via numpy."""
    from collections import Counter

    tfs = {i: Counter((t or "").split(" ")) for i, t in rows}
    out = {}
    ids = sorted(tfs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = tfs[ids[ai]], tfs[ids[bi]]
            dot = sum(a[t] * b[t] for t in a.keys() & b.keys())
            n2a = sum(v * v for v in a.values())
            n2b = sum(v * v for v in b.values())
            if float(dot) * dot >= (tau * tau) * float(n2a) * n2b:
                out[(ids[ai], ids[bi])] = (n2a, n2b, dot)
    return out


def test_cosine_self_join_equals_brute_force(ray_session):
    import random

    from dedup_ray.ops.simjoin import cosine_self_join

    rng = random.Random(13)
    vocab = [f"c{i}" for i in range(20)]
    rows = [(i, " ".join(rng.choices(vocab, k=30))) for i in range(35)]
    # planted near-dup pair: one substitution
    toks = rows[7][1].split(" ")
    toks[0] = "EDITED"
    rows.append((200, " ".join(toks)))
    rows.append((201, ""))      # empty text: single '' token, joins nothing
    for tau in (0.5, 0.8, 0.95):
        got = cosine_self_join(
            _mk(rows), "id", tau=tau, num_partitions=4
        ).to_pandas()
        want = _brute_force_cosine(rows, tau)
        pairs = set() if got.empty else set(zip(got["id1"], got["id2"]))
        assert pairs == set(want), f"tau={tau}"
        if not got.empty:
            for r in got.itertuples():
                n2a, n2b, dot = want[(r.id1, r.id2)]
                assert (r.n2_1, r.n2_2, r.dot) == (n2a, n2b, dot)
                assert abs(r.cosine - dot / np.sqrt(n2a * n2b)) < 1e-12
    assert (7, 200) in _brute_force_cosine(rows, 0.8)


def test_cosine_self_join_identical_docs_score_one(ray_session):
    from dedup_ray.ops.simjoin import cosine_self_join

    rows = [(1, "a b c a"), (2, "a b c a"), (3, "x y z w")]
    got = cosine_self_join(_mk(rows), "id", tau=0.99,
                           num_partitions=2).to_pandas()
    assert set(zip(got["id1"], got["id2"])) == {(1, 2)}
    assert got["cosine"].iloc[0] == 1.0
