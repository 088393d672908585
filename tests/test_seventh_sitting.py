"""Seventh-sitting operators: windowed funnel, event transitions,
equi-depth ntile binning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup_ray.ops.relational import event_transitions, funnel_steps
from dedup_ray.stages.ordering import ntile_bucket

US = 1_000_000


def _events(rows):
    return rd.from_arrow(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1] * US, "us") for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }))


def test_funnel_basic_progression():
    ds = _events([
        # user 1 completes all three steps in order
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        # user 2 has b before a: only step a counts
        (2, 10, "b"), (2, 20, "a"),
        # user 3 never signs up
        (3, 5, "b"), (3, 6, "c"),
        # user 4: a then c (skips b) -> 1 step
        (4, 1, "a"), (4, 2, "c"),
    ])
    out = funnel_steps(ds, "user_id", "ts", "event_type",
                       ["a", "b", "c"]).to_pandas()
    got = dict(zip(out["steps_completed"], out["n_users"]))
    assert got == {3: 1, 1: 2, 0: 1}


def test_funnel_strictly_later_ties_do_not_count():
    # b at the SAME timestamp as a must not complete step 2
    ds = _events([(1, 10, "a"), (1, 10, "b"), (2, 10, "a"), (2, 11, "b")])
    out = funnel_steps(ds, "user_id", "ts", "event_type",
                       ["a", "b"]).to_pandas()
    got = dict(zip(out["steps_completed"], out["n_users"]))
    assert got == {1: 1, 2: 1}


def test_funnel_window_blocks_late_steps():
    ds = _events([
        (1, 0, "a"), (1, 50, "b"),     # within window
        (2, 0, "a"), (2, 200, "b"),    # outside window
        # user 3: an early out-of-window b, then an in-window one later?
        # window counts from the PREVIOUS step completion (t=0) so only
        # events in (0, 100] qualify
        (3, 0, "a"), (3, 150, "b"), (3, 90, "b"),
    ])
    out = funnel_steps(ds, "user_id", "ts", "event_type", ["a", "b"],
                       window_us=100 * US).to_pandas()
    got = dict(zip(out["steps_completed"], out["n_users"]))
    assert got == {2: 2, 1: 1}


def test_funnel_first_step_takes_earliest_event():
    # earliest a at t=100; the b at t=50 is before it -> 1 step only
    ds = _events([(1, 100, "a"), (1, 50, "b"), (1, 300, "a")])
    out = funnel_steps(ds, "user_id", "ts", "event_type", ["a", "b"],
                       window_us=500 * US).to_pandas()
    assert dict(zip(out["steps_completed"], out["n_users"])) == {1: 1}


def test_funnel_partition_invariance():
    rng = np.random.default_rng(7)
    rows = [(int(rng.integers(0, 40)), int(rng.integers(0, 1000)),
             str(rng.choice(["a", "b", "c", "x"]))) for _ in range(600)]
    ds = _events(rows)
    a = funnel_steps(ds, "user_id", "ts", "event_type", ["a", "b", "c"],
                     window_us=300 * US, num_partitions=1).to_pandas()
    b = funnel_steps(ds.repartition(7), "user_id", "ts", "event_type",
                     ["a", "b", "c"], window_us=300 * US,
                     num_partitions=5).to_pandas()
    key = "steps_completed"
    assert (a.sort_values(key).reset_index(drop=True)
            .equals(b.sort_values(key).reset_index(drop=True)))


def test_event_transitions_counts_and_tiebreak():
    ds = _events([
        (1, 10, "a"), (1, 20, "b"), (1, 30, "a"),
        # user 2: tie at t=5 broken by event_id order (rows 3 then 4)
        (2, 5, "x"), (2, 5, "y"),
        (3, 1, "z"),  # single event -> no transition
    ])
    out = event_transitions(ds, "user_id", "ts", "event_type",
                            "event_id").to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("x", "y"): 1}


def test_event_transitions_reference_parity():
    rng = np.random.default_rng(3)
    rows = [(int(rng.integers(0, 25)), int(rng.integers(0, 50)),
             str(rng.choice(list("pqr")))) for _ in range(400)]
    ds = _events(rows)
    out = event_transitions(ds, "user_id", "ts", "event_type",
                            "event_id").to_pandas()
    # independent pandas reference
    df = pd.DataFrame(rows, columns=["user_id", "t", "k"])
    df["event_id"] = range(len(df))
    df = df.sort_values(["user_id", "t", "event_id"])
    same = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
    ref = pd.DataFrame({
        "prev_type": df["k"].to_numpy()[:-1][same],
        "next_type": df["k"].to_numpy()[1:][same],
    }).value_counts().to_dict()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == ref


def _ntile_reference(n_rows: int, n_buckets: int) -> list[int]:
    q, rem = divmod(n_rows, n_buckets)
    out = []
    for b in range(1, n_buckets + 1):
        out.extend([b] * (q + (1 if b <= rem else 0)))
    return out


def test_ntile_remainder_rule_matches_sql():
    vals = np.random.default_rng(11).permutation(103).astype(np.float64)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(103), pa.int64()),
        "v": pa.array(vals),
    }))
    out = ntile_bucket(ds, "v", "id", 10).to_pandas()
    out = out.sort_values("rank")
    # first 103 % 10 = 3 buckets get 11 rows, the rest 10
    assert out["bucket"].tolist() == _ntile_reference(103, 10)
    # rank order equals value order
    assert (np.diff(out["v"].to_numpy()) > 0).all()


def test_ntile_fewer_rows_than_buckets():
    ds = rd.from_arrow(pa.table({
        "id": pa.array([3, 1, 2], pa.int64()),
        "v": pa.array([30.0, 10.0, 20.0]),
    }))
    out = ntile_bucket(ds, "v", "id", 8).to_pandas().sort_values("rank")
    assert out["bucket"].tolist() == [1, 2, 3]
    assert out["id"].tolist() == [1, 2, 3]


# ---------------------------------------------------------------------------
# Fellegi–Sunter linkage
# ---------------------------------------------------------------------------

from fractions import Fraction

import ray.data as _rd

from dedup_ray.ops.linkage import estimate_mu_weights, fellegi_sunter_score


def _pairs_table(rows):
    return _rd.from_arrow(pa.table({
        "id1": pa.array([r[0] for r in rows], pa.int64()),
        "id2": pa.array([r[1] for r in rows], pa.int64()),
        "a_x": pa.array([r[2] for r in rows], pa.int64()),
        "a_y": pa.array([r[3] for r in rows], pa.int64()),
        "label": pa.array([r[4] for r in rows], pa.int64()),
        "is_train": pa.array([r[5] for r in rows], pa.int64()),
    }))


def test_fs_weights_match_hand_computation():
    # 3 training matches (a_x agrees 2/3, a_y 3/3),
    # 2 training non-matches (a_x agrees 0/2, a_y 1/2)
    rows = [
        (0, 1, 1, 1, 1, 1), (0, 2, 1, 1, 1, 1), (1, 2, 0, 1, 1, 1),
        (3, 4, 0, 0, 0, 1), (3, 5, 0, 1, 0, 1),
        (9, 10, 1, 0, 1, 0),  # held-out pair: must not affect weights
    ]
    w = estimate_mu_weights(_pairs_table(rows), ["a_x", "a_y"])
    assert (w["n_match"], w["n_unmatch"]) == (3, 2)
    # Laplace rationals
    m_x, u_x = Fraction(3, 5), Fraction(1, 4)
    m_y, u_y = Fraction(4, 5), Fraction(2, 4)
    import math
    for pat in range(4):
        r = Fraction(1)
        r *= m_x / u_x if pat & 1 else (1 - m_x) / (1 - u_x)
        r *= m_y / u_y if pat & 2 else (1 - m_y) / (1 - u_y)
        expect = math.floor(
            math.log(r.numerator / r.denominator) * 1e6 + 0.5) / 1e6
        assert w["pattern_scores"][pat] == expect


def test_fs_scoring_separates_planted_matches():
    rng = np.random.default_rng(5)
    rows = []
    for i in range(400):
        is_match = i % 2 == 0
        # matches agree on both fields with p=0.9; non-matches p=0.1
        p = 0.9 if is_match else 0.1
        rows.append((i, i + 1000,
                     int(rng.random() < p), int(rng.random() < p),
                     int(is_match), int(i < 200)))
    scored, w = fellegi_sunter_score(_pairs_table(rows), ["a_x", "a_y"])
    df = scored.to_pandas()
    held = df[df["id1"] >= 200]  # the untrained half
    # decision accuracy on the held-out half should be far above chance
    acc = (held["is_match"] == held["label"]).mean()
    assert acc > 0.75
    # llr of the all-agree pattern is positive, all-disagree negative
    assert w["pattern_scores"][3] > 0 > w["pattern_scores"][0]


def test_fs_partition_invariance():
    rng = np.random.default_rng(6)
    rows = [(i, i + 500, int(rng.random() < 0.5), int(rng.random() < 0.5),
             int(rng.random() < 0.4), int(rng.random() < 0.7))
            for i in range(300)]
    a = fellegi_sunter_score(_pairs_table(rows), ["a_x", "a_y"])[0] \
        .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    b = fellegi_sunter_score(
        _pairs_table(rows).repartition(9), ["a_x", "a_y"])[0] \
        .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# Gram matrix / covariance / PCA
# ---------------------------------------------------------------------------

from dedup_ray.ops.matrix import (
    covariance_from_gram,
    gram_matrix,
    power_iteration,
)


def _vec_ds(x: np.ndarray):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array(list(x.astype(np.float32))),
    }))


def test_gram_matches_numpy_and_is_partition_invariant():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(120, 8))
    xs = np.floor(x.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    # float32 storage round-trip: scale what was actually stored
    xs = np.floor(x.astype(np.float32).astype(np.float64) * 1e6 + 0.5) \
        .astype(np.int64)
    expect = xs.T @ xs
    out = gram_matrix(_vec_ds(x), "embedding").to_pandas()
    tri = out[out["j"] > 0]
    for r in tri.itertuples():
        assert r.g == expect[r.i - 1, r.j - 1]
    sums = out[out["j"] == 0].sort_values("i")["g"].to_numpy()
    assert (sums == xs.sum(axis=0)).all()
    out2 = gram_matrix(_vec_ds(x).repartition(7), "embedding").to_pandas()
    a = out.sort_values(["i", "j"]).reset_index(drop=True)
    b = out2.sort_values(["i", "j"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_covariance_and_pca_match_numpy():
    rng = np.random.default_rng(4)
    # anisotropic cloud: dominant direction along (1, 1, 0)/sqrt(2)
    base = rng.normal(size=(500, 3)) * np.array([3.0, 0.5, 0.1])
    rot = np.array([[1, 1, 0], [1, -1, 0], [0, 0, np.sqrt(2)]]) / np.sqrt(2)
    x = base @ rot
    gram = gram_matrix(_vec_ds(x), "embedding").to_pandas()
    cov = covariance_from_gram(gram, n_rows=len(x))
    ref = np.cov(x.astype(np.float32).astype(np.float64), rowvar=False)
    assert np.allclose(cov, ref, atol=1e-5)
    lam, v = power_iteration(cov)
    w, u = np.linalg.eigh(ref)
    assert abs(lam - w[-1]) < 1e-6 * max(1.0, abs(w[-1]))
    assert abs(abs(v @ u[:, -1]) - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# Soundex phonetic keys
# ---------------------------------------------------------------------------

from dedup_ray.stages.phonetic import soundex_array, soundex_sql


def test_soundex_canonical_examples():
    cases = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
             "Tymczak": "T522", "Pfister": "P236", "Honeyman": "H555",
             "Washington": "W252", "Lee": "L000", "Gutierrez": "G362",
             "Jackson": "J250", "": "", "42nd": ""}
    got = soundex_array(list(cases))
    assert dict(zip(cases, got)) == cases


def test_soundex_hw_transparent_vowel_separates():
    # same code across h/w collapses; across a vowel it repeats
    assert soundex_array(["schmit"])[0] == "S530"   # s-c adjacent 2,2
    assert soundex_array(["sekic"])[0] == "S220"    # s.e.k -> 2, 2 repeat
    # the first letter's code seeds suppression (the Pfister rule):
    # b h b collapses entirely; b a b re-emits after the vowel reset
    assert soundex_array(["bhb"])[0] == "B000"
    assert soundex_array(["bab"])[0] == "B100"
    assert soundex_array(["babab"])[0] == "B110"


def test_soundex_sql_twin_matches_kernel():
    import duckdb

    names = ["Robert", "rupert", "Ashcraft", "Tymczak", "pfister",
             "honeyman", "lee", "washington", "aeiou", "hhhh", "bcdl",
             "x", "zz", "supercalifragilistic"]
    con = duckdb.connect()
    con.execute("CREATE TABLE __soundex_src AS SELECT unnest(?) AS nm",
                [names])
    sql = soundex_sql("nm")
    got = dict(con.execute(sql).fetchall())
    expect = dict(zip(names, soundex_array(names)))
    assert got == expect
