"""Pareto front: staircase kernel vs brute-force dominance, combiner
property under arbitrary partitioning, cohort retention vs pandas, and
canonical-URL election rule order."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup_ray.ops.skyline import _staircase_keep, pareto_front


def brute_front(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (x[j] >= x[i] and y[j] >= y[i]
                    and (x[j] > x[i] or y[j] > y[i])):
                keep[i] = False
                break
    return keep


def test_staircase_matches_brute_force():
    rng = np.random.default_rng(11)
    for trial in range(30):
        n = int(rng.integers(1, 60))
        # small value range forces ties and exact duplicates
        x = rng.integers(0, 8, n).astype(np.int64)
        y = rng.integers(0, 8, n).astype(np.int64)
        got = _staircase_keep(x, y)
        want = brute_front(x, y)
        assert (got == want).all(), (trial, x, y)


def test_staircase_duplicates_of_front_point_all_kept():
    x = np.array([5, 5, 5, 1], dtype=np.int64)
    y = np.array([5, 5, 2, 9], dtype=np.int64)
    keep = _staircase_keep(x, y)
    assert keep.tolist() == [True, True, False, True]


def test_pareto_front_distributed_matches_brute(ray_session):
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "a": rng.integers(0, 40, n).astype(np.int64),
        "b": rng.integers(0, 40, n).astype(np.int64),
    })
    # maximize a, MINIMIZE b — exercise the axis flip
    want = brute_front(df["a"].to_numpy(), -df["b"].to_numpy())
    want_ids = set(df.loc[want, "id"])
    # many small blocks: the combiner must agree with the global front
    tables = [pa.Table.from_pandas(df.iloc[i:i + 37]) for
              i in range(0, n, 37)]
    ds = rd.from_arrow(tables)
    got = pareto_front(ds, "a", "b", maximize=(True, False)).to_pandas()
    assert set(got["id"]) == want_ids
    assert len(got) == int(want.sum())


def test_cohort_retention_matches_pandas(ray_session):
    rng = np.random.default_rng(5)
    n = 3000
    users = rng.integers(0, 80, n)
    # event times spread over ~10 weeks
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 70, n) * np.timedelta64(86400_000_000, "us")
    df = pd.DataFrame({"user_id": users.astype(np.int64), "ts": ts})

    week = (df["ts"].to_numpy().astype("datetime64[D]")
            .astype(np.int64) - 4) // 7
    uw = pd.DataFrame({"u": users, "w": week}).drop_duplicates()
    cohort = uw.groupby("u")["w"].transform("min")
    want = (pd.DataFrame({"cohort_week": cohort,
                          "age_weeks": uw["w"] - cohort})
            .groupby(["cohort_week", "age_weeks"]).size()
            .rename("n_users").reset_index())

    from dedup_ray.ops.relational import cohort_retention
    got = cohort_retention(rd.from_pandas(df), "user_id", "ts").to_pandas()
    key = ["cohort_week", "age_weeks"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[key + ["n_users"]].astype("int64"),
        want[key + ["n_users"]].astype("int64"))


def test_canonical_url_rule_order(ray_session):
    from dedup_ray.stages.urlnorm import canonical_url_per_group

    rows = pd.DataFrame({
        "digest": ["g1"] * 3 + ["g2"] * 2 + ["g3"] * 2 + ["g4"],
        "url": [
            # g1: https beats http even when longer
            "http://a.example/x", "https://a.example/longer/x",
            "http://b.example/x",
            # g2: same scheme → shortest wins
            "https://c.example/pp", "https://c.example/p",
            # g3: same scheme+length → lexicographic
            "http://d.example/a", "http://d.example/b",
            # g4: singleton
            "http://e.example/only",
        ],
        "doc_id": np.arange(8, dtype=np.int64),
    })
    got = canonical_url_per_group(
        rd.from_pandas(rows), "digest", "url", id_col="doc_id"
    ).to_pandas().set_index("digest")
    assert got.loc["g1", "canonical_url"] == "https://a.example/longer/x"
    assert got.loc["g2", "canonical_url"] == "https://c.example/p"
    assert got.loc["g3", "canonical_url"] == "http://d.example/a"
    assert got.loc["g4", "canonical_url"] == "http://e.example/only"
    assert got["n_pages"].to_dict() == {"g1": 3, "g2": 2, "g3": 2, "g4": 1}


def test_mojibake_screen_repairs_roundtrip(ray_session):
    from dedup_ray.stages.webclean import MOJIBAKE_PAIRS, mojibake_screen

    clean = ["café normal", "a ’quoted’ “word",
             "plain ascii", None, "über"]
    # damage: encode utf-8, misread as cp1252 (exactly the pair model)
    damaged = [c.encode("utf-8").decode("cp1252") if c else c
               for c in clean]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": damaged})
    got = mojibake_screen(rd.from_pandas(df)).to_pandas() \
        .set_index("doc_id").sort_index()
    # repaired length == original clean length (null -> empty)
    want_len = [len(c) if c else 0 for c in clean]
    assert got["n_chars_repaired"].tolist() == want_len
    assert got["flagged"].tolist() == [True, True, False, False, True]
    n_markers = [sum(d.count(bad) for bad, _ in MOJIBAKE_PAIRS)
                 if d else 0 for d in damaged]
    assert got["n_mojibake"].tolist() == n_markers


def test_registrable_domain_rules():
    from dedup_ray.stages.urlnorm import registrable_domain_array

    hosts = pa.array([
        "www.site1.co.uk",   # 2-level suffix beats .uk
        "a.b.site2.com",     # deep subdomain collapses
        "site3.io",
        "co.uk",             # bare suffix maps to itself
        "weird.internal",    # no rule: unchanged
        "blog.site4.com.au",
    ])
    got = registrable_domain_array(hosts).to_pylist()
    assert got == ["site1.co.uk", "site2.com", "site3.io",
                   "co.uk", "weird.internal", "site4.com.au"]


def test_registrable_domain_sql_matches_kernel():
    import duckdb

    from dedup_ray.stages.urlnorm import (registrable_domain_array,
                                          registrable_domain_sql)

    hosts = ["www.site1.co.uk", "a.b.site2.com", "site3.io", "co.uk",
             "weird.internal", "blog.site4.com.au", "x.ac.uk",
             "deep.y.net", "p.q.r.co.jp", "solo.uk"]
    want = registrable_domain_array(pa.array(hosts)).to_pylist()
    con = duckdb.connect()
    con.execute("CREATE TABLE h AS SELECT unnest(?) AS host", [hosts])
    got = [r[0] for r in con.execute(
        f"SELECT {registrable_domain_sql('host')} FROM h").fetchall()]
    assert got == want
