"""Jaro–Winkler comparator (`ops/strsim.py`) — parity with DuckDB's
`jaro_winkler_similarity` (the engine the catalog oracle runs on) plus
hand-pinned canonical values from the record-linkage literature."""

import random

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup_ray.ops.strsim import _round6, jaro, jaro_winkler


def test_canonical_literature_values():
    # Winkler (1990) examples; floor-transposition convention
    assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.961111) < 1e-5
    assert abs(jaro_winkler("DWAYNE", "DUANE") - 0.84) < 1e-5
    assert abs(jaro("DIXON", "DICKSONX") - 0.766667) < 1e-5
    # identity, disjoint, and the both-empty = 0 convention
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert jaro_winkler("", "") == 0.0
    assert jaro_winkler("a", "") == 0.0


def test_boost_only_above_threshold_and_prefix_cap():
    # jaro("abcdXY", "abcdZW") = (4/6+4/6+4/4)/3 = 7/9 > 0.7 → boost
    j = jaro("abcdxy", "abcdzw")
    assert abs(j - 7 / 9) < 1e-12
    jw = jaro_winkler("abcdxy", "abcdzw")
    # prefix capped at 4 even though 4 chars agree before divergence
    assert abs(jw - (j + 4 * 0.1 * (1 - j))) < 1e-12


def test_fuzz_13k_pairs_exact_duckdb_parity():
    random.seed(7)
    alpha = "abcdef"
    pairs = [
        (
            "".join(random.choice(alpha) for _ in range(random.randint(0, 9))),
            "".join(random.choice(alpha) for _ in range(random.randint(0, 9))),
        )
        for _ in range(13000)
    ]
    con = duckdb.connect()
    df = pd.DataFrame(pairs, columns=["a", "b"])
    con.register("p", df)
    rows = con.execute(
        "SELECT a, b, floor(jaro_winkler_similarity(a, b) * 1e6 + 0.5) / 1e6"
        " FROM p"
    ).fetchall()
    for a, b, want in rows:
        assert _round6(jaro_winkler(a, b)) == want, (a, b)


def test_column_op_distinct_cache_and_nulls():
    from dedup_ray.ops.strsim import jaro_winkler_column

    ds = rd.from_arrow(pa.table({
        "x": pa.array(["martha", "dwayne", None, "same"], pa.string()),
        "y": pa.array(["marhta", "duane", "abc", "same"], pa.string()),
    })).repartition(2)
    out = jaro_winkler_column(ds, "x", "y").to_pandas()
    got = dict(zip(out["x"].fillna(""), out["jw"]))
    assert got[""] == 0.0  # null folds to empty → score 0
    assert got["same"] == 1.0
    assert abs(got["martha"] - 0.961111) < 1e-6
