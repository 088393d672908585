"""Driver-style correctness harness: run every queries() entry and its
DuckDB oracle at sf0.01, compare row-count + schema + sorted values.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [names...]

Note: the oracles for the seeded non-SQL operators (minhash_dedup_docs
pairs_recovered, ann_topk_lsh / ann_topk_ivf recalls, the logistic
weights) pin deterministic values MEASURED AT sf0.01 — running this
harness against another sf_dir will correctly flag those as mismatches.
"""

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWS {len(ray_df)} vs {len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        # The driver hashes raw values, so an int64 engine column against a
        # float64/object oracle column (DuckDB HUGEINT sum) hash-mismatches
        # even when cell values are equal. Flag the dtype class explicitly.
        a_int = np.issubdtype(a[c].dtype, np.integer)
        b_int = np.issubdtype(b[c].dtype, np.integer)
        if a_int != b_int:
            return f"DTYPE col={c} {a[c].dtype} vs {b[c].dtype}"
        if np.issubdtype(a[c].dtype, np.floating):
            if not np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=1e-9,
                equal_nan=True,
            ):
                bad = np.nanmax(np.abs(av.astype(float) - bv.astype(float)))
                return f"VALUES col={c} maxdiff={bad}"
        else:
            if not (av == bv).all():
                i = int(np.nonzero(av != bv)[0][0])
                return f"VALUES col={c} row{i}: {av[i]!r} vs {bv[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dedup_ray.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} RAY-ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        wall = time.time() - t0
        if name not in ORACLES:
            print(f"{name:28s} rows-only rows={len(ray_df)} ({wall:.1f}s)")
            continue
        try:
            sql_df = con.sql(ORACLES[name]).df()
        except Exception as e:
            print(f"{name:28s} SQL-ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:28s} {verdict} rows={len(ray_df)} ({wall:.1f}s)")
        if verdict != "OK":
            failures.append(name)
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
