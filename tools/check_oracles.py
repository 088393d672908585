"""Driver-style correctness harness: run every queries() entry and its
DuckDB oracle at sf0.01, compare row-count + schema + sorted values.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [names...]

CI sweep mode (round-3 verdict item #6 — run at every sitting close):
    python tools/check_oracles.py --sample 40 --seed <round>
samples 40 catalog entries with the seeded RNG, checks them, and appends
one tally line to PROGRESS.jsonl:
    {"sweep": {"seed": N, "n": 40, "ok": 40, "failures": [],
               "total_sec": S, "times": {name: sec, ...}}, "ts": ...}
``--log`` appends the same tally for a full-catalog (or named-subset)
run — the round-5 standing close ritual is a full sweep WITH the
per-entry times so tail creep is caught the sitting it appears.

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
    args = list(sys.argv[1:])
    sample_n = seed = None
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i:i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
    log_tally = "--log" in args
    if log_tally:
        args.remove("--log")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

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

    names = sorted(only) if only else list(QUERIES)
    if sample_n is not None:
        # sample from the positional subset when one was given, so
        # explicitly-named queries are never silently dropped
        rng = np.random.default_rng(0 if seed is None else seed)
        names = sorted(
            rng.choice(names, size=min(sample_n, len(names)),
                       replace=False).tolist())
        only = set(names)

    failures = []
    times: dict = {}
    n_checked = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        n_checked += 1
        import time

        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} RAY-ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        wall = time.time() - t0
        times[name] = round(wall, 1)
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
    if sample_n is not None or log_tally:
        import json
        import os
        import time

        line = {"sweep": {"seed": seed, "n": n_checked,
                          "ok": n_checked - len(failures),
                          "failures": failures,
                          "total_sec": round(sum(times.values()), 1),
                          "times": times},
                "ts": time.time()}
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROGRESS.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(line) + "\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
