"""Driver-facing query catalog: one entry per operator family (SURVEY.md §2).

Every function takes ``sf_dir`` and returns a Dataset / DataFrame / Table.
``ORACLES`` holds the equivalent DuckDB SQL where the operator is
SQL-expressible; rows-only operators (hash-based dedup, fingerprints,
heuristic lang-id, full pipeline) have no oracle entry by design.

Convention for hash-comparability with the oracle (the driver sorts columns
by name and value-hashes): every computed column is explicitly named
identically on both sides, floats are rounded at the emit point (6dp for
ratios/averages, 2dp for money sums), and deterministic tie-breaks are
written into both orderings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from dedup_ray.ops.relational import (
    anti_join,
    distinct_rows,
    group_collect,
    grouped_mode,
    left_join,
    semi_join,
)
from dedup_ray.stages.textstats import idf_table, quality_stats, tokenize_explode
from dedup_ray.util.dsutil import as_arrow

EN_STOP_SQL = "('the','and','of','a','to','in','is','it','that','was')"


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --------------------------------------------------------------------------
# A-series: grouped aggregation (TPC-H Q1 shape; SURVEY.md A1-A10 family)
# --------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        )
        disc_price = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return t.append_column("disc_price", disc_price)

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Mean("l_quantity", alias_name="avg_qty"),
        Mean("l_extendedprice", alias_name="avg_price"),
        Count(alias_name="count_order"),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.round(t["sum_qty"], ndigits=2),
                "sum_base_price": pc.round(t["sum_base_price"], ndigits=2),
                "sum_disc_price": pc.round(t["sum_disc_price"], ndigits=2),
                "avg_qty": pc.round(t["avg_qty"], ndigits=6),
                "avg_price": pc.round(t["avg_price"], ndigits=6),
                "count_order": t["count_order"],
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def grouped_stats_events(sf_dir: str):
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pc.round(t["sum_value"], ndigits=2),
                "avg_value": pc.round(t["avg_value"], ndigits=6),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def pearson_qty_price(sf_dir: str):
    """A8: Pearson corr via distributed partial sums + driver combine."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
                "sxy": pa.array([(x * y).sum()]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, sx, sy = parts["n"].sum(), parts["sx"].sum(), parts["sy"].sum()
    sxx, syy, sxy = parts["sxx"].sum(), parts["syy"].sum(), parts["sxy"].sum()
    cov = sxy - sx * sy / n
    corr = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return pd.DataFrame({"corr_qty_price": [round(float(corr), 6)]})


def dup_user_events(sf_dir: str):
    """A5: keys with multiplicity > 1 (``dual_marry.py`` semantics)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", columns=["user_id"])
    out = ds.groupby("user_id").aggregate(Count(alias_name="n"))
    return out.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# M-series: per-record maps / normalizers / exploders
# --------------------------------------------------------------------------

def normalize_part_names(sf_dir: str):
    """M2: the exact reference regex chain on part names."""
    from dedup_ray.conformance.normalize import normalize_array

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "norm_name": normalize_array(t["p_name"], lowercase=True),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def last_token_part(sf_dir: str):
    """M7: last whitespace token (``family_name.R:6-8``)."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_partkey": batch["p_partkey"],
                "last_token": batch["p_name"].str.split(" ").str[-1],
            }
        )

    return as_arrow(ds.map_batches(f, batch_format="pandas"))


def tokenize_docs(sf_dir: str):
    """M4: token explode with empty-field sentinel."""
    return tokenize_explode(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def token_idf(sf_dir: str):
    """A1: global IDF = total token rows / token count."""
    return idf_table(tokenize_docs(sf_dir))


def doc_token_counts(sf_dir: str):
    from ray.data.aggregate import Count

    toks = tokenize_docs(sf_dir)
    out = toks.groupby("doc_id").aggregate(Count(alias_name="n_tokens"))
    return out


def text_quality(sf_dir: str):
    return quality_stats(_read(sf_dir, "documents", columns=["doc_id", "text"]))


PSI_LO, PSI_HI, PSI_BUCKETS = 0.0, 25.0, 10


def psi_drift_events(sf_dir: str):
    """PSI drift monitor (``ops/diff.py::psi_drift``): value
    distributions of the even- vs odd-id event snapshots compared over
    fixed buckets — one histogram pass per side, driver state
    2×n_buckets ints; smoothing, contribution and total replayed from
    the same constants in SQL."""
    from dedup_ray.ops.diff import psi_drift

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == parity))
        return f

    a = ds.map_batches(half(0), batch_format="pyarrow")
    b = ds.map_batches(half(1), batch_format="pyarrow")
    return psi_drift(a, b, "value", lo=PSI_LO, hi=PSI_HI,
                     n_buckets=PSI_BUCKETS)


def json_extract_events(sf_dir: str):
    """Schema-on-read JSON extraction (``stages/textstats.py::
    json_extract_cols``): typed ``k`` pulled from the ``props`` JSON
    column, then summed per user — the ingest-normalization hop between
    raw logs and relational operators."""
    from dedup_ray.stages.textstats import json_extract_cols

    ds = _read(sf_dir, "events", columns=["user_id", "props"])
    flat = json_extract_cols(ds, "props", {"k": ("k", pa.int64())},
                             keep_cols=["user_id"])

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([("k", "sum"),
                                             ("k", "count")])
        return g.rename_columns(["user_id", "k_sum", "n"])

    from dedup_ray.util.exchange import exchange_group_apply

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "user_id" not in part.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "k_sum": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = part.group_by("user_id").aggregate([("k_sum", "sum"),
                                                ("n", "sum")])
        return pa.table({
            "user_id": g["user_id"],
            "k_sum": pc.cast(g["k_sum_sum"], pa.int64()),
            "n": pc.cast(g["n_sum"], pa.int64()),
        })

    partials = flat.map_batches(agg, batch_format="pyarrow")
    return exchange_group_apply(partials, "user_id", final, 4)


ROLL_WINDOW = 4


def rolling_events(sf_dir: str):
    """Per-user sliding-window aggregates (``ops/relational.py::
    grouped_rolling``): ROWS-frame moving mean/sum over the last 4
    events plus the lag delta — one hash exchange, vectorized
    pandas rolling over all users per partition."""
    from dedup_ray.ops.relational import grouped_rolling

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    out = grouped_rolling(ds, "user_id", ["ts", "event_id"], "value",
                          window=ROLL_WINDOW)

    def slim(t: pa.Table) -> pa.Table:
        return t.drop_columns(["ts"])

    return out.map_batches(slim, batch_format="pyarrow")


BADWORDS = ("slow", "merge", "spark", "batch")
BADWORD_THRESHOLD = 0.05


def badword_docs(sf_dir: str):
    """C4-style blocklist screen (``stages/webclean.py::
    badword_fraction``): fraction of lowercased whitespace tokens on a
    broadcast word list, ``blocked`` above the threshold.  Shuffle-free
    vectorized map; the list and threshold are shared constants with
    the oracle."""
    from dedup_ray.stages.webclean import badword_fraction

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return badword_fraction(ds, BADWORDS, threshold=BADWORD_THRESHOLD)


ZORDER_BITS = 12  # user_id reaches 1,500 at sf0.1; 4,096 headroom


def zorder_events(sf_dir: str):
    """Z-order clustering keys (``stages/ordering.py::zorder_key``):
    interleave (user_id, hour-of-day) bits so both dimensions prune at
    read time when output files sort by the key; shuffle-free, unrolled
    SQL bit-expression oracle generated from the same constants."""
    from dedup_ray.stages.ordering import zorder_key

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "u": pc.cast(t["user_id"], pa.int64()),
            "h": pc.cast(pc.hour(t["ts"]), pa.int64()),
        })

    return zorder_key(ds.map_batches(prep, batch_format="pyarrow"),
                      ["u", "h"], bits=ZORDER_BITS)


def auc_embeddings(sf_dir: str):
    """Exact ROC AUC (``ops/evaluate.py::auc_score``, Mann–Whitney with
    midranks): score = first embedding coordinate, label = even class id
    — no global sort; one histogram exchange, driver state bounded by
    distinct scores.  The window-rank SQL replay is digit-identical."""
    from dedup_ray.ops.evaluate import auc_score

    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def prep(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        first = pc.list_element(emb, 0)
        lab = pc.equal(pc.bit_wise_and(pc.cast(t["label"], pa.int64()),
                                       pa.scalar(1)), pa.scalar(0))
        return pa.table({"score": pc.cast(first, pa.float64()),
                         "lab": pc.cast(lab, pa.int64())})

    return auc_score(ds.map_batches(prep, batch_format="pyarrow"),
                     "score", "lab", num_partitions=4)


HITS_ITERS = 2


def hits_docs(sf_dir: str):
    """HITS hubs & authorities (``ops/pagerank.py::hits``, Kleinberg
    1999): two exchange joins + two tree-reduced norms per iteration,
    score vector never on the driver.  Link graph synthesized from
    doc_id arithmetic (multi-edges count per occurrence, matching the
    SQL's UNION ALL); the oracle unrolls both iterations as CTEs."""
    from dedup_ray.ops.pagerank import hits

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = ids[ids >= 1]
        return pa.table({
            "src": pa.array(np.r_[src, src], pa.int64()),
            "dst": pa.array(np.r_[src // 2, src // 3], pa.int64()),
        })

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return hits(edges, iters=HITS_ITERS, num_partitions=8)


def _hits_oracle_sql() -> str:
    base = """
    WITH e AS (
        SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
        WHERE doc_id >= 1
        UNION ALL
        SELECT doc_id, doc_id // 3 FROM documents WHERE doc_id >= 1),
    nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    s0 AS (SELECT node, 1.0 AS hub, 1.0 AS auth FROM nodes)"""
    parts = [base]
    for k in range(1, HITS_ITERS + 1):
        p = k - 1
        parts.append(f""",
    a{k}raw AS MATERIALIZED (
        SELECT e.dst AS node, sum(s.hub) AS v
        FROM e JOIN s{p} s ON e.src = s.node GROUP BY e.dst),
    a{k}n AS (SELECT sqrt(sum(v * v)) AS nrm FROM a{k}raw),
    sa{k} AS MATERIALIZED (
        SELECT n.node, n.hub,
               coalesce(r.v / (SELECT nrm FROM a{k}n), 0) AS auth
        FROM s{p} n LEFT JOIN a{k}raw r USING (node)),
    h{k}raw AS MATERIALIZED (
        SELECT e.src AS node, sum(s.auth) AS v
        FROM e JOIN sa{k} s ON e.dst = s.node GROUP BY e.src),
    h{k}n AS (SELECT sqrt(sum(v * v)) AS nrm FROM h{k}raw),
    s{k} AS MATERIALIZED (
        SELECT n.node,
               coalesce(r.v / (SELECT nrm FROM h{k}n), 0) AS hub,
               n.auth
        FROM sa{k} n LEFT JOIN h{k}raw r USING (node))""")
    parts.append(f"""
    SELECT node, round(hub, 9) AS hub, round(auth, 9) AS authority
    FROM s{HITS_ITERS}""")
    return "".join(parts)


def cocitation_docs(sf_dir: str):
    """Bipartite projection (``ops/graph.py::bipartite_project``): doc→host
    links become a weighted host–host co-citation graph — two exchanges
    (neighbor sets on src, pair counts on (dst1, dst2)), C(deg,2)
    bounded by the max_degree skew cap.  Links synthesized from doc_id
    arithmetic; self-join oracle."""
    from dedup_ray.ops.graph import bipartite_project

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.r_[ids, ids, ids], pa.int64()),
            "dst": pa.array(np.r_[ids % 11, ids % 7 + 20, ids % 5 + 40],
                            pa.int64()),
        })

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return bipartite_project(edges, num_partitions=8)


LPA_ROUNDS = 4


def lpa_communities_docs(sf_dir: str):
    """Deterministic label propagation (``ops/graph.py::
    label_propagation``): communities over a synthesized block-star
    graph with sparse bridges — dense blocks converge to one label
    while single bridge edges do NOT force a merge (the behavior CC
    cannot express).  Fixed synchronous rounds, min-label tie-break;
    the oracle unrolls every round as a CTE."""
    from dedup_ray.ops.graph import label_propagation

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ctr = (ids // 10) * 10
        bridge = ids[(ids % 10 == 0) & ((ids // 10) % 2 == 0)]
        return pa.table({
            "a": pa.array(np.r_[ids, bridge], pa.int64()),
            "b": pa.array(np.r_[ctr, bridge + 10], pa.int64()),
        })

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return label_propagation(edges, rounds=LPA_ROUNDS, num_partitions=8)


SNM_WINDOW = 4


def snm_pairs_orders(sf_dir: str):
    """Sorted-neighborhood blocking (``stages/ordering.py::snm_pairs``):
    candidate pairs within a 4-position window of the global
    (o_totalprice, o_orderkey) order — the classic record-linkage
    blocker, distributed via range-rank + overlapping rank buckets so
    each pair materializes exactly once."""
    from dedup_ray.stages.ordering import snm_pairs

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return snm_pairs(ds, key_col="o_totalprice", id_col="o_orderkey",
                     window=SNM_WINDOW, num_partitions=8)


def zscore_docs(sf_dir: str):
    """Per-language z-score of doc length (``ops/relational.py::
    group_zscore``): two shuffle-free passes — K-group sufficient stats
    to the driver, broadcast back.  The distance-preserving counterpart
    of ``lang_percentile_docs``."""
    from dedup_ray.ops.relational import group_zscore

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return group_zscore(ds, "lang", "n_chars", "doc_id")


def interleave_docs(sf_dir: str):
    """Anti-clustering interleave (``stages/ordering.py::
    interleave_by_key``): round-robin positions across languages so no
    two same-language docs sit adjacent until a language exhausts — the
    training-batch de-clumping order.  One exchange; position is a pure
    function of (within-key rank, key index)."""
    from dedup_ray.stages.ordering import interleave_by_key

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return interleave_by_key(ds, "lang", "doc_id", num_partitions=4)


BBIT_PERMS = 16
BBIT_B = 2


def bbit_minhash_docs(sf_dir: str):
    """b-bit MinHash Jaccard estimation (Li & König 2010;
    ``stages/minhash.py::bbit_minhash_md5``): 2-bit registers over 16
    md5 permutations, collision-corrected estimates for adjacent-id doc
    pairs.  The md5 spec twin makes EVERY step SQL-replayable — min-hash,
    bit truncation and estimator are all checked, no pinned constants."""
    from dedup_ray.stages.minhash import bbit_estimate_pairs, bbit_minhash_md5

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    regs = bbit_minhash_md5(ds, n_perms=BBIT_PERMS, b=BBIT_B)
    return bbit_estimate_pairs(regs, b=BBIT_B, n_perms=BBIT_PERMS)


def containment_join_docs(sf_dir: str):
    """Asymmetric containment join (``ops/simjoin.py::containment_join``):
    15-token excerpts of every 4th document joined against the full
    corpus on shingle containment |L∩R|/|L| ≥ 0.8 — the quote/excerpt/
    syndication detector Jaccard misses (a short excerpt of a long page
    has tiny Jaccard but containment ≈ 1).  The oracle replays blocking
    AND verification."""
    from dedup_ray.ops.simjoin import containment_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def long_docs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.coalesce(pc.cast(t["text"], pa.string()), ""), " ")
        return t.filter(pc.greater_equal(pc.list_value_length(toks), 30))

    def excerpt(t: pa.Table) -> pa.Table:
        keep, out = [], []
        for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (txt or "").split(" ")
            if i % 4 == 0 and len(toks) >= 30:
                keep.append(i)
                out.append(" ".join(toks[:15]))
        return pa.table({"doc_id": pa.array(keep, pa.int64()),
                         "text": pa.array(out, pa.string())})

    left = docs.map_batches(excerpt, batch_format="pyarrow")
    right = docs.map_batches(long_docs, batch_format="pyarrow")
    return containment_join(left, right, "doc_id", "doc_id",
                            tau=0.8, num_partitions=8)


ROBOTS_SPECS: dict[str, list[tuple[bool, str]]] = {
    # literal-prefix rules only: the SQL-expressible subset (wildcard/$
    # semantics are pytest-covered against RFC 9309 examples)
    "h0.com": [(False, "/p/1")],
    "h1.com": [(False, "/"), (True, "/p/2")],
    "h3.com": [(False, "/p")],
    "h5.com": [(True, "/p/5"), (False, "/p/5")],  # tie → Allow wins
}
ROBOTS_NHOSTS = 7


def robots_filter_docs(sf_dir: str):
    """RFC 9309 robots evaluation (``stages/robots.py``): one cogroup of
    the URL stream against per-host robots payloads, longest-match-wins
    rules compiled once per host.  URLs + robots synthesized from shared
    constants; the oracle replays prefix matching with a window rank."""
    from dedup_ray.stages.robots import robots_filter

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"url": pa.array(
            [f"http://h{i % ROBOTS_NHOSTS}.com/p/{i}" for i in ids],
            pa.string())})

    robots_rows = {
        h: "User-agent: *\n" + "\n".join(
            ("Allow: " if a else "Disallow: ") + p for a, p in rules)
        for h, rules in ROBOTS_SPECS.items()
    }
    robots = ray.data.from_arrow(pa.table({
        "host": pa.array(list(robots_rows), pa.string()),
        "robots_txt": pa.array(list(robots_rows.values()), pa.string()),
    }))
    urls = ds.map_batches(mk_urls, batch_format="pyarrow")
    return robots_filter(urls, robots, num_partitions=4)


def _robots_oracle_sql() -> str:
    vals = ", ".join(
        f"('{h}', {str(a).upper()}, '{p}')"
        for h, rules in ROBOTS_SPECS.items() for a, p in rules
    )
    return f"""
    WITH urls AS (
        SELECT 'http://h' || (doc_id % {ROBOTS_NHOSTS}) || '.com/p/'
                   || doc_id AS url,
               'h' || (doc_id % {ROBOTS_NHOSTS}) || '.com' AS host,
               '/p/' || doc_id AS path
        FROM documents),
    rules AS (SELECT * FROM (VALUES {vals}) t(host, is_allow, prefix)),
    m AS (
        SELECT u.url, r.is_allow,
               row_number() OVER (
                   PARTITION BY u.url
                   ORDER BY length(r.prefix) DESC,
                            CAST(r.is_allow AS INT) DESC) AS rn
        FROM urls u JOIN rules r
          ON u.host = r.host AND starts_with(u.path, r.prefix))
    SELECT u.url, coalesce(m.is_allow, TRUE) AS allowed
    FROM urls u LEFT JOIN m ON u.url = m.url AND m.rn = 1
"""


VALIDATE_RULES = [
    {"name": "doc_id_unique", "kind": "unique", "column": "doc_id"},
    {"name": "text_not_null", "kind": "not_null", "column": "text"},
    {"name": "nchars_range", "kind": "range", "column": "n_chars",
     "lo": 1, "hi": 2000},
    {"name": "lang_regex", "kind": "regex", "column": "lang",
     "pattern": "[a-z]{2}"},
    {"name": "source_isin", "kind": "isin", "column": "source",
     "values": ["web", "wiki", "news", "forum"]},
]


def validate_docs(sf_dir: str):
    """Declarative data-quality gate (``ops/profile.py::validate_rules``):
    the rules are data, the oracle is generated from the same list —
    not-null / range / regex / membership ride one vectorized pass,
    uniqueness one shared distinct exchange."""
    from dedup_ray.ops.profile import validate_rules

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source", "n_chars"])
    return validate_rules(ds, VALIDATE_RULES)


def decode_entities_docs(sf_dir: str):
    """HTML entity decode (``stages/normtext.py::decode_entities``):
    kernel and oracle share the ``ENTITY_RULES`` literal list.  An
    entity-rich prefix (including a double-encoded ``&amp;lt;``) is
    prepended to every doc so the chain and its ordering are actually
    exercised on corpus data."""
    from dedup_ray.stages.normtext import decode_entities

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        pref = pa.scalar("A &amp; B &lt;tag&gt; &quot;q&quot; "
                         "&amp;lt;once&amp;gt; &nbsp;&hellip; ")
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.binary_join_element_wise(
                pc.cast(pref, pa.string()),
                pc.coalesce(t["text"], pa.scalar("")), ""),
        })

    return decode_entities(ds.map_batches(synth, batch_format="pyarrow"))


def grouped_median_events(sf_dir: str):
    """Exact per-group median from value-count histograms
    (``ops/relational.py::grouped_median``): one exchange, state bounded
    by distinct (group, value) pairs — no sort of the data."""
    from dedup_ray.ops.relational import grouped_median

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_median(ds, "event_type", "value", num_partitions=4)


def bfs_dist_docs(sf_dir: str):
    """Multi-source BFS hop distance (``ops/graph.py::multi_source_bfs``):
    TrustRank-style link distance from a seed set — one frontier⋈edges
    exchange per hop, every node settled at first discovery.  Link graph
    synthesized from doc_id arithmetic (each doc links to id//2 and
    id//3), seeds = ids divisible by 97; the oracle walks the same graph
    with a recursive CTE and takes min(dist)."""
    from dedup_ray.ops.graph import multi_source_bfs

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = ids[ids >= 1]
        return pa.table({
            "src": pa.array(np.r_[src, src], pa.int64()),
            "dst": pa.array(np.r_[src // 2, src // 3], pa.int64()),
        })

    def mk_seeds(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(ids[ids % 97 == 0], pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    seeds = ds.map_batches(mk_seeds, batch_format="pyarrow")
    return multi_source_bfs(edges, seeds, max_hops=3, num_partitions=8)


def linreg_events(sf_dir: str):
    """Grouped OLS trend screen (``ops/relational.py::grouped_linreg``):
    value-vs-hour-of-day slope/intercept/R² per event type from
    distributed sufficient statistics — six floats per (group, batch)
    move, nothing per-group materializes.  Hour-of-day is the regressor
    so the closed form stays well-conditioned (a raw epoch x would
    cancel catastrophically in nΣxx − Σx²)."""
    from dedup_ray.ops.relational import grouped_linreg

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def add_hour(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "x": pc.cast(pc.hour(t["ts"]), pa.float64()),
            "value": t["value"],
        })

    return grouped_linreg(
        ds.map_batches(add_hour, batch_format="pyarrow"),
        "event_type", "x", "value", num_partitions=4)


PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def pmi_bigrams_docs(sf_dir: str):
    """Top-k adjacent-token collocations by PMI
    (``stages/textstats.py::pmi_bigrams``): per-batch unigram/bigram
    partials, one grouped-sum exchange each, min-count prune BEFORE the
    two count joins, bounded sort/limit."""
    from dedup_ray.stages.textstats import pmi_bigrams

    return pmi_bigrams(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        min_count=PMI_MIN_COUNT, top_k=PMI_TOP_K,
    )


KMEANS_K = 4
KMEANS_ROUNDS = 2
KMEANS_DIM = 64


def kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means (``stages/kmeans.py``): full-corpus
    centroid updates via per-batch partial sums (≤k rows/batch move) —
    unlike SemDeDup/IVF's bounded-sample training, every vector
    contributes every round; driver state is the k×d centroid matrix.
    Deterministic smallest-id init; the oracle unrolls all rounds as
    CTEs from the same constants."""
    from dedup_ray.stages.kmeans import kmeans_lloyd

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assignments, _ = kmeans_lloyd(ds, k=KMEANS_K, rounds=KMEANS_ROUNDS)
    return assignments


def warc_roundtrip_docs(sf_dir: str):
    """WARC container round trip (``sources/warc.py``, ISO 28500): each
    batch of documents is framed as a record-per-gzip-member ``.warc.gz``
    blob (the Common Crawl layout), then parsed back through the reader
    stage — HTTP unwrap, member split and header fields all exercised.
    The oracle reconstructs the (url, text) pairs arithmetically."""
    from dedup_ray.sources.warc import build_warc, parse_warc_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_blob(t: pa.Table) -> pa.Table:
        recs = [
            {"type": "response", "uri": f"http://example.com/doc/{i}",
             "payload": (s or "").encode()}
            for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ]
        return pa.table({"bytes": pa.array(
            [build_warc(recs, gzip_members=True)], pa.binary())})

    def parse(b: pa.Table) -> pa.Table:
        t = parse_warc_batch(b)
        return pa.table({
            "url": t["url"],
            "text": pc.cast(t["payload"], pa.string()),
            "http_status": t["http_status"],
        })

    return ds.map_batches(to_blob, batch_format="pyarrow").map_batches(
        parse, batch_format="pyarrow")


def redirect_resolve_docs(sf_dir: str):
    """Redirect-chain resolution by pointer doubling
    (``ops/graph.py::resolve_pointers``): follow a functional src→dst
    mapping to its terminal in log-rounds exchange hops — the URL-alias
    collapse a crawler runs before dedup.  Chains synthesized from
    doc_id arithmetic (``id → id−1`` while ``id % 8 ≠ 0``, length ≤ 7,
    covered by 2^4 with rounds=4); the oracle follows the same chains
    with a recursive CTE."""
    from dedup_ray.ops.graph import resolve_pointers

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = ids[ids % 8 != 0]
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(src - 1, pa.int64())})

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return resolve_pointers(edges, rounds=4, num_partitions=8)


def rollup_events(sf_dir: str):
    """Multi-level ROLLUP(event_type, user_id) totals in ONE exchange
    (``ops/relational.py::rollup_aggregate``): every batch emits partial
    (sum, count) rows for all grouping-set levels at once, so the
    all-to-all is one shuffle instead of one per level."""
    from dedup_ray.ops.relational import rollup_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])
    return rollup_aggregate(ds, ["event_type", "user_id"], "value")


def token_entropy_docs(sf_dir: str):
    """Per-doc Shannon entropy of the token distribution
    (``stages/textstats.py::token_entropy``) — the repetition/diversity
    screen; shuffle-free, one vectorized pass."""
    from dedup_ray.stages.textstats import token_entropy

    return token_entropy(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


def compression_ratio_docs(sf_dir: str):
    """zlib compression-ratio gibberish/template screen
    (``stages/webclean.py::compression_ratio``).  Rows-only: the oracle
    engine has no zlib; the screen's behavior (noise fails low, templates
    fail high, prose passes) is property-tested instead."""
    from dedup_ray.stages.webclean import compression_ratio

    return compression_ratio(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


NOVELTY_BUCKET = 100


def novelty_curve_docs(sf_dir: str):
    """Crawl-saturation curve: duplicate rate per arrival bucket (doc_id
    stands in for crawl order).  A doc is a duplicate iff an earlier doc
    (smaller id) has the same text digest — the running-dedup-rate metric
    a crawl operator watches to decide when a frontier is exhausted.

    Two-phase: each batch emits one (digest, bucket, n, min_id) partial
    per (digest, bucket) it sees — a hot digest (a page mirrored 10⁶×)
    ships one partial per batch, never every copy into one reducer — then
    a digest exchange finds the global min id per digest and charges each
    bucket ``n − 1{holds the global min}`` duplicates.  The per-bucket
    rollup is a tiny grouped sum.
    """
    from dedup_ray.stages.exact import add_digest
    from dedup_ray.util.dsutil import partitioned_group_apply

    ds = add_digest(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        text_col="text",
        id_col="doc_id",
    ).select_columns(["doc_id", "digest"])

    def partial(part: pd.DataFrame) -> pd.DataFrame:
        part = part.assign(bucket=part["doc_id"] // NOVELTY_BUCKET)
        return (
            part.groupby(["digest", "bucket"])["doc_id"]
            .agg(n="size", min_id="min")
            .reset_index()
        )

    def per_digest(part: pd.DataFrame) -> pd.DataFrame:
        g = (
            part.groupby(["digest", "bucket"])
            .agg(n=("n", "sum"), min_id=("min_id", "min"))
            .reset_index()
        )
        gm = g.groupby("digest")["min_id"].transform("min")
        return pd.DataFrame(
            {
                "bucket": g["bucket"],
                "n": g["n"].astype("int64"),
                "n_dup": (
                    g["n"] - (g["min_id"] == gm).astype("int64")
                ).astype("int64"),
            }
        )

    marked = partitioned_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["digest"],
        per_digest,
        num_partitions=8,
    )

    def fin(t: pa.Table) -> pa.Table:
        n = pc.cast(t["sum(n)"], pa.int64())
        nd = pc.cast(t["sum(n_dup)"], pa.int64())
        rate = pc.round(
            pc.divide(pc.cast(nd, pa.float64()), pc.cast(n, pa.float64())),
            ndigits=6,
        )
        return pa.table(
            {"bucket": t["bucket"], "n": n, "n_dup": nd, "dup_rate": rate}
        )

    return (
        marked.groupby("bucket")
        .sum(["n", "n_dup"])
        .map_batches(fin, batch_format="pyarrow")
    )


CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


def chunk_tokens_docs(sf_dir: str):
    """Context-window chunking (``stages/packing.py::chunk_tokens``):
    overlapping fixed-token chunks, shuffle-free, every token covered.
    Oracle replays the slicing with list_slice + range from the same
    window/stride constants."""
    from dedup_ray.stages.packing import chunk_tokens

    return chunk_tokens(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        window=CHUNK_WINDOW,
        stride=CHUNK_STRIDE,
    )


def token_logfreq_score_docs(sf_dir: str):
    """CCNet-style pseudo-perplexity quality score: mean ln(corpus unigram
    count) over each doc's tokens (``stages/textstats.py``).  Lookup is a
    co-partitioned join — no broadcast vocabulary."""
    from dedup_ray.stages.textstats import token_logfreq_score

    return token_logfreq_score(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        num_partitions=8,
    )


# --------------------------------------------------------------------------
# J-series: joins
# --------------------------------------------------------------------------

def left_join_orders(sf_dir: str):
    """J1: big ⟕ small — broadcast while the right side is small, size-gated
    fallback to the partitioned hash join (``combine-at.R`` shape)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name"]), batch_format="pyarrow"
    )
    return left_join(
        orders, cust, "o_custkey",
        big_cols=["o_orderkey", "o_custkey"], small_cols=["o_custkey", "c_name"],
    )


def semi_join_customers(sf_dir: str):
    """J3: customers having at least one order."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    keys = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"
    )
    return semi_join(cust, keys, "c_custkey", cols=["c_custkey", "c_name"])


def anti_join_customers(sf_dir: str):
    """J4: customers with no large (> 350k) order — broadcast
    anti-membership (``valid_index.py:12-13`` pattern).  The price filter
    keeps the result non-empty at every scale factor (a fully-empty result
    would carry no schema to compare)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    keys = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 350000.0)).select(
            ["o_custkey"]
        ).rename_columns(["c_custkey"]),
        batch_format="pyarrow",
    )
    return anti_join(cust, keys, "c_custkey", cols=["c_custkey", "c_name"])


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-06-01"


def q3_shipping_priority(sf_dir: str):
    """J6+A-series composition (TPC-H Q3 shape): customer ⋈ orders ⋈
    lineitem, grouped revenue, top-10.  The scale plan keeps every wide
    step narrow: lineitem revenue is pre-aggregated per orderkey BEFORE
    any join (combiner ahead of the shuffle — the fact table never moves
    with payload), the customer side degrades to a semi-join key set
    (size-gated broadcast, ``ops/relational.py``), and only the
    date-filtered orders rows carry (date, priority) into the final
    co-partitioned ``hash_join``.  Top-10 is a bounded global sort on the
    already-aggregated result."""
    from ray.data.aggregate import Sum

    from dedup_ray.util.dsutil import hash_join

    cutoff = pa.scalar(pd.Timestamp(Q3_DATE))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda t: pa.table({
            "o_custkey":
                t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT))["c_custkey"]
        }),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cutoff)),
        batch_format="pyarrow",
    )
    orders = semi_join(
        orders, keys, "o_custkey",
        cols=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"],
        }),
        batch_format="pyarrow",
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        r = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": r})

    li_agg = li.map_batches(rev, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("rev", alias_name="revenue"))

    j = hash_join(
        li_agg, orders, "l_orderkey",
        ["l_orderkey", "revenue"],
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        num_partitions=8,
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue": pc.round(t["revenue"], ndigits=2),
            # date as ISO string: timestamps change resolution through the
            # pandas merge and hash differently across engines
            "o_orderdate": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
            "o_orderpriority": t["o_orderpriority"],
        }),
        batch_format="pyarrow",
    )
    return j.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(10)


# --------------------------------------------------------------------------
# D/O-series: distinct / mode / top-k
# --------------------------------------------------------------------------

def distinct_lang_source(sf_dir: str):
    return distinct_rows(
        _read(sf_dir, "documents", columns=["lang", "source"]), ["lang", "source"]
    )


def mode_event_type(sf_dir: str):
    return grouped_mode(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        "user_id",
        "event_type",
    )


def top_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


# --------------------------------------------------------------------------
# P/A2-series: within-block pairs + multiset overlap
# --------------------------------------------------------------------------

def block_pairs_docs(sf_dir: str):
    """P1: canonical pairs within source blocks."""
    from dedup_ray.ops.relational import block_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return block_pairs(ds, "source", "doc_id")


def pair_token_overlap(sf_dir: str):
    """A2: multiset token overlap (Counter & Counter) for within-source
    pairs with positive overlap (``c_org.py:19-21`` semantics)."""
    from collections import Counter

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        ids = g["doc_id"].tolist()
        counters = [
            Counter([w for w in (t or "").split(" ") if w != ""])
            for t in g["text"]
        ]
        i1, i2, ov = [], [], []
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                o = sum((counters[a] & counters[b]).values())
                if o > 0:
                    i1.append(ids[a])
                    i2.append(ids[b])
                    ov.append(o)
        return pd.DataFrame(
            {"id1": i1, "id2": i2, "overlap": pd.Series(ov, dtype="int64")}
        )

    return as_arrow(ds.groupby("source").map_groups(gen, batch_format="pandas"))


def diff_nchars_pairs(sf_dir: str):
    """diff_year analog: |Δn_chars| / block span, within source blocks."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        span = int(g["n_chars"].max() - g["n_chars"].min())
        ids = g["doc_id"].tolist()
        nc = g["n_chars"].tolist()
        src = group["source"].iloc[0]
        s, i1, i2, dv = [], [], [], []
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                s.append(src)
                i1.append(ids[a])
                i2.append(ids[b])
                dv.append(
                    round(abs(nc[a] - nc[b]) / span, 6) if span else 0.0
                )
        return pd.DataFrame({"source": s, "id1": i1, "id2": i2, "diff_nchars": dv})

    return as_arrow(ds.groupby("source").map_groups(gen, batch_format="pandas"))


def ap_cluster_docs(sf_dir: str):
    """G9: affinity propagation per source block (``ap_cluster.R:16-34``).

    Pair similarity = −|Δn_chars| (negative distance, the canonical AP
    input); exemplars/assignments from the Frey–Dueck iteration in
    :func:`dedup_ray.conformance.cluster.affinity_propagation_block`.
    Rows-only: the fixed-point of a damped message-passing iteration is not
    SQL-expressible (same class as simhash_docs/fingerprint_docs); the
    algorithm itself is pytest-verified on planted-blob fixtures.
    """
    from dedup_ray.conformance.cluster import affinity_propagation_block

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        if len(ids) < 2:  # singleton block: its own exemplar (no pairs)
            out = pd.DataFrame({"id": ids, "cluster_rep": ids})
        else:
            nc = g["n_chars"].to_numpy(dtype=np.float64)
            a, b = np.triu_indices(len(ids), k=1)
            pairs = pd.DataFrame(
                {"id1": ids[a], "id2": ids[b], "sim": -np.abs(nc[a] - nc[b])}
            )
            out = affinity_propagation_block(pairs)
        out.insert(0, "source", group["source"].iloc[0])
        return out.rename(columns={"id": "doc_id"})

    return as_arrow(
        ds.groupby("source").map_groups(per_block, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# G-series: graph / clustering / evaluation
# --------------------------------------------------------------------------

def cc_chain_docs(sf_dir: str):
    """G6: connected components over a deterministic sparse doc graph
    (edges doc u → u+1 where u % 10 < 3; chains of ≤ 4 nodes).

    The "u+1 exists" membership is a semi-join of candidate edges against
    the doc table on id2 — size-gated broadcast/partitioned, never a
    driver-side id set over the whole corpus."""
    from dedup_ray.stages.cc import assign_clusters

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def cand_edges(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False)
        uu = u[u % 10 < 3]
        return pa.table(
            {"id1": pa.array(uu, pa.int64()), "id2": pa.array(uu + 1, pa.int64())}
        )

    cand = docs.map_batches(cand_edges, batch_format="pyarrow")
    id2_side = docs.map_batches(
        lambda t: t.rename_columns(["id2"]), batch_format="pyarrow"
    )
    edges = semi_join(cand, id2_side, "id2", cols=["id1", "id2"])
    return assign_clusters(docs, edges, id_col="doc_id")



# Cache convention (applies to _CHAIN_CC_CACHE / _EVAL_SUMS_CACHE /
# _CANOPY_CACHE / _SIMJOIN_TRUTH_CACHE): process-lifetime memos keyed by
# sf_dir, which ASSUMES the corpus at that path is immutable for the
# process lifetime — regenerating the parquet under a live process would
# return stale results, and the materialized datasets stay pinned in the
# object store.  Fine for the one-shot bench/correctness drivers that own
# these entry points; long-lived services should key on file mtime/size.
_CHAIN_CC_CACHE: dict = {}


def _chain_cc(sf_dir: str):
    """Per-process memo of the chain-CC clustering (NB-model
    convention): seven catalog entries consume the same deterministic
    cluster table; one materialized CC run per corpus replaces seven
    identical edge-build + CC executions.  Pure function of the doc
    table, so caching cannot change any result."""
    if sf_dir not in _CHAIN_CC_CACHE:
        _CHAIN_CC_CACHE[sf_dir] = cc_chain_docs(sf_dir).materialize()
    return _CHAIN_CC_CACHE[sf_dir]

def cluster_stats_docs(sf_dir: str):
    """Cluster analytics rollup: per CC cluster (the deterministic
    ``cc_chain_docs`` graph), member count and min/max/total document
    length — the post-dedup audit a curation run reports.  One
    co-partitioning join + one narrow grouped aggregate."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from dedup_ray.util.dsutil import hash_join

    clusters = _chain_cc(sf_dir)
    lens = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    joined = hash_join(clusters, lens, on="doc_id",
                       left_cols=["doc_id", "cluster_id"],
                       right_cols=["doc_id", "n_chars"], how="inner")
    agg = joined.groupby("cluster_id").aggregate(
        Count(alias_name="n_docs"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
        Sum("n_chars", alias_name="total_chars"),
    )

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_id": t["cluster_id"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "min_chars": pc.cast(t["min_chars"], pa.int64()),
            "max_chars": pc.cast(t["max_chars"], pa.int64()),
            "total_chars": pc.cast(t["total_chars"], pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow")


_EVAL_SUMS_CACHE: dict = {}


def _eval_sums(sf_dir: str) -> dict:
    """Per-process memo of the chain-CC vs block-of-4-truth contingency
    scalars (``ops/evaluate.py::contingency_sums``): the B³/ARI/NMI
    trio shares ONE three-exchange pass instead of ~6 plan launches
    each.  Pure function of the doc table."""
    from dedup_ray.ops.evaluate import contingency_sums

    if sf_dir not in _EVAL_SUMS_CACHE:
        pred = _chain_cc(sf_dir)
        docs = _read(sf_dir, "documents", columns=["doc_id"])

        def truth_of(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({"doc_id": t["doc_id"],
                             "truth_id": pa.array(ids // 4)})

        truth = docs.map_batches(truth_of, batch_format="pyarrow")
        _EVAL_SUMS_CACHE[sf_dir] = contingency_sums(
            pred, truth, num_partitions=4)
    return _EVAL_SUMS_CACHE[sf_dir]


def bcubed_eval_docs(sf_dir: str):
    """B-cubed precision/recall/F1 of the chain-CC clustering against a
    block-of-4 truth partition — the entity-resolution metric family next
    to the reference's pairwise F1, in closed form over overlap cells
    (``ops/evaluate.py::bcubed_scores``)."""
    from dedup_ray.ops.evaluate import bcubed_scores

    return bcubed_scores(None, None, num_partitions=4,
                      sums=_eval_sums(sf_dir))


def ari_eval_docs(sf_dir: str):
    """Adjusted Rand Index of the chain-CC clustering vs the block-of-4
    truth — the chance-corrected pairwise agreement, closed form over
    contingency cells (``ops/evaluate.py::ari_score``)."""
    from dedup_ray.ops.evaluate import ari_score

    return ari_score(None, None, num_partitions=4,
                  sums=_eval_sums(sf_dir))


def triangle_count_docs(sf_dir: str):
    """Distributed triangle counting (wedge join, one grouped pass + one
    packed-key semi-join) over a deterministic doc graph: edges u→u+1
    where u %% 10 < 3 and u→u+2 where u %% 10 < 2, endpoints validated
    against the doc table (``ops/graph.py::triangle_count``).  Oracle: a
    three-way self-join."""
    from dedup_ray.ops.graph import triangle_count
    from dedup_ray.util.exchange import exchange_join

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def cand(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False)
        a1, b1 = u[u % 10 < 3], u[u % 10 < 3] + 1
        a2, b2 = u[u % 10 < 2], u[u % 10 < 2] + 2
        return pa.table({"a": pa.array(np.r_[a1, a2]),
                         "b": pa.array(np.r_[b1, b2])})

    cands = docs.map_batches(cand, batch_format="pyarrow")
    ids = docs.map_batches(
        lambda t: pa.table({"b": t["doc_id"]}), batch_format="pyarrow")
    edges = exchange_join(
        cands, ids, on="b", how="semi", num_partitions=8,
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    return triangle_count(edges, num_partitions=8)


def cluster_rep_longest(sf_dir: str):
    """Post-dedup representative selection: keep the LONGEST member per
    cluster, ties broken by min doc_id.

    The pipeline's min-id keeper is an arbitrary member; training-data
    curation usually keeps the most complete copy (quality-keep).  Cluster
    structure: the deterministic ``cc_chain_docs`` graph.  Shape: one
    token-count map, one co-partitioning join, one partitioned per-cluster
    argmax — no driver state, no per-group dispatch.
    """
    import pyarrow.compute as pc

    from dedup_ray.util.dsutil import hash_join, partitioned_group_apply

    labels = _chain_cc(sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ntok(t: pa.Table) -> pa.Table:
        txt = pc.coalesce(pc.cast(t["text"], pa.string()), "")
        n = pc.list_value_length(pc.split_pattern(txt, " "))
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    j = hash_join(
        labels,
        docs.map_batches(ntok, batch_format="pyarrow"),
        on="doc_id",
        left_cols=["doc_id", "cluster_id"],
        right_cols=["doc_id", "n_tokens"],
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        out = df.groupby("cluster_id", as_index=False).agg(
            keep_id=("doc_id", "first"),
            best_len=("n_tokens", "first"),
            cluster_size=("doc_id", "size"),
        )
        out["cluster_size"] = out["cluster_size"].astype("int64")
        return out

    return partitioned_group_apply(j, ["cluster_id"], pick)


def soft_dedup_weights_docs(sf_dir: str):
    """Soft dedup: down-weight instead of drop — every member of a
    duplicate cluster gets training weight ``1 / cluster_size`` so the
    cluster contributes one document's worth of gradient in aggregate.
    Cluster structure: the deterministic ``cc_chain_docs`` graph.  One
    partitioned group pass (size + per-row weight) — no driver state.
    """
    from dedup_ray.util.dsutil import partitioned_group_apply

    labels = _chain_cc(sf_dir)

    def weight(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["weight"] = 1.0 / df.groupby("cluster_id")["doc_id"].transform(
            "size"
        )
        return df

    return partitioned_group_apply(labels, ["cluster_id"], weight)


def group_collect_lang(sf_dir: str):
    """A4: exact-key clustering of docs by language."""
    return group_collect(
        _read(sf_dir, "documents", columns=["doc_id", "lang"]), "lang", "doc_id"
    )


def eval_source_vs_lang(sf_dir: str):
    """Pairwise P/R/F1 (``evaluate.py:125-128``) of source-clustering
    against lang-clustering over documents."""
    from dedup_ray.ops.evaluate import pairwise_prf_ds

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def pred(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "cluster_id": t["source"]})

    def truth(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "cluster_id": t["lang"]})

    m = pairwise_prf_ds(
        docs.map_batches(pred, batch_format="pyarrow"),
        docs.map_batches(truth, batch_format="pyarrow"),
        id_col="doc_id",
        num_partitions=4,
    )
    return pd.DataFrame(
        {
            "precision": [round(m["precision"], 6)],
            "recall": [round(m["recall"], 6)],
            "f1": [round(m["f1"], 6)],
        }
    )


# --------------------------------------------------------------------------
# Streaming-shaped: windows / sessions over the events log
# --------------------------------------------------------------------------

def window_tumbling_events(sf_dir: str):
    """Tumbling 1h window per event_type: count + sum(value)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        window_id = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_id": window_id,
                "value": t["value"],
            }
        )

    out = (
        ds.map_batches(win, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_id": t["window_id"],
                "n_events": t["n_events"],
                "sum_value": pc.round(t["sum_value"], ndigits=2),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def sessionize_events(sf_dir: str):
    """Session windows: per user, 30-min-gap sessionization over the sorted
    event log.  Hash-partitioned by user (every user's history lands whole
    in one partition), then ONE vectorized pandas pass per partition —
    user cardinality scales with the corpus, so per-user dispatch would
    not; ordering stated: (ts, event_id)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    from dedup_ray.util.dsutil import partitioned_group_apply

    def sess_part(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL users in the partition: one sort, per-user
        # diff/cumsum via pandas groupby kernels — no per-user dispatch
        df = df.sort_values(["user_id", "ts", "event_id"])
        gap = df.groupby("user_id")["ts"].diff().dt.total_seconds()
        new_s = (gap.isna() | (gap > 1800)).astype(int)
        df = df.assign(session_id=new_s.groupby(df["user_id"].values).cumsum())
        return (
            df.groupby(["user_id", "session_id"])
            .size()
            .reset_index(name="n_events")
        )

    return partitioned_group_apply(ds, ["user_id"], sess_part)


def quantile_sketch_events(sf_dir: str):
    """Mergeable relative-error quantile sketch (DDSketch-style log bins)
    over ``events.value`` — accuracy scorecard vs exact order statistics.

    The exact value-count path (``doc_length_quantiles``) needs driver
    state ~ distinct values; the sketch needs ≤ log_γ(max/min) bins at
    any corpus size and merges by addition.  The VERIFIABLE CLAIM is the
    guarantee itself: every midpoint estimate within 1% of the exact
    order statistic (rank ``floor(q·(n−1))``) — which the oracle pins as
    booleans derived from ``count(events)``.
    """
    from dedup_ray.stages.sketch import dd_quantiles, dd_sketch

    REL = 0.01
    QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    ds = _read(sf_dir, "events", columns=["value"])
    est = dd_quantiles(dd_sketch(ds, "value", rel_err=REL), QS, rel_err=REL)

    # exact order statistics via a distributed value-count histogram
    # (driver state = distinct values; fine at catalog scale — the sketch
    # is the path that replaces this at 100 TB).  Filtered to the SAME
    # domain the sketch bins (positive finite values) so both sides rank
    # over one population; `n` in the output stays count(events) because
    # the oracle pins that, and the sf data is all-positive — if a future
    # generator emits v <= 0 the domain counts diverge and this assert
    # points at the cause rather than a phantom accuracy failure.
    from ray.data.aggregate import Count

    def pos_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return t.filter(
            _pc.and_(
                _pc.is_valid(t["value"]), _pc.greater(t["value"], 0.0)
            )
        )

    vc = (
        ds.map_batches(pos_only, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("value")
    )
    if len(vc) == 0:
        raise ValueError("no positive finite event values to rank")
    cum = vc["n"].cumsum().to_numpy()
    total = int(cum[-1])
    rows = []
    for q, e in zip(QS, est):
        rank = int(np.floor(q * (total - 1)))
        exact = float(vc["value"].iloc[int(np.searchsorted(cum, rank + 1))])
        ok = abs(e / exact - 1.0) <= REL + 1e-12
        rows.append((q, total, int(ok)))
    return pa.table(
        {
            "q": pa.array([r[0] for r in rows], pa.float64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "ok": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def quantile_sketch_by_type_events(sf_dir: str):
    """Grouped quantile sketch: per event_type, p50/p90 from the grouped
    DDSketch, scored against exact per-group order statistics (the same
    1%-bound claim as ``quantile_sketch_events``, per key).  The sketch
    shuffle carries (group, bin, n) partials — bounded by groups × bins.
    """
    from dedup_ray.stages.sketch import dd_quantiles_grouped, dd_sketch_grouped

    REL = 0.01
    QS = [0.5, 0.9]
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    sk = dd_sketch_grouped(ds, "value", ["event_type"], rel_err=REL)
    est = dd_quantiles_grouped(sk, ["event_type"], QS, rel_err=REL)

    from ray.data.aggregate import Count

    # exact side ranks over the SAME positive-finite domain the sketch
    # bins (mirrors quantile_sketch_events' pos_only rationale): a group
    # with non-positive values would otherwise desynchronize the ranks,
    # and an all-nonpositive group would appear here but not in `est`
    def pos_only(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(pc.is_valid(t["value"]), pc.greater(t["value"], 0.0))
        )

    vc = (
        ds.map_batches(pos_only, batch_format="pyarrow")
        .groupby(["event_type", "value"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "value"])
    )
    if len(vc) == 0:
        raise ValueError("no positive finite event values to rank")
    rows = []
    for etype, g in vc.groupby("event_type"):
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        for q, e in zip(QS, est[(etype,)]):
            rank = int(np.floor(q * (total - 1)))
            exact = float(g["value"].iloc[int(np.searchsorted(cum, rank + 1))])
            ok = abs(e / exact - 1.0) <= REL + 1e-12
            rows.append((etype, q, total, int(ok)))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "q": pa.array([r[1] for r in rows], pa.float64()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "ok": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def topk_per_user_events(sf_dir: str):
    """Grouped top-k: each user's 3 highest-value events, ranked.

    Ties broken by ascending event_id so the rank is total.  One
    partitioned pass: vectorized sort + ``groupby.cumcount`` — the
    distributed form of ``row_number() OVER (PARTITION BY …)``; per-user
    state never leaves its partition.
    """
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    from dedup_ray.util.dsutil import partitioned_group_apply

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.assign(rank=df.groupby("user_id").cumcount() + 1)
        return df[df["rank"] <= 3]

    return partitioned_group_apply(ds, ["user_id"], topk)


def rolling_mean_events(sf_dir: str):
    """Per-user rolling mean over the trailing 3 events (ordered by
    ``(ts, event_id)``) — the windowed-aggregate shape feature pipelines
    use for activity features.  Explicit shift-and-add (not pandas'
    sliding-sum rolling kernel) keeps float association identical to the
    SQL window frame.  One partitioned vectorized pass.
    """
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    from dedup_ray.util.dsutil import partitioned_group_apply

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            ts_us=df["ts"].astype("datetime64[us]").astype("int64")
        ).sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        g = df.groupby("user_id")["value"]
        v1, v2 = g.shift(1), g.shift(2)
        total = df["value"].add(v1, fill_value=0.0).add(v2, fill_value=0.0)
        n = 1 + v1.notna().astype("int64") + v2.notna().astype("int64")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "mean3": (total / n).to_numpy(),
            }
        )

    return partitioned_group_apply(ds, ["user_id"], roll)


def pivot_event_counts(sf_dir: str):
    """Pivot/crosstab: per user, one count column per event type.

    Two-level: vectorized per-batch crosstab partials, then ONE grouped
    sum over (user × 5 columns) — the shuffle carries pre-aggregated
    partials, never raw events.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # crosstab of nothing drops columns → pin schema
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    **{f"n_{t}": pd.Series(dtype="int64") for t in types},
                }
            )
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=types, fill_value=0).astype("int64")
        ct.columns = [f"n_{c}" for c in types]
        return ct.reset_index()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types])
    )
    return out


def asof_join_events(sf_dir: str):
    """AS-OF join — an operator Ray Data has no native form of: for every
    'click' event, the most recent STRICTLY-prior 'view' by the same user.

    Scale shape: hash-partition by user (each user's history lands whole),
    then ONE vectorized ``pd.merge_asof`` per partition — no per-user
    dispatch, no driver state.  Strictly-prior (``allow_exact_matches=
    False`` == SQL ``a.ts > b.ts``) keeps tie semantics engine-independent;
    emitted times are int64 epoch-microseconds (no NaT/resolution hazards).
    Inner semantics: clicks with no prior view are dropped (a nullable
    match column would be the only NULL in the catalog's hash compare).
    """
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    from dedup_ray.util.dsutil import partitioned_group_apply

    def asof_part(df: pd.DataFrame) -> pd.DataFrame:
        # int64 epoch-us keys throughout: merge_asof needs identical key
        # dtypes and datetime resolutions vary by source — ints do not
        df = df.assign(ts_us=df["ts"].astype("datetime64[us]").astype("int64"))
        clicks = df[df["event_type"] == "click"].sort_values("ts_us")
        views = df[df["event_type"] == "view"].sort_values("ts_us")
        j = pd.merge_asof(
            clicks[["event_id", "user_id", "ts_us"]],
            views[["user_id", "ts_us"]].assign(view_ts_us=views["ts_us"]),
            on="ts_us",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        ).dropna(subset=["view_ts_us"])
        view_us = j["view_ts_us"].astype("int64")
        return pd.DataFrame(
            {
                "event_id": j["event_id"].to_numpy(),
                "user_id": j["user_id"].to_numpy(),
                "ts_us": j["ts_us"].to_numpy(),
                "view_ts_us": view_us.to_numpy(),
                "lag_us": (j["ts_us"] - view_us).to_numpy(),
            }
        )

    return partitioned_group_apply(ds, ["user_id"], asof_part)


def range_join_events(sf_dir: str):
    """Range (interval) join — likewise absent from Ray Data: per 'signup'
    event, the count of the user's 'purchase' events in [ts, ts + 7 days).

    Distributed form: co-partition by user, then express the interval
    count as a DIFFERENCE OF TWO AS-OF LOOKUPS against the per-user
    cumulative purchase counter — ``n = f(ts+7d) − f(ts)`` where ``f(t)``
    = purchases strictly before ``t`` (one ``merge_asof`` each, fully
    vectorized; duplicate purchase timestamps are safe because backward
    as-of picks the LAST sorted row = the max cumulative count).  Zero
    counts kept (left semantics).
    """
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    from dedup_ray.util.dsutil import partitioned_group_apply

    WINDOW_US = 7 * 24 * 3600 * 1_000_000

    def range_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(ts_us=df["ts"].astype("datetime64[us]").astype("int64"))
        sign = df[df["event_type"] == "signup"][
            ["event_id", "user_id", "ts_us"]
        ].copy()
        pur = df[df["event_type"] == "purchase"][["user_id", "ts_us"]].copy()
        pur = pur.sort_values(["user_id", "ts_us"], kind="mergesort")
        pur["cum"] = pur.groupby("user_id").cumcount() + 1
        pur = pur.sort_values("ts_us", kind="mergesort")

        def f_strictly_before(t_us: pd.Series) -> np.ndarray:
            q = pd.DataFrame(
                {
                    "user_id": sign["user_id"].to_numpy(),
                    "ts_us": t_us.to_numpy(),
                }
            ).sort_values("ts_us", kind="mergesort")
            m = pd.merge_asof(
                q.reset_index(),
                pur,
                on="ts_us",
                by="user_id",
                direction="backward",
                allow_exact_matches=False,
            ).set_index("index")
            return (
                m["cum"].fillna(0).astype("int64").sort_index().to_numpy()
            )

        ts_us = sign["ts_us"].reset_index(drop=True)
        n = f_strictly_before(ts_us + WINDOW_US) - f_strictly_before(ts_us)
        return pd.DataFrame(
            {
                "event_id": sign["event_id"].to_numpy(),
                "user_id": sign["user_id"].to_numpy(),
                "n_in_window": n,
            }
        )

    return partitioned_group_apply(ds, ["user_id"], range_part)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

def ann_topk(sf_dir: str):
    """Exact brute-force top-10 cosine neighbors for query vectors 0..4."""
    from dedup_ray.stages.ann import knn_cosine

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    qvecs = np.asarray([list(v) for v in qdf["embedding"]], dtype=np.float64)
    return knn_cosine(emb, qdf["vec_id"].tolist(), qvecs, k=10)


# --------------------------------------------------------------------------
# Dedup operators (rows-only checks: hash-based, not SQL-expressible)
# --------------------------------------------------------------------------

def exact_dedup_docs(sf_dir: str):
    """Exact dedup groups: digest → keeper + multiplicity (md5 = SQL md5)."""
    from dedup_ray.stages.exact import add_digest

    ds = add_digest(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        text_col="text",
        id_col="doc_id",
    )

    from dedup_ray.util.dsutil import partitioned_group_apply

    def keep_part(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pandas groupby per partition — digest cardinality
        # ~ corpus size, so per-group map_groups dispatch would not scale
        out = (
            df.groupby("digest")
            .agg(keep_id=("doc_id", "min"), n_copies=("doc_id", "size"))
            .reset_index()
        )
        out["n_copies"] = out["n_copies"].astype("int64")
        return out

    return partitioned_group_apply(ds, ["digest"], keep_part)


def _planted_recall_row(clusters, n_copies: int) -> pa.Table:
    """Planted-truth scorecard for a clustering of ``pages_from_documents``.

    With ``amplify=n_copies`` every source doc yields exactly ``n_copies``
    pages (original + exact mirror + near-dup) forming one truth cluster,
    so truth-pair totals are pure functions of ``count(documents)`` — which
    is what makes the oracle SQL-expressible.  ``pairs_recovered`` counts
    truth pairs whose two pages landed in the same predicted cluster:
    group pages by (source doc, predicted cluster) and sum C(nc, 2).
    All aggregation is Ray-side; only the final scalars reach the driver.
    """
    from ray.data.aggregate import Count, Sum

    def parse_doc(t: pa.Table) -> pa.Table:
        doc = pc.extract_regex(t["url"], r"//doc(?P<d>\d+)\.")
        return pa.table(
            {
                "doc_id": pc.cast(pc.struct_field(doc, "d"), pa.int64()),
                "cluster_id": t["cluster_id"],
            }
        )

    per = (
        clusters.map_batches(parse_doc, batch_format="pyarrow")
        .groupby(["doc_id", "cluster_id"])
        .aggregate(Count(alias_name="nc"))
    )

    def pairs(t: pa.Table) -> pa.Table:
        nc = pc.cast(t["nc"], pa.int64())
        return pa.table(
            {
                "n_pages": nc,
                "pairs_recovered": pc.divide(
                    pc.multiply(nc, pc.subtract(nc, 1)), 2
                ),
            }
        )

    agg = per.map_batches(pairs, batch_format="pyarrow").aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("pairs_recovered", alias_name="pairs_recovered"),
    )
    n_pages = int(agg["n_pages"])
    n_docs = n_pages // n_copies
    n_truth = n_docs * (n_copies * (n_copies - 1) // 2)
    recovered = int(agg["pairs_recovered"])
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_pages": pa.array([n_pages], pa.int64()),
            "n_truth_pairs": pa.array([n_truth], pa.int64()),
            "pairs_recovered": pa.array([recovered], pa.int64()),
            "recall": pa.array(
                [round(recovered / n_truth, 6) if n_truth else 1.0], pa.float64()
            ),
        }
    )


def minhash_dedup_docs(sf_dir: str):
    """Full near-dup pipeline over a pages table amplified from documents
    (amplify=3 ⇒ per doc: original + exact mirror + 3%-edit near-dup, one
    truth cluster each).  Emits the planted-truth scorecard row; the oracle
    derives every column from ``count(documents)`` plus the recall==1.0
    invariant the pipeline maintains (``evaluate.py:125-128`` semantics)."""
    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline
    from dedup_ray.sources.pages import pages_from_documents

    import ray

    pages = pages_from_documents(sf_dir, amplify=3)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    cfg = DedupConfig(
        minhash_concurrency=max(2, cpus - 2), auto_partitions=True
    )
    clusters, _ = dedup_pipeline(pages, cfg)
    return _planted_recall_row(clusters, n_copies=3)


def dedup_tier_report(sf_dir: str):
    """Per-tier duplicate attribution: which dedup tier earned each merge.

    The engine's flagship is TIERED — exact digest → MinHash/LSH → SimHash
    → substring/CDC — and a 100-TB operator needs to see what each tier
    contributes before paying for it.  This query runs the full pipeline
    over a tier-separable planted corpus (:func:`pages_tiered`: per
    qualifying doc an exact mirror only the exact tier can claim and an
    append-one-token near-dup only a near tier can claim) and attributes
    unions by CUMULATIVE component counting: processing tiers in pipeline
    order, ``n_unions(t) = components(edges of tiers < t) − components(
    edges of tiers ≤ t)`` — the distributed formulation (4 CC runs over
    materialized edge sets), no driver edge state, so the report works
    unchanged at corpus scale.

    Oracle: exact claims one union per qualifying doc (the planted
    mirror); MinHash claims the planted near-dup per doc PLUS the merges
    of the corpus's own cross-document near-dup graph, which the SQL
    re-derives from first principles (distinct 3-token shingles, true
    Jaccard ≥ the verify threshold, recursive-CTE CC); SimHash and
    substring contribute 0 new unions (their edges duplicate existing
    connectivity on this corpus).
    """
    import ray

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.dedup import dedup_pipeline
    from dedup_ray.sources.pages import pages_tiered
    from dedup_ray.stages.cc import component_labels

    pages = pages_tiered(sf_dir, min_tokens=40)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    cfg = DedupConfig(
        minhash_concurrency=max(2, cpus - 2), auto_partitions=True
    )
    tiers: dict = {}
    dedup_pipeline(pages, cfg, tier_edges_out=tiers, tier_edges_only=True)
    n_nodes = pages.count()

    # The four cumulative component counts are independent given the
    # materialized tier edge sets — run them CONCURRENTLY (the
    # similarity-branch convention in pipelines/dedup.py): each CC pass
    # pays ~1 s of plan-launch latency regardless of CPU count, so
    # overlapping the four passes removes ~3 s of serial barrier.
    present = [t for t in ("exact", "near_minhash", "near_simhash",
                           "substring") if t in tiers]
    # Materialize each cumulative union SERIALLY first: each tier's
    # pin/cast plan executes exactly once (later unions concat already-
    # materialized refs), and the threads below then fan out only the CC
    # passes over fully-materialized inputs — concurrent driver-thread
    # execution of overlapping lazy plans is not a documented-safe Ray
    # Data pattern (round-5 advice item).
    cums = []
    cum = None
    for tier in present:
        cum = (tiers[tier] if cum is None
               else cum.union(tiers[tier])).materialize()
        cums.append(cum)

    def comps_of(edge_ds) -> int:
        labels = component_labels(edge_ds, cfg.cc_local_edge_limit)
        if labels is None:
            return n_nodes
        lab = labels.materialize()
        return n_nodes - lab.count() + len(lab.unique("cluster_id"))

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(cums) or 1) as pool:
        comps_list = list(pool.map(comps_of, cums))

    rows = []
    prev_comps = n_nodes
    for tier, comps in zip(present, comps_list):
        rows.append((tier, prev_comps - comps, comps))
        prev_comps = comps
    return pa.table(
        {
            "tier": pa.array([r[0] for r in rows], pa.string()),
            "n_unions": pa.array([r[1] for r in rows], pa.int64()),
            "components_after": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def incremental_dedup_docs(sf_dir: str):
    """Incremental dedup scorecard: batch-dedup the base corpus (one page
    per document), persist it as a bucketed index (``state/dedupindex``),
    then cluster a NEW shard against that index touching only the shard's
    own key buckets (``pipelines/incremental`` — O(shard), not O(corpus)).

    Shard construction (docs of ≥40 tokens, so MinHash anchoring is
    deterministic — a 2% edit is 1-2 tokens, shingle Jaccard ≥0.86, and at
    k=3/32×4 LSH the per-doc miss probability is ~1e-9; exact copies hit
    the digest path): ``doc_id % 7 == 0`` contributes an exact
    copy, ``doc_id % 7 == 3`` a 2%-edit near-dup.  Every shard doc must
    anchor to its source document's base cluster and no cluster merges may
    occur; the oracle derives all counts from the documents table."""
    import tempfile

    import ray

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.dedup import (
        compact_signature_table,
        dedup_pipeline,
    )
    from dedup_ray.pipelines.incremental import dedup_against_index
    from dedup_ray.sources.pages import _rng, mutate_text, pages_from_documents
    from dedup_ray.state.dedupindex import build_index
    from dedup_ray.util.exchange import exchange_join

    cpus = int(ray.cluster_resources().get("CPU", 4))
    cfg = DedupConfig(
        minhash_concurrency=max(2, cpus // 2), auto_partitions=True
    )

    pages = pages_from_documents(sf_dir, amplify=1)
    clusters, _ = dedup_pipeline(
        pages, cfg, extract=False, use_simhash=False, use_substring=False
    )
    clusters = clusters.materialize()
    compact = compact_signature_table(
        pages, cfg, "url", extract=False, with_simhash=False, with_chunks=False
    )
    import shutil

    root = tempfile.mkdtemp(prefix="dedupindex-", dir="/tmp")
    try:
        return _incremental_scorecard(
            sf_dir, root, cfg, compact, clusters, build_index
        )
    finally:
        # the index is corpus-scale (~1 KB/doc); repeated catalog runs
        # must not accumulate trees in /tmp
        shutil.rmtree(root, ignore_errors=True)


def _incremental_scorecard(sf_dir, root, cfg, compact, clusters, build_index):
    from dedup_ray.pipelines.incremental import dedup_against_index
    from dedup_ray.sources.pages import _rng, mutate_text
    from dedup_ray.util.exchange import exchange_join

    build_index(compact, clusters, root, cfg, id_col="url", num_buckets=32)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    def to_shard(t: pa.Table) -> pa.Table:
        urls, texts = [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            text = text or ""
            if len(text.split(" ")) < 40:
                continue
            m = int(d) % 7
            if m == 0:
                urls.append(f"https://shard.example/exact/{d}")
                texts.append(text)
            elif m == 3:
                urls.append(f"https://shard.example/near/{d}")
                texts.append(mutate_text(text, 0.02, _rng(42, f"inc/{d}")))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            }
        )

    shard = docs.map_batches(to_shard, batch_format="pyarrow")
    out, report = dedup_against_index(shard, root, cfg, extract=False)

    # expected anchor per shard doc = its SOURCE page's base cluster (join,
    # not the url formula, so identical base docs collapsing into one
    # cluster cannot fake a mismatch)
    def parse_out(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["url"], r"example/(?P<k>exact|near)/(?P<d>\d+)$")
        return pa.table(
            {
                "doc_id": pc.cast(pc.struct_field(m, "d"), pa.int64()),
                "kind": pc.struct_field(m, "k"),
                "got": t["cluster_id"],
            }
        )

    def parse_base(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["url"], r"//doc(?P<d>\d+)\.")
        return pa.table(
            {
                "doc_id": pc.cast(pc.struct_field(m, "d"), pa.int64()),
                "base_cluster": t["cluster_id"],
            }
        )

    def score(t: pa.Table) -> pa.Table:
        ok = pc.equal(t["got"], t["base_cluster"])
        ex = pc.equal(t["kind"], "exact")
        return pa.table(
            {
                "anchored_exact": pc.cast(pc.and_(ok, ex), pa.int64()),
                "anchored_near": pc.cast(
                    pc.and_(ok, pc.invert(ex)), pa.int64()
                ),
            }
        )

    joined = exchange_join(
        out.map_batches(parse_out, batch_format="pyarrow"),
        clusters.map_batches(parse_base, batch_format="pyarrow"),
        on="doc_id",
        how="inner",
        num_partitions=cfg.num_partitions,
        post=score,
        empty_schema=pa.schema(
            [("anchored_exact", pa.int64()), ("anchored_near", pa.int64())]
        ),
    )
    from ray.data.aggregate import Sum

    agg = joined.aggregate(
        Sum("anchored_exact", alias_name="anchored_exact"),
        Sum("anchored_near", alias_name="anchored_near"),
    )
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_shard": pa.array([report["n_docs"]], pa.int64()),
            "anchored_exact": pa.array(
                [int(agg["anchored_exact"] or 0)], pa.int64()
            ),
            "anchored_near": pa.array(
                [int(agg["anchored_near"] or 0)], pa.int64()
            ),
            "merges": pa.array([int(report["merges"])], pa.int64()),
        }
    )


def simhash_docs(sf_dir: str):
    """SimHash fingerprints per document (rows-only)."""
    from dedup_ray.config import DedupConfig
    from dedup_ray.stages.signer import sign_docs

    cfg = DedupConfig(minhash_concurrency=2)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = sign_docs(ds, cfg, id_col="doc_id", with_simhash=True, with_chunks=False)
    return out.select_columns(["doc_id", "simhash"])


FOLD_WORDS = ["Café", "Über", "naïve", "Señor", "Crème-Brûlée"]


BLOCKED_DOMAINS = ["site3.example.com", "site7.example.com",
                   "example.net"]


def blocklist_filter_docs(sf_dir: str):
    """Domain-blocklist crawl filter (subdomain semantics: host == d or
    endswith '.d') over the same synthesized hosts as
    ``host_page_stats``; the list broadcasts in the closure and matching
    is k vectorized passes (``stages/urlnorm.py::blocklist_filter``)."""
    from dedup_ray.stages.urlnorm import blocklist_filter

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        host = pc.binary_join_element_wise(
            "site", pa.array((ids % 13).astype(str)), ".example.com", "")
        return pa.table({"doc_id": t["doc_id"], "host": host})

    return blocklist_filter(ds.map_batches(mk, batch_format="pyarrow"),
                            "host", BLOCKED_DOMAINS)


def fold_text_docs(sf_dir: str):
    """Case/accent folding over accent-synthesized pages: per-doc text
    gains an accented token chosen by doc_id %% 5 (same CASE in the
    oracle), then folds through strip-accents + Unicode lower
    (``stages/normtext.py::fold_text``)."""
    from dedup_ray.stages.normtext import fold_text

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        extra = pa.array([" " + FOLD_WORDS[int(i) % 5] for i in ids],
                         pa.string())
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.binary_join_element_wise(t["text"], extra, ""),
        })

    return fold_text(ds.map_batches(synth, batch_format="pyarrow"))


def simhash_md5_docs(sf_dir: str):
    """SimHash spec twin over md5 token-hash bit planes — every majority
    bit oracle-recomputable (token x 64-bit-plane explode, hex-digit
    decode, sign sums, nibble repack).  The signer's keyed SimHash stays
    the production path (``simhash_docs``, rows-only)."""
    from dedup_ray.stages.simhash import simhash_md5_docs as impl

    return impl(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def fingerprint_docs_q(sf_dir: str):
    """Winnowing fingerprints, md5-hash twin so every fingerprint is
    oracle-recomputable (fixed-width hex compares exactly as the uint64
    it encodes; leftmost-min + position dedup replayed with window
    functions).  The keyed-BLAKE2b variant
    (``textstats.fingerprint_docs``) remains the production path,
    property-tested in ``tests/test_ops.py``."""
    from dedup_ray.stages.textstats import fingerprint_docs_md5

    return fingerprint_docs_md5(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def lang_id_docs(sf_dir: str):
    """Heuristic language ID (rows-only; deterministic)."""
    from dedup_ray.stages.textstats import lang_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = lang_id(ds, concurrency=2)
    return out.select_columns(["doc_id", "lang_pred"])


def balanced_sample_events(sf_dir: str):
    """O4: balanced per-class resampling (``classifier.py:252-261``),
    deterministic variant — first 200 events per event_type in (event_id)
    order, so the Ray result and the SQL oracle agree exactly.  The
    reference's seeded ``np.random.choice`` maps to the same grouped-take
    shape with a seeded shuffle instead of the id sort."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def take(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("event_id").head(200)

    return as_arrow(ds.groupby("event_type").map_groups(take, batch_format="pandas"))


def shortpath_source_docs(sf_dir: str):
    """G2: per-block all-pairs shortest-path feature over a deterministic
    similarity graph (sim = 1 − |Δn_chars|/span within source blocks, edges
    where sim > 0, weight 1/sim, feature 1/dist — ``shortpath.py:45-77``).
    Rows-only: weighted APSP is not SQL-expressible.  Uses the smallest 8
    sources to bound the O(V·E log V) per-block work in the check."""
    from dedup_ray.ops.graph import block_graph_features

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    counts = ds.groupby("source").count().to_pandas()
    small = set(
        counts.sort_values(["count()", "source"]).head(8)["source"]
    )
    import ray

    small_ref = ray.put(frozenset(small))

    def keep(t: pa.Table) -> pa.Table:
        keep_set = ray.get(small_ref)
        mask = pa.array([s in keep_set for s in t["source"].to_pylist()])
        return t.filter(mask)

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        span = int(g["n_chars"].max() - g["n_chars"].min())
        ids = g["doc_id"].tolist()
        nc = g["n_chars"].tolist()
        src = group["source"].iloc[0]
        rows = []
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                d = abs(nc[a] - nc[b]) / span if span else 0.0
                rows.append((src, ids[a], ids[b], round(1.0 - d, 6)))
        return pd.DataFrame(rows, columns=["source", "id1", "id2", "sim"])

    sims = as_arrow(
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("source")
        .map_groups(gen, batch_format="pandas")
    )
    out = block_graph_features(sims, "source", sim_col="sim")
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "id1": t["id1"],
                "id2": t["id2"],
                "sp": pc.round(t["sp"], ndigits=6),
            }
        ),
        batch_format="pyarrow",
    )


def _ann_recall_vs_exact(sf_dir: str, approx_fn, **kw) -> pa.Table:
    """Per-query recall@k of an approximate ANN path against the exact one.

    Runs the brute-force top-k (itself oracle-checked as ``ann_topk``) and
    the approximate path on the same queries, intersects neighbor sets, and
    emits (query_id, n_exact, n_hits, recall).  Both result sets are
    n_queries·k rows — tiny by construction — so the set intersection runs
    driver-side.  The approximate paths are fully seeded, so the recall per
    query is a deterministic constant at a given sf: the oracle pins the
    sf0.01 values (the quality bar itself is asserted in tests/test_ann.py
    on corpora WITH neighbor structure; the sf embeddings are isotropic —
    the hardest ANN regime — which is exactly why the pinned recalls sit
    well below 1)."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    qvecs = np.asarray([list(v) for v in qdf["embedding"]], dtype=np.float64)
    qids = qdf["vec_id"].tolist()
    from dedup_ray.stages.ann import knn_cosine

    exact = knn_cosine(emb, qids, qvecs, k=10).to_pandas()
    approx = approx_fn(emb, qids, qvecs, k=10, **kw).to_pandas()
    rows = []
    for q in qids:
        e = set(exact.loc[exact["query_id"] == q, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == q, "neighbor_id"])
        rows.append((int(q), len(e), len(e & a), round(len(e & a) / len(e), 2)))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_exact": pa.array([r[1] for r in rows], pa.int64()),
            "n_hits": pa.array([r[2] for r in rows], pa.int64()),
            "recall": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def ann_topk_lsh(sf_dir: str):
    """Multi-table multiprobe hyperplane-LSH ANN, scored against the exact
    top-k (recall@10 per query; deterministic seeded path, pinned oracle)."""
    from dedup_ray.stages.ann import knn_cosine_lsh

    return _ann_recall_vs_exact(sf_dir, knn_cosine_lsh)


def ann_topk_ivf(sf_dir: str):
    """IVF (coarse k-means lists, nprobe probing) ANN, scored against the
    exact top-k (recall@10 per query; deterministic seeded path)."""
    from dedup_ray.stages.ann import knn_cosine_ivf

    return _ann_recall_vs_exact(sf_dir, knn_cosine_ivf, n_lists=8, nprobe=4)


def ann_topk_pq(sf_dir: str):
    """Product-quantization ANN (per-subspace codebooks, ADC screen,
    in-batch exact re-rank), scored against the exact top-k (recall@10
    per query; deterministic seeded path, pinned oracle)."""
    from dedup_ray.stages.ann import knn_cosine_pq

    return _ann_recall_vs_exact(sf_dir, knn_cosine_pq)


def focus_org_bag_parts(sf_dir: str):
    """J8: focus-entity regex self-lookup + org-bag clustering
    (``org_bag.py:18-19`` + mode pick of ``uni_glue_baseline.R:26-29``) —
    per brand block, modal part name under the separator-insensitive
    anchored regex, survivors clustered by p_type."""
    from dedup_ray.ops.relational import focus_entity_org_bag

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])
    return focus_entity_org_bag(ds, "p_brand", "p_name", "p_type", "p_partkey")


def coau_dist_docs(sf_dir: str):
    """G3: degree-filtered doc–token bipartite graph distance
    (``short_path.R:27-28,65-84``) over the 8 smallest source blocks —
    tokens with block df in [2,3] are 'coauthor' nodes, coau_dist = 2/dist,
    dummy at dist==2.  Oracle: recursive-CTE BFS in DuckDB."""
    from dedup_ray.ops.graph import bipartite_token_distance

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    counts = ds.groupby("source").count().to_pandas()
    small = counts.sort_values(["count()", "source"]).head(8)["source"]
    import ray

    small_ref = ray.put(frozenset(small))

    def keep(t: pa.Table) -> pa.Table:
        keep_set = ray.get(small_ref)
        return t.filter(
            pc.is_in(t["source"], value_set=pa.array(sorted(keep_set)))
        )

    return bipartite_token_distance(
        ds.map_batches(keep, batch_format="pyarrow"),
        "source", "doc_id", "text",
    )


# PageRank query constants, shared between the Ray implementation and the
# generated DuckDB oracle so the two graphs (and the arithmetic) cannot
# drift: edges u → expr(u) mod N per expression.  The expressions are
# deliberately NON-injective (a linear map with gcd(a, N)=1 is a
# permutation, making in-degree constant and PageRank trivially uniform —
# no oracle power); quadratic + integer-division maps give an uneven
# in-degree distribution.  Each expression is valid both as NumPy over an
# int64 array ``u`` and, with ``u`` → ``doc_id``, as DuckDB SQL.
PR_EDGE_EXPRS = ("u * u + 3", "u // 3 + 1")
PR_DAMPING = 0.85
PR_ITERS = 8
PR_ROUND = 9


def pagerank_docs(sf_dir: str):
    """Distributed PageRank (``ops/pagerank.py``) over a deterministic doc
    link graph: every doc u links to (u²+3) mod N and (u//3+1) mod N
    (doc_ids are dense 0..N−1 in the synthetic corpus; N from one O(1)
    count).  Two narrow exchanges per iteration, rank vector never on the
    driver; oracle: the same power iteration unrolled as chained CTEs.

    Output is integer nano-ranks (``round(pr·10⁹)``): engines' float
    ``round()`` kernels disagree by 1 ulp on the nearest-double of a
    rounded decimal, so hash-comparable float columns are a trap — the
    integer is identical as long as the two sides' pre-round sums agree to
    ≪0.5 nano, which 8 contraction iterations guarantee."""
    from dedup_ray.ops.pagerank import pagerank
    from dedup_ray.util.dsutil import rename_columns

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()

    def mk_edges(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([u for _ in PR_EDGE_EXPRS])
        dst = np.concatenate(
            [eval(expr, {"u": u}) % n for expr in PR_EDGE_EXPRS]  # noqa: S307
        )
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    nodes = rename_columns(docs, {"doc_id": "node"})
    pr = pagerank(
        nodes,
        edges,
        damping=PR_DAMPING,
        iters=PR_ITERS,
        round_to=None,
    )

    def to_nano(t: pa.Table) -> pa.Table:
        e9 = np.rint(
            t["pagerank"].to_numpy(zero_copy_only=False) * 10.0**PR_ROUND
        ).astype(np.int64)
        return pa.table(
            {"doc_id": t["node"], "pagerank_e9": pa.array(e9, pa.int64())}
        )

    return pr.map_batches(to_nano, batch_format="pyarrow")


def similarity_join_docs(sf_dir: str):
    """Cross-table fuzzy join (``ops/simjoin.py``): documents (≥40 tokens)
    joined against a deterministically-derived second table (every 3rd doc
    with its last 10 tokens dropped — a truncation near-dup) on 3-shingle
    Jaccard ≥ 0.5, blocked on shingles with df ≤ 8 across both sides.
    The oracle replays blocking AND verification on shingle strings, so
    candidate generation itself is checked, not just the verify step."""
    from dedup_ray.ops.simjoin import similarity_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def long_docs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.coalesce(pc.cast(t["text"], pa.string()), ""), " "
        )
        return t.filter(pc.greater_equal(pc.list_value_length(toks), 40))

    left = docs.map_batches(long_docs, batch_format="pyarrow")

    def truncate(t: pa.Table) -> pa.Table:
        keep, out_txt = [], []
        ids = t["doc_id"].to_pylist()
        for i, txt in enumerate(t["text"].to_pylist()):
            toks = (txt or "").split(" ")
            if ids[i] % 3 == 0 and len(toks) >= 40:
                keep.append(ids[i])
                out_txt.append(" ".join(toks[: len(toks) - 10]))
        return pa.table(
            {
                "doc_id": pa.array(keep, pa.int64()),
                "text": pa.array(out_txt, pa.string()),
            }
        )

    right = docs.map_batches(truncate, batch_format="pyarrow")
    return similarity_join(
        left, right, "doc_id", "doc_id", k=3, tau=0.5, max_df=8
    )


_SIMJOIN_TRUTH_CACHE: dict = {}


def _simjoin_truth(sf_dir: str):
    """Per-process memo of the exact 3-shingle Jaccard ≥ 0.5 self-join
    over ≥40-token docs (see the cache convention at _CHAIN_CC_CACHE):
    similarity_self_join_docs returns it directly and
    blocking_quality_docs scores the canopy blocking against it — one
    prefix-filter pass instead of two."""
    from dedup_ray.ops.simjoin import similarity_self_join

    if sf_dir not in _SIMJOIN_TRUTH_CACHE:
        docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

        def long_docs(t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(
                pc.coalesce(pc.cast(t["text"], pa.string()), ""), " "
            )
            return t.filter(
                pc.greater_equal(pc.list_value_length(toks), 40))

        _SIMJOIN_TRUTH_CACHE[sf_dir] = similarity_self_join(
            docs.map_batches(long_docs, batch_format="pyarrow"),
            "doc_id",
            k=3,
            tau=0.5,
        ).materialize()
    return _SIMJOIN_TRUTH_CACHE[sf_dir]


def similarity_self_join_docs(sf_dir: str):
    """Exact all-pairs similarity self-join (``ops/simjoin.py``) over
    documents (≥40 tokens), 3-shingle Jaccard ≥ 0.5, via prefix-filter
    blocking whose recall is exactly 1 — so the oracle is the BRUTE-FORCE
    all-pairs answer, checking the prefix-principle guarantee itself
    rather than replaying the blocking."""
    return _simjoin_truth(sf_dir)


def split_seed_search(sf_dir: str):
    """O5: deterministic split-seed search (``sample_seed.py:26-41``) — per
    source block (n docs, n 'en' docs), try seeds 0..499 with val-set rule
    (min_doc_id + seed) % 5 == 0 and pick the seed minimizing
    |pos_rate(train) − pos_rate(val)| (ties → smallest seed).  The reference
    shape exactly: distributed per-block aggregates, driver loop over the
    tiny aggregate table."""
    from ray.data.aggregate import Count, Min, Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t["source"],
                "doc_id": t["doc_id"],
                "pos": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Min("doc_id", alias_name="bkey"),
            Count(alias_name="n"),
            Sum("pos", alias_name="pos"),
        )
        .to_pandas()
    )
    bkey = agg["bkey"].to_numpy()
    n = agg["n"].to_numpy(dtype=np.float64)
    pos = agg["pos"].to_numpy(dtype=np.float64)
    best_seed, best_diff = None, None
    for seed in range(500):
        val = (bkey + seed) % 5 == 0
        if val.all() or not val.any():
            continue
        d = pos[~val].sum() / n[~val].sum() - pos[val].sum() / n[val].sum()
        if best_diff is None or abs(d) < abs(best_diff):
            best_seed, best_diff = seed, d
    return pd.DataFrame(
        {"best_seed": [best_seed], "diff_pos_rate": [round(float(best_diff), 6)]}
    )


def per_block_accuracy(sf_dir: str):
    """A9: per-block accuracy screen (``check_train_labels.py:10-17``) —
    prediction = block-modal lang (ties → lang asc), label = lang,
    acc = mean(pred == label) per source."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def acc(group: pd.DataFrame) -> pd.DataFrame:
        counts = (
            group.groupby("lang").size().reset_index(name="n")
            .sort_values(["n", "lang"], ascending=[False, True])
        )
        mode = counts["lang"].iloc[0]
        return pd.DataFrame(
            {
                "source": [group["source"].iloc[0]],
                "acc": [round(float((group["lang"] == mode).mean()), 6)],
            }
        )

    return as_arrow(ds.groupby("source").map_groups(acc, batch_format="pandas"))


def pscore_report_docs(sf_dir: str):
    """``pscore.R:10-14`` score-distribution report as data: over the
    per-block accuracy scores (A9), the 20-bin equal-width histogram plus
    the annotations the reference's plot carries — mean ± sd in the title,
    lowest/highest-scoring block name on the axis label (ties broken by
    lexicographic min name).  The reference renders a PDF; the engine
    emits the report's numbers so any plotter can reproduce it.  Scores
    stream through Ray aggregates (min/max/mean/sd) and a bin-count
    groupby — the per-name score table never lands on the driver, only
    the 20 histogram rows do."""
    from ray.data.aggregate import Max, Mean, Min, Std

    scores = per_block_accuracy(sf_dir).materialize()
    agg = scores.aggregate(
        Min("acc"), Max("acc"), Mean("acc"), Std("acc", ddof=1)
    )
    mn, mx = float(agg["min(acc)"]), float(agg["max(acc)"])
    mean_s = round(float(agg["mean(acc)"]), 6)
    sd_s = round(float(agg["std(acc)"]), 6)
    w = (mx - mn) / 20.0

    def pick(val):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["acc"], val)).select(["source"])

        return f

    min_name = scores.map_batches(pick(mn), batch_format="pyarrow").min("source")
    max_name = scores.map_batches(pick(mx), batch_format="pyarrow").min("source")

    def binb(t: pa.Table) -> pa.Table:
        a = t["acc"].to_numpy(zero_copy_only=False)
        if w > 0:
            b = np.minimum(np.floor((a - mn) / w), 19).astype(np.int64)
        else:
            b = np.zeros(len(a), np.int64)
        return pa.table({"bin": pa.array(b)})

    counts = (
        scores.map_batches(binb, batch_format="pyarrow")
        .groupby("bin").count().to_pandas()
    )
    cmap = dict(zip(counts["bin"], counts["count()"]))
    bins = np.arange(20, dtype=np.int64)
    return pa.table({
        "bin": pa.array(bins),
        "lo": pa.array(np.round(mn + bins * w, 6)),
        "hi": pa.array(np.round(mn + (bins + 1) * w, 6)),
        "n": pa.array([int(cmap.get(int(b), 0)) for b in bins], pa.int64()),
        "mean_score": pa.array([mean_s] * 20),
        "sd_score": pa.array([sd_s] * 20),
        "min_name": pa.array([min_name] * 20, pa.string()),
        "max_name": pa.array([max_name] * 20, pa.string()),
    })


def embed_pair_features(sf_dir: str):
    """ST2: embedding pair features per label block — the reference pair
    scorer's exact formulas (``doc2vec_pair_native.py:105-110``): euclidean
    dist, arccos-clipped angle, sqrt of text-length product (doc lengths
    broadcast via ``ray.put``, J5 shape).  Vectorized pair gather per block."""
    from dedup_ray.stages.classifier import embedding_pair_features

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"]).to_pandas()
    lookup = dict(zip(docs["doc_id"], docs["n_chars"].astype(float)))
    return embedding_pair_features(emb, len_lookup=lookup)


def logistic_score_embeddings(sf_dir: str):
    """ST4 + S7: train a deterministic numpy logistic regression (binary
    target ``label < 5``) on the labeled embeddings sample, persist the
    fitted model as an .npz artifact (the reference's joblib dump,
    ``classifier.py:343,373,401``), then score the table with an actor pool
    that loads the artifact once per actor (``LogisticScorer.__init__``).
    Training collects only the labeled sample (bounded by design); scoring
    streams.  Training is full-batch gradient descent with zero RNG, so the
    fitted weights are a deterministic function of the table — the oracle
    pins the standardization-folded weights as SQL constants and recomputes
    sigmoid(list_dot_product(embedding, w) + b) per row in DuckDB (the
    folded form and the scorer's (x−mean)/std·w+b differ only at ~1e-13,
    orders below the 6dp emit rounding)."""
    import os
    import tempfile

    from dedup_ray.stages.classifier import (
        save_model,
        score_with_model,
        train_logistic,
    )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    df = emb.to_pandas()
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    y = (df["label"].to_numpy() < 5).astype(np.float64)
    model = train_logistic(X, y)
    path = os.path.join(tempfile.gettempdir(), "dedup_ray_logistic.npz")
    save_model(model, path, ["embedding"])
    scored = score_with_model(emb, path)

    def emit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "score": pc.round(t["score"], ndigits=6),
                "pred": pc.cast(t["pred"], pa.int64()),
            }
        )

    return scored.map_batches(emit, batch_format="pyarrow")


def ensemble_score_embeddings(sf_dir: str):
    """ST4, full reference shape: TWO fitted models — the logistic scorer
    and a deterministic gradient-boosted-stump model (the XGB analog,
    ``classifier.py:303-311``) — combined with the reference's only
    ensemble strategy, ``preds.mean(axis=1) > 0.5``
    (``classifier.py:349-357``).  Both trainers are zero-RNG, so the
    fitted parameters are a deterministic function of the table and the
    oracle pins them as SQL constants (folded logistic weights + one CASE
    per stump), recomputing the probability mean per row in DuckDB."""
    import os
    import tempfile

    from dedup_ray.stages.classifier import (
        save_model,
        save_stump_model,
        score_with_ensemble,
        train_logistic,
        train_stumps,
    )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    df = emb.to_pandas()
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    y = (df["label"].to_numpy() < 5).astype(np.float64)
    p_log = os.path.join(tempfile.gettempdir(), "dedup_ray_ens_logistic.npz")
    p_stu = os.path.join(tempfile.gettempdir(), "dedup_ray_ens_stumps.npz")
    save_model(train_logistic(X, y), p_log, ["embedding"])
    save_stump_model(train_stumps(X, y), p_stu, ["embedding"])
    scored = score_with_ensemble(emb, [p_log, p_stu])

    def emit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "score": pc.round(t["score"], ndigits=6),
                "pred": pc.cast(t["pred"], pa.int64()),
            }
        )

    return scored.map_batches(emit, batch_format="pyarrow")


def window_hopping_events(sf_dir: str):
    """Hopping window (size 2h, hop 1h) per event_type: each event belongs
    to TWO overlapping windows — emitted by a flat-map explode (window_id =
    hop index of the window START), then one grouped aggregate.  The
    overlap factor is bounded (size/hop), so the explode multiplies the
    stream by a constant, not the key cardinality."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    hop = 3_600_000_000  # 1h in us
    k = 2  # size / hop

    def explode(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        base = us // hop
        parts = []
        for j in range(k):
            parts.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        "window_id": pa.array(base - j),
                        "value": t["value"],
                    }
                )
            )
        return pa.concat_tables(parts)

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_id": t["window_id"],
                "n_events": t["n_events"],
                "sum_value": pc.round(t["sum_value"], ndigits=2),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def embed_cosine_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup edges within label blocks (cos >= 0.3),
    vectorized gram matrix per block.  Oracle: list_cosine_similarity."""
    from dedup_ray.stages.embed import cosine_dup_edges

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    return cosine_dup_edges(emb, "label", threshold=0.3)


def semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic pruning (Abbas et al. 2023) over the embeddings
    table: k-means cells → within-cell cos>=tau components → keep the
    member farthest from its centroid.  Rows-only: the k-means fixed point
    is not SQL-expressible (same class as ap_cluster_docs); the policy and
    the distributed machinery are pytest-verified (planted groups, local
    parity, partition invariance) in tests/test_semdedup.py."""
    from dedup_ray.stages.semdedup import semdedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup(emb, n_cells=8, tau=0.3, num_partitions=8)


def embed_cosine_dedup_docs(sf_dir: str):
    """Full embedding-cosine near-dup pipeline FROM TEXT over the planted
    amplified corpus: hashed-feature embeddings (deterministic,
    training-free — the doc2vec-production analog; word-3-gram features so
    unrelated docs sit at cosine ~0, not the ~0.7 common-word floor of
    unigram bags) → per-lang cosine edges (cos >= 0.4) → union-find
    clusters → planted-truth scorecard.  A 3% token edit preserves ~90% of
    3-grams (cosine ~0.9 for typical docs; the worst planted pair — a
    10-token doc where one edit kills most of its handful of 3-grams —
    sits at 0.50), so the 0.4 threshold clears every planted pair while
    staying above the cross-doc noise floor (p99 ≈ 0.29): recall is
    deterministically 1.0, which makes the scorecard oracle-expressible
    even though the seeded hash is not."""
    from dedup_ray.sources.pages import pages_from_documents
    from dedup_ray.stages.cc import assign_clusters
    from dedup_ray.stages.embed import cosine_dup_edges, embed_docs

    pages = pages_from_documents(sf_dir, amplify=3)
    emb = embed_docs(pages, id_col="url", dim=64, keep_cols=("lang",), ngram=3)
    edges = cosine_dup_edges(
        emb, "lang", id_col="url", threshold=0.4
    ).select_columns(["id1", "id2"])
    clusters = assign_clusters(
        pages.select_columns(["url"]), edges, id_col="url", num_partitions=8
    )
    return _planted_recall_row(clusters, n_copies=3)


DISCIPLINE_LISTS: dict[str, frozenset] = {
    "color": frozenset({"red", "blue", "green", "yellow", "purple", "white"}),
    "size": frozenset({"small", "large", "tiny", "huge", "mini"}),
    "temperature": frozenset({"hot", "cold", "warm", "cool"}),
    "mechanism": frozenset({"gear", "bolt", "spring", "lever", "valve"}),
}


def tag_parts_multilabel(sf_dir: str):
    """M8: venue→discipline multi-label tagger re-expressed on part names —
    membership of name tokens in broadcast keyword lists emits 0..n
    (p_partkey, tag) rows per part (``define_fields_by_venue.R:13-48``)."""
    import ray

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    lists_ref = ray.put(DISCIPLINE_LISTS)  # J5-style broadcast of small side

    def tag(t: pa.Table) -> pa.Table:
        lists = ray.get(lists_ref)
        # vectorized: explode name tokens once, then one is_in + parent-index
        # gather per tag list — no per-row Python
        toks = pc.split_pattern(t["p_name"], " ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keys = pc.take(t["p_partkey"], parents)
        outs = []
        for tag_name, words in lists.items():
            hit = pc.is_in(flat, value_set=pa.array(sorted(words)))
            hit_keys = pc.unique(keys.filter(hit))
            outs.append(
                pa.table(
                    {
                        "p_partkey": pc.cast(hit_keys, pa.int64()),
                        "tag": pa.array([tag_name] * len(hit_keys), pa.string()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return ds.map_batches(tag, batch_format="pyarrow")


def concat_title_abstract(sf_dir: str):
    """M5: text-field assembly before shingling — ``str(title)+str(abstract)``
    with the string ``'nan'`` standing in for missing fields
    (``doc2vec.py:69-81``), re-expressed as source+text per document.
    Pure vectorized Arrow concat; the output feeds a signer unchanged."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def f(t: pa.Table) -> pa.Table:
        full = pc.binary_join_element_wise(
            pc.coalesce(t["source"], pa.scalar("nan")),
            pc.coalesce(pc.cast(t["text"], pa.string()), pa.scalar("nan")),
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "fulltext": full})

    return ds.map_batches(f, batch_format="pyarrow")


def normalize_urls_docs(sf_dir: str):
    """URL canonicalization (``stages/urlnorm.py``): messy crawl URLs are
    synthesized deterministically from doc_id (mixed-case authority,
    default port, tracking params, fragment) on BOTH sides, and only the
    Ray side runs the normalizer kernel — the oracle re-derives the
    normalization with the same RE2 rule list via ``oracle_sql_expr``."""
    from dedup_ray.stages.urlnorm import normalize_urls

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        d = pc.cast(t["doc_id"], pa.string())
        m13 = pa.array((ids % 13).astype(str))
        m3 = pa.array((ids % 3).astype(str))
        m5 = pa.array((ids % 5).astype(str))
        url = pc.binary_join_element_wise(
            "HTTPS://Site", m13, ".Example.COM:443/p/", d,
            "/?utm_source=feed&utm_campaign=c", m3, "&id=", d,
            "&fbclid=x#s", m5, "",
        )
        return pa.table({"doc_id": t["doc_id"], "url": url})

    return normalize_urls(ds.map_batches(mk, batch_format="pyarrow"))


def bpe_token_counts_docs(sf_dir: str):
    """Token counting for LLM-data budgeting: whitespace tokens + BPE-ish
    pre-tokenizer matches per document (``stages/textstats.py::
    bpe_token_counts``; RE2 kernel shared verbatim with the oracle)."""
    from dedup_ray.stages.textstats import bpe_token_counts

    return bpe_token_counts(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def ngram_jaccard_pairs(sf_dir: str):
    """n-gram Jaccard near-dup detection: within-source doc pairs scored by
    Jaccard of distinct word-3-gram sets, kept at >= 0.05.  The exact
    small-scale oracle of what MinHash estimates at scale (SURVEY.md §2.5
    note); the 3-gram is the same shingle unit the signer hashes."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        ids = g["doc_id"].tolist()
        grams: list[set] = []
        for t in g["text"]:
            toks = [w for w in (t or "").split(" ") if w != ""]
            grams.append(
                {
                    " ".join(toks[i : i + 3])
                    for i in range(len(toks) - 2)
                }
            )
        i1, i2, jac = [], [], []
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                inter = len(grams[a] & grams[b])
                if not inter:
                    continue
                j = inter / (len(grams[a]) + len(grams[b]) - inter)
                if j >= 0.05:
                    i1.append(ids[a])
                    i2.append(ids[b])
                    jac.append(round(j, 6))
        return pd.DataFrame(
            {"id1": i1, "id2": i2, "jaccard": pd.Series(jac, dtype="float64")}
        )

    return as_arrow(ds.groupby("source").map_groups(gen, batch_format="pandas"))


# --------------------------------------------------------------------------
# Web-corpus cleaning family (stages/webclean.py): C4-style line dedup,
# PII redaction, Gopher-style repetition screen, benchmark decontamination,
# host-level crawl stats
# --------------------------------------------------------------------------

def line_dedup_docs(sf_dir: str):
    """C4-style line-level exact dedup: documents explode into fixed
    12-token lines; a line is kept only at its globally-first occurrence
    (min ``(doc_id, line_no)`` over identical line text).  Explode is a
    pure map; the dedup is one int64-keyed exchange on the line hash."""
    from dedup_ray.stages.webclean import explode_token_lines, line_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return line_dedup(explode_token_lines(ds))


HB_HEADER = "home about contact login search news shop blog help faq nav hub"


def host_boilerplate_docs(sf_dir: str):
    """Per-host boilerplate line removal (RefinedWeb doctrine): a line
    occurring in >= 3 distinct documents of one host is site furniture and
    is scrubbed from every document of that host.  Hosts synthesized as
    ``site<doc_id%13>.example.com``; a host-specific 12-token nav header
    is prepended so each host shares an aligned boilerplate line 0, which
    the operator must remove while keeping the content lines.  One line-hash
    exchange for the per-(host, line) distinct-doc census + one id-keyed
    exchange to rebuild text (``stages/webclean.py::host_boilerplate_removal``)."""
    from dedup_ray.stages.webclean import host_boilerplate_removal

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m13 = pa.array((ids % 13).astype(str))
        host = pc.binary_join_element_wise("site", m13, ".example.com", "")
        txt = pc.coalesce(t["text"], pa.scalar(""))
        text = pc.binary_join_element_wise(HB_HEADER, m13, " ", txt, "")
        return pa.table({"doc_id": t["doc_id"], "host": host, "text": text})

    return host_boilerplate_removal(
        ds.map_batches(mk, batch_format="pyarrow"), min_docs=3
    )


INTRADOC_TAIL = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lambda")  # 11 filler tokens; 'rep<h>' makes 12


def intradoc_dedup_docs(sf_dir: str):
    """Within-document repeated-line removal — the shuffle-free member of
    the line-dedup family (global: ``line_dedup_docs``; per-host:
    ``host_boilerplate_docs``).  A doc-dependent 12-token header is
    prepended TWICE so line 0 == line 1 inside every document; the
    operator must drop the repeat and keep everything else, entirely
    inside ``map_batches`` (``stages/webclean.py::intradoc_line_dedup``)."""
    from dedup_ray.stages.webclean import intradoc_line_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m7 = pa.array((ids % 7).astype(str))
        txt = pc.coalesce(t["text"], pa.scalar(""))
        hdr = pc.binary_join_element_wise(
            "rep", m7, " " + INTRADOC_TAIL + " ", "")
        text = pc.binary_join_element_wise(hdr, hdr, txt, "")
        return pa.table({"doc_id": t["doc_id"], "text": text})

    return intradoc_line_dedup(ds.map_batches(mk, batch_format="pyarrow"))


def redact_pii_docs(sf_dir: str):
    """PII redaction over synthesized contact-laden pages: the RE2 rule
    list (``stages/webclean.py::PII_RULES``) drives BOTH the Arrow kernel
    and the generated DuckDB oracle; counts are taken per rule in
    application order."""
    from dedup_ray.stages.webclean import redact_pii

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        d = pc.cast(t["doc_id"], pa.string())
        m7 = pa.array((ids % 7).astype(str))
        phone_full = pc.binary_join_element_wise(
            " call +1-", pa.array((300 + ids % 700).astype(str)),
            "-", pa.array((100 + ids % 900).astype(str)),
            "-", pa.array((1000 + ids % 9000).astype(str)), "",
        )
        phone = pc.if_else(
            pa.array(ids % 3 == 0), phone_full, pa.scalar("")
        )
        ip_full = pc.binary_join_element_wise(
            " from 10.", pa.array((ids % 256).astype(str)),
            ".", pa.array((ids % 200).astype(str)),
            ".", pa.array((ids % 250).astype(str)), "",
        )
        ip = pc.if_else(pa.array(ids % 4 == 0), ip_full, pa.scalar(""))
        text = pc.binary_join_element_wise(
            t["text"], " contact user", d, "@Example", m7, ".COM now", ""
        )
        text = pc.binary_join_element_wise(text, phone, ip, "")
        return pa.table({"doc_id": t["doc_id"], "text": text})

    return redact_pii(ds.map_batches(mk, batch_format="pyarrow")).map_batches(
        lambda t: t.drop_columns(["text"]), batch_format="pyarrow"
    )


def repetition_quality_docs(sf_dir: str):
    """Gopher-style per-document repetition/quality screen: word count,
    mean word length, duplicate-2-gram occurrence fraction, top-token
    share, and the composite keep flag — all computed batch-locally with
    no shuffle (``stages/webclean.py::repetition_quality``)."""
    from dedup_ray.stages.webclean import repetition_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return repetition_quality(ds)


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: docs with ``doc_id % 50 == 0`` form the
    held-out set; every other (training) doc is flagged if it shares any
    8-token gram with it.  Benchmark gram hashes broadcast once via
    ``ray.put``; the train sweep is ``np.isin`` per batch."""
    from dedup_ray.stages.webclean import (
        benchmark_gram_set,
        decontaminate,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(is_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
            return t.filter(pa.array(m if is_bench else ~m))

        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    grams_ref = benchmark_gram_set(bench)
    return decontaminate(train, grams_ref)


def host_page_stats(sf_dir: str):
    """Host-level crawl statistics: pages per host and the exact-dup rate
    within each host (1 − distinct digests / pages).  URLs synthesized
    deterministically on both sides; host extraction shares the
    ``stages/urlnorm.py`` kernel with the canonicalizer."""
    from dedup_ray.stages.urlnorm import extract_host_array
    from dedup_ray.util.dsutil import partitioned_group_apply
    from dedup_ray.util.hashing import content_digest

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        url = pc.binary_join_element_wise(
            "HTTPS://Site",
            pa.array((t["doc_id"].to_numpy(zero_copy_only=False) % 13)
                     .astype(str)),
            ".Example.COM:443/p/", pc.cast(t["doc_id"], pa.string()), "",
        )
        dg = content_digest(t["text"].to_pylist(), algo="md5")
        return pa.table({
            "host": extract_host_array(url),
            "digest": pa.array(dg, pa.string()),
        })

    def agg(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("host", sort=False).agg(
            n_pages=("digest", "size"), n_distinct=("digest", "nunique")
        ).reset_index()
        g["dup_rate"] = (1.0 - g["n_distinct"] / g["n_pages"]).round(6)
        return g

    pages = ds.map_batches(mk, batch_format="pyarrow")
    return partitioned_group_apply(pages, ["host"], agg, num_partitions=8)


def host_links_docs(sf_dir: str):
    """Host-level link graph: three ``<a href>`` links synthesized into
    every page's markup (targets ``site<(doc_id+k)%13>`` for k=1..3),
    extracted by the vectorized split kernel
    (``stages/urlnorm.py::extract_links``), reduced to
    ``(src_host, dst_host, n_links)`` edge weights — per-batch partial
    counts shrink the stream before ONE narrow (src, dst)-keyed exchange.
    The oracle replays extraction with ``regexp_extract_all`` and host
    parsing with the regex the engine's host kernel uses."""
    from dedup_ray.stages.urlnorm import extract_host_array, extract_links
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        d = pc.cast(t["doc_id"], pa.string())
        txt = pc.coalesce(t["text"], pa.scalar(""))
        for k in (1, 2, 3):
            txt = pc.binary_join_element_wise(
                txt, ' <a href="http://site',
                pa.array(((ids + k) % 13).astype(str)),
                ".example.com/p", d, '">x</a>', "",
            )
        src = pc.binary_join_element_wise(
            "site", pa.array((ids % 13).astype(str)), ".example.com", "")
        return pa.table({"src_host": src, "text": txt})

    links = extract_links(ds.map_batches(mk, batch_format="pyarrow"),
                          carry_col="src_host")

    def partial(t: pa.Table) -> pa.Table:
        href = t["href"]
        if isinstance(href, pa.ChunkedArray):
            href = href.combine_chunks()
        e = pa.table({"src_host": t["src_host"],
                      "dst_host": extract_host_array(href)})
        g = e.group_by(["src_host", "dst_host"]).aggregate([([], "count_all")])
        return g.rename_columns(["src_host", "dst_host", "c"])

    def finish(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"src_host": pa.array([], pa.string()),
                             "dst_host": pa.array([], pa.string()),
                             "n_links": pa.array([], pa.int64())})
        g = part.group_by(["src_host", "dst_host"]).aggregate([("c", "sum")])
        return pa.table({"src_host": g["src_host"],
                         "dst_host": g["dst_host"],
                         "n_links": pc.cast(g["c_sum"], pa.int64())})

    partials = links.map_batches(partial, batch_format="pyarrow")
    return exchange_group_apply(partials, ["src_host", "dst_host"], finish,
                                num_partitions=8)


def curate_docs(sf_dir: str):
    """End-to-end corpus curation (``pipelines/curate.py``): Gopher-style
    quality screen → PII redaction → C4-style line dedup → document
    reassembly.  Four deterministic stages, two narrow-key exchanges; the
    oracle re-derives the whole chain in SQL."""
    from dedup_ray.pipelines.curate import curate_pipeline

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return curate_pipeline(docs)


def salted_stats_events(sf_dir: str):
    """Grouped event statistics computed through the SALTED two-phase plan
    (``util/salted.py``): rows shard over (key, salt) first, shard partials
    merge on the key alone — a hot event_type never converges on one
    reducer.  Oracle: the plain SQL groupby (results identical)."""
    from dedup_ray.util.salted import salted_group_agg

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = salted_group_agg(
        ds, ["event_type"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum"),
         "min_value": ("value", "min"), "max_value": ("value", "max")},
        salt=8,
    )

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pc.round(t["sum_value"], ndigits=2),
            "min_value": pc.round(t["min_value"], ndigits=6),
            "max_value": pc.round(t["max_value"], ndigits=6),
        })

    return out.map_batches(fmt, batch_format="pyarrow")


def media_pipeline_docs(sf_dir: str):
    """Multimodal plumbing, driver-checked: per doc a raw-RGB image, a raw
    video and an int16 PCM audio payload are synthesized deterministically
    (sizes are pure functions of doc_id, payload bytes are zeros); the REAL
    actor-pool stages (``stages/multimodal.py``: nearest-neighbor resize,
    every-Nth frame fan-out, fixed windowing) run over the binary columns,
    and the oracle recomputes every size/count arithmetically.  Counts are
    Ray groupbys; the three per-doc aggregates combine via ``hash_join``,
    never a driver merge."""
    from dedup_ray.stages.multimodal import (
        VideoFrameSample,
        resize_images,
        window_audio,
    )
    from dedup_ray.util.dsutil import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_img(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        w = (4 + ids % 5).astype(np.int32)
        h = (3 + ids % 4).astype(np.int32)
        return pa.table({
            "media_id": pc.cast(t["doc_id"], pa.string()),
            "payload": pa.array([bytes(int(a * b) * 3) for a, b in zip(w, h)],
                                pa.binary()),
            "width": pa.array(w), "height": pa.array(h),
            "media_type": pa.array(["image/raw-rgb"] * len(ids)),
        })

    def mk_vid(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nf = (2 + ids % 6).astype(np.int32)
        return pa.table({
            "media_id": pc.cast(t["doc_id"], pa.string()),
            "payload": pa.array([bytes(int(k) * 12) for k in nf],
                                pa.binary()),
            "width": pa.array(np.full(len(ids), 2, np.int32)),
            "height": pa.array(np.full(len(ids), 2, np.int32)),
            "n_frames": pa.array(nf),
        })

    def mk_aud(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ns = 700 + ids % 600
        return pa.table({
            "media_id": pc.cast(t["doc_id"], pa.string()),
            "payload": pa.array([bytes(int(k) * 2) for k in ns],
                                pa.binary()),
        })

    resized = resize_images(
        docs.map_batches(mk_img, batch_format="pyarrow"), 4, 4
    ).map_batches(
        lambda t: pa.table({
            "media_id": t["media_id"],
            "img_out_bytes": pc.cast(
                pc.binary_length(t["payload"]), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    frames = docs.map_batches(mk_vid, batch_format="pyarrow").map_batches(
        VideoFrameSample, fn_constructor_kwargs={"every": 2},
        batch_format="pyarrow", concurrency=2, batch_size=64,
    ).groupby("media_id").count().map_batches(
        lambda t: pa.table({
            "media_id": t["media_id"],
            "n_sampled_frames": pc.cast(t["count()"], pa.int64()),
        }),
        batch_format="pyarrow",
    )
    wins = window_audio(
        docs.map_batches(mk_aud, batch_format="pyarrow"), 256
    ).groupby("media_id").count().map_batches(
        lambda t: pa.table({
            "media_id": t["media_id"],
            "n_audio_windows": pc.cast(t["count()"], pa.int64()),
        }),
        batch_format="pyarrow",
    )
    joined = hash_join(
        hash_join(
            resized, frames, "media_id",
            ["media_id", "img_out_bytes"],
            ["media_id", "n_sampled_frames"],
            num_partitions=8,
        ),
        wins, "media_id",
        ["media_id", "img_out_bytes", "n_sampled_frames"],
        ["media_id", "n_audio_windows"],
        num_partitions=8,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df["media_id"].astype("int64")
        return pd.DataFrame({
            "doc_id": d,
            "img_in_bytes": ((4 + d % 5) * (3 + d % 4) * 3).astype("int64"),
            "img_out_bytes": df["img_out_bytes"].astype("int64"),
            "n_frames": (2 + d % 6).astype("int64"),
            "n_sampled_frames": df["n_sampled_frames"].astype("int64"),
            "n_audio_windows": df["n_audio_windows"].astype("int64"),
        })

    return joined.map_batches(final, batch_format="pandas")


def avi_frames_docs(sf_dir: str):
    """REAL video-container decode, driver-checked: per doc an actual AVI
    file (RIFF 'AVI ', uncompressed 24-bit DIB — ``codecs.avi_encode``) is
    synthesized with dimensions/frame counts that are pure functions of
    doc_id, the ``backend='avi'`` actor-pool stage decodes the container
    and samples every 2nd frame, and the oracle predicts every count and
    byte size arithmetically — so a decode error (wrong stride handling,
    header misparse, dropped frame) surfaces as a value mismatch."""
    from dedup_ray.stages.codecs import avi_encode
    from dedup_ray.stages.multimodal import sample_video_frames

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_avi(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nf = (2 + ids % 6).astype(np.int64)
        w = (2 + ids % 3).astype(np.int64)   # odd widths hit stride padding
        h = (2 + ids % 2).astype(np.int64)
        payloads = [
            avi_encode(np.zeros((int(f), int(hh), int(ww), 3), np.uint8))
            for f, hh, ww in zip(nf, h, w)
        ]
        return pa.table({
            "media_id": pc.cast(t["doc_id"], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
        })

    frames = sample_video_frames(
        docs.map_batches(mk_avi, batch_format="pyarrow"),
        every=2, concurrency=2, batch_size=64, backend="avi",
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "b": pc.cast(pc.binary_length(t["payload"]), pa.int64()),
        })

    agg = frames.map_batches(partial, batch_format="pyarrow") \
        .groupby("media_id").sum(["n", "b"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df["media_id"].astype("int64")
        return pd.DataFrame({
            "doc_id": d,
            "n_sampled_frames": df["sum(n)"].astype("int64"),
            "frame_bytes": ((2 + d % 3) * (2 + d % 2) * 3).astype("int64"),
            "sampled_bytes": df["sum(b)"].astype("int64"),
        })

    return agg.map_batches(final, batch_format="pandas")


SKEWJOIN_HOT_ROWS = 2_000


def skew_join_events(sf_dir: str):
    """Hot-key-aware join (``ops/relational.py::skew_inner_join``): a
    synthesized viral key (``user_id % 10 < 7 → hub 0``, so one key holds
    ~70%% of events) joins a per-(hub, event_type) dimension built from
    the same table.  The census finds hub 0 hot, routes it through the
    salted-replication path while the cold hubs take the plain
    co-partitioning join, and the rolled-up output must equal the plain
    SQL join — the skew machinery is observable only as load balance,
    never in values."""
    from dedup_ray.ops.relational import skew_inner_join

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def hubify(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        m = u % 10
        return pa.table({
            "hub": pa.array(np.where(m < 7, 0, m), pa.int64()),
            "event_type": t["event_type"],
            "value": t["value"],
        })

    # materialized ONCE: the census, the hot/cold splits and the dim all
    # re-read this table (tiny here; at scale it is the signature-table
    # pattern — one materialize amortized over every downstream pass)
    left = ds.map_batches(hubify, batch_format="pyarrow").materialize()
    dim = left.map_batches(
        lambda t: pa.table({"hub": t["hub"],
                            "event_type": t["event_type"]}),
        batch_format="pyarrow",
    ).groupby(["hub", "event_type"]).count().map_batches(
        lambda t: pa.table({
            "hub": t["hub"],
            "dim_type": t["event_type"],
            "type_n": pc.cast(t["count()"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()  # consumed by both the cold split and the hot replicate
    joined = skew_inner_join(
        left, dim, "hub",
        ["hub", "event_type", "value"], ["hub", "dim_type", "type_n"],
        hot_row_threshold=SKEWJOIN_HOT_ROWS, salt=4, num_partitions=8,
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("hub").aggregate(
            [([], "count_all"), ("type_n", "sum"), ("value", "sum")]
        )
        return pa.table({
            "hub": g["hub"], "n": g["count_all"],
            "tn": g["type_n_sum"], "v": g["value_sum"],
        })

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("hub").sum(["n", "tn", "v"])
    return agg.map_batches(
        lambda t: pa.table({
            "hub": t["hub"],
            "joined_rows": pc.cast(t["sum(n)"], pa.int64()),
            "type_n_total": pc.cast(t["sum(tn)"], pa.int64()),
            "value_total": pc.round(t["sum(v)"], 3),
        }),
        batch_format="pyarrow",
    )


PUSHDOWN_PRICE = 200_000.0
FULLOUTER_MIN = 9
DSIR_TARGET_LANG = "en"


EDIT_CAP = 10


def jsonl_roundtrip_docs(sf_dir: str):
    """JSONL sink→source round trip (the interchange format web corpora
    ship in): documents write to line-delimited JSON under /tmp and read
    back through ``read_json``; the check is content-preserving
    transport — per doc the round-tripped text's length and first token
    must equal the original's (computed AFTER the round trip, so any
    escaping/encoding defect in either direction surfaces as a value
    mismatch against the parquet-derived oracle)."""
    import shutil
    import tempfile

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    root = tempfile.mkdtemp(prefix="jsonl-", dir="/tmp")
    try:
        ds.write_json(root)
        back = ray.data.read_json(root)

        def verify(t: pa.Table) -> pa.Table:
            txt = pc.coalesce(t["text"], pa.scalar("", t["text"].type))
            first = pc.list_element(pc.split_pattern(txt, " "), 0)
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_chars_rt": pc.cast(pc.utf8_length(txt), pa.int64()),
                "first_token": first,
            })

        out = back.map_batches(verify, batch_format="pyarrow")
        # materialize before the tempdir vanishes (lazy reads hold paths)
        return out.materialize()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def edit_distance_parts(sf_dir: str):
    """Vectorized edit-distance pair feature (``stages/textstats.py::
    levenshtein_batch``): within each brand block, the ``EDIT_CAP``
    smallest part keys pair up (deterministic cap = the bounded-block
    discipline every P1-family operator uses) and one batched DP scores
    all pairs in lockstep — numpy across the pair axis, no per-pair
    Python.  The classic record-linkage similarity for typo'd
    venue/author/product strings; DuckDB's native ``levenshtein()`` is
    the oracle."""
    from dedup_ray.stages.textstats import levenshtein_batch

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("p_partkey").head(EDIT_CAP)
        recs = list(zip(df["p_partkey"], df["p_name"]))
        rows = [
            (df["p_brand"].iloc[0], k1, k2, n1, n2)
            for i, (k1, n1) in enumerate(recs)
            for k2, n2 in recs[i + 1 :]
        ]
        out = pd.DataFrame(
            rows, columns=["p_brand", "k1", "k2", "n1", "n2"])
        if len(out):
            out["dist"] = levenshtein_batch(
                out["n1"].tolist(), out["n2"].tolist())
        else:
            out["dist"] = pd.Series([], dtype="int64")
        return out[["p_brand", "k1", "k2", "dist"]]

    return as_arrow(
        ds.groupby("p_brand").map_groups(pairs, batch_format="pandas")
    )


def hll_user_registers_events(sf_dir: str):
    """Per-GROUP HLL distinct sketch (``stages/sketch.py::
    hll_grouped_registers``): distinct users per event type as md5
    register rows — every group costs ≤256 register rows regardless of
    its cardinality (the fixed-memory answer to "distinct users per
    host" over a 100-TB crawl), merged by one grouped MAX.  The oracle
    rebuilds every register from ``md5(user_id)`` alone."""
    from dedup_ray.stages.sketch import hll_grouped_registers

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    out = hll_grouped_registers(ds, "event_type", "user_id")
    return out.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "idx": pc.cast(t["idx"], pa.int64()),
            "rho": pc.cast(t["rho"], pa.int64()),
        }),
        batch_format="pyarrow",
    )
KCORE_K, KCORE_ROUNDS, KCORE_CLIQUE_STEP = 3, 6, 50


def k_core_docs(sf_dir: str):
    """Distributed k-core peeling (``ops/graph.py::k_core``) over a
    derived doc graph: the binary tree ``(doc_id, doc_id//2)`` (tendrils
    that peel) plus a clique over every ``doc_id %% 50 == 0`` node (the
    dense backbone that survives k=3).  Bounded peeling: both engines
    run exactly ``KCORE_ROUNDS`` rounds — a removal-free round makes all
    later rounds no-ops, so early kernel convergence and the oracle's
    fixed unroll produce the identical edge set by construction."""
    from dedup_ray.ops.graph import k_core

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def tree(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ids = ids[ids >= 1]
        return pa.table({"a": pa.array(ids, pa.int64()),
                         "b": pa.array(ids // 2, pa.int64())})

    def hub_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[ids % KCORE_CLIQUE_STEP == 0], pa.int64())
        })

    # bounded driver collect: n_docs / KCORE_CLIQUE_STEP hub ids
    hubs = sorted(
        r["doc_id"]
        for r in docs.map_batches(hub_filter,
                                  batch_format="pyarrow").take_all()
    )
    clique = pa.table({
        "a": pa.array([x for i, x in enumerate(hubs)
                       for _ in hubs[i + 1:]], pa.int64()),
        "b": pa.array([y for i, x in enumerate(hubs)
                       for y in hubs[i + 1:]], pa.int64()),
    })
    edges = docs.map_batches(tree, batch_format="pyarrow").union(
        ray.data.from_arrow(clique))
    core = k_core(edges, k=KCORE_K, max_rounds=KCORE_ROUNDS,
                  num_partitions=8)
    return core.sort(["a", "b"])


def dsir_llr_docs(sf_dir: str):
    """DSIR importance scores (``stages/selection.py::dsir_logratio``,
    Xie et al. 2023): every document scored by the log-likelihood ratio
    of its md5-bucketed tokens under the English-subset target
    distribution vs the whole corpus — two driver-bounded histogram
    passes (4096 ints each) + one broadcast score pass, zero shuffles.
    Oracle rebuilds the identical buckets (first 3 hex digits of
    md5(token)) and smoothed ratios in SQL."""
    from dedup_ray.stages.selection import dsir_logratio

    corpus = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    target = corpus.map_batches(
        lambda t: t.filter(
            pc.equal(t["lang"], DSIR_TARGET_LANG)
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    return dsir_logratio(
        corpus.map_batches(lambda t: t.select(["doc_id", "text"]),
                           batch_format="pyarrow"),
        target,
    )
def perplexity_docs(sf_dir: str):
    """Hashed-unigram LM perplexity (``stages/selection.py::
    unigram_perplexity``, CCNet quality-signal shape): one
    driver-bounded histogram pass fits the smoothed bucket LM, one
    broadcast pass scores every doc's mean negative log prob and
    perplexity.  Zero shuffles; oracle replays buckets and formula."""
    from dedup_ray.stages.selection import unigram_perplexity

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return unigram_perplexity(ds)


BM25_TERMS = ["shuffle", "spark", "vector"]
BM25_K, BM25_K1, BM25_B = 25, 1.2, 0.75


def bm25_topk_docs(sf_dir: str):
    """Distributed BM25 retrieval (``ops/retrieval.py::bm25_topk``):
    top-25 documents for a three-term query — stats pass (df/avgdl
    partials, driver state = len(query)+2 scalars), broadcast idf,
    vectorized scoring with batch-local top-k so the final sort moves at
    most k×n_blocks rows.  The oracle unrolls the identical formula over
    the token explode; both engines rank on the 6-decimal-rounded score
    with doc-id tie-breaks, so the comparison is association-proof."""
    from dedup_ray.ops.retrieval import bm25_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(ds, BM25_TERMS, k=BM25_K, k1=BM25_K1, b=BM25_B)


def full_outer_counts_events(sf_dir: str):
    """Full outer join through the co-partitioning ``hash_join`` (the
    ``how`` surface pandas gives every partition merge): heavy clickers
    vs heavy purchasers per user — users appearing on either side
    survive with typed nulls coalesced to 0 on the absent side.  One
    shuffle; the oracle is DuckDB's native FULL OUTER JOIN."""
    from dedup_ray.util.dsutil import hash_join

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def side(ev: str, out: str):
        return ds.map_batches(
            lambda t, ev=ev: t.filter(pc.equal(t["event_type"], ev)),
            batch_format="pyarrow",
        ).groupby("user_id").count().map_batches(
            lambda t, out=out: pa.table({
                "user_id": t["user_id"],
                out: pc.cast(t["count()"], pa.int64()),
            }).filter(pc.greater_equal(t["count()"],
                                       pa.scalar(FULLOUTER_MIN))),
            batch_format="pyarrow",
        )

    joined = hash_join(
        side("click", "clicks"), side("purchase", "purchases"),
        "user_id", ["user_id", "clicks"], ["user_id", "purchases"],
        num_partitions=8, how="outer",
    )
    return joined.map_batches(
        lambda df: pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "clicks": df["clicks"].fillna(0).astype("int64"),
            "purchases": df["purchases"].fillna(0).astype("int64"),
        }),
        batch_format="pandas",
    )


def bloom_semi_lineitem(sf_dir: str):
    """Bloom-prefiltered semi join (``ops/relational.py::
    bloom_semi_join``): lineitems of expensive orders, with the order-key
    side streamed into a fixed-size Bloom (driver memory = filter size
    regardless of key count), the big side pruned BEFORE the shuffle
    (no false negatives → no lost rows) and an exact partitioned semi
    join killing the false positives.  Output equals the plain semi
    join; rolled up per return flag."""
    from dedup_ray.ops.relational import bloom_semi_join

    line = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_returnflag", "l_quantity"])
    keys = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"],
        filter=(pc.field("o_totalprice") > PUSHDOWN_PRICE),
    ).map_batches(
        lambda t: pa.table({"l_orderkey": t["o_orderkey"]}),
        batch_format="pyarrow",
    )
    kept = bloom_semi_join(line, keys, "l_orderkey",
                           ["l_orderkey", "l_returnflag", "l_quantity"],
                           bits_log2=16, num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_returnflag").aggregate(
            [([], "count_all"), ("l_quantity", "sum")]
        )
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "n": g["count_all"], "q": g["l_quantity_sum"],
        })

    agg = as_arrow(kept).map_batches(partial, batch_format="pyarrow") \
        .groupby("l_returnflag").sum(["n", "q"])
    return agg.map_batches(
        lambda t: pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pc.cast(t["sum(n)"], pa.int64()),
            "sum_qty": pc.round(t["sum(q)"], 2),
        }),
        batch_format="pyarrow",
    )


def pushdown_read_orders(sf_dir: str):
    """Predicate + projection pushdown AT THE READ: the price filter is
    handed to the PyArrow scanner inside ``read_parquet`` (row-group
    statistics prune storage I/O before any block reaches the object
    store — the 100-TB discipline of never shipping bytes a WHERE clause
    already excludes) and only three columns leave the file.  Downstream
    is one narrow grouped aggregate."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
        filter=(pc.field("o_totalprice") > PUSHDOWN_PRICE),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate(
            [("o_orderkey", "count"), ("o_totalprice", "sum")]
        )
        return pa.table({
            "o_orderpriority": g["o_orderpriority"],
            "n": g["o_orderkey_count"],
            "total": g["o_totalprice_sum"],
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority").sum(["n", "total"])
    return agg.map_batches(
        lambda t: pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "n": pc.cast(t["sum(n)"], pa.int64()),
            "total": pc.round(t["sum(total)"], 2),
        }),
        batch_format="pyarrow",
    )


def route_media_docs(sf_dir: str):
    """The multimodal router end to end (``stages/multimodal.py::
    route_media``): per doc a REAL container is synthesized — doc_id%%5
    picks PNG / JPEG / WAV / AVI / plain bytes, with dimensions that are
    pure functions of doc_id — and the router must sniff the magic,
    parse the container with the matching codec, and report dimensions
    read from INSIDE it (decoded array shapes, sample counts, frame
    counts).  The oracle predicts every type and dimension
    arithmetically, so a mis-route or header misparse fails values, not
    just a label."""
    from dedup_ray.stages.codecs import (
        avi_encode,
        jpeg_encode,
        png_encode,
        wav_encode,
    )
    from dedup_ray.stages.multimodal import route_media

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for d in ids:
            m = int(d) % 5
            w, h = 3 + int(d) % 4, 2 + int(d) % 3
            if m == 0:
                payloads.append(png_encode(np.zeros((h, w, 3), np.uint8)))
            elif m == 1:
                payloads.append(jpeg_encode(np.zeros((h, w, 3), np.uint8)))
            elif m == 2:
                n = 500 + int(d) % 300
                payloads.append(wav_encode(np.zeros(n, np.int16), 8000))
            elif m == 3:
                nf = 2 + int(d) % 4
                payloads.append(
                    avi_encode(np.zeros((nf, h, w, 3), np.uint8)))
            else:
                payloads.append(b"plain text payload %d" % int(d))
        return pa.table({
            "media_id": pc.cast(t["doc_id"], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    routed = route_media(docs.map_batches(mk, batch_format="pyarrow"),
                         concurrency=2, batch_size=128)
    return routed.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["media_id"], pa.int64()),
            "content_type": t["content_type"],
            "dim1": t["dim1"], "dim2": t["dim2"],
        }),
        batch_format="pyarrow",
    )


def jpeg_roundtrip_docs(sf_dir: str):
    """REAL baseline-JPEG codec, driver-checked as a planted-truth
    scorecard: per doc a deterministic gradient image (dims pure
    functions of doc_id) is encoded at quality 100 — even doc_ids 4:4:4,
    odd ones 4:2:0 with restart markers — decoded back through
    ``codecs.jpeg_decode`` in an actor-pool stage, and the VERIFIABLE
    CLAIM is the reconstruction bound: max per-channel error ≤2 for
    4:4:4 (pure DCT rounding) and ≤32 for 4:2:0 (2×2 chroma averaging
    across a steep gradient step, amplified ≤1.772× by YCbCr→RGB;
    measured worst case over every dim combo here is 23).
    The oracle predicts dims arithmetically and asserts the bound holds
    for every row, so any decode defect (Huffman desync, wrong
    upsampling, restart mishandling) flips ``ok`` and fails the hash."""
    from dedup_ray.stages.codecs import jpeg_decode, jpeg_encode

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    class RoundTrip:
        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            ok = np.zeros(len(ids), bool)
            ws = (9 + ids % 8).astype(np.int64)
            hs = (9 + ids % 5).astype(np.int64)
            for i, (d, w, h) in enumerate(zip(ids, ws, hs)):
                x = np.linspace(0, 255, int(w))
                y = np.linspace(0, 255, int(h))
                img = np.stack([
                    np.add.outer(y, x) / 2, np.tile(x, (int(h), 1)),
                    np.tile(y[:, None], (1, int(w))),
                ], -1).astype(np.uint8)
                sub = bool(d % 2)
                data = jpeg_encode(img, quality=100, subsample=sub,
                                   restart_interval=2 if sub else 0)
                out = jpeg_decode(data)
                err = np.abs(out.astype(np.float64) - img).max()
                ok[i] = err <= (32.0 if sub else 2.0)
            return pa.table({
                "doc_id": t["doc_id"],
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "ok": pa.array(ok),
            })

    return docs.map_batches(RoundTrip, batch_format="pyarrow",
                            batch_size=128, concurrency=4)


def top_tokens_docs(sf_dir: str):
    """Corpus heavy hitters: top-20 tokens by frequency (ties broken by
    token).  Pre-aggregated inside each batch (np.unique partials), one
    small grouped sum, then a bounded sort+limit — the groupby payload is
    (token, partial_count) rows, never raw tokens."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        v, c = np.unique(
            np.asarray(toks.to_pylist(), dtype=object), return_counts=True
        )
        return pa.table({"token": pa.array(v, pa.string()),
                         "cnt": pa.array(c, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("cnt")
    top = agg.map_batches(
        lambda t: pa.table({"token": t["token"],
                            "n": pc.cast(t["sum(cnt)"], pa.int64())}),
        batch_format="pyarrow",
    ).sort(["n", "token"], descending=[True, False]).limit(20)
    return top


def hll_token_registers_docs(sf_dir: str):
    """Distinct-token HyperLogLog sketch (``stages/sketch.py``): the md5
    register layout makes the SKETCH ITSELF oracle-checkable — the DuckDB
    oracle recomputes every register from the data.  Per batch ≤256 partial
    rows leave the task; the merge is one tiny groupby-max."""
    from dedup_ray.stages.sketch import hll_token_registers

    return hll_token_registers(
        _read(sf_dir, "documents", columns=["text"])
    )


def cms_token_registers_docs(sf_dir: str):
    """Token-frequency Count-Min sketch (``stages/sketch.py``): like the
    HLL query, the register table ITSELF is the checked artifact — the
    DuckDB oracle recomputes every (hrow, bucket, cnt) register from
    md5(token) hex-digit pairs.  ≤1024 partial rows per batch, one grouped
    sum."""
    from dedup_ray.stages.sketch import cms_token_registers

    return cms_token_registers(_read(sf_dir, "documents", columns=["text"]))


SHUFFLE_SEED = 42


def shuffle_rank_docs(sf_dir: str):
    """Reproducible global training-order shuffle: rank = position in
    ``md5(doc_id:seed)`` order (``stages/ordering.py``, two-level scan —
    256 coarse key buckets, driver sees 256 counter rows, one exchange)."""
    from dedup_ray.stages.ordering import shuffle_rank

    return shuffle_rank(_read(sf_dir, "documents", columns=["doc_id"]),
                        seed=SHUFFLE_SEED)


PACK_BUDGET = 256


def pack_sequences_docs(sf_dir: str):
    """Sequence packing for LLM pretraining: documents laid out in doc_id
    order accumulate whitespace-token counts; each doc's training sequence
    is ``floor(tokens_before / budget)`` with its start offset inside the
    sequence.  Distributed two-level prefix scan
    (``stages/packing.py``): bucket-granular sums to the driver, one
    exchange for the within-bucket cumsum."""
    from dedup_ray.stages.packing import pack_sequences, token_counts

    counts = token_counts(_read(sf_dir, "documents",
                                columns=["doc_id", "text"]))
    return pack_sequences(counts, budget=PACK_BUDGET, bucket_width=64)


TOKEN_BUDGET = 15_000


def token_budget_select_docs(sf_dir: str):
    """Quality-ranked token-budget selection ("take the best B tokens"):
    keep documents in ``(score DESC, doc_id ASC)`` order while the running
    token total stays ≤ ``TOKEN_BUDGET`` — the budgeted-selection step of a
    pre-training recipe, = ``SUM(n_tokens) OVER (ORDER BY score DESC,
    doc_id) <= B`` in SQL, computed WITHOUT a global sort
    (``stages/ordering.py::token_budget_select``: per-distinct-score sums
    to the driver, boundary group tie-broken by id, broadcast filter).
    Score = distinct-token count (lexical diversity); tokens = non-empty
    whitespace tokens."""
    from dedup_ray.stages.ordering import token_budget_select
    from dedup_ray.util.hashing import stable64_array

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keepmask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n = t.num_rows
        p = parent[keepmask]
        n_tokens = np.bincount(p, minlength=n).astype(np.int64)
        words = flat.filter(pa.array(keepmask)).to_pylist()
        score = np.zeros(n, dtype=np.int64)
        if words:
            h = stable64_array(words, seed=0xB4D6).view(np.uint64)
            order = np.lexsort((h, p))
            ps, hs = p[order], h[order]
            newrun = np.r_[True, (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])]
            score = np.bincount(ps[newrun], minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "score": pa.array(score),
            "n_tokens": pa.array(n_tokens),
        })

    per_doc = ds.map_batches(feats, batch_format="pyarrow")
    return token_budget_select(per_doc, budget=TOKEN_BUDGET,
                               id_col="doc_id")


LANG_TOKEN_BUDGET = 3_000


def lang_token_budget_docs(sf_dir: str):
    """Stratified token-budget selection: the best ``LANG_TOKEN_BUDGET``
    tokens PER LANGUAGE (score = token count, preferring long documents),
    = ``SUM(n_tokens) OVER (PARTITION BY lang ORDER BY score DESC,
    doc_id) <= B``.  Same sort-free plan as ``token_budget_select_docs``
    keyed on (lang, score); the per-language budget is the standard
    multilingual-recipe shape (cap every language at the same token
    mass)."""
    from dedup_ray.stages.ordering import token_budget_select

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def feats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keepmask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_tokens = np.bincount(
            parent[keepmask], minlength=t.num_rows
        ).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "score": pa.array(n_tokens),
            "n_tokens": pa.array(n_tokens),
        })

    per_doc = ds.map_batches(feats, batch_format="pyarrow")
    return token_budget_select(per_doc, budget=LANG_TOKEN_BUDGET,
                               id_col="doc_id", group_col="lang")


QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def doc_length_quantiles(sf_dir: str):
    """Exact distributed quantiles of document length via value-count
    histogram: per-batch partial counts, one small grouped sum, driver-side
    cumsum over the DISTINCT LENGTH VALUES (bounded by max doc length, not
    corpus size).  Quantile definition: sorted[floor(q·(n−1))], computed in
    IEEE double on both sides."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t["n_chars"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"n_chars": pa.array(v, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    hist = as_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_chars").sum("cnt")
    ).to_pandas().sort_values("n_chars")
    vals = hist["n_chars"].to_numpy()
    cnt = hist["sum(cnt)"].to_numpy()
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    rows = []
    for q in QUANTILE_QS:
        idx = int(np.floor(np.float64(q) * (n - 1)))
        v = int(vals[np.searchsorted(cum, idx + 1)])
        rows.append((float(q), v))
    return pd.DataFrame({"q": [r[0] for r in rows],
                         "v": pd.Series([r[1] for r in rows], dtype="int64")})


def split_leakage_docs(sf_dir: str):
    """Train/test leakage audit: after keyed-md5 split assignment, find
    exact-text digests that straddle more than one split (copies
    synthesized for doc_id %% 5 == 0 so the check has signal).  Per-batch
    (digest, split) distinct partials, one digest-keyed exchange counting
    docs and distinct splits — the QA gate a recipe runs before
    training."""
    from dedup_ray.stages.mixing import split_assign
    from dedup_ray.util.exchange import exchange_group_apply
    from dedup_ray.util.hashing import content_digest

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def amplify(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = ids % 5 == 0
        dup = pa.table({
            "doc_id": pa.array(ids[m] + 100000),
            "text": t["text"].filter(pa.array(m)),
        })
        return pa.concat_tables([t.select(["doc_id", "text"]), dup])

    both = docs.map_batches(amplify, batch_format="pyarrow")
    assigned = split_assign(both, SPLIT_FRACTIONS, seed=SPLIT_SEED,
                            keep_cols=("text",))

    def partial(t: pa.Table) -> pa.Table:
        dg = content_digest(t["text"].to_pylist(), algo="md5")
        sp = t["split"].to_pylist()
        keys = np.array([f"{d}\x1f{s}" for d, s in zip(dg, sp)])
        u, c = np.unique(keys, return_counts=True)
        parts = np.char.partition(u, "\x1f")
        return pa.table({
            "dg": pa.array(parts[:, 0], pa.string()),
            "split": pa.array(parts[:, 2], pa.string()),
            "n": pa.array(c.astype(np.int64)),
        })

    def leaked(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"dg": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_splits": pa.array([], pa.int64())})
        dg = np.asarray(part["dg"].to_pylist(), object)
        sp = np.asarray(part["split"].to_pylist(), object)
        n = part["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sp, dg))
        dg, sp, n = dg[order], sp[order], n[order]
        # collapse per-batch partials: the same (dg, split) may arrive
        # from several batches and must count as ONE split
        pair_first = np.r_[True, (dg[1:] != dg[:-1]) | (sp[1:] != sp[:-1])]
        pid = np.cumsum(pair_first) - 1
        pair_n = np.zeros(pid[-1] + 1, np.int64)
        np.add.at(pair_n, pid, n)
        dg, sp, n = dg[pair_first], sp[pair_first], pair_n
        first = np.r_[True, dg[1:] != dg[:-1]]
        gid = np.cumsum(first) - 1
        n_docs = np.zeros(gid[-1] + 1, np.int64)
        np.add.at(n_docs, gid, n)
        n_splits = np.bincount(gid)  # rows now (dg, split)-distinct
        keep = n_splits >= 2
        return pa.table({
            "dg": pa.array(dg[first][keep], pa.string()),
            "n_docs": pa.array(n_docs[keep]),
            "n_splits": pa.array(n_splits[keep].astype(np.int64)),
        })

    return exchange_group_apply(
        assigned.map_batches(partial, batch_format="pyarrow"),
        "dg", leaked, 8)


DEBOUNCE_SEC = 3600


def debounce_events(sf_dir: str):
    """Event debounce dedup: drop an event when the PREVIOUS event of the
    same (user, type) — ordered by (ts, event_id) — is within 1 hour.
    One co-partitioning exchange on user_id; inside a partition the
    predicate is a vectorized lag over the lexsorted rows (== SQL
    ``lag(ts) OVER (PARTITION BY user_id, event_type
    ORDER BY ts, event_id)``)."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])

    def keep(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
            })
        eid = part["event_id"].to_numpy(zero_copy_only=False)
        uid = part["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(part["event_type"].to_pylist(), object)
        ts = pc.cast(part["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)  # epoch micros
        order = np.lexsort((eid, ts, et, uid))
        u, e, t2, i2 = uid[order], et[order], ts[order], eid[order]
        same = np.r_[False, (u[1:] == u[:-1]) & (e[1:] == e[:-1])]
        gap = np.r_[np.int64(0), t2[1:] - t2[:-1]]
        keep_m = ~same | (gap > DEBOUNCE_SEC * 1_000_000)
        sel = order[keep_m]
        return pa.table({
            "event_id": part["event_id"].take(pa.array(sel)),
            "user_id": part["user_id"].take(pa.array(sel)),
            "event_type": part["event_type"].take(pa.array(sel)),
        })

    return exchange_group_apply(ds, "user_id", keep, 16)


def scd2_intervals_events(sf_dir: str):
    """SCD2 dimension build (gaps-and-islands): per user, collapse
    consecutive runs of equal ``event_type`` — ordered by (ts, event_id)
    — into validity intervals ``[valid_from, valid_to)`` with
    ``valid_to`` = next island's start (epoch micros; NULL while
    current) and the run's event count.  The change-log → type-2
    dimension op of a lakehouse pipeline: one co-partitioning exchange
    on user_id, then a vectorized run-length pass per partition (no
    per-user dispatch)."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])

    def islands(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "valid_from": pa.array([], pa.int64()),
                "valid_to": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "is_current": pa.array([], pa.bool_()),
            })
        eid = part["event_id"].to_numpy(zero_copy_only=False)
        uid = part["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(part["event_type"].to_pylist(), object)
        ts = pc.cast(part["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u, e, t = uid[order], et[order], ts[order]
        new_island = np.r_[True, (u[1:] != u[:-1]) | (e[1:] != e[:-1])]
        starts = np.flatnonzero(new_island)
        ends = np.r_[starts[1:], len(u)]
        iu, ie = u[starts], e[starts]
        valid_from = t[starts]
        # next island of the SAME user starts this one's valid_to
        same_user_next = np.r_[iu[1:] == iu[:-1], False]
        valid_to = np.where(
            same_user_next, np.r_[valid_from[1:], np.int64(0)], np.int64(-1)
        )
        return pa.table({
            "user_id": pa.array(iu),
            "event_type": pa.array(ie, pa.string()),
            "valid_from": pa.array(valid_from),
            "valid_to": pa.array(
                np.where(valid_to < 0, 0, valid_to), pa.int64(),
                mask=valid_to < 0),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "is_current": pa.array(~same_user_next),
        })

    return exchange_group_apply(ds, "user_id", islands, 16)


STRAT_FRACTIONS = {"en": 0.3, "de": 1.0, "fr": 0.5, "es": 0.0}
STRAT_SEED = 77


def stratified_sample_docs(sf_dir: str):
    """Per-language deterministic downsampling ("keep 30%% of en, all of
    de, half of fr, drop es, drop unlisted"): keyed-md5 threshold per
    group, shuffle-free and append-stable
    (``stages/mixing.py::stratified_sample``)."""
    from dedup_ray.stages.mixing import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample(ds, STRAT_FRACTIONS, group_col="lang",
                             seed=STRAT_SEED)


def table_checksum_orders(sf_dir: str):
    """Order-insensitive table checksum over (o_orderkey, o_orderstatus)
    — the cross-engine audit primitive: per-row md5-prefix ints summed,
    independent of row order and partitioning
    (``util/dsutil.py::table_checksum``)."""
    from dedup_ray.util.dsutil import table_checksum

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    return table_checksum(ds, ["o_orderkey", "o_orderstatus"], seed=3)


def sniff_content_docs(sf_dir: str):
    """Magic-byte content-type sniffing over synthesized binary payloads
    (doc_id %% 5 selects PDF / DOCTYPE / html / xml / plain prefixes,
    same CASE in the oracle) rolled up to per-type counts — vectorized
    prefix compares on the Arrow binary buffer
    (``stages/multimodal.py::sniff_content_type``)."""
    from dedup_ray.stages.multimodal import sniff_content_type

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        prefix = np.array(["%PDF-1.7 ", "<!DOCTYPE html>", "<html lang=",
                           "<?xml version=", ""], dtype=object)[ids % 5]
        body = t["text"].to_pylist()
        payload = pa.array(
            [(p + (b or "")).encode() for p, b in zip(prefix, body)],
            pa.binary())
        return pa.table({"doc_id": t["doc_id"], "payload": payload})

    typed = sniff_content_type(ds.map_batches(mk, batch_format="pyarrow"))
    return typed.groupby("content_type").count().map_batches(
        lambda t: pa.table({"content_type": t["content_type"],
                            "n": pc.cast(t["count()"], pa.int64())}),
        batch_format="pyarrow",
    )


WSAMPLE_K, WSAMPLE_SEED = 50, 23


def weighted_sample_docs(sf_dir: str):
    """Weighted sampling without replacement (A-ES): top-50 docs by
    ``u^(1/n_chars)`` with keyed-md5 uniforms — longer docs
    proportionally likelier, reproducible from (id, seed, weight) alone
    (``stages/mixing.py::weighted_sample``)."""
    from dedup_ray.stages.mixing import weighted_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return weighted_sample(ds, WSAMPLE_K, "n_chars", seed=WSAMPLE_SEED)


PRUNED_LANGS = ["en", "de"]


def partitioned_io_docs(sf_dir: str):
    """Partitioned-write + partition-pruned read — the IO discipline a
    100-TB corpus lives by: write documents hive-partitioned by lang
    (``write_parquet(partition_cols=["lang"])``), then read back ONLY
    the ``lang=en`` / ``lang=de`` directories (directory-name pruning:
    bytes of other languages never leave storage) and aggregate.
    Round-trips through a fresh temp dir each call."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    out = tempfile.mkdtemp(prefix="pio_")
    try:
        docs = _read(sf_dir, "documents",
                     columns=["doc_id", "lang", "n_chars"])
        docs.write_parquet(out, partition_cols=["lang"])
        import ray.data

        per_lang = [ray.data.read_parquet(f"{out}/lang={lg}")
                    for lg in PRUNED_LANGS]
        pruned = per_lang[0]
        for dsl in per_lang[1:]:
            pruned = pruned.union(dsl)
        agg = pruned.groupby("lang").aggregate(
            _Count(alias_name="n_docs"),
            _Sum("n_chars", alias_name="sum_chars"),
        )
        return agg.map_batches(
            lambda t: pa.table({
                "lang": t["lang"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
            }),
            batch_format="pyarrow",
        ).materialize()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def union_evolve_docs(sf_dir: str):
    """Schema-evolution union: an old-generation slice (doc_id, text)
    unions with a new-generation slice (doc_id, text, lang) — missing
    columns become typed nulls, matching ``UNION ALL BY NAME``
    (``util/dsutil.py::union_evolve``)."""
    from dedup_ray.util.dsutil import union_evolve

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def old_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 2 == 0)).select(["doc_id", "text"])

    def new_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 2 == 1))

    old = docs.map_batches(old_side, batch_format="pyarrow")
    new = docs.map_batches(new_side, batch_format="pyarrow")
    return union_evolve(
        [old, new],
        schemas=[{"doc_id": pa.int64(), "text": pa.string()},
                 {"doc_id": pa.int64(), "text": pa.string(),
                  "lang": pa.string()}],
    )


def corpus_diff_docs(sf_dir: str):
    """Crawl-to-crawl snapshot diff: old = docs with doc_id %% 10 != 0,
    new = docs with doc_id %% 11 != 0 and text amended when
    doc_id %% 7 == 0 — per-doc added/removed/changed/same status via ONE
    co-partitioned exchange with exact in-partition text comparison
    (``ops/diff.py::corpus_diff``)."""
    from dedup_ray.ops.diff import corpus_diff

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def old_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 != 0))

    def new_side(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 11 != 0))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        amended = pc.binary_join_element_wise(
            t["text"], pa.scalar(" amended"), "")
        text = pc.if_else(pa.array(ids % 7 == 0), amended, t["text"])
        return pa.table({"doc_id": t["doc_id"], "text": text})

    old = docs.map_batches(old_side, batch_format="pyarrow")
    new = docs.map_batches(new_side, batch_format="pyarrow")
    return corpus_diff(old, new)


PROFILE_COLS = {"user_id": "num", "event_type": "str", "value": "num",
                "ts": "ts"}  # shared with the generated oracle


PSEUDO_SECRET = "s3cr3t"


def pseudonymize_events(sf_dir: str):
    """Privacy-preserving identifier tokens: user ids replaced by keyed
    md5 tokens, then grouped to show joins/groupbys survive
    pseudonymization (``stages/mixing.py::pseudonymize``)."""
    from dedup_ray.stages.mixing import pseudonymize

    ds = _read(sf_dir, "events", columns=["user_id"])
    tok = pseudonymize(ds, ["user_id"], PSEUDO_SECRET)
    return tok.groupby("user_id_token").count().map_batches(
        lambda t: pa.table({
            "user_id_token": t["user_id_token"],
            "n_events": pc.cast(t["count()"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


def profile_events(sf_dir: str):
    """Distributed table profiling over events: per-column null count,
    EXACT distinct count (per-batch unique partials -> one grouped count
    per column) and native-typed min/max (``ops/profile.py``)."""
    from dedup_ray.ops.profile import profile_table

    ds = _read(sf_dir, "events", columns=list(PROFILE_COLS))
    return profile_table(ds, list(PROFILE_COLS))


NGRAM_N, NGRAM_MIN, NGRAM_K = 3, 5, 50  # shared with the oracle
FUZZY_W, FUZZY_TAU = 3, 0.05  # fuzzy-decontamination gram width/threshold


def fuzzy_decontaminate_docs(sf_dir: str):
    """GPT-3/PaLM-style fuzzy decontamination: per (train doc, benchmark
    doc) pair, distinct-3-gram containment (|inter|/|train grams|) and
    Jaccard, kept at containment >= 0.05.  The benchmark posting index
    broadcasts once; the training sweep is one shuffle-free pass
    (``stages/webclean.py::fuzzy_decontaminate``).  Benchmark docs =
    ``doc_id %% 50 == 0`` as in ``decontaminate_docs``."""
    from dedup_ray.stages.webclean import (
        benchmark_gram_index,
        fuzzy_decontaminate,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(is_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
            return t.filter(pa.array(m if is_bench else ~m))

        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    idx = benchmark_gram_index(bench, width=FUZZY_W)
    return fuzzy_decontaminate(train, idx, width=FUZZY_W,
                               min_containment=FUZZY_TAU)


def frequent_ngrams_docs(sf_dir: str):
    """Boilerplate-phrase census: top-50 token 3-grams with corpus count
    >= 5 — per-batch np.unique partials, one small grouped sum, bounded
    sort/limit (``stages/webclean.py::frequent_ngrams``)."""
    from dedup_ray.stages.webclean import frequent_ngrams

    ds = _read(sf_dir, "documents", columns=["text"])
    return frequent_ngrams(ds, n=NGRAM_N, min_count=NGRAM_MIN,
                           top_k=NGRAM_K)


def frequent_ngrams_cms_docs(sf_dir: str):
    """CMS-prefiltered heavy hitters: fixed-size sketch pass, then an
    exact recount of only plausibly-frequent grams — output EQUAL to
    ``frequent_ngrams_docs`` by the never-undercount guarantee, so it
    shares that oracle verbatim."""
    from dedup_ray.stages.webclean import frequent_ngrams_cms

    ds = _read(sf_dir, "documents", columns=["text"])
    return frequent_ngrams_cms(ds, n=NGRAM_N, min_count=NGRAM_MIN,
                               top_k=NGRAM_K)


BPE_MERGES = 8  # rounds; shared by the trainer and the generated oracle


def bpe_train_docs(sf_dir: str):
    """Distributed BPE merge training (Sennrich 2016): the merge-rule
    table learned from the corpus.  One corpus-sized pass builds the word
    histogram; each round then runs over the vocab-bounded histogram
    (partial pair counts → one small grouped sum → argmax; greedy
    leftmost-non-overlapping application).  The oracle UNROLLS all
    rounds as generated materialized CTEs — pair counting, tie-break and
    the run-parity merge rule are checked round by round
    (``stages/bpetrain.py``)."""
    from dedup_ray.stages.bpetrain import bpe_train

    ds = _read(sf_dir, "documents", columns=["text"])
    return bpe_train(ds, BPE_MERGES)


def bpe_encode_docs(sf_dir: str):
    """BPE tokenization with the merges learned from this corpus: per-doc
    BPE token count after applying all 8 trained rules.  Encoding replays
    the merges on each batch's DISTINCT words only; the oracle reuses the
    trainer's unrolled CTEs and joins doc words against the final symbol
    state."""
    from dedup_ray.stages.bpetrain import bpe_encode_counts, bpe_train

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train(_read(sf_dir, "documents", columns=["text"]),
                       BPE_MERGES)
    return bpe_encode_counts(ds, merges)


def range_rank_orders(sf_dir: str):
    """Global ``ORDER BY (o_totalprice, o_orderkey)`` rank WITHOUT a
    global sort: sample-based range partitioning (deterministic md5
    sample → boundary quantiles → one bucket exchange → local sorts +
    exact offsets from B per-bucket counters).  Boundaries affect only
    load balance — ranks are exact for any boundary choice
    (``stages/ordering.py::range_rank``)."""
    from dedup_ray.stages.ordering import range_rank

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return range_rank(ds, key_col="o_totalprice", id_col="o_orderkey")


def lang_percentile_docs(sf_dir: str):
    """Per-language ECDF rank-normalization
    (``stages/ordering.py::group_percent_rank``): each document's
    ``n_chars`` quantile within its language — the step that makes
    per-language quality scores comparable before one global threshold
    (CCNet-style per-bucket filtering).  One group-keyed exchange; ranks
    for every language computed in one lexsort per partition."""
    from dedup_ray.stages.ordering import group_percent_rank

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return group_percent_rank(ds, group_col="lang", value_col="n_chars",
                              id_col="doc_id")


def vocab_ids_docs(sf_dir: str):
    """Frequency-ordered vocabulary export: whitespace tokens counted
    corpus-wide (per-batch ``np.unique`` partials → one grouped sum),
    then assigned contiguous ids by ``ORDER BY count DESC, token`` via
    the sample-based range-partitioned rank — no full-table sort
    all-to-all even when the vocab is large.  The tokenizer-prep step of
    a training run (vocab tables feed id-mapping joins downstream)."""
    from dedup_ray.stages.ordering import range_rank
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.coalesce(t["text"], pa.scalar(""))
        toks = pc.list_flatten(pc.split_pattern(txt, " "))
        u, c = np.unique(np.asarray(toks.to_pylist(), dtype=object),
                         return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()),
                         "c": pa.array(c, pa.int64())})

    def total(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64()),
                             "negfreq": pa.array([], pa.int64())})
        g = part.group_by("token").aggregate([("c", "sum")])
        freq = pc.cast(g["c_sum"], pa.int64())
        return pa.table({"token": g["token"], "freq": freq,
                         "negfreq": pc.negate(freq)})

    vocab = exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), "token", total, 8)
    ranked = range_rank(vocab, key_col="negfreq", id_col="token",
                        num_partitions=8)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "token": t["token"],
            "freq": pc.negate(t["negfreq"]),
            "vocab_id": t["rank"],
        })

    return ranked.map_batches(finish, batch_format="pyarrow")


EXACT_SUBSTR_LEN = 40  # chars; shared by the kernel and the oracle


def exact_substring_docs(sf_dir: str):
    """ExactSubstr coverage (Lee et al. 2022 semantics, char windows):
    per-doc count of positions covered by a corpus-duplicated substring of
    length >= 40.  Exact — a duplicated >=L substring covers a position
    iff a duplicated L-window does — via one narrow (ghash, count)
    exchange + broadcast dup set (``stages/exactsubstr.py``); the CDC path
    (``stages/substring.py``) is the scale-side approximation of the same
    semantics."""
    from dedup_ray.stages.exactsubstr import exact_substring_coverage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_substring_coverage(ds, min_len=EXACT_SUBSTR_LEN)


def exact_substring_cut_docs(sf_dir: str):
    """ExactSubstr removal: text with every duplicated->=40-char-covered
    position cut (all-occurrence policy — output is a pure function of
    corpus content, partition/order-invariant).  The oracle reconstructs
    the kept text with merged cover islands + complement-segment
    ``string_agg``."""
    from dedup_ray.stages.exactsubstr import exact_substring_cut

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_substring_cut(ds, min_len=EXACT_SUBSTR_LEN)


SA_DEPTH = 16


def suffix_array_docs(sf_dir: str):
    """Truncated suffix array (``stages/suffix.py``): global rank of every
    suffix position by its first 16 bytes, ties by (doc_id, pos) — the
    suffix-ARRAY form of exact-substring dedup the north star names
    (Lee et al. 2022's published structure; ``exactsubstr.py`` is the
    hash-window form).  One range exchange, rank-exact for any sampled
    boundary set."""
    from dedup_ray.stages.suffix import suffix_array

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return suffix_array(ds, depth=SA_DEPTH)


def sa_coverage_docs(sf_dir: str):
    """Per-doc duplicated-position census via the suffix array: a position
    is duplicated when its 16-byte prefix has an earlier occurrence in
    (prefix, doc, pos) order — keep-first/cut-rest, hash-free.  Partial
    per-doc counts per range bucket fold through one small groupby."""
    from dedup_ray.stages.suffix import sa_repeat_coverage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return sa_repeat_coverage(ds, depth=SA_DEPTH)


# --------------------------------------------------------------------------
# Oracle SQL (DuckDB, over the pre-registered views)
# --------------------------------------------------------------------------

TOKENS_CTE = (
    "WITH toks AS (SELECT doc_id, unnest(CASE WHEN "
    "length(list_filter(string_split(text, ' '), x -> x <> '')) = 0 "
    "THEN [CAST(doc_id AS VARCHAR)] "
    "ELSE list_filter(string_split(text, ' '), x -> x <> '') END) AS token "
    "FROM documents)"
)

ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "grouped_stats_events": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY event_type
    """,
    "pearson_qty_price": """
        SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        FROM lineitem
    """,
    "dup_user_events": """
        SELECT user_id, count(*) AS n FROM events
        GROUP BY user_id HAVING count(*) > 1
    """,
    "normalize_part_names": (
        "SELECT p_partkey, {expr} AS norm_name FROM part"
    ),
    "last_token_part": """
        SELECT p_partkey, string_split(p_name, ' ')[-1] AS last_token FROM part
    """,
    "tokenize_docs": f"{TOKENS_CTE} SELECT doc_id, token FROM toks",
    "token_idf": f"""
        {TOKENS_CTE}
        SELECT token,
               round((SELECT count(*) FROM toks) / CAST(count(*) AS DOUBLE), 6)
                   AS idf
        FROM toks GROUP BY token
    """,
    "doc_token_counts": f"""
        {TOKENS_CTE}
        SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id
    """,
    "text_quality": f"""
        WITH tk AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS tok
            FROM documents),
        agg AS (
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(length(tok)), 6) AS avg_token_len,
                   round(avg(CASE WHEN lower(tok) IN {EN_STOP_SQL}
                             THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio
            FROM tk GROUP BY doc_id)
        SELECT d.doc_id,
               length(d.text) AS n_chars,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.avg_token_len, 0.0) AS avg_token_len,
               coalesce(a.stopword_ratio, 0.0) AS stopword_ratio,
               CASE WHEN length(d.text) = 0 THEN 0.0
                    ELSE round(length(regexp_replace(d.text, '[\\w\\s]', '', 'g'))
                               / CAST(length(d.text) AS DOUBLE), 6) END
                   AS punct_ratio
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "left_join_orders": """
        SELECT o.o_orderkey, o.o_custkey, c.c_name
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "semi_join_customers": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
    """,
    "distinct_lang_source": "SELECT DISTINCT lang, source FROM documents",
    "mode_event_type": """
        SELECT user_id, event_type, n FROM (
            SELECT user_id, event_type, count(*) AS n,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY count(*) DESC, event_type)
                       AS rk
            FROM events GROUP BY user_id, event_type)
        WHERE rk = 1
    """,
    "top_orders": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "block_pairs_docs": """
        SELECT a.source, a.doc_id AS id1, b.doc_id AS id2
        FROM documents a JOIN documents b
          ON a.source = b.source AND a.doc_id < b.doc_id
    """,
    "pair_token_overlap": """
        WITH tk AS (
            SELECT doc_id, source, tok, count(*) AS c FROM (
                SELECT doc_id, source,
                       unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS tok
                FROM documents)
            GROUP BY doc_id, source, tok)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               CAST(sum(least(a.c, b.c)) AS BIGINT) AS overlap
        FROM tk a JOIN tk b
          ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """,
    "diff_nchars_pairs": """
        WITH d AS (
            SELECT doc_id, source, n_chars,
                   max(n_chars) OVER (PARTITION BY source)
                   - min(n_chars) OVER (PARTITION BY source) AS span
            FROM documents)
        SELECT a.source, a.doc_id AS id1, b.doc_id AS id2,
               CASE WHEN a.span = 0 THEN 0.0
                    ELSE round(abs(a.n_chars - b.n_chars)
                               / CAST(a.span AS DOUBLE), 6) END AS diff_nchars
        FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
    """,
    "cc_chain_docs": """
        WITH edges0 AS (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id % 10 < 3),
        edges AS (SELECT u, v FROM edges0 UNION ALL SELECT v, u FROM edges0),
        RECURSIVE: reach(node, lbl) -- placeholder, replaced below
    """,
    "group_collect_lang": """
        SELECT lang, doc_id,
               min(doc_id) OVER (PARTITION BY lang) AS cluster_rep,
               count(*) OVER (PARTITION BY lang) AS cluster_size
        FROM documents
    """,
    "eval_source_vs_lang": """
        WITH j AS (SELECT doc_id, lang, source FROM documents),
        gt AS (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS tot FROM
               (SELECT count(*) AS n FROM j GROUP BY lang)),
        pr AS (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS tot FROM
               (SELECT count(*) AS n FROM j GROUP BY source)),
        co AS (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS tot FROM
               (SELECT count(*) AS n FROM j GROUP BY lang, source))
        SELECT round(co.tot / CAST(pr.tot AS DOUBLE), 6) AS precision,
               round(co.tot / CAST(gt.tot AS DOUBLE), 6) AS recall,
               round(2.0 * (co.tot / CAST(pr.tot AS DOUBLE))
                         * (co.tot / CAST(gt.tot AS DOUBLE))
                     / (co.tot / CAST(pr.tot AS DOUBLE)
                        + co.tot / CAST(gt.tot AS DOUBLE)), 6) AS f1
        FROM gt, pr, co
    """,
    "window_tumbling_events": """
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_id,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY event_type, window_id
    """,
    "sessionize_events": """
        WITH e AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
            SELECT user_id, event_id,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM e)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events
        FROM s GROUP BY user_id, session_id
    """,
    "ann_topk": """
        SELECT query_id, neighbor_id, cos_sim FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   round(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])), 6) DESC,
                           e.vec_id) AS rk
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
        WHERE rk <= 10
    """,
    "exact_dedup_docs": """
        SELECT md5(text) AS digest, min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "tag_parts_multilabel": """
        SELECT p_partkey, 'color' AS tag FROM part
        WHERE list_has_any(string_split(p_name, ' '),
              ['red','blue','green','yellow','purple','white'])
        UNION ALL
        SELECT p_partkey, 'size' FROM part
        WHERE list_has_any(string_split(p_name, ' '),
              ['small','large','tiny','huge','mini'])
        UNION ALL
        SELECT p_partkey, 'temperature' FROM part
        WHERE list_has_any(string_split(p_name, ' '),
              ['hot','cold','warm','cool'])
        UNION ALL
        SELECT p_partkey, 'mechanism' FROM part
        WHERE list_has_any(string_split(p_name, ' '),
              ['gear','bolt','spring','lever','valve'])
    """,
    "balanced_sample_events": """
        SELECT event_id, event_type FROM (
            SELECT event_id, event_type,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY event_id) AS rk
            FROM events)
        WHERE rk <= 200
    """,
    "ngram_jaccard_pairs": """
        WITH l AS (SELECT doc_id, source,
                          list_filter(string_split(text,' '), x -> x <> '') AS toks
                   FROM documents),
        t AS (SELECT doc_id, source, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) AS pos FROM l),
        g AS (SELECT a.doc_id, a.source,
                     a.tok || ' ' || b.tok || ' ' || c.tok AS gram
              FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                       JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
        gd AS (SELECT DISTINCT doc_id, source, gram FROM g),
        cnt AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY doc_id),
        inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS i
                  FROM gd x JOIN gd y ON y.source = x.source
                       AND y.gram = x.gram AND y.doc_id > x.doc_id
                  GROUP BY x.doc_id, y.doc_id)
        SELECT id1, id2,
               round(i * 1.0 / (c1.n + c2.n - i), 6) AS jaccard
        FROM inter JOIN cnt c1 ON c1.doc_id = id1
                   JOIN cnt c2 ON c2.doc_id = id2
        WHERE i * 1.0 / (c1.n + c2.n - i) >= 0.05
    """,
}

# fix up the two oracles that need programmatic assembly
from dedup_ray.conformance.normalize import oracle_sql_expr  # noqa: E402

ORACLES["normalize_part_names"] = ORACLES["normalize_part_names"].format(
    expr=oracle_sql_expr("p_name", lowercase=True)
)
ORACLES["cc_chain_docs"] = """
    WITH RECURSIVE edges0 AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 10 < 3),
    edges AS (SELECT u, v FROM edges0 UNION ALL SELECT v, u FROM edges0),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node)
    SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
"""

# Shared chain-cluster CTE prefix for the post-dedup policy queries.
_CHAIN_COMP_CTE = """
    WITH RECURSIVE edges0 AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 10 < 3),
    edges AS (SELECT u, v FROM edges0 UNION ALL SELECT v, u FROM edges0),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node),
    comp AS (
        SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node)
"""

# keep_id: deterministic argmax via a composite score — n_tokens majorizes
# (doc_id < 2^32), minus doc_id breaks ties toward the SMALLEST id.
ORACLES["cluster_stats_docs"] = _CHAIN_COMP_CTE + """
    SELECT c.cluster_id, count(*)::BIGINT AS n_docs,
           min(d.n_chars)::BIGINT AS min_chars,
           max(d.n_chars)::BIGINT AS max_chars,
           sum(d.n_chars)::BIGINT AS total_chars
    FROM comp c JOIN documents d USING (doc_id)
    GROUP BY c.cluster_id
"""


ORACLES["bcubed_eval_docs"] = _CHAIN_COMP_CTE + """,
    truth AS (SELECT doc_id, doc_id // 4 AS truth_id FROM documents),
    j AS (SELECT c.doc_id, c.cluster_id, t.truth_id
          FROM comp c JOIN truth t USING (doc_id)),
    cells AS (SELECT cluster_id, truth_id, count(*)::DOUBLE AS n
              FROM j GROUP BY 1, 2),
    cs AS (SELECT cluster_id, count(*)::DOUBLE AS sz FROM comp GROUP BY 1),
    ts AS (SELECT truth_id, count(*)::DOUBLE AS sz FROM truth GROUP BY 1),
    p AS (SELECT sum(n * n / cs.sz) AS v
          FROM cells JOIN cs USING (cluster_id)),
    r AS (SELECT sum(n * n / ts.sz) AS v
          FROM cells JOIN ts USING (truth_id)),
    nn AS (SELECT count(*)::DOUBLE AS n FROM j)
    SELECT round(p.v / nn.n, 6) AS bcubed_p,
           round(r.v / nn.n, 6) AS bcubed_r,
           round(2 * (p.v / nn.n) * (r.v / nn.n)
                 / ((p.v / nn.n) + (r.v / nn.n)), 6) AS bcubed_f1
    FROM p, r, nn
"""


ORACLES["triangle_count_docs"] = """
    WITH e AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 10 < 3
        UNION ALL
        SELECT a.doc_id, b.doc_id
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 2
        WHERE a.doc_id % 10 < 2)
    SELECT count(*)::BIGINT AS n_triangles
    FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
"""


ORACLES["ari_eval_docs"] = _CHAIN_COMP_CTE + """,
    truth AS (SELECT doc_id, doc_id // 4 AS truth_id FROM documents),
    j AS (SELECT c.doc_id, c.cluster_id, t.truth_id
          FROM comp c JOIN truth t USING (doc_id)),
    sc AS (SELECT sum(n * (n - 1) // 2) AS v FROM (
               SELECT count(*)::BIGINT AS n FROM j
               GROUP BY cluster_id, truth_id)),
    sa AS (SELECT sum(n * (n - 1) // 2) AS v FROM (
               SELECT count(*)::BIGINT AS n FROM j GROUP BY cluster_id)),
    sb AS (SELECT sum(n * (n - 1) // 2) AS v FROM (
               SELECT count(*)::BIGINT AS n FROM j GROUP BY truth_id)),
    nn AS (SELECT count(*)::BIGINT AS n FROM j)
    SELECT round((sc.v - sa.v * sb.v * 2.0 / (nn.n * (nn.n - 1)))
                 / ((sa.v + sb.v) / 2.0
                    - sa.v * sb.v * 2.0 / (nn.n * (nn.n - 1))), 6) AS ari
    FROM sc, sa, sb, nn
"""


ORACLES["cluster_rep_longest"] = _CHAIN_COMP_CTE + """
    , tok AS (
        SELECT doc_id,
               CAST(array_length(string_split(coalesce(text, ''), ' '))
                    AS BIGINT) AS n_tokens
        FROM documents)
    SELECT c.cluster_id,
           CAST(max(t.n_tokens) AS BIGINT) AS best_len,
           CAST(max(t.n_tokens) * 4294967296
                - max(t.n_tokens * 4294967296 - t.doc_id)
                AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS cluster_size
    FROM comp c JOIN tok t USING (doc_id)
    GROUP BY c.cluster_id
"""

ORACLES["soft_dedup_weights_docs"] = _CHAIN_COMP_CTE + """
    SELECT doc_id, cluster_id,
           1.0 / (count(*) OVER (PARTITION BY cluster_id)) AS weight
    FROM comp
"""

# DuckDB's native ASOF JOIN is the oracle for the partitioned merge_asof;
# strictly-prior semantics (a.ts > b.ts) make ties engine-independent.
ORACLES["asof_join_events"] = """
    SELECT a.event_id, a.user_id,
           CAST(epoch_us(a.ts) AS BIGINT) AS ts_us,
           CAST(epoch_us(b.ts) AS BIGINT) AS view_ts_us,
           CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS lag_us
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') a
    ASOF JOIN (SELECT user_id, ts FROM events
               WHERE event_type = 'view') b
      ON a.user_id = b.user_id AND a.ts > b.ts
"""

ORACLES["quantile_sketch_events"] = """
    SELECT t.q,
           (SELECT CAST(count(*) AS BIGINT) FROM events) AS n,
           CAST(1 AS BIGINT) AS ok
    FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9), (0.99)) AS t(q)
"""

ORACLES["quantile_sketch_by_type_events"] = """
    SELECT e.event_type, t.q,
           CAST(count(*) AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS ok
    FROM events e, (VALUES (0.5), (0.9)) AS t(q)
    GROUP BY 1, 2
"""

ORACLES["topk_per_user_events"] = """
    SELECT event_id, user_id, value, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT event_id, user_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id
             ) AS rank
      FROM events)
    WHERE rank <= 3
"""

ORACLES["rolling_mean_events"] = """
    SELECT event_id, user_id,
           avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS mean3
    FROM events
"""

ORACLES["pivot_event_counts"] = """
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
             AS n_click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS n_error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
             AS n_signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
             AS n_view
    FROM events GROUP BY user_id
"""

ORACLES["range_join_events"] = """
    SELECT s.event_id, s.user_id,
           CAST(count(p.ts) AS BIGINT) AS n_in_window
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'signup') s
    LEFT JOIN (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id
     AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 7 DAY
    GROUP BY 1, 2
"""

def _lang_id_oracle() -> str:
    """SQL mirror of ``LangId``: CJK → zh; else max stopword hits with
    lang-ascending tie-break (the CASE order IS the tie-break); 0 → en."""
    from dedup_ray.stages.textstats import STOPWORDS

    langs = sorted(k for k, v in STOPWORDS.items() if v)
    hit_cols = ", ".join(
        "sum(CASE WHEN tok IN ({}) THEN 1 ELSE 0 END) AS hits_{}".format(
            ", ".join(repr(w) for w in sorted(STOPWORDS[lang])), lang
        )
        for lang in langs
    )
    gmax = "greatest({})".format(", ".join(f"hits_{lang}" for lang in langs))
    picks = " ".join(
        f"WHEN hits_{lang} = {gmax} THEN '{lang}'" for lang in langs
    )
    return rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '\w+')) AS tok
            FROM documents),
        h AS (SELECT doc_id, {hit_cols} FROM toks GROUP BY doc_id),
        best AS (
            SELECT doc_id,
                   CASE WHEN {gmax} = 0 THEN 'en' {picks} END AS pred
            FROM h)
        SELECT d.doc_id,
               CASE WHEN regexp_matches(d.text, '[一-鿿]') THEN 'zh'
                    ELSE coalesce(b.pred, 'en') END AS lang_pred
        FROM documents d LEFT JOIN best b USING (doc_id)
    """


ORACLES["lang_id_docs"] = _lang_id_oracle()

ORACLES["window_hopping_events"] = """
    WITH e AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS base, value
        FROM events),
    x AS (
        SELECT event_type, base - j AS window_id, value
        FROM e, (SELECT unnest([0, 1]) AS j))
    SELECT event_type, window_id, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM x GROUP BY event_type, window_id
"""

ORACLES["embed_cosine_dup_pairs"] = """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings)
    SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
"""

ORACLES["embed_pair_features"] = """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
    n AS (
        SELECT vec_id, label, v,
               sqrt(list_inner_product(v, v)) AS nrm
        FROM e)
    SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
           round(list_distance(a.v, b.v), 6) AS dist,
           round(acos(least(1.0, greatest(-1.0,
                 list_inner_product(a.v, b.v) / (a.nrm * b.nrm)))), 6)
               AS angle,
           round(sqrt(da.n_chars * db.n_chars), 6) AS lenmul
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    JOIN documents da ON da.doc_id = a.vec_id
    JOIN documents db ON db.doc_id = b.vec_id
"""

ORACLES["focus_org_bag_parts"] = r"""
    WITH counts AS (
        SELECT p_brand, p_name, count(*) AS n FROM part
        GROUP BY p_brand, p_name),
    focus AS (
        SELECT p_brand, p_name AS focus FROM (
            SELECT p_brand, p_name,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY n DESC, p_name) AS rk
            FROM counts)
        WHERE rk = 1),
    keyed AS (
        SELECT p_brand,
               '^' || replace(regexp_replace(lower(focus), '\W+', '_', 'g'),
                              '_', '\W+') || '$' AS pat
        FROM focus),
    sau AS (
        SELECT p.p_brand, p.p_partkey, p.p_type
        FROM part p JOIN keyed k ON p.p_brand = k.p_brand
        WHERE regexp_matches(p.p_name, k.pat, 'i'))
    SELECT p_brand, p_type, min(p_partkey) AS keep_id,
           count(*) AS n_members
    FROM sau GROUP BY p_brand, p_type
"""

ORACLES["split_seed_search"] = """
    WITH agg AS (
        SELECT source, min(doc_id) AS bkey, count(*) AS n,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
        FROM documents GROUP BY source),
    seeds AS (SELECT unnest(generate_series(0, 499)) AS seed),
    split AS (
        SELECT s.seed,
               sum(CASE WHEN (bkey + s.seed) % 5 = 0 THEN 0 ELSE pos END)
                   AS tr_pos,
               sum(CASE WHEN (bkey + s.seed) % 5 = 0 THEN 0 ELSE n END)
                   AS tr_n,
               sum(CASE WHEN (bkey + s.seed) % 5 = 0 THEN pos ELSE 0 END)
                   AS va_pos,
               sum(CASE WHEN (bkey + s.seed) % 5 = 0 THEN n ELSE 0 END)
                   AS va_n
        FROM seeds s, agg GROUP BY s.seed),
    valid AS (
        SELECT seed,
               tr_pos / CAST(tr_n AS DOUBLE)
                   - va_pos / CAST(va_n AS DOUBLE) AS d
        FROM split WHERE tr_n > 0 AND va_n > 0)
    SELECT seed AS best_seed, round(d, 6) AS diff_pos_rate
    FROM valid ORDER BY abs(d), seed LIMIT 1
"""

ORACLES["per_block_accuracy"] = """
    WITH m AS (
        SELECT source, lang AS mode FROM (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY count(*) DESC, lang) AS rk
            FROM documents GROUP BY source, lang)
        WHERE rk = 1)
    SELECT d.source,
           round(avg(CASE WHEN d.lang = m.mode THEN 1.0 ELSE 0.0 END), 6)
               AS acc
    FROM documents d JOIN m USING (source) GROUP BY d.source
"""

ORACLES["pscore_report_docs"] = """
    WITH m AS (
        SELECT source, lang AS mode FROM (
            SELECT source, lang,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY count(*) DESC, lang) AS rk
            FROM documents GROUP BY source, lang)
        WHERE rk = 1),
    acc AS (
        SELECT d.source,
               round(avg(CASE WHEN d.lang = m.mode THEN 1.0 ELSE 0.0 END), 6)
                   AS acc
        FROM documents d JOIN m USING (source) GROUP BY d.source),
    s AS (
        SELECT min(acc) AS mn, max(acc) AS mx,
               round(avg(acc), 6) AS mean_score,
               round(stddev_samp(acc), 6) AS sd_score
        FROM acc),
    nm AS (
        SELECT (SELECT min(source) FROM acc, s WHERE acc.acc = s.mn)
                   AS min_name,
               (SELECT min(source) FROM acc, s WHERE acc.acc = s.mx)
                   AS max_name),
    bins AS (SELECT unnest(generate_series(0, 19)) AS bin),
    cnt AS (
        SELECT CAST(least(floor((acc - mn) / ((mx - mn) / 20.0)), 19)
                    AS BIGINT) AS bin,
               count(*) AS k
        FROM acc, s WHERE mx > mn GROUP BY 1
        UNION ALL
        SELECT 0, count(*) FROM acc, s WHERE mx = mn HAVING count(*) > 0)
    SELECT b.bin,
           round(s.mn + b.bin * ((s.mx - s.mn) / 20.0), 6) AS lo,
           round(s.mn + (b.bin + 1) * ((s.mx - s.mn) / 20.0), 6) AS hi,
           CAST(coalesce(c.k, 0) AS BIGINT) AS n,
           s.mean_score, s.sd_score, nm.min_name, nm.max_name
    FROM bins b CROSS JOIN s CROSS JOIN nm
    LEFT JOIN cnt c ON c.bin = b.bin
"""

ORACLES["coau_dist_docs"] = """
    WITH RECURSIVE blocks AS (
        SELECT source FROM (
            SELECT source, count(*) AS n FROM documents GROUP BY source
            ORDER BY n, source LIMIT 8)),
    dd AS (
        SELECT d.source, d.doc_id, d.text
        FROM documents d JOIN blocks USING (source)),
    tok AS (
        SELECT DISTINCT source, doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS token
        FROM dd),
    ret AS (
        SELECT source, token FROM (
            SELECT source, token, count(*) AS c FROM tok
            GROUP BY source, token)
        WHERE c BETWEEN 2 AND 3),
    dt AS (
        SELECT t.source, t.doc_id, t.token
        FROM tok t JOIN ret USING (source, token)),
    edges AS (
        SELECT DISTINCT source, u, v FROM (
            SELECT source, 'd:' || CAST(doc_id AS VARCHAR) AS u,
                   't:' || token AS v FROM dt
            UNION ALL
            SELECT source, 't:' || token, 'd:' || CAST(doc_id AS VARCHAR)
            FROM dt
            UNION ALL
            SELECT a.source, 't:' || a.token, 't:' || b.token
            FROM dt a JOIN dt b
              ON a.source = b.source AND a.doc_id = b.doc_id
                 AND a.token <> b.token)),
    reach(source, src, node, dist) AS (
        SELECT source, doc_id, 'd:' || CAST(doc_id AS VARCHAR), 0 FROM dd
        UNION
        SELECT r.source, r.src, e.v, r.dist + 1
        FROM reach r JOIN edges e
          ON e.source = r.source AND e.u = r.node
        WHERE r.dist < 16),
    md AS (
        SELECT source, src, node, min(dist) AS dist FROM reach
        GROUP BY source, src, node),
    pairs AS (
        SELECT a.source, a.doc_id AS id1, b.doc_id AS id2
        FROM dd a JOIN dd b
          ON a.source = b.source AND a.doc_id < b.doc_id)
    SELECT p.source, p.id1, p.id2,
           CASE WHEN m.dist IS NULL THEN 0.0
                ELSE round(2.0 / m.dist, 6) END AS coau_dist,
           CASE WHEN m.dist = 2 THEN 1.0 ELSE 0.0 END AS coau_dummy
    FROM pairs p LEFT JOIN md m
      ON m.source = p.source AND m.src = p.id1
         AND m.node = 'd:' || CAST(p.id2 AS VARCHAR)
"""


PPR_SEED_STEP = 100


def ppr_docs(sf_dir: str):
    """Personalized PageRank (random walk with restart at ``doc_id %%
    100 == 0`` seeds) over the same deterministic link graph as
    ``pagerank_docs`` — authority RELATIVE to a trusted set, the
    seed-biased host-ranking pass of a crawl-quality pipeline.  Same
    two-exchange iteration; the restart weight is one vectorized isin
    against the broadcast seed set.  Integer nano-ranks as in
    ``pagerank_docs``; oracle unrolls the seeded iteration in SQL."""
    from dedup_ray.ops.pagerank import pagerank
    from dedup_ray.util.dsutil import rename_columns

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()

    def mk_edges(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([u for _ in PR_EDGE_EXPRS])
        dst = np.concatenate(
            [eval(expr, {"u": u}) % n for expr in PR_EDGE_EXPRS]  # noqa: S307
        )
        return pa.table(
            {"src": pa.array(src, pa.int64()),
             "dst": pa.array(dst, pa.int64())}
        )

    def hub_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[ids % PPR_SEED_STEP == 0],
                                            pa.int64())})

    seeds = [r["doc_id"] for r in
             docs.map_batches(hub_filter, batch_format="pyarrow").take_all()]
    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    nodes = rename_columns(docs, {"doc_id": "node"})
    pr = pagerank(nodes, edges, damping=PR_DAMPING, iters=PR_ITERS,
                  round_to=None, seed_nodes=seeds)

    def to_nano(t: pa.Table) -> pa.Table:
        e9 = np.rint(
            t["pagerank"].to_numpy(zero_copy_only=False) * 10.0**PR_ROUND
        ).astype(np.int64)
        return pa.table(
            {"doc_id": t["node"], "ppr_e9": pa.array(e9, pa.int64())}
        )

    return pr.map_batches(to_nano, batch_format="pyarrow")


def _pagerank_oracle() -> str:
    """Power iteration unrolled as chained CTEs, generated from the SAME
    constants the Ray query uses (edge formulas, damping, iteration count,
    rounding) so graph and arithmetic cannot drift.  Every doc emits one
    edge per formula, so out-degree is len(PR_EDGE_FORMULAS) for every node
    and the dangling term is zero on both sides."""
    import re

    d = PR_DAMPING
    edge_selects = " UNION ALL ".join(
        "SELECT doc_id AS src, ("
        + re.sub(r"\bu\b", "doc_id", expr)
        + ") % (SELECT n FROM nn) AS dst FROM documents"
        for expr in PR_EDGE_EXPRS
    )
    ctes = [
        "WITH nn AS (SELECT count(*) AS n FROM documents)",
        f"edges AS ({edge_selects})",
        "outd AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg "
        "FROM edges GROUP BY src)",
        "r0 AS (SELECT doc_id AS node, 1.0 / (SELECT n FROM nn) AS pr "
        "FROM documents)",
    ]
    for k in range(PR_ITERS):
        ctes.append(
            f"r{k + 1} AS (SELECT dcs.doc_id AS node, "
            f"(1.0 - {d}) / (SELECT n FROM nn) "
            f"+ {d} * coalesce(s.c, 0.0) AS pr "
            "FROM documents dcs LEFT JOIN ("
            "SELECT e.dst AS node, sum(r.pr / o.outdeg) AS c "
            f"FROM edges e JOIN r{k} r ON r.node = e.src "
            "JOIN outd o ON o.src = e.src GROUP BY e.dst"
            ") s ON s.node = dcs.doc_id)"
        )
    return (
        ",\n    ".join(ctes)
        + "\n    SELECT node AS doc_id, "
        f"CAST(round(pr * 1e{PR_ROUND}) AS BIGINT) AS pagerank_e9"
        f" FROM r{PR_ITERS}"
    )


ORACLES["pagerank_docs"] = _pagerank_oracle()


def _ppr_oracle() -> str:
    """The seeded power iteration unrolled: every node has out-degree
    len(PR_EDGE_EXPRS) > 0 in this graph, so the dangling term is zero
    and the restart weight is ``(1-d)/|S|`` on seeds, 0 elsewhere."""
    import re

    d = PR_DAMPING
    edge_selects = " UNION ALL ".join(
        "SELECT doc_id AS src, ("
        + re.sub(r"\bu\b", "doc_id", expr)
        + ") % (SELECT n FROM nn) AS dst FROM documents"
        for expr in PR_EDGE_EXPRS
    )
    seed_p = (f"(SELECT 1.0 / count(*) FROM documents "
              f"WHERE doc_id % {PPR_SEED_STEP} = 0)")
    is_seed = f"(dcs.doc_id % {PPR_SEED_STEP} = 0)"
    ctes = [
        "WITH nn AS (SELECT count(*) AS n FROM documents)",
        f"edges AS ({edge_selects})",
        "outd AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg "
        "FROM edges GROUP BY src)",
        f"r0 AS (SELECT doc_id AS node, CASE WHEN doc_id % "
        f"{PPR_SEED_STEP} = 0 THEN {seed_p} ELSE 0.0 END AS pr "
        "FROM documents)",
    ]
    for k in range(PR_ITERS):
        ctes.append(
            f"r{k + 1} AS (SELECT dcs.doc_id AS node, "
            f"(CASE WHEN {is_seed} THEN (1.0 - {d}) * {seed_p} "
            f"ELSE 0.0 END) "
            f"+ {d} * coalesce(s.c, 0.0) AS pr "
            "FROM documents dcs LEFT JOIN ("
            "SELECT e.dst AS node, sum(r.pr / o.outdeg) AS c "
            f"FROM edges e JOIN r{k} r ON r.node = e.src "
            "JOIN outd o ON o.src = e.src GROUP BY e.dst"
            ") s ON s.node = dcs.doc_id)"
        )
    return (
        ",\n    ".join(ctes)
        + "\n    SELECT node AS doc_id, "
        f"CAST(round(pr * 1e{PR_ROUND}) AS BIGINT) AS ppr_e9"
        f" FROM r{PR_ITERS}"
    )


ORACLES["ppr_docs"] = _ppr_oracle()


def normalize_text_docs(sf_dir: str):
    """Unicode normalization over documents (``stages/normtext``): NFC +
    an ordered RE2 rule chain (control strip, CRLF→LF, horizontal-space
    collapse, newline trim, blank-line squeeze).  The oracle below is
    GENERATED from the same rule list at import time, so kernel and SQL
    cannot drift."""
    from dedup_ray.stages.normtext import normalize_text

    return normalize_text(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    )


# Shared mixing recipe: weights 0.25 / 1.0 / 1.75 / 2.5 cycling over the
# synthetic sources — exercises drop-most, identity, one-full-plus-frac
# and two-full-plus-frac in one query.  The SQL oracle is generated from
# THIS dict (stages/mixing.mix_sql), thresholds included.
MIX_WEIGHTS = {f"src{i}": (0.25, 1.0, 1.75, 2.5)[i % 4] for i in range(20)}
MIX_SEED = 13


def mix_sources_docs(sf_dir: str):
    """Deterministic weighted source mixing (``stages/mixing``): doc of
    weight w appears floor(w) times plus once more iff its keyed md5
    prefix clears the fractional threshold — exact, shuffle-free,
    engine-portable membership."""
    from dedup_ray.stages.mixing import mix_sources

    return mix_sources(
        _read(sf_dir, "documents", columns=["doc_id", "source"]),
        MIX_WEIGHTS,
        seed=MIX_SEED,
    )


SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SEED = 17
HOST_CAP_K = 10
HOST_CAP_SEED = 42


def split_assign_docs(sf_dir: str):
    """Deterministic train/val/test assignment by keyed md5 bucket
    (``stages/mixing.split_assign``): shuffle-free, append-stable, the SQL
    oracle is generated from the SAME fractions dict."""
    from dedup_ray.stages.mixing import split_assign

    return split_assign(
        _read(sf_dir, "documents", columns=["doc_id"]),
        SPLIT_FRACTIONS,
        seed=SPLIT_SEED,
    )


def cluster_split_docs(sf_dir: str):
    """Cluster-aware train/val/test split — the PREVENTION counterpart
    to the ``split_leakage_docs`` audit: documents are assigned to
    splits by their exact-dup CLUSTER id (min doc_id per text digest),
    so two copies of one page can never straddle train and eval.  One
    digest exchange (groupby min + co-partitioned join back), then the
    same keyed-md5 threshold rule as ``split_assign`` applied to the
    cluster id; shuffle-free past the join, append-stable."""
    from dedup_ray.stages.mixing import split_assign
    from dedup_ray.util.dsutil import hash_join
    from dedup_ray.util.hashing import content_digest

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def dig(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "digest": pa.array(
                content_digest(
                    [x or "" for x in t["text"].to_pylist()], algo="md5"
                ), pa.string()),
        })

    d = ds.map_batches(dig, batch_format="pyarrow").materialize()
    reps = d.groupby("digest").min("doc_id").map_batches(
        lambda t: pa.table({"digest": t["digest"],
                            "cluster_id": pc.cast(t["min(doc_id)"],
                                                  pa.int64())}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        d, reps, "digest", ["doc_id", "digest"], ["digest", "cluster_id"],
        num_partitions=8,
    )
    assigned = split_assign(
        as_arrow(joined), SPLIT_FRACTIONS, id_col="cluster_id",
        seed=SPLIT_SEED, keep_cols=("doc_id",),
    )
    return assigned.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "split": t["split"],
        }),
        batch_format="pyarrow",
    )


def cap_per_host_docs(sf_dir: str):
    """Per-key deterministic cap (``ops/relational.cap_per_key``): at most
    K docs per source, ranked by keyed md5 so the kept set is identical at
    any parallelism.  The crawler-trap-domain guard of a web pipeline."""
    from dedup_ray.ops.relational import cap_per_key

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return cap_per_key(
        ds, "source", "doc_id", k=HOST_CAP_K, seed=HOST_CAP_SEED,
        num_partitions=8,
    )


def filter_below_quantile_docs(sf_dir: str):
    """Global-threshold filter: drop documents below the exact 0.1 length
    quantile.  The threshold comes from the value-count histogram (partial
    per-batch counts → one grouped sum → driver cumsum over DISTINCT
    values — state bounded by max doc length, not corpus size), then one
    broadcast-threshold filter pass.  Quantile def sorted[floor(q·(n−1))]
    on both sides."""
    q = 0.1
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(
            t["n_chars"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"n_chars": pa.array(v, pa.int64()),
                         "cnt": pa.array(c, pa.int64())})

    hist = as_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_chars").sum("cnt")
    ).to_pandas().sort_values("n_chars")
    cum = np.cumsum(hist["sum(cnt)"].to_numpy())
    n = int(cum[-1])
    idx = int(np.floor(np.float64(q) * (n - 1)))
    thr = int(hist["n_chars"].to_numpy()[np.searchsorted(cum, idx + 1)])
    return ds.filter(expr=f"n_chars >= {thr}")


RECIPE_CAP_K = 15


def training_recipe_docs(sf_dir: str):
    """End-to-end corpus recipe, oracle-checked WHOLE (the composition
    analog of ``curate_docs``): exact dedup (md5 text, min-id rep) →
    per-source cap (keyed md5 rank) → train/val/test split (keyed md5
    bucket) → weighted epoch mixing of the train split.  Two narrow
    exchanges total (digest, source); split and mix are shuffle-free maps.
    The DuckDB oracle replays the whole chain as CTEs generated from the
    SAME constants (cap seed, split fractions, mix weights)."""
    from dedup_ray.ops.relational import cap_per_key
    from dedup_ray.stages.exact import exact_dedup
    from dedup_ray.stages.mixing import mix_sources, split_assign

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    surv = as_arrow(
        exact_dedup(docs, text_col="text", id_col="doc_id", num_partitions=8)
    ).select_columns(["doc_id", "source"])
    capped = cap_per_key(
        surv, "source", "doc_id", k=RECIPE_CAP_K, seed=HOST_CAP_SEED,
        num_partitions=8,
    )
    # materialize: sp feeds BOTH the train-mix branch and the others
    # branch; without it the dedup+cap+split chain executes twice
    sp = split_assign(
        capped, SPLIT_FRACTIONS, seed=SPLIT_SEED, keep_cols=("source",)
    ).materialize()

    def only_train(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["split"], "train")).select(
            ["doc_id", "source"]
        )

    def tag_others(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["split"], "train")))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "split": t["split"],
                "epoch": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    mixed = mix_sources(
        sp.map_batches(only_train, batch_format="pyarrow"),
        MIX_WEIGHTS,
        seed=MIX_SEED,
    )

    def tag_train(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "split": pa.array(["train"] * t.num_rows, pa.string()),
                "epoch": t["epoch"],
            }
        )

    return as_arrow(
        mixed.map_batches(tag_train, batch_format="pyarrow").union(
            sp.map_batches(tag_others, batch_format="pyarrow")
        )
    )


def _recipe_oracle_sql() -> str:
    from dedup_ray.stages.mixing import mix_sql, split_case_expr

    case = split_case_expr(SPLIT_FRACTIONS, id_col="doc_id", seed=SPLIT_SEED)
    mix_inner = mix_sql(
        MIX_WEIGHTS, table="sp_train", id_col="doc_id",
        source_col="source", seed=MIX_SEED,
    )
    return f"""
        WITH dedup AS (
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM documents) WHERE rn = 1),
        capped AS (
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY substr(md5('{HOST_CAP_SEED}:' || doc_id),
                                           1, 16),
                                    doc_id) AS rn
                FROM dedup) WHERE rn <= {RECIPE_CAP_K}),
        sp AS (SELECT doc_id, source, {case} AS split FROM capped),
        sp_train AS (SELECT doc_id, source FROM sp WHERE split = 'train'),
        mixed AS ({mix_inner})
        SELECT doc_id, source, 'train' AS split, epoch FROM mixed
        UNION ALL
        SELECT doc_id, source, split, CAST(0 AS BIGINT) AS epoch
        FROM sp WHERE split <> 'train'
    """


def _register_generated_oracles() -> None:
    # generated from the SAME rule list / weights dict the kernels use
    from dedup_ray.stages.mixing import mix_sql
    from dedup_ray.stages.normtext import norm_sql_expr

    ORACLES["normalize_text_docs"] = (
        f"SELECT doc_id, {norm_sql_expr('text')} AS text FROM documents"
    )
    ORACLES["mix_sources_docs"] = mix_sql(MIX_WEIGHTS, seed=MIX_SEED)
    from dedup_ray.stages.mixing import split_sql

    ORACLES["split_assign_docs"] = split_sql(SPLIT_FRACTIONS, seed=SPLIT_SEED)
    ORACLES["training_recipe_docs"] = _recipe_oracle_sql()
    from dedup_ray.stages.mixing import split_case_expr

    _leak_case = split_case_expr(SPLIT_FRACTIONS, id_col="doc_id",
                                 seed=SPLIT_SEED)
    ORACLES["split_leakage_docs"] = f"""
        WITH all_docs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000, text FROM documents
            WHERE doc_id % 5 = 0),
        s AS (SELECT doc_id, text, {_leak_case} AS split FROM all_docs),
        g AS (SELECT md5(text) AS dg, count(*) AS n_docs,
                     count(DISTINCT split) AS n_splits
              FROM s GROUP BY 1)
        SELECT dg, n_docs::BIGINT AS n_docs, n_splits::BIGINT AS n_splits
        FROM g WHERE n_splits >= 2
    """
    from dedup_ray.stages.mixing import stratified_sample_sql

    ORACLES["stratified_sample_docs"] = stratified_sample_sql(
        STRAT_FRACTIONS, "lang", seed=STRAT_SEED,
    ).replace("SELECT *", "SELECT doc_id, lang")
    ORACLES["cap_per_host_docs"] = f"""
        SELECT source, doc_id FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5('{HOST_CAP_SEED}:' || doc_id), 1, 16),
                                doc_id) AS rn
            FROM documents) WHERE rn <= {HOST_CAP_K}
    """
    ORACLES["filter_below_quantile_docs"] = """
        SELECT doc_id, n_chars FROM documents
        WHERE n_chars >= (
            SELECT n_chars FROM (
                SELECT n_chars,
                       row_number() OVER (ORDER BY n_chars) AS rn,
                       count(*) OVER () AS n
                FROM documents)
            WHERE rn = CAST(floor(0.1 * (n - 1)) AS BIGINT) + 1)
    """


_register_generated_oracles()


def _exact_substr_ctes(L: int) -> str:
    """Shared CTE chain: duplicated L-window starts over documents."""
    return f"""
        WITH g AS (
            SELECT doc_id,
                   unnest(generate_series(
                       1, greatest(length(text) - {L} + 1, 0))) AS i,
                   text
            FROM documents),
        gg AS (SELECT doc_id, i::INT AS i, substr(text, i::INT, {L}) AS gram
               FROM g),
        dup AS (SELECT gram FROM gg GROUP BY gram HAVING count(*) >= 2),
        s AS (SELECT doc_id, i FROM gg
              WHERE gram IN (SELECT gram FROM dup))
    """


def _register_bpe_oracle() -> None:
    from dedup_ray.stages.bpetrain import bpe_encode_sql, bpe_sql

    ORACLES["bpe_train_docs"] = bpe_sql(BPE_MERGES)
    ORACLES["bpe_encode_docs"] = bpe_encode_sql(BPE_MERGES)


_register_bpe_oracle()


ORACLES["frequent_ngrams_docs"] = f"""
    WITH toks AS (SELECT list_filter(string_split(text, ' '),
                                     x -> x <> '') AS l FROM documents),
    g AS (SELECT unnest(generate_series(
              1, greatest(length(l) - {NGRAM_N} + 1, 0))) AS i, l
          FROM toks),
    grams AS (SELECT array_to_string(l[i:i + {NGRAM_N} - 1], ' ') AS gram
              FROM g)
    SELECT gram, count(*)::BIGINT AS n FROM grams
    GROUP BY gram HAVING count(*) >= {NGRAM_MIN}
    ORDER BY n DESC, gram LIMIT {NGRAM_K}
"""


ORACLES["fuzzy_decontaminate_docs"] = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 array_to_string(toks[i:i + {FUZZY_W} - 1], ' ') AS gram
          FROM t, UNNEST(range(1, len(toks) - {FUZZY_W} + 2)) AS r(i)
          WHERE len(toks) >= {FUZZY_W}),
    tg AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0),
    bg AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 50 = 0),
    dt AS (SELECT doc_id, count(*) AS nd FROM tg GROUP BY doc_id),
    db AS (SELECT bench_id, count(*) AS nb FROM bg GROUP BY bench_id),
    ov AS (SELECT tg.doc_id, bg.bench_id, count(*)::BIGINT AS inter
           FROM tg JOIN bg USING (gram) GROUP BY 1, 2)
    SELECT o.doc_id, o.bench_id, o.inter,
           round(o.inter / dt.nd, 6) AS containment,
           round(o.inter / (dt.nd + db.nb - o.inter), 6) AS jaccard
    FROM ov o JOIN dt USING (doc_id) JOIN db USING (bench_id)
    WHERE o.inter / dt.nd >= {FUZZY_TAU}
"""


def _register_profile_oracle() -> None:
    from dedup_ray.ops.profile import profile_sql

    ORACLES["profile_events"] = profile_sql(
        "events", list(PROFILE_COLS), PROFILE_COLS)


_register_profile_oracle()


ORACLES["corpus_diff_docs"] = """
    WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
    new AS (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' amended'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 11 <> 0)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text <> n.text THEN 'changed'
                ELSE 'same' END AS status
    FROM old o FULL OUTER JOIN new n USING (doc_id)
"""


ORACLES["fingerprint_docs"] = """
    WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                          x -> x <> '') AS l
               FROM documents),
    sh AS (SELECT doc_id, i::BIGINT AS i,
                  substr(md5(array_to_string(l[i:i + 7], ' ')), 1, 16) AS h
           FROM t, UNNEST(range(1, len(l) - 8 + 2)) AS r(i)
           WHERE len(l) >= 8),
    n AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id),
    small AS (SELECT s.doc_id, min(s.h) AS fingerprint
              FROM sh s JOIN n USING (doc_id) WHERE n.m <= 4
              GROUP BY s.doc_id),
    ws AS (SELECT doc_id, unnest(range(1, m - 4 + 2)) AS s
           FROM n WHERE m > 4),
    win AS (SELECT sh.doc_id, ws.s, sh.i, sh.h
            FROM ws JOIN sh ON sh.doc_id = ws.doc_id
                           AND sh.i BETWEEN ws.s AND ws.s + 3),
    pick AS (SELECT doc_id, s, i, h,
                    row_number() OVER (PARTITION BY doc_id, s
                                       ORDER BY h, i) AS rn
             FROM win),
    selpos AS (SELECT DISTINCT doc_id, i, h FROM pick WHERE rn = 1)
    SELECT doc_id, h AS fingerprint FROM selpos
    UNION ALL SELECT doc_id, fingerprint FROM small
"""


ORACLES["simhash_md5_docs"] = """
    WITH toks AS (SELECT doc_id,
                         unnest(list_filter(string_split(text, ' '),
                                x -> x <> '')) AS token
                  FROM documents),
    h AS (SELECT doc_id, substr(md5(token), 1, 16) AS hx FROM toks),
    bits AS (SELECT doc_id, bb.b AS b,
                    sum(2 * (((strpos('0123456789abcdef',
                                      substr(hx, 16 - (bb.b // 4), 1)) - 1)
                              // (CASE bb.b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                  WHEN 2 THEN 4 ELSE 8 END)) % 2) - 1) AS s
             FROM h, UNNEST(range(0, 64)) AS bb(b)
             GROUP BY doc_id, bb.b),
    fpb AS (SELECT doc_id, b,
                   CASE WHEN s >= 0 THEN 1 ELSE 0 END AS bit FROM bits),
    dig AS (SELECT doc_id, b // 4 AS dignib,
                   sum(bit * (CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                              WHEN 2 THEN 4 ELSE 8 END)) AS v
            FROM fpb GROUP BY doc_id, b // 4),
    hexstr AS (SELECT doc_id,
                      string_agg(substr('0123456789abcdef', (v + 1)::BIGINT, 1), ''
                                 ORDER BY dignib DESC) AS simhex
               FROM dig GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(hs.simhex, 'ffffffffffffffff') AS simhex
    FROM documents d LEFT JOIN hexstr hs USING (doc_id)
"""


ORACLES["fold_text_docs"] = """
    SELECT doc_id,
           lower(strip_accents(text || CASE doc_id % 5 WHEN 0 THEN ' Café' WHEN 1 THEN ' Über' WHEN 2 THEN ' naïve' WHEN 3 THEN ' Señor' WHEN 4 THEN ' Crème-Brûlée' END))
               AS folded
    FROM documents
"""


# PQ recall pinned from the deterministic seeded path (same pattern as
# the LSH/IVF ANN oracles): ADC screen + exact re-rank reaches the full
# exact top-10 for every probe query at sf0.01.
ORACLES["ann_topk_pq"] = """
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(10 AS BIGINT), CAST(10 AS BIGINT),
         CAST(1.0 AS DOUBLE)),
        (1, 10, 10, 1.0), (2, 10, 10, 1.0), (3, 10, 10, 1.0),
        (4, 10, 10, 1.0)
    ) AS t(query_id, n_exact, n_hits, recall)
"""


def _blocklist_oracle() -> str:
    conds = " OR ".join(
        f"host = '{d}' OR host LIKE '%.{d}'" for d in BLOCKED_DOMAINS)
    return f"""
        WITH u AS (SELECT doc_id,
                          'site' || (doc_id % 13) || '.example.com' AS host
                   FROM documents)
        SELECT doc_id, host FROM u WHERE NOT ({conds})
    """


ORACLES["blocklist_filter_docs"] = _blocklist_oracle()


ORACLES["pseudonymize_events"] = f"""
    SELECT substr(md5('{PSEUDO_SECRET}:' || user_id), 1, 16)
               AS user_id_token,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY 1
"""


ORACLES["frequent_ngrams_cms_docs"] = ORACLES["frequent_ngrams_docs"]


ORACLES["sniff_content_docs"] = """
    WITH p AS (SELECT doc_id,
                      CASE doc_id % 5
                          WHEN 0 THEN '%PDF-1.7 ' WHEN 1 THEN '<!DOCTYPE html>'
                          WHEN 2 THEN '<html lang=' WHEN 3 THEN '<?xml version='
                          ELSE '' END || text AS payload
               FROM documents),
    t AS (SELECT CASE
              WHEN substr(payload, 1, 5) = '%PDF-' THEN 'pdf'
              WHEN substr(payload, 1, 9) = '<!DOCTYPE' THEN 'html'
              WHEN substr(payload, 1, 5) = '<html' THEN 'html'
              WHEN substr(payload, 1, 5) = '<?xml' THEN 'xml'
              -- the binary-media magics in kernel order: png/jpeg start
              -- with non-ASCII bytes a VARCHAR payload cannot contain,
              -- but GIF8/RIFF are pure ASCII and CAN head a text row —
              -- mirror them so kernel and oracle agree on such rows
              WHEN substr(payload, 1, 4) = 'GIF8' THEN 'gif'
              WHEN substr(payload, 1, 4) = 'RIFF' THEN 'riff'
              ELSE 'other' END AS content_type
          FROM p)
    SELECT content_type, count(*)::BIGINT AS n FROM t GROUP BY 1
"""


ORACLES["table_checksum_orders"] = """
    SELECT count(*)::BIGINT AS n_rows,
           sum(('0x' || substr(md5('3|' || o_orderkey || '|'
                               || o_orderstatus), 1, 8))::BIGINT)::BIGINT
               AS checksum
    FROM orders
"""


def _register_wsample_oracle() -> None:
    from dedup_ray.stages.mixing import weighted_sample_sql

    ORACLES["weighted_sample_docs"] = weighted_sample_sql(
        WSAMPLE_K, "n_chars", seed=WSAMPLE_SEED)


_register_wsample_oracle()


ORACLES["partitioned_io_docs"] = """
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars
    FROM documents WHERE lang IN ('en', 'de')
    GROUP BY lang
"""


ORACLES["union_evolve_docs"] = """
    SELECT doc_id, text, NULL::VARCHAR AS lang FROM documents
    WHERE doc_id % 2 = 0
    UNION ALL BY NAME
    SELECT doc_id, text, lang FROM documents WHERE doc_id % 2 = 1
"""


ORACLES["debounce_events"] = f"""
    SELECT event_id, user_id, event_type FROM (
        SELECT event_id, user_id, event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap
        FROM events)
    WHERE gap IS NULL OR gap > {DEBOUNCE_SEC}::BIGINT * 1000000
"""


ORACLES["range_rank_orders"] = """
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice, o_orderkey) - 1
               AS rank
    FROM orders
"""

def _validate_oracle_sql() -> str:
    from dedup_ray.ops.profile import validate_sql

    return validate_sql(VALIDATE_RULES, "documents")


ORACLES["validate_docs"] = _validate_oracle_sql()

ORACLES["robots_filter_docs"] = _robots_oracle_sql()

ORACLES["hits_docs"] = _hits_oracle_sql()

ORACLES["psi_drift_events"] = f"""
    WITH w AS (SELECT {(PSI_HI - PSI_LO) / PSI_BUCKETS} AS w),
    av AS (SELECT least(greatest(CAST(floor((value - {PSI_LO})
               / (SELECT w FROM w)) AS BIGINT), 0),
               {PSI_BUCKETS - 1}) AS bucket
           FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL),
    bv AS (SELECT least(greatest(CAST(floor((value - {PSI_LO})
               / (SELECT w FROM w)) AS BIGINT), 0),
               {PSI_BUCKETS - 1}) AS bucket
           FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL),
    bk AS (SELECT unnest(range(0, {PSI_BUCKETS})) AS bucket),
    ca AS (SELECT bucket, count(*) AS c FROM av GROUP BY bucket),
    cb AS (SELECT bucket, count(*) AS c FROM bv GROUP BY bucket),
    j AS (SELECT bk.bucket, coalesce(ca.c, 0) AS n_a,
                 coalesce(cb.c, 0) AS n_b
          FROM bk LEFT JOIN ca USING (bucket)
                  LEFT JOIN cb USING (bucket)),
    tot AS (SELECT greatest(sum(n_a), 1) AS ta,
                   greatest(sum(n_b), 1) AS tb FROM j),
    p AS (SELECT bucket, n_a, n_b,
                 greatest(n_a / ta, 1e-6) AS pa_,
                 greatest(n_b / tb, 1e-6) AS pb_
          FROM j, tot),
    c AS (SELECT bucket, n_a, n_b,
                 round((pa_ - pb_) * ln(pa_ / pb_), 6) AS contrib
          FROM p)
    SELECT bucket, n_a, n_b, contrib,
           (SELECT round(sum(contrib), 6) FROM c) AS psi
    FROM c
"""

ORACLES["json_extract_events"] = """
    SELECT user_id,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           count(json_extract(props, '$.k')) AS n
    FROM events GROUP BY user_id
"""

def _lpa_oracle_sql(rounds: int) -> str:
    parts = ["""
    WITH e0 AS (
        SELECT doc_id AS a, (doc_id // 10) * 10 AS b FROM documents
        UNION ALL
        SELECT doc_id AS a, doc_id + 10 AS b FROM documents
        WHERE doc_id % 10 = 0 AND (doc_id // 10) % 2 = 0),
    es AS (SELECT a AS src, b AS dst FROM e0
           UNION ALL SELECT b AS src, a AS dst FROM e0),
    l0 AS (SELECT node, node AS label
           FROM (SELECT DISTINCT src AS node FROM es))"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    m{r} AS (SELECT e.dst AS node, l.label FROM es e
             JOIN l{r - 1} l ON e.src = l.node
             UNION ALL SELECT node, label FROM l{r - 1}),
    c{r} AS (SELECT node, label, count(*) AS c FROM m{r}
             GROUP BY node, label),
    l{r} AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER
                 (PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c{r}) WHERE rn = 1)""")
    parts.append(f"\n    SELECT node, label FROM l{rounds}")
    return "".join(parts)


ORACLES["lpa_communities_docs"] = _lpa_oracle_sql(LPA_ROUNDS)

ORACLES["rolling_events"] = f"""
    SELECT event_id, user_id,
           round(avg(value) OVER w, 6) AS roll_avg,
           round(sum(value) OVER w, 6) AS roll_sum,
           round(value - lag(value) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {ROLL_WINDOW - 1} PRECEDING AND CURRENT ROW)
"""

ORACLES["badword_docs"] = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    f AS (SELECT doc_id, count(*) AS nt,
                 CAST(sum(CASE WHEN lower(token) IN
                     {tuple(sorted(set(BADWORDS)))}
                     THEN 1 ELSE 0 END) AS BIGINT) AS nf
          FROM toks GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(f.nt, 0) AS n_tokens,
           coalesce(f.nf, 0) AS n_flagged,
           round(coalesce(f.nf, 0) * 1.0
                 / greatest(coalesce(f.nt, 0), 1), 6) AS bad_frac,
           (coalesce(f.nf, 0) * 1.0
            / greatest(coalesce(f.nt, 0), 1)) > {BADWORD_THRESHOLD}
               AS blocked
    FROM documents d LEFT JOIN f USING (doc_id)
"""


def _zorder_oracle_sql() -> str:
    from dedup_ray.stages.ordering import zorder_sql_expr

    expr = zorder_sql_expr(["u", "h"], bits=ZORDER_BITS)
    return f"""
    WITH p AS (SELECT event_id, CAST(user_id AS BIGINT) AS u,
                      CAST(hour(ts) AS BIGINT) AS h FROM events)
    SELECT event_id, u, h, ({expr}) AS zkey FROM p
"""


ORACLES["zorder_events"] = _zorder_oracle_sql()

ORACLES["auc_embeddings"] = """
    WITH d AS (SELECT CAST(embedding[1] AS DOUBLE) AS score,
                      CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS lab
               FROM embeddings),
    r AS (SELECT lab, avg(rn) OVER (PARTITION BY score) AS midrank
          FROM (SELECT score, lab,
                       row_number() OVER (ORDER BY score) AS rn
                FROM d)),
    agg AS (SELECT sum(CASE WHEN lab = 1 THEN midrank END) AS rs,
                   sum(lab) AS p, sum(1 - lab) AS n FROM r)
    SELECT round((rs - p * (p + 1) / 2.0) / (p * n), 6) AS auc,
           CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg
    FROM agg
"""

ORACLES["cocitation_docs"] = """
    WITH e AS (
        SELECT DISTINCT src, dst FROM (
            SELECT doc_id AS src, doc_id % 11 AS dst FROM documents
            UNION ALL
            SELECT doc_id, doc_id % 7 + 20 FROM documents
            UNION ALL
            SELECT doc_id, doc_id % 5 + 40 FROM documents))
    SELECT a.dst AS dst1, b.dst AS dst2, count(*) AS n_common
    FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
    GROUP BY a.dst, b.dst
"""

ORACLES["snm_pairs_orders"] = f"""
    WITH r AS (SELECT o_orderkey AS id,
                      row_number() OVER (
                          ORDER BY o_totalprice, o_orderkey) - 1 AS rnk
               FROM orders)
    SELECT a.id AS id1, b.id AS id2
    FROM r a JOIN r b
      ON b.rnk > a.rnk AND b.rnk - a.rnk < {SNM_WINDOW}
"""

ORACLES["zscore_docs"] = """
    SELECT doc_id, lang, n_chars,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / nullif(stddev_pop(n_chars) OVER (PARTITION BY lang),
                          0), 6) AS z
    FROM documents
"""

ORACLES["interleave_docs"] = """
    WITH k AS (SELECT count(DISTINCT lang) AS kk FROM documents),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (
                     PARTITION BY lang
                     ORDER BY md5(doc_id || ':interleave'), doc_id) - 1
                     AS rnk,
                 dense_rank() OVER (ORDER BY lang) - 1 AS kix
          FROM documents)
    SELECT doc_id, lang, rnk * kk + kix AS pos FROM r, k
"""

ORACLES["bbit_minhash_docs"] = f"""
    {TOKENS_CTE},
    dt AS (SELECT DISTINCT doc_id, token FROM toks),
    h AS (SELECT doc_id, p.i AS perm,
                 min(md5(p.i || ':' || token)) AS mh
          FROM dt CROSS JOIN range(0, {BBIT_PERMS}) p(i)
          GROUP BY doc_id, p.i),
    r AS (SELECT doc_id, perm,
                 ('0x' || substr(mh, 32, 1))::BIGINT % {1 << BBIT_B} AS reg
          FROM h),
    m AS (SELECT a.doc_id AS id1, a.doc_id + 1 AS id2,
                 sum(CASE WHEN a.reg = b.reg THEN 1 ELSE 0 END)
                     / CAST({BBIT_PERMS} AS DOUBLE) AS mf,
                 count(*) AS np
          FROM r a JOIN r b ON b.doc_id = a.doc_id + 1 AND b.perm = a.perm
          GROUP BY a.doc_id)
    SELECT id1, id2,
           round((mf - {1.0 / (1 << BBIT_B)}) /
                 (1 - {1.0 / (1 << BBIT_B)}), 6) AS est_jaccard
    FROM m WHERE np = {BBIT_PERMS}
"""

ORACLES["containment_join_docs"] = """
    WITH lt AS (
        SELECT doc_id AS id_l,
               (string_split(text, ' '))[1:15] AS toks
        FROM documents
        WHERE doc_id % 4 = 0
          AND array_length(string_split(text, ' ')) >= 30),
    rt AS (
        SELECT doc_id AS id_r, string_split(text, ' ') AS toks
        FROM documents
        WHERE array_length(string_split(text, ' ')) >= 30),
    shl AS (
        SELECT DISTINCT id_l,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        FROM (SELECT id_l, toks,
                     unnest(range(1, array_length(toks) - 1)) AS i
              FROM lt)),
    shr AS (
        SELECT DISTINCT id_r,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        FROM (SELECT id_r, toks,
                     unnest(range(1, array_length(toks) - 1)) AS i
              FROM rt)),
    cardl AS (SELECT id_l, count(*) AS n_l FROM shl GROUP BY id_l),
    cardr AS (SELECT id_r, count(*) AS n_r FROM shr GROUP BY id_r),
    dfc AS (
        SELECT s, count(*) AS df FROM (
            SELECT s FROM shl UNION ALL SELECT s FROM shr) GROUP BY s),
    rare AS (SELECT s FROM dfc WHERE df <= 8),
    cand AS (
        SELECT DISTINCT l.id_l, r.id_r
        FROM shl l JOIN rare USING (s) JOIN shr r ON r.s = l.s),
    ints AS (
        SELECT c.id_l, c.id_r, count(*) AS inter
        FROM cand c
        JOIN shl a ON a.id_l = c.id_l
        JOIN shr b ON b.id_r = c.id_r AND b.s = a.s
        GROUP BY c.id_l, c.id_r)
    SELECT i.id_l, i.id_r,
           CAST(cl.n_l AS BIGINT) AS n_l,
           CAST(cr.n_r AS BIGINT) AS n_r,
           CAST(i.inter AS BIGINT) AS inter,
           CAST(i.inter AS DOUBLE) / cl.n_l AS containment
    FROM ints i
    JOIN cardl cl USING (id_l)
    JOIN cardr cr USING (id_r)
    WHERE CAST(i.inter AS DOUBLE) / cl.n_l >= 0.8
"""


def _decode_entities_oracle_sql() -> str:
    from dedup_ray.stages.normtext import entity_sql_expr

    synth = ("'A &amp; B &lt;tag&gt; &quot;q&quot; "
             "&amp;lt;once&amp;gt; &nbsp;&hellip; ' || coalesce(text, '')")
    return f"SELECT doc_id, {entity_sql_expr(f'({synth})')} AS text " \
           "FROM documents"


ORACLES["decode_entities_docs"] = _decode_entities_oracle_sql()

ORACLES["grouped_median_events"] = """
    SELECT event_type, count(*) AS n,
           round(median(value), 6) AS median
    FROM events GROUP BY event_type
"""

ORACLES["bfs_dist_docs"] = """
    WITH RECURSIVE edges AS (
        SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
        WHERE doc_id >= 1
        UNION ALL
        SELECT doc_id, doc_id // 3 FROM documents WHERE doc_id >= 1
    ),
    seeds AS (SELECT doc_id AS node FROM documents WHERE doc_id % 97 = 0),
    walk AS (
        SELECT node, 0 AS dist FROM seeds
        UNION ALL
        SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON w.node = e.src
        WHERE w.dist < 3
    )
    SELECT node, min(dist) AS dist FROM walk GROUP BY node
"""

ORACLES["linreg_events"] = """
    SELECT event_type, count(*) AS n,
           round(regr_slope(value, hour(ts)), 6) AS slope,
           round(regr_intercept(value, hour(ts)), 6) AS intercept,
           round(regr_r2(value, hour(ts)), 6) AS r2
    FROM events GROUP BY event_type
"""

ORACLES["pmi_bigrams_docs"] = f"""
    WITH t AS (SELECT list_filter(string_split(COALESCE(text, ''), ' '),
                                  x -> x <> '') AS l FROM documents),
    ug AS (SELECT unnest(l) AS w FROM t),
    uc AS (SELECT w, count(*) AS c FROM ug GROUP BY w),
    bg AS (SELECT l[i] AS w1, l[i + 1] AS w2
           FROM t, UNNEST(range(1, len(l))) AS r(i)),
    bc AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
    tot AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uc) AS n1,
                   (SELECT CAST(sum(c) AS DOUBLE) FROM bc) AS n2)
    SELECT bc.w1, bc.w2, bc.c,
           round(ln((CAST(bc.c AS DOUBLE) * n1 * n1)
                    / (n2 * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))),
                 6) AS pmi
    FROM bc, tot
    JOIN uc u1 ON bc.w1 = u1.w
    JOIN uc u2 ON bc.w2 = u2.w
    WHERE bc.c >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, bc.w1, bc.w2 LIMIT {PMI_TOP_K}
"""


def _kmeans_oracle_sql() -> str:
    k, R, D = KMEANS_K, KMEANS_ROUNDS, KMEANS_DIM
    assign = (
        "SELECT vec_id, c FROM ("
        "SELECT e.vec_id, i.c, row_number() OVER ("
        "PARTITION BY e.vec_id ORDER BY "
        "list_distance(CAST(e.embedding AS DOUBLE[]), i.emb), i.c) AS rn "
        "FROM embeddings e CROSS JOIN c{p} i) WHERE rn = 1"
    )
    parts = [f"""
    WITH c0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
               CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings ORDER BY vec_id LIMIT {k})"""]
    for r in range(1, R + 1):
        parts.append(f""",
    a{r} AS MATERIALIZED ({assign.format(p=r - 1)}),
    m{r} AS MATERIALIZED (
        SELECT a.c AS c, r.i AS dim, avg(e.embedding[r.i]) AS m
        FROM embeddings e JOIN a{r} a USING (vec_id)
             CROSS JOIN range(1, {D + 1}) AS r(i)
        GROUP BY a.c, r.i),
    c{r} AS MATERIALIZED (
        SELECT prev.c, COALESCE(nw.emb, prev.emb) AS emb
        FROM c{r - 1} prev LEFT JOIN (
            SELECT c, list(m ORDER BY dim) AS emb FROM m{r} GROUP BY c
        ) nw USING (c))""")
    parts.append(
        "\n    SELECT vec_id, c AS cluster FROM ("
        + assign.format(p=R).split("FROM (", 1)[1]
    )
    return "".join(parts)


ORACLES["kmeans_embeddings"] = _kmeans_oracle_sql()

ORACLES["warc_roundtrip_docs"] = """
    SELECT 'http://example.com/doc/' || doc_id AS url,
           COALESCE(text, '') AS text,
           CAST(200 AS BIGINT) AS http_status
    FROM documents
"""

ORACLES["redirect_resolve_docs"] = """
    WITH RECURSIVE edges AS (
        SELECT doc_id AS src, doc_id - 1 AS dst
        FROM documents WHERE doc_id % 8 <> 0
    ),
    reach AS (
        SELECT src, dst AS cur FROM edges
        UNION ALL
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.cur = e.src
    )
    SELECT src, cur AS final FROM reach
    WHERE cur NOT IN (SELECT src FROM edges)
"""

ORACLES["rollup_events"] = """
    SELECT event_type, user_id,
           round(sum(value), 4) AS sum_value, count(*) AS n,
           CAST(2 - GROUPING(event_type) - GROUPING(user_id) AS BIGINT)
               AS lvl
    FROM events GROUP BY ROLLUP(event_type, user_id)
"""

ORACLES["token_entropy_docs"] = TOKENS_CTE + """
    , c AS (SELECT doc_id, token, count(*) AS c
            FROM toks GROUP BY doc_id, token),
    n AS (SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS slc
          FROM c GROUP BY doc_id)
    SELECT doc_id, round(ln(n) - slc / n, 6) AS token_entropy FROM n
"""

ORACLES["lang_percentile_docs"] = """
    SELECT doc_id, lang, n_chars,
           percent_rank() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS pct_rank
    FROM documents
"""

ORACLES["vocab_ids_docs"] = """
    WITH t AS (SELECT string_split(COALESCE(text, ''), ' ') AS toks
               FROM documents),
    tok AS (SELECT toks[i] AS token
            FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
    vc AS (SELECT token, count(*) AS freq FROM tok GROUP BY token)
    SELECT token, freq,
           row_number() OVER (ORDER BY freq DESC, token) - 1 AS vocab_id
    FROM vc
"""


def _register_exact_substr_oracles() -> None:
    L = EXACT_SUBSTR_LEN
    ORACLES["exact_substring_docs"] = _exact_substr_ctes(L) + f""",
        isl AS (SELECT doc_id, i,
                       lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi
                FROM s),
        cov AS (SELECT doc_id,
                       sum(CASE WHEN pi IS NULL OR i - pi >= {L}
                                THEN {L} ELSE i - pi END) AS dup_chars
                FROM isl GROUP BY doc_id)
        SELECT d.doc_id, length(d.text) AS nchars,
               coalesce(c.dup_chars, 0)::BIGINT AS dup_chars
        FROM documents d LEFT JOIN cov c USING (doc_id)
    """
    ORACLES["exact_substring_cut_docs"] = _exact_substr_ctes(L) + f""",
        m AS (SELECT doc_id, i,
                     CASE WHEN i - max(i) OVER (
                              PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) < {L}
                          THEN 0 ELSE 1 END AS newgrp
              FROM s),
        grp AS (SELECT doc_id, i,
                       sum(newgrp) OVER (PARTITION BY doc_id
                                         ORDER BY i) AS gid
                FROM m),
        isl AS (SELECT doc_id, gid, min(i) AS a, max(i) + {L} AS b
                FROM grp GROUP BY doc_id, gid),
        seg AS (SELECT doc_id, b AS gstart,
                       lead(a) OVER (PARTITION BY doc_id
                                     ORDER BY a) AS gend
                FROM isl
                UNION ALL
                SELECT doc_id, 1, min(a) FROM isl GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN count(s.gstart) = 0 THEN any_value(d.text)
                    ELSE coalesce(string_agg(
                        substr(d.text, s.gstart,
                               coalesce(s.gend, length(d.text) + 1)
                               - s.gstart),
                        '' ORDER BY s.gstart), '') END AS text
        FROM documents d LEFT JOIN seg s ON d.doc_id = s.doc_id
        GROUP BY d.doc_id
    """


_register_exact_substr_oracles()


def cogroup_user_activity(sf_dir: str):
    """General N-ary cogroup (``ops/relational.py::cogroup``): events and
    orders co-partitioned on their own key columns in ONE exchange; each
    partition computes per-user aggregates from both sides with full-outer
    semantics — no join-key surrogate, no second shuffle of pre-aggregated
    streams."""
    from dedup_ray.ops.relational import cogroup

    ev = _read(sf_dir, "events", columns=["user_id", "value"])
    od = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def per_part(e: pa.Table, o: pa.Table) -> pa.Table:
        eu = e["user_id"].to_numpy(zero_copy_only=False)
        evv = e["value"].to_numpy(zero_copy_only=False)
        ou = o["o_custkey"].to_numpy(zero_copy_only=False)
        ov = o["o_totalprice"].to_numpy(zero_copy_only=False)
        keys = np.union1d(eu, ou)
        n_ev = np.zeros(len(keys), np.int64)
        s_ev = np.zeros(len(keys), np.float64)
        n_od = np.zeros(len(keys), np.int64)
        s_od = np.zeros(len(keys), np.float64)
        if len(eu):
            idx = np.searchsorted(keys, eu)
            np.add.at(n_ev, idx, 1)
            np.add.at(s_ev, idx, evv)
        if len(ou):
            idx = np.searchsorted(keys, ou)
            np.add.at(n_od, idx, 1)
            np.add.at(s_od, idx, ov)
        return pa.table({
            "user_id": pa.array(keys, pa.int64()),
            "n_events": pa.array(n_ev),
            "sum_value": pc.round(pa.array(s_ev), ndigits=6),
            "n_orders": pa.array(n_od),
            "sum_price": pc.round(pa.array(s_od), ndigits=2),
        })

    return cogroup(
        [ev, od], ["user_id", "o_custkey"], per_part, 16,
        empty_schemas=[
            pa.schema([("user_id", pa.int64()), ("value", pa.float64())]),
            pa.schema([("o_custkey", pa.int64()),
                       ("o_totalprice", pa.float64())]),
        ],
    )


ORACLES["cogroup_user_activity"] = """
    WITH e AS (SELECT user_id, count(*) AS n_events, sum(value) AS sv
               FROM events GROUP BY user_id),
         o AS (SELECT o_custkey AS user_id, count(*) AS n_orders,
                      sum(o_totalprice) AS sp
               FROM orders GROUP BY o_custkey)
    SELECT coalesce(e.user_id, o.user_id) AS user_id,
           coalesce(n_events, 0) AS n_events,
           round(coalesce(sv, 0), 6) AS sum_value,
           coalesce(n_orders, 0) AS n_orders,
           round(coalesce(sp, 0), 2) AS sum_price
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
"""


# upsert shard synthesis constants — shared by kernel and oracle
UPSERT_MOD_UPDATE = 10   # doc_id % 10 == 0 gets a re-fetched version 2
UPSERT_MOD_NEW = 97      # doc_id % 97 == 0 spawns a brand-new page
UPSERT_NEW_BASE = 10_000_000


def upsert_latest_docs(sf_dir: str):
    """MERGE-INTO upsert (``ops/relational.py::upsert_latest``): a
    deterministic update shard (re-fetched pages for doc_id%10==0 with
    version 2, brand-new pages for doc_id%97==0) merges into the base
    corpus; highest version per doc_id wins in ONE cogroup exchange."""
    from dedup_ray.ops.relational import upsert_latest

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tag_base(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "version": pa.array(np.ones(t.num_rows, np.int64)),
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        })

    def mk_updates(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        upd = ids[ids % UPSERT_MOD_UPDATE == 0]
        new = ids[ids % UPSERT_MOD_NEW == 0] + UPSERT_NEW_BASE
        # re-fetched text = old text + ' [updated]'; new page text is
        # 'new page <id>' — only lengths survive to the output
        old_len = pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_numpy(
            zero_copy_only=False)[ids % UPSERT_MOD_UPDATE == 0]
        return pa.table({
            "doc_id": pa.array(np.r_[upd, new], pa.int64()),
            "version": pa.array(
                np.r_[np.full(len(upd), 2, np.int64),
                      np.ones(len(new), np.int64)]),
            "n_chars": pa.array(
                np.r_[old_len + len(" [updated]"),
                      np.array([len(f"new page {i}") for i in new],
                               np.int64)]),
        })

    tagged = base.map_batches(tag_base, batch_format="pyarrow")
    updates = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(mk_updates, batch_format="pyarrow")
    return upsert_latest(tagged, updates, "doc_id", "version")


ORACLES["upsert_latest_docs"] = f"""
    WITH base AS (SELECT doc_id, 1::BIGINT AS version,
                         length(text)::BIGINT AS n_chars
                  FROM documents),
    upd AS (SELECT doc_id, 2::BIGINT AS version,
                   (length(text) + {len(' [updated]')})::BIGINT AS n_chars
            FROM documents WHERE doc_id % {UPSERT_MOD_UPDATE} = 0
            UNION ALL
            SELECT doc_id + {UPSERT_NEW_BASE}, 1::BIGINT,
                   length('new page ' ||
                          (doc_id + {UPSERT_NEW_BASE}))::BIGINT
            FROM documents WHERE doc_id % {UPSERT_MOD_NEW} = 0),
    u AS (SELECT *, 0 AS src FROM base
          UNION ALL SELECT *, 1 AS src FROM upd)
    SELECT doc_id, version, n_chars FROM u
    QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY version DESC, src DESC) = 1
"""


def mixed_lang_clusters_docs(sf_dir: str):
    """Cluster-hygiene audit: per CC cluster (the deterministic
    ``cc_chain_docs`` graph), member count, distinct languages and a
    mixed-language flag — near-dup clusters spanning languages signal
    boilerplate-driven false merges (the RefinedWeb failure mode).
    One co-partitioning join + one cluster-keyed exchange with a
    vectorized nunique pass."""
    from dedup_ray.util.dsutil import hash_join, partitioned_group_apply

    clusters = _chain_cc(sf_dir)
    langs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    joined = hash_join(clusters, langs, on="doc_id",
                       left_cols=["doc_id", "cluster_id"],
                       right_cols=["doc_id", "lang"], how="inner")

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster_id")["lang"]
        out = pd.DataFrame({
            "n_docs": g.size().astype("int64"),
            "n_langs": g.nunique().astype("int64"),
        }).reset_index()
        out["mixed"] = out["n_langs"] > 1
        return out

    return partitioned_group_apply(joined, ["cluster_id"], audit)


ORACLES["mixed_lang_clusters_docs"] = _CHAIN_COMP_CTE + """
    SELECT c.cluster_id, count(*)::BIGINT AS n_docs,
           count(DISTINCT d.lang)::BIGINT AS n_langs,
           count(DISTINCT d.lang) > 1 AS mixed
    FROM comp c JOIN documents d USING (doc_id)
    GROUP BY c.cluster_id
"""


DUP_SAMPLE_BUCKETS = 64  # of 256 two-hex-digit digest buckets (25%)


def dup_rate_estimate_docs(sf_dir: str):
    """Sampled dup-rate estimator — the cheap pre-flight a 100-TB dedup
    run starts with: documents whose content-digest falls in the first
    64 of 256 md5 buckets (a deterministic, hash-uniform 25% sample —
    sampling by DIGEST keeps every copy of a sampled text together, so
    within-sample dup structure is unbiased) are counted exactly:
    sampled docs, distinct texts, duplicate docs, dup rate.  Digest
    partials + one bucket-pruned digest exchange; the full corpus is
    never shuffled."""
    from dedup_ray.util.dsutil import partitioned_group_apply
    from dedup_ray.util.hashing import content_digest

    ds = _read(sf_dir, "documents", columns=["text"])

    def sample(t: pa.Table) -> pa.Table:
        dig = content_digest(t["text"].to_pylist())
        keep = np.array([int(d[:2], 16) for d in dig]) \
            < DUP_SAMPLE_BUCKETS
        return pa.table({"digest": pa.array(
            np.array(dig, dtype=object)[keep], pa.string())})

    sampled = ds.map_batches(sample, batch_format="pyarrow")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_rows": np.array([len(df)], np.int64),
            "n_distinct": np.array([df["digest"].nunique()], np.int64),
        })

    partial = partitioned_group_apply(sampled, ["digest"], part)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df["n_rows"].sum())
        d = int(df["n_distinct"].sum())
        return pd.DataFrame({
            "sampled_docs": np.array([n], np.int64),
            "distinct_texts": np.array([d], np.int64),
            "dup_docs": np.array([n - d], np.int64),
            "dup_rate": np.array([np.round((n - d) / max(n, 1), 6)]),
        })

    return partitioned_group_apply(partial, ["n_rows"], combine,
                                   num_partitions=1)


ORACLES["dup_rate_estimate_docs"] = f"""
    WITH s AS (SELECT md5(coalesce(text, '')) AS dg FROM documents
               WHERE ('0x' || substr(md5(coalesce(text, '')), 1, 2))::INT
                     < {DUP_SAMPLE_BUCKETS})
    SELECT count(*)::BIGINT AS sampled_docs,
           count(DISTINCT dg)::BIGINT AS distinct_texts,
           (count(*) - count(DISTINCT dg))::BIGINT AS dup_docs,
           round((count(*) - count(DISTINCT dg))::DOUBLE
                 / greatest(count(*), 1), 6) AS dup_rate
    FROM s
"""


ZIPF_TOP = 100


def zipf_fit_docs(sf_dir: str):
    """Vocabulary power-law health check: OLS fit of ln(freq) on
    ln(rank) over the top-100 tokens (rank ties broken by token asc) —
    natural corpora sit near slope -1; template/spam floods bend the
    curve.  Per-batch np.unique count partials, ONE small grouped sum,
    bounded sort+limit, then the regression runs over 100 rows inside
    a single final task (never the raw token stream)."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.coalesce(t["text"], ""), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        v, c = np.unique(
            np.asarray(toks.to_pylist(), dtype=object), return_counts=True)
        return pa.table({"token": pa.array(v, pa.string()),
                         "cnt": pa.array(c, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("cnt")
    top = agg.map_batches(
        lambda t: pa.table({"token": t["token"],
                            "n": pc.cast(t["sum(cnt)"], pa.int64())}),
        batch_format="pyarrow",
    ).sort(["n", "token"], descending=[True, False]).limit(ZIPF_TOP)

    def fit(t: pa.Table) -> pa.Table:
        c = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        tok = np.asarray(t["token"].to_pylist(), dtype=object)
        order = np.lexsort((tok, -c))  # rank order, immune to block order
        y = np.log(c[order])
        x = np.log(np.arange(1, len(y) + 1, dtype=np.float64))
        n = float(len(y))
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        slope = (n * sxy - sx * sy) / dx
        intercept = (sy - slope * sx) / n
        r2 = 0.0 if dy == 0 else (n * sxy - sx * sy) ** 2 / (dx * dy)
        return pa.table({
            "n_points": pa.array([int(n)], pa.int64()),
            "slope": pa.array([np.round(slope, 6)]),
            "intercept": pa.array([np.round(intercept, 6)]),
            "r2": pa.array([np.round(r2, 6)]),
        })

    return top.repartition(1).map_batches(fit, batch_format="pyarrow")


ORACLES["zipf_fit_docs"] = f"""
    WITH tok0 AS (
        SELECT unnest(string_split(coalesce(text, ''), ' ')) AS token
        FROM documents),
    tok AS (SELECT * FROM tok0 WHERE token <> ''),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    top AS (SELECT token, c FROM cnt
            ORDER BY c DESC, token LIMIT {ZIPF_TOP}),
    pts AS (SELECT ln((row_number() OVER (ORDER BY c DESC, token))
                      ::DOUBLE) AS x,
                   ln(c::DOUBLE) AS y
            FROM top),
    s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(x * y) AS sxy
          FROM pts)
    SELECT n::BIGINT AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept,
           round(CASE WHEN (n * syy - sy * sy) = 0 THEN 0
                      ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy)
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 END, 6) AS r2
    FROM s
"""


def source_overlap_docs(sf_dir: str):
    """Cross-source duplication matrix (``ops/relational.py::
    cooccurrence``): every document is re-hosted once under the next
    source ring-wise (``'src' || ((doc_id+1) %% 20)`` — the planted
    syndication), pages reduce to distinct (digest, source), and the
    matrix counts, per unordered source pair, how many distinct texts
    both host — the report that tells a curation run which sources are
    mirrors of each other before it weights them independently.  One
    digest-keyed exchange (each digest's C(k,2) pairs emitted where it
    lives) + a bounded pair-sum combine."""
    from dedup_ray.ops.relational import cooccurrence
    from dedup_ray.util.hashing import content_digest

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        dig = pa.array(content_digest(t["text"].to_pylist()), pa.string())
        mirror = pa.array(
            ("src" + pd.Series((ids + 1) % 20).astype(str)), pa.string())
        return pa.table({
            "digest": pa.concat_arrays([dig, dig]),
            "source": pa.concat_arrays(
                [pc.cast(t["source"].combine_chunks(), pa.string()),
                 mirror]),
        })

    pg = ds.map_batches(pages, batch_format="pyarrow")
    out = cooccurrence(pg, "digest", "source")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["source1", "source2", "n_shared"])

    return out.map_batches(rename, batch_format="pyarrow")


ORACLES["source_overlap_docs"] = """
    WITH pages AS (
        SELECT md5(coalesce(text, '')) AS dg, source AS s FROM documents
        UNION ALL
        SELECT md5(coalesce(text, '')),
               'src' || ((doc_id + 1) % 20)::VARCHAR
        FROM documents),
    d AS (SELECT DISTINCT dg, s FROM pages)
    SELECT a.s AS source1, b.s AS source2, count(*)::BIGINT AS n_shared
    FROM d a JOIN d b ON a.dg = b.dg AND a.s < b.s
    GROUP BY 1, 2
"""


SWEEP_CUTS = [25, 50, 75]  # integer percent cuts (binary-exact /100)


def threshold_sweep_docs(sf_dir: str):
    """Dedup-threshold sensitivity report — the tuning pass run before
    committing a verify threshold at corpus scale: the SAME candidate
    edge set (adjacent-doc edges with a deterministic integer percent
    similarity ``(u*37) %% 100``) is cut at three thresholds, each cut's
    connected components are computed, and one row per threshold
    reports edges kept, cluster count, docs clustered and the largest
    cluster.  Edges materialize ONCE; each cut is a filter + CC + two
    tiny aggregates, so the sweep costs T× the CC, never T× the
    candidate generation.  Integer percent comparisons keep kernel and
    oracle exact."""
    from dedup_ray.stages.cc import component_labels

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def cand_edges(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id1": pa.array(u, pa.int64()),
            "id2": pa.array(u + 1, pa.int64()),
            "pct": pa.array((u * 37) % 100, pa.int64()),
        })

    cand = docs.map_batches(cand_edges, batch_format="pyarrow")
    id2_side = docs.map_batches(
        lambda t: t.rename_columns(["id2"]), batch_format="pyarrow")
    edges = semi_join(cand, id2_side, "id2",
                      cols=["id1", "id2", "pct"]).materialize()

    rows = []
    for cut in SWEEP_CUTS:
        kept = edges.map_batches(
            lambda t, c=cut: t.filter(pc.greater_equal(t["pct"], c)),
            batch_format="pyarrow",
        ).materialize()
        n_edges = kept.count()
        labels = component_labels(kept) if n_edges else None
        if labels is None:
            rows.append((cut / 100.0, 0, 0, 0, 0))
            continue
        sizes = labels.groupby("cluster_id").count().to_pandas()
        n = sizes["count()"].to_numpy()
        rows.append((cut / 100.0, n_edges, len(n), int(n.sum()),
                     int(n.max())))
    return pd.DataFrame(rows, columns=[
        "threshold", "n_edges", "n_clusters", "n_docs", "max_cluster"
    ]).astype({"threshold": "float64", "n_edges": "int64",
               "n_clusters": "int64", "n_docs": "int64",
               "max_cluster": "int64"})


def _threshold_sweep_oracle() -> str:
    parts = []
    for i, cut in enumerate(SWEEP_CUTS):
        parts.append(f"""
    k{i} AS (SELECT u, v FROM e WHERE pct >= {cut}),
    ek{i} AS (SELECT u, v FROM k{i} UNION ALL SELECT v, u FROM k{i}),
    r{i}(node, lbl) AS (
        SELECT u, u FROM ek{i}
        UNION
        SELECT e2.v, r.lbl FROM r{i} r JOIN ek{i} e2 ON e2.u = r.node),
    c{i} AS (SELECT node, min(lbl) AS lbl FROM r{i} GROUP BY node),
    s{i} AS (SELECT lbl, count(*) AS n FROM c{i} GROUP BY lbl),
    rep{i} AS (SELECT {cut} / 100.0 AS threshold,
                      (SELECT count(*) FROM k{i})::BIGINT AS n_edges,
                      count(*)::BIGINT AS n_clusters,
                      coalesce(sum(n), 0)::BIGINT AS n_docs,
                      coalesce(max(n), 0)::BIGINT AS max_cluster
               FROM s{i})""")
    selects = " UNION ALL ".join(
        f"SELECT * FROM rep{i}" for i in range(len(SWEEP_CUTS)))
    return ("WITH RECURSIVE e AS (SELECT a.doc_id AS u, "
            "a.doc_id + 1 AS v, (a.doc_id * 37) % 100 AS pct "
            "FROM documents a JOIN documents b "
            "ON b.doc_id = a.doc_id + 1),"
            + ",".join(parts) + " " + selects)


ORACLES["threshold_sweep_docs"] = _threshold_sweep_oracle()


WATERMARK_DELAY_US = 300_000_000  # 5-minute allowed lateness


def late_events(sf_dir: str):
    """Watermark / late-arrival accounting (``stages/ordering.py::
    watermark_late``, the Dataflow-model bookkeeping): replaying the
    event log in event_id arrival order, a record is late when its
    event time trails the running max event time of all earlier
    arrivals by more than 5 minutes.  Two-level prefix MAX — ordered
    range buckets, per-bucket running max, B driver-side bucket maxima
    folded into exclusive offsets; all math in int64 microseconds so
    the SQL window oracle matches exactly."""
    from dedup_ray.stages.ordering import watermark_late

    ds = _read(sf_dir, "events", columns=["event_id", "ts"])
    return watermark_late(ds, "event_id", "ts", WATERMARK_DELAY_US)


ORACLES["late_events"] = f"""
    WITH w AS (SELECT event_id, ts,
                      max(ts) OVER (ORDER BY event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS wm
               FROM events)
    SELECT event_id,
           (wm IS NOT NULL AND
            date_diff('microsecond', ts, wm) > {WATERMARK_DELAY_US})
               AS late,
           (CASE WHEN wm IS NOT NULL AND
                      date_diff('microsecond', ts, wm)
                          > {WATERMARK_DELAY_US}
                 THEN date_diff('microsecond', ts, wm)
                      - {WATERMARK_DELAY_US}
                 ELSE 0 END)::BIGINT AS late_by_us
    FROM w
"""


MOJIBAKE_PLANT_MOD = 7


def mojibake_docs(sf_dir: str):
    """ftfy-style encoding-repair screen (``stages/webclean.py::
    mojibake_screen``): every ``doc_id %% 7 == 0`` document gets a
    deterministic cp1252-mojibake suffix planted; the stage counts
    marker sequences across the ordered ``MOJIBAKE_PAIRS`` list,
    repairs them with global replaces, and reports (n_mojibake,
    flagged, repaired length).  Batch-local vectorized Arrow — no
    shuffle; the oracle replays the same plant and pair list via
    nested replace()."""
    from dedup_ray.stages.webclean import MOJIBAKE_PAIRS, mojibake_screen

    suffix = " caf" + MOJIBAKE_PAIRS[0][0] + " x" + MOJIBAKE_PAIRS[2][0]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        tail = pa.array(np.where(ids % MOJIBAKE_PLANT_MOD == 0,
                                 suffix, ""))
        txt = pc.binary_join_element_wise(
            pc.coalesce(t["text"], ""), tail, "")
        return pa.table({"doc_id": t["doc_id"], "text": txt})

    return mojibake_screen(ds.map_batches(plant, batch_format="pyarrow"))


def _mojibake_oracle() -> str:
    from dedup_ray.stages.webclean import (MOJIBAKE_PAIRS,
                                           mojibake_oracle_exprs)

    suffix = " caf" + MOJIBAKE_PAIRS[0][0] + " x" + MOJIBAKE_PAIRS[2][0]
    n_expr, rep_expr = mojibake_oracle_exprs("t")
    return f"""
    WITH planted AS (
        SELECT doc_id,
               coalesce(text, '') ||
               (CASE WHEN doc_id % {MOJIBAKE_PLANT_MOD} = 0
                     THEN '{suffix}' ELSE '' END) AS t
        FROM documents)
    SELECT doc_id, ({n_expr})::BIGINT AS n_mojibake,
           ({n_expr}) > 0 AS flagged,
           length({rep_expr})::BIGINT AS n_chars_repaired
    FROM planted
"""


ORACLES["mojibake_docs"] = _mojibake_oracle()


DOMAIN_SUFFIX_SYNTH = ["com", "co.uk", "org", "com.au", "io", "net",
                       "ac.uk"]
DOMAIN_SUB_SYNTH = ["www.", "blog.", ""]


def domain_count_docs(sf_dir: str):
    """Registrable-domain rollup (``stages/urlnorm.py::
    registrable_domain``): per doc a host is synthesized (subdomain /
    site / TLD all pure functions of doc_id, TLDs spanning two-level
    public suffixes like co.uk), mapped to its registrable domain by
    PSL longest-match, and counted per domain — the ownership-boundary
    aggregation real crawl caps group on (per-HOST caps undercount
    sites spanning subdomains).  Batch-local suffix match + one
    domain-keyed count exchange."""
    from dedup_ray.stages.urlnorm import registrable_domain
    from dedup_ray.util.dsutil import partitioned_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_host(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = np.array(DOMAIN_SUB_SYNTH, dtype=object)[ids % 3]
        suf = np.array(DOMAIN_SUFFIX_SYNTH,
                       dtype=object)[ids % len(DOMAIN_SUFFIX_SYNTH)]
        host = (pd.Series(sub) + "site" + pd.Series(ids % 11).astype(str)
                + "." + pd.Series(suf))
        return pa.table({"doc_id": t["doc_id"],
                         "host": pa.array(host, pa.string())})

    hosts = registrable_domain(
        ds.map_batches(mk_host, batch_format="pyarrow"), "host")

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("domain").size().rename("n_docs").reset_index()
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return partitioned_group_apply(hosts.map_batches(
        lambda t: t.select(["domain"]), batch_format="pyarrow"),
        ["domain"], count_part)


def _domain_oracle() -> str:
    from dedup_ray.stages.urlnorm import registrable_domain_sql

    subs = ", ".join(f"'{s}'" for s in DOMAIN_SUB_SYNTH)
    sufs = ", ".join(f"'{s}'" for s in DOMAIN_SUFFIX_SYNTH)
    return f"""
    WITH h AS (
        SELECT ([{subs}][(doc_id % 3) + 1])
               || 'site' || (doc_id % 11)::VARCHAR || '.'
               || ([{sufs}][(doc_id % {len(DOMAIN_SUFFIX_SYNTH)}) + 1])
                   AS host
        FROM documents),
    d AS (SELECT {registrable_domain_sql('host')} AS domain FROM h)
    SELECT domain, count(*)::BIGINT AS n_docs FROM d GROUP BY domain
"""


ORACLES["domain_count_docs"] = _domain_oracle()


def pareto_front_docs(sf_dir: str):
    """Pareto-front (skyline) selection (``ops/skyline.py``): documents
    no other document beats on BOTH axes — more distinct vocabulary
    (maximize) at fewer total tokens (minimize).  The per-batch prune
    is a true combiner (``front(union) == front(union of fronts)``),
    so only O(front) rows reach the single gather partition; axes are
    int64 so kernel and oracle compare exactly."""
    from dedup_ray.ops.skyline import pareto_front
    from dedup_ray.stages.textstats import explode_tokens

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        flat, parents, n = explode_tokens(t["text"], t.num_rows)
        dfu = pd.DataFrame(
            {"p": parents, "t": flat.to_pandas()}).drop_duplicates()
        nd = np.bincount(dfu["p"], minlength=t.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_distinct": pa.array(nd),
            "n_tokens": pa.array(n),
        })

    metrics = ds.map_batches(stats, batch_format="pyarrow")
    return pareto_front(metrics, "n_distinct", "n_tokens",
                        maximize=(True, False))


ORACLES["pareto_front_docs"] = """
    WITH tok0 AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), ' '))
                   AS token
        FROM documents),
    tok AS (SELECT * FROM tok0 WHERE token <> ''),
    d AS (SELECT doc_id, count(DISTINCT token) AS n_distinct,
                 count(*) AS n_tokens
          FROM tok GROUP BY doc_id),
    allc AS (SELECT documents.doc_id,
                    coalesce(d.n_distinct, 0)::BIGINT AS n_distinct,
                    coalesce(d.n_tokens, 0)::BIGINT AS n_tokens
             FROM documents LEFT JOIN d USING (doc_id))
    SELECT a.doc_id, a.n_distinct, a.n_tokens FROM allc a
    WHERE NOT EXISTS (
        SELECT 1 FROM allc b
        WHERE b.n_distinct >= a.n_distinct AND b.n_tokens <= a.n_tokens
          AND (b.n_distinct > a.n_distinct OR b.n_tokens < a.n_tokens))
"""


def cohort_retention_events(sf_dir: str):
    """Weekly cohort retention (``ops/relational.py::cohort_retention``):
    users join the cohort of their first active ISO week; the matrix
    counts distinct users active per (cohort, week-offset).  One
    user-keyed exchange + one bounded partial-sum pass; weeks are int64
    indexes (since Monday 1970-01-05) so both engines compare on exact
    integer arithmetic."""
    from dedup_ray.ops.relational import cohort_retention

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(ds, "user_id", "ts")


ORACLES["cohort_retention_events"] = """
    WITH w AS (SELECT user_id,
                      (datediff('day', DATE '1970-01-05', ts::DATE)
                       // 7)::BIGINT AS week
               FROM events),
    uw AS (SELECT DISTINCT user_id, week FROM w),
    c AS (SELECT user_id, min(week) AS cohort_week FROM uw
          GROUP BY user_id)
    SELECT c.cohort_week, uw.week - c.cohort_week AS age_weeks,
           count(*)::BIGINT AS n_users
    FROM uw JOIN c USING (user_id)
    GROUP BY 1, 2
"""


CANON_COPIES = 3
CANON_MIRROR_BASE = 1_000_000


def canonical_url_docs(sf_dir: str):
    """Canonical-URL election within exact-dup clusters
    (``stages/urlnorm.py::canonical_url_per_group``): every document is
    amplified into 3 mirror pages with deterministically varied URLs
    (scheme/host/path-depth pure functions of doc_id and copy index,
    identical text), grouped by content digest, and each cluster elects
    ONE keeper URL by crawl policy — https over http, then shortest,
    then lexicographic, then smallest page id.  One digest-keyed
    exchange; the election is a single vectorized sort+head pass per
    partition."""
    from dedup_ray.stages.urlnorm import canonical_url_per_group
    from dedup_ray.util.hashing import content_digest

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        dig = content_digest(t["text"].to_pylist())
        digs, urls, pids = [], [], []
        for k in range(CANON_COPIES):
            scheme = np.where((ids + k) % 3 == 0, "https", "http")
            url = (pd.Series(scheme, dtype="string")
                   + "://site" + pd.Series((ids + 7 * k) % 13).astype(str)
                   + ".example/" + "p/" * (k + 1)
                   + pd.Series(ids).astype(str))
            digs.append(pa.array(dig, pa.string()))
            urls.append(pa.array(url, pa.string()))
            pids.append(pa.array(ids + k * CANON_MIRROR_BASE, pa.int64()))
        return pa.table({
            "digest": pa.concat_arrays(digs),
            "url": pa.concat_arrays(urls),
            "page_id": pa.concat_arrays(pids),
        })

    pages = ds.map_batches(mk_pages, batch_format="pyarrow")
    return canonical_url_per_group(pages, "digest", "url",
                                   id_col="page_id")


ORACLES["canonical_url_docs"] = f"""
    WITH pages AS (
        SELECT md5(coalesce(text, '')) AS digest,
               (CASE WHEN (doc_id + k) % 3 = 0
                     THEN 'https' ELSE 'http' END)
                 || '://site' || ((doc_id + 7 * k) % 13)::VARCHAR
                 || '.example/' || repeat('p/', k + 1)
                 || doc_id::VARCHAR AS url,
               doc_id + k * {CANON_MIRROR_BASE} AS page_id
        FROM documents,
             (SELECT unnest(range({CANON_COPIES})) AS k)),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY digest ORDER BY
                   (CASE WHEN url LIKE 'https://%' THEN 0 ELSE 1 END),
                   length(url), url, page_id) AS rn,
               count(*) OVER (PARTITION BY digest) AS n_pages
        FROM pages)
    SELECT digest, url AS canonical_url, page_id AS canonical_id,
           n_pages::BIGINT AS n_pages
    FROM ranked WHERE rn = 1
"""


def anchor_text_docs(sf_dir: str):
    """Inbound anchor-text aggregation per TARGET host — the classic web-IR
    side channel (inbound anchors describe the target page better than its
    own words; no reference analog — web-native extension per the brief).
    Three ``<a href>`` links with rotating anchor texts are synthesized
    into every page's markup (targets ``site<(doc_id+k)%13>``, k=1..3);
    (href, anchor) pairs come out of the vectorized two-split kernel
    (``stages/urlnorm.py::extract_anchors``); per-batch (host, anchor)
    partial counts shrink the stream before ONE host-keyed exchange.  The
    oracle replays the exact regex ``href="([^"]*)">([^<]*)</a>`` with a
    positionally-zipped double ``unnest``."""
    from dedup_ray.stages.urlnorm import extract_anchors, extract_host_array
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    labels = np.asarray(ANCHOR_LABELS, dtype=object)

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        d = pc.cast(t["doc_id"], pa.string())
        txt = pc.coalesce(t["text"], pa.scalar(""))
        for k in (1, 2, 3):
            txt = pc.binary_join_element_wise(
                txt, ' <a href="http://site',
                pa.array(((ids + k) % 13).astype(str)),
                ".example.com/p/", d, '">',
                pa.array(labels[(ids + k) % 3]), "</a>", "",
            )
        return pa.table({"doc_id": t["doc_id"], "text": txt})

    pairs = extract_anchors(ds.map_batches(mk, batch_format="pyarrow"))

    def partial(t: pa.Table) -> pa.Table:
        href = t["href"]
        if isinstance(href, pa.ChunkedArray):
            href = href.combine_chunks()
        e = pa.table({"dst_host": extract_host_array(href),
                      "anchor": t["anchor"]})
        g = e.group_by(["dst_host", "anchor"]).aggregate([([], "count_all")])
        return g.rename_columns(["dst_host", "anchor", "c"])

    def finish(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "dst_host": pa.array([], pa.string()),
                "n_refs": pa.array([], pa.int64()),
                "n_anchor_texts": pa.array([], pa.int64()),
                "anchors_csv": pa.array([], pa.string()),
            })
        df = part.to_pandas()
        g = df.groupby("dst_host", sort=False).agg(
            n_refs=("c", "sum"),
            n_anchor_texts=("anchor", "nunique"),
            anchors_csv=("anchor", lambda s: ",".join(sorted(set(s)))),
        ).reset_index()
        g["n_refs"] = g["n_refs"].astype("int64")
        g["n_anchor_texts"] = g["n_anchor_texts"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = pairs.map_batches(partial, batch_format="pyarrow")
    return exchange_group_apply(agg, "dst_host", finish, num_partitions=8)


ANCHOR_LABELS = ("click here", "read more", "home page")


def template_fingerprint_docs(sf_dir: str):
    """Structural template census: pages grouped by the md5 of their
    OPENING-tag sequence — the markup-skeleton analog of exact text dedup
    (pages rendered by one CMS template share a fingerprint even when
    every word differs).  Deterministic layout variants (nav when id%3==0,
    1+id%4 paragraphs, footer when id%2==0) are rendered per doc; the tag
    stream comes from the vectorized split+RE2 kernel
    (``stages/extract.py::tag_sequence``); per-batch fingerprint partials
    shrink the stream before ONE fingerprint-keyed exchange."""
    from dedup_ray.stages.extract import tag_sequence
    from dedup_ray.util.exchange import exchange_group_apply
    from dedup_ray.util.hashing import content_digest

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    NAV = "<nav><ul><li>x</li><li>y</li></ul></nav>"
    paras = np.asarray(["<p>t</p>" * (1 + i) for i in range(4)],
                       dtype=object)

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        html = (
            "<html><head><title>s</title></head><body>"
            + np.where(ids % 3 == 0, NAV, "").astype(object)
            + paras[ids % 4]
            + np.where(ids % 2 == 0, "<footer>f</footer>", "").astype(object)
            + "</body></html>"
        )
        return pa.table({"doc_id": t["doc_id"],
                         "html_str": pa.array(html, pa.string())})

    seqs = tag_sequence(ds.map_batches(mk, batch_format="pyarrow"))

    def partial(t: pa.Table) -> pa.Table:
        seq = t["tagseq"]
        if isinstance(seq, pa.ChunkedArray):
            seq = seq.combine_chunks()
        fp = pa.array(content_digest(seq.to_pylist(), algo="md5"))
        n_tags = pc.add(pc.count_substring(seq, ">"), 1)
        g = pa.table({
            "fingerprint": fp,
            "n_tags": pc.cast(n_tags, pa.int64()),
            "doc_id": t["doc_id"],
        }).group_by("fingerprint").aggregate(
            [([], "count_all"), ("n_tags", "min"), ("doc_id", "min")])
        return g.rename_columns(
            ["fingerprint", "n_pages", "n_tags", "min_doc_id"])

    def finish(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "fingerprint": pa.array([], pa.string()),
                "n_pages": pa.array([], pa.int64()),
                "n_tags": pa.array([], pa.int64()),
                "min_doc_id": pa.array([], pa.int64()),
            })
        g = part.group_by("fingerprint").aggregate(
            [("n_pages", "sum"), ("n_tags", "min"), ("min_doc_id", "min")])
        return g.rename_columns(
            ["fingerprint", "n_pages", "n_tags", "min_doc_id"])

    agg = seqs.map_batches(partial, batch_format="pyarrow")
    return exchange_group_apply(agg, "fingerprint", finish, num_partitions=8)


def reciprocal_links_docs(sf_dir: str):
    """Mutual-link detection over the host graph — reciprocal links are a
    link-farm / mirror-ring signal (organic web links are overwhelmingly
    one-way), and the mutual subgraph feeds mirror-site collapse.  Edge
    synthesis: k=1..3 forward links per page plus a back-link to
    ``site((id+12)%13)`` from every id%4==0 page, so genuine reciprocal
    pairs exist; ``ops/graph.py::reciprocal_edges`` co-locates both
    directions of a pair with ONE unordered-pair-keyed exchange."""
    from dedup_ray.ops.graph import reciprocal_edges

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)

        def host(arr):
            return pc.binary_join_element_wise(
                "site", pa.array(arr.astype(str)), "")

        src = host(ids % 13)
        parts = [pa.table({"src": src, "dst": host((ids + k) % 13)})
                 for k in (1, 2, 3)]
        m = ids % 4 == 0
        parts.append(pa.table({"src": host(ids[m] % 13),
                               "dst": host((ids[m] + 12) % 13)}))
        return pa.concat_tables(parts)

    edges = ds.map_batches(mk, batch_format="pyarrow")
    return reciprocal_edges(edges, num_partitions=8)



def edit1_token_join_docs(sf_dir: str):
    """Edit-distance-1 vocabulary self-join (``ops/editjoin.py``):
    FastSS deletion neighborhoods — every distinct token (len >= 4)
    emits itself plus its single-deletion variants, one exchange on the
    variant groups candidates, exact distance-1 verify, one more
    exchange de-duplicates multi-witness pairs.  No all-pairs stage;
    the oracle replays neighborhood generation AND the levenshtein
    verify.  Vocabulary = part-name tokens plus a deterministic planted
    typo (2nd char dropped from the first token of every 7th part), so
    true distance-1 pairs exist at every sf."""
    from dedup_ray.ops.editjoin import edit_distance_self_join

    parts = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def vocab(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.cast(t["p_name"], pa.string()), " ")
        toks = pc.list_flatten(lists).to_pylist()
        keys = t["p_partkey"].to_numpy(zero_copy_only=False)
        firsts = pc.list_element(lists, 0).to_pylist()
        lasts = [lv[-1] for lv in lists.to_pylist()]
        typos = [f[:1] + f[2:] for f, k in zip(firsts, keys) if k % 7 == 0]
        typos += [f[:2] + f[3:] for f, k in zip(lasts, keys) if k % 5 == 0]
        return pa.table({"token": pa.array(toks + typos, pa.string())})

    return edit_distance_self_join(
        parts.map_batches(vocab, batch_format="pyarrow"),
        "token", min_len=4, num_partitions=8, max_variant_group=None)


KMV_SKETCH_K = 128


def kmv_set_ops_docs(sf_dir: str):
    """Cross-source distinct-vocabulary set operations from KMV/theta
    sketches (``stages/sketch.py::kmv_grouped_sketch`` + ``kmv_set_ops``):
    per-source k-minimum md5 values of the token stream, then pairwise
    union / intersection / Jaccard ESTIMATES — the question HLL cannot
    answer.  Sketch content and estimator arithmetic are both
    SQL-replayable (hex16 md5, (k-1)/theta)."""
    from dedup_ray.stages.sketch import kmv_grouped_sketch, kmv_set_ops

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def tok(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            pc.coalesce(pc.cast(t["text"], pa.string()), ""), " ")
        toks = pc.list_flatten(lists)
        src = pc.take(t["source"], pc.list_parent_indices(lists))
        keep = pc.indices_nonzero(pc.not_equal(toks, ""))
        return pa.table({"source": pc.take(src, keep),
                         "token": pc.take(toks, keep)})

    tokens = ds.map_batches(tok, batch_format="pyarrow")
    sk = kmv_grouped_sketch(tokens, "source", "token", k=KMV_SKETCH_K,
                            num_partitions=8)
    return kmv_set_ops(sk, "source", k=KMV_SKETCH_K)


EXACT_QS = [0.25, 0.5, 0.9, 0.99]


def exact_quantiles_events(sf_dir: str):
    """Exact global quantiles WITHOUT a sort (``stages/ordering.py::
    exact_quantiles``): histogram-bisection distributed selection —
    each pass streams one bounded histogram per open interval, the
    driver descends; values are pinned exactly in O(log) passes.  The
    exact counterpart of the DDSketch queries; oracle = row_number
    rank selection."""
    from dedup_ray.stages.ordering import exact_quantiles

    ds = _read(sf_dir, "events", columns=["value"])
    return exact_quantiles(ds, "value", EXACT_QS)


MINIMIZER_K, MINIMIZER_W = 8, 16


def minimizer_sketch_docs(sf_dir: str):
    """(w, k)-minimizer fingerprints (``stages/shingle.py::
    minimizer_sketch``): window-minimum k-gram hashes — the
    positionally-stable sketch (shared minimizer == aligned shared
    substring w.h.p.), ~2/(w+1) of the gram stream.  md5-hex16 spec
    twin: the SQL oracle replays gram hashing and the window minimum
    verbatim."""
    from dedup_ray.stages.shingle import minimizer_sketch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minimizer_sketch(ds, "doc_id", "text",
                            k=MINIMIZER_K, w=MINIMIZER_W)


HILBERT_BITS = 8


def hilbert_key_events(sf_dir: str):
    """Hilbert-curve clustering key (``stages/ordering.py::
    hilbert_key``): the locality upgrade of ``zorder_events`` — the
    no-jump space-filling walk, one vectorized per-batch bit
    recurrence, replayed in SQL as an unrolled CTE chain
    (``hilbert_sql``)."""
    from dedup_ray.stages.ordering import hilbert_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def qxy(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t["event_id"],
            "hx": pa.array(uid % 256, pa.int64()),
            "hy": pa.array(eid % 256, pa.int64()),
        })

    keyed = hilbert_key(ds.map_batches(qxy, batch_format="pyarrow"),
                        "hx", "hy", bits=HILBERT_BITS)
    return keyed.select_columns(["event_id", "hkey"])



HH_PHI = 50


def heavy_hitters_docs(sf_dir: str):
    """Exact heavy hitters via Misra-Gries + rescan (``stages/sketch.py::
    heavy_hitters_exact``): tokens with count > n/phi, EXACTLY — MG
    summaries (a true combiner, O(phi) state) give a guaranteed
    candidate superset, one broadcast rescan makes the counts exact.
    The deterministic-exact counterpart of the CMS frequency queries."""
    from dedup_ray.stages.sketch import heavy_hitters_exact

    ds = _read(sf_dir, "documents", columns=["text"])
    return heavy_hitters_exact(ds, "text", phi=HH_PHI, num_partitions=4)


def rendezvous_shard_docs(sf_dir: str):
    """Rendezvous (highest-random-weight) sharding (``stages/mixing.py::
    rendezvous_shard``): consistent placement — per doc the argmax-md5
    shard at n=8 AND n=9, with the moved flag.  Growing the shard map
    by one moves ~1/9 of rows (vs 8/9 for hash%n); the movement is
    directly visible in the output and the whole argmax replays in
    SQL."""
    from dedup_ray.stages.mixing import rendezvous_shard

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    s8 = rendezvous_shard(ds, "doc_id", 8, out_col="shard8")
    s89 = rendezvous_shard(s8, "doc_id", 9, out_col="shard9")

    def flag(t: pa.Table) -> pa.Table:
        moved = pc.cast(pc.not_equal(t["shard8"], t["shard9"]), pa.int64())
        return t.append_column("moved", moved)

    return s89.map_batches(flag, batch_format="pyarrow")


MINPAIR_SHARED = 2


def minimizer_pairs_docs(sf_dir: str):
    """Minimizer-blocked near-dup candidates (``stages/shingle.py::
    minimizer_pairs``): doc pairs sharing >= 2 (w=16, k=8) minimizers
    with the shared count — the aligned-substring blocking tier next
    to LSH banding.  Bucket exchange + pair-key exchange, both replayed
    by the oracle's self-join."""
    import ray

    from dedup_ray.stages.shingle import minimizer_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # the pair-key reduce moves ~100 pair rows per doc — width follows
    # the session's CPU count (8 at the driver's sf0.01 gate, 32 on the
    # bench box) so the heavy exchange isn't squeezed through 8 tasks
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return minimizer_pairs(ds, "doc_id", "text", k=MINIMIZER_K,
                           w=MINIMIZER_W, min_shared=MINPAIR_SHARED,
                           num_partitions=max(8, min(64, cpus)),
                           max_bucket=None)


WALK_STEPS = 4


def random_walks_docs(sf_dir: str):
    """Deterministic random walks (``ops/graph.py::random_walks``) over
    the synthetic host graph (same edge rule as ``reciprocal_links_docs``
    minus the back-links): md5-seeded neighbor choice, one frontier
    exchange per step — the DeepWalk corpus generator, bit-replayable
    in SQL as chained rank joins."""
    from dedup_ray.ops.graph import random_walks

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)

        def host(arr):
            return pc.binary_join_element_wise(
                "site", pa.array(arr.astype(str)), "")

        parts = [pa.table({"src": host(ids % 13),
                           "dst": host((ids + k) % 13)})
                 for k in (1, 2, 3)]
        return pa.concat_tables(parts)

    edges = ds.map_batches(mk, batch_format="pyarrow")
    return random_walks(edges, n_steps=WALK_STEPS, num_partitions=4)



def mis_docs(sf_dir: str):
    """Deterministic Luby MIS (``ops/graph.py::maximal_independent_set``)
    over the synthetic host graph: non-adjacent representative hosts —
    the conflict-free-keeper primitive.  md5 vertex priorities make the
    fixed point a pure function of the graph (pinned oracle: the host
    graph is corpus-independent, sf-stable)."""
    from dedup_ray.ops.graph import maximal_independent_set

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)

        def host(arr):
            return pc.binary_join_element_wise(
                "site", pa.array(arr.astype(str)), "")

        parts = [pa.table({"src": host(ids % 13),
                           "dst": host((ids + k) % 13)})
                 for k in (1, 2, 3)]
        return pa.concat_tables(parts)

    edges = ds.map_batches(mk, batch_format="pyarrow")
    return maximal_independent_set(edges, num_partitions=4)


WMH_PERMS = 16


def weighted_minhash_docs(sf_dir: str):
    """Integer-weighted MinHash (``stages/minhash.py::
    weighted_minhash_md5``): weighted-Jaccard estimates over term
    frequencies for adjacent-id doc pairs via the multiset-expansion
    reduction — tf-aware near-dup similarity where set Jaccard saturates
    on repeated boilerplate.  The md5 spec twin replays token expansion,
    register minima AND the match-fraction estimator in SQL."""
    from dedup_ray.stages.minhash import (weighted_jaccard_pairs,
                                          weighted_minhash_md5)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    regs = weighted_minhash_md5(ds, n_perms=WMH_PERMS)
    return weighted_jaccard_pairs(regs, n_perms=WMH_PERMS,
                                  num_partitions=8)


ENTROPY_FLAG_BITS = 2.0


def char_entropy_docs(sf_dir: str):
    """Character-entropy gibberish screen (``stages/textstats.py::
    char_entropy``): bits/char per doc with a low-entropy flag — the
    repetition/template detector orthogonal to token quality stats.
    Shuffle-free; kernel and oracle share the ``log2(n) − Σc·log2(c)/n``
    form so only summation order differs (absorbed by round(4))."""
    from dedup_ray.stages.textstats import char_entropy

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return char_entropy(ds, "doc_id", "text",
                        low_threshold=ENTROPY_FLAG_BITS)



def f2_selfjoin_docs(sf_dir: str):
    """AMS/Count-Sketch F2 (``stages/sketch.py::ams_f2``): the token
    stream's self-join size Σf², estimated in d×w integer registers and
    reproduced BIT-FOR-BIT by the oracle (md5 buckets + signs, integer
    register sums, median of 5 row estimates) — the join-planner /
    skew-early-warning statistic."""
    from dedup_ray.stages.sketch import ams_f2

    ds = _read(sf_dir, "documents", columns=["text"])
    return ams_f2(ds, "text", num_partitions=4)



RRF_POOL, RRF_K, RRF_C = 50, 20, 60


def rrf_fusion_docs(sf_dir: str):
    """Reciprocal-rank fusion (``ops/retrieval.py::rrf_fuse``): BM25
    top-50 fused with a raw term-count top-50 for the same query —
    rank-space ensembling of incomparable scorers.  Fusion runs on the
    retriever OUTPUTS (k-bounded), never the corpus; the oracle replays
    both rankings (QUALIFY row_number) and the 1/(c+r) sum."""
    from dedup_ray.ops.retrieval import bm25_topk, rrf_fuse, term_count_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    a = bm25_topk(ds, BM25_TERMS, k=RRF_POOL, k1=BM25_K1, b=BM25_B)
    b = term_count_topk(ds, BM25_TERMS, k=RRF_POOL)
    return rrf_fuse([a, b], k=RRF_K, c=RRF_C)



BOOT_REPS = 20


def bootstrap_mean_docs(sf_dir: str):
    """Poisson-bootstrap sampling distribution of mean doc length
    (``stages/mixing.py::poisson_bootstrap_mean``): 20 replicate means
    from ONE streaming pass — md5-deterministic Poisson(1) weights
    through the shared CDF ladder, so every replicate replays in SQL.
    The corpus-scale answer to "what is the CI on this statistic"."""
    from dedup_ray.stages.mixing import poisson_bootstrap_mean

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return poisson_bootstrap_mean(ds, "n_chars", n_reps=BOOT_REPS)



def scc_docs(sf_dir: str):
    """Distributed strongly-connected components (``ops/graph.py::
    strongly_connected_components``, coloring/FW-BW): mutual-reachability
    clusters on a DIRECTED host graph — redirect rings and mirror loops,
    where the flagship's weak CC over-merges.  Synthetic graph: a 4-site
    ring feeding an 8-site chain (ring = one SCC, chain = singletons);
    corpus-independent, so the pinned oracle is sf-stable."""
    from dedup_ray.ops.graph import strongly_connected_components

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = ids % 13

        def host(arr):
            return pc.binary_join_element_wise(
                "site", pa.array(arr.astype(str)), "")

        ring = h < 4
        chain = (h >= 4) & (h < 12)
        bridge = h == 3
        return pa.concat_tables([
            pa.table({"src": host(h[ring]),
                      "dst": host((h[ring] + 1) % 4)}),
            pa.table({"src": host(h[chain]), "dst": host(h[chain] + 1)}),
            pa.table({"src": host(np.full(bridge.sum(), 3)),
                      "dst": host(np.full(bridge.sum(), 4))}),
        ])

    edges = ds.map_batches(mk, batch_format="pyarrow")
    return strongly_connected_components(edges, num_partitions=4)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "anchor_text_docs": anchor_text_docs,
    "template_fingerprint_docs": template_fingerprint_docs,
    "reciprocal_links_docs": reciprocal_links_docs,
    "grouped_stats_events": grouped_stats_events,
    "pearson_qty_price": pearson_qty_price,
    "dup_user_events": dup_user_events,
    "normalize_part_names": normalize_part_names,
    "last_token_part": last_token_part,
    "tokenize_docs": tokenize_docs,
    "token_idf": token_idf,
    "doc_token_counts": doc_token_counts,
    "text_quality": text_quality,
    "left_join_orders": left_join_orders,
    "semi_join_customers": semi_join_customers,
    "anti_join_customers": anti_join_customers,
    "distinct_lang_source": distinct_lang_source,
    "mode_event_type": mode_event_type,
    "top_orders": top_orders,
    "block_pairs_docs": block_pairs_docs,
    "ap_cluster_docs": ap_cluster_docs,
    "pair_token_overlap": pair_token_overlap,
    "diff_nchars_pairs": diff_nchars_pairs,
    "cc_chain_docs": cc_chain_docs,
    "cluster_rep_longest": cluster_rep_longest,
    "soft_dedup_weights_docs": soft_dedup_weights_docs,
    "group_collect_lang": group_collect_lang,
    "eval_source_vs_lang": eval_source_vs_lang,
    "window_tumbling_events": window_tumbling_events,
    "window_hopping_events": window_hopping_events,
    "sessionize_events": sessionize_events,
    "asof_join_events": asof_join_events,
    "range_join_events": range_join_events,
    "topk_per_user_events": topk_per_user_events,
    "quantile_sketch_events": quantile_sketch_events,
    "quantile_sketch_by_type_events": quantile_sketch_by_type_events,
    "rolling_mean_events": rolling_mean_events,
    "pivot_event_counts": pivot_event_counts,
    "ann_topk": ann_topk,
    "exact_dedup_docs": exact_dedup_docs,
    "tag_parts_multilabel": tag_parts_multilabel,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "concat_title_abstract": concat_title_abstract,
    "bpe_token_counts_docs": bpe_token_counts_docs,
    "normalize_urls_docs": normalize_urls_docs,
    "balanced_sample_events": balanced_sample_events,
    "embed_pair_features": embed_pair_features,
    "embed_cosine_dup_pairs": embed_cosine_dup_pairs,
    "line_dedup_docs": line_dedup_docs,
    "host_boilerplate_docs": host_boilerplate_docs,
    "intradoc_dedup_docs": intradoc_dedup_docs,
    "exact_substring_docs": exact_substring_docs,
    "suffix_array_docs": suffix_array_docs,
    "sa_coverage_docs": sa_coverage_docs,
    "range_rank_orders": range_rank_orders,
    "lang_percentile_docs": lang_percentile_docs,
    "token_entropy_docs": token_entropy_docs,
    "rollup_events": rollup_events,
    "redirect_resolve_docs": redirect_resolve_docs,
    "warc_roundtrip_docs": warc_roundtrip_docs,
    "kmeans_embeddings": kmeans_embeddings,
    "pmi_bigrams_docs": pmi_bigrams_docs,
    "linreg_events": linreg_events,
    "bfs_dist_docs": bfs_dist_docs,
    "grouped_median_events": grouped_median_events,
    "decode_entities_docs": decode_entities_docs,
    "validate_docs": validate_docs,
    "robots_filter_docs": robots_filter_docs,
    "containment_join_docs": containment_join_docs,
    "bbit_minhash_docs": bbit_minhash_docs,
    "interleave_docs": interleave_docs,
    "zscore_docs": zscore_docs,
    "snm_pairs_orders": snm_pairs_orders,
    "cocitation_docs": cocitation_docs,
    "hits_docs": hits_docs,
    "auc_embeddings": auc_embeddings,
    "zorder_events": zorder_events,
    "json_extract_events": json_extract_events,
    "psi_drift_events": psi_drift_events,
    "badword_docs": badword_docs,
    "rolling_events": rolling_events,
    "lpa_communities_docs": lpa_communities_docs,
    "perplexity_docs": perplexity_docs,
    "vocab_ids_docs": vocab_ids_docs,
    "bpe_train_docs": bpe_train_docs,
    "bpe_encode_docs": bpe_encode_docs,
    "frequent_ngrams_docs": frequent_ngrams_docs,
    "fuzzy_decontaminate_docs": fuzzy_decontaminate_docs,
    "profile_events": profile_events,
    "corpus_diff_docs": corpus_diff_docs,
    "simhash_md5_docs": simhash_md5_docs,
    "fold_text_docs": fold_text_docs,
    "ann_topk_pq": ann_topk_pq,
    "blocklist_filter_docs": blocklist_filter_docs,
    "cluster_stats_docs": cluster_stats_docs,
    "pseudonymize_events": pseudonymize_events,
    "frequent_ngrams_cms_docs": frequent_ngrams_cms_docs,
    "union_evolve_docs": union_evolve_docs,
    "partitioned_io_docs": partitioned_io_docs,
    "weighted_sample_docs": weighted_sample_docs,
    "table_checksum_orders": table_checksum_orders,
    "sniff_content_docs": sniff_content_docs,
    "stratified_sample_docs": stratified_sample_docs,
    "debounce_events": debounce_events,
    "scd2_intervals_events": scd2_intervals_events,
    "split_leakage_docs": split_leakage_docs,
    "bcubed_eval_docs": bcubed_eval_docs,
    "ari_eval_docs": ari_eval_docs,
    "triangle_count_docs": triangle_count_docs,
    "exact_substring_cut_docs": exact_substring_cut_docs,
    "redact_pii_docs": redact_pii_docs,
    "repetition_quality_docs": repetition_quality_docs,
    "decontaminate_docs": decontaminate_docs,
    "host_page_stats": host_page_stats,
    "host_links_docs": host_links_docs,
    "pack_sequences_docs": pack_sequences_docs,
    "doc_length_quantiles": doc_length_quantiles,
    "curate_docs": curate_docs,
    "shuffle_rank_docs": shuffle_rank_docs,
    "hll_token_registers_docs": hll_token_registers_docs,
    "cms_token_registers_docs": cms_token_registers_docs,
    "token_logfreq_score_docs": token_logfreq_score_docs,
    "token_budget_select_docs": token_budget_select_docs,
    "lang_token_budget_docs": lang_token_budget_docs,
    "q3_shipping_priority": q3_shipping_priority,
    "chunk_tokens_docs": chunk_tokens_docs,
    "novelty_curve_docs": novelty_curve_docs,
    "compression_ratio_docs": compression_ratio_docs,
    "top_tokens_docs": top_tokens_docs,
    "media_pipeline_docs": media_pipeline_docs,
    "avi_frames_docs": avi_frames_docs,
    "jpeg_roundtrip_docs": jpeg_roundtrip_docs,
    "pushdown_read_orders": pushdown_read_orders,
    "skew_join_events": skew_join_events,
    "bloom_semi_lineitem": bloom_semi_lineitem,
    "full_outer_counts_events": full_outer_counts_events,
    "bm25_topk_docs": bm25_topk_docs,
    "dsir_llr_docs": dsir_llr_docs,
    "route_media_docs": route_media_docs,
    "k_core_docs": k_core_docs,
    "cluster_split_docs": cluster_split_docs,
    "hll_user_registers_events": hll_user_registers_events,
    "edit_distance_parts": edit_distance_parts,
    "jsonl_roundtrip_docs": jsonl_roundtrip_docs,
    "salted_stats_events": salted_stats_events,
    "focus_org_bag_parts": focus_org_bag_parts,
    "normalize_text_docs": normalize_text_docs,
    "mix_sources_docs": mix_sources_docs,
    "split_assign_docs": split_assign_docs,
    "training_recipe_docs": training_recipe_docs,
    "cap_per_host_docs": cap_per_host_docs,
    "filter_below_quantile_docs": filter_below_quantile_docs,
    "coau_dist_docs": coau_dist_docs,
    "pagerank_docs": pagerank_docs,
    "ppr_docs": ppr_docs,
    "similarity_join_docs": similarity_join_docs,
    "similarity_self_join_docs": similarity_self_join_docs,
    "split_seed_search": split_seed_search,
    "per_block_accuracy": per_block_accuracy,
    "pscore_report_docs": pscore_report_docs,
    # oracle-checked via planted-truth scorecards / pinned deterministic
    # constants (the hashes themselves are not SQL-expressible; the
    # VERIFIABLE CLAIM — recall over planted pairs, recall@k vs the exact
    # path, folded-weight rescoring — is)
    "minhash_dedup_docs": minhash_dedup_docs,
    "dedup_tier_report": dedup_tier_report,
    "incremental_dedup_docs": incremental_dedup_docs,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "logistic_score_embeddings": logistic_score_embeddings,
    "ensemble_score_embeddings": ensemble_score_embeddings,
    "embed_cosine_dedup_docs": embed_cosine_dedup_docs,
    "semdedup_embeddings": semdedup_embeddings,
    "lang_id_docs": lang_id_docs,
    "pareto_front_docs": pareto_front_docs,
    "cohort_retention_events": cohort_retention_events,
    "canonical_url_docs": canonical_url_docs,
    "mojibake_docs": mojibake_docs,
    "domain_count_docs": domain_count_docs,
    "mixed_lang_clusters_docs": mixed_lang_clusters_docs,
    "dup_rate_estimate_docs": dup_rate_estimate_docs,
    "zipf_fit_docs": zipf_fit_docs,
    "late_events": late_events,
    "threshold_sweep_docs": threshold_sweep_docs,
    "source_overlap_docs": source_overlap_docs,
    # rows-only (non-SQL-expressible: own-hash fingerprints, weighted APSP)
    "simhash_docs": simhash_docs,
    "fingerprint_docs": fingerprint_docs_q,
    "shortpath_source_docs": shortpath_source_docs,
    "cogroup_user_activity": cogroup_user_activity,
    "upsert_latest_docs": upsert_latest_docs,
}


# Planted-truth / pinned-deterministic oracles for the hash-based paths.
# The hashes (MinHash bands, hyperplane signatures, token feature-hash,
# k-means init) are not SQL-expressible, but each query's VERIFIABLE CLAIM
# is: recall over the planted amplify=3 truth derives from count(documents);
# approximate-ANN recall@10 vs the exact path and the 8 truth pairs the
# MinHash pipeline leaves unrecovered (short-doc near-dups whose true
# shingle Jaccard falls below the 0.5 verify threshold) are deterministic
# seeded constants, pinned at the driver's sf0.01 corpus.

# Tier attribution from first principles: the exact tier claims one union
# per qualifying doc (the planted mirror); the MinHash tier claims the
# planted near-dup PLUS every merge of the cross-document near-dup graph
# that exists in the corpus itself — which the oracle re-derives exactly:
# distinct 3-token shingles per doc, true Jaccard >= the 0.5 verify
# threshold, recursive-CTE connected components.  est-Jaccard (128 perms)
# vs true Jaccard cannot disagree here: at sf0.01 the closest cross-doc
# pair to the threshold sits at J=0.974 and the closest non-pair below
# 0.3, so the LSH+verify decision is deterministic.  SimHash and
# substring arrive after connectivity is complete (0 new unions).
ORACLES["dedup_tier_report"] = """
    WITH RECURSIVE docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
      WHERE array_length(string_split(text, ' ')) >= 40
    ),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(1, array_length(toks) - 1)) AS i
      FROM docs
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS s
      FROM idx
    ),
    card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges0 AS (
      SELECT u, v FROM inter
      JOIN card ca ON ca.doc_id = inter.u
      JOIN card cb ON cb.doc_id = inter.v
      WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
    ),
    edges AS (SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
    ),
    comp AS (SELECT node, min(lbl) AS root FROM reach GROUP BY node),
    m AS (
      SELECT count(*) - count(DISTINCT root) AS merges FROM comp
    ),
    n AS (SELECT count(*) AS n40 FROM docs)
    SELECT t.tier,
           CAST(CASE t.tier WHEN 'exact' THEN n.n40
                WHEN 'near_minhash' THEN n.n40 + m.merges
                ELSE 0 END AS BIGINT) AS n_unions,
           CAST(CASE t.tier WHEN 'exact' THEN 2 * n.n40
                ELSE n.n40 - m.merges END AS BIGINT) AS components_after
    FROM n, m, (VALUES ('exact'), ('near_minhash'),
                       ('near_simhash'), ('substring')) AS t(tier)
"""

ORACLES["similarity_join_docs"] = """
    WITH lt AS (
        SELECT doc_id AS id_l, string_split(text, ' ') AS toks
        FROM documents
        WHERE array_length(string_split(text, ' ')) >= 40),
    rt AS (
        SELECT doc_id AS id_r,
               (string_split(text, ' '))
                   [1 : array_length(string_split(text, ' ')) - 10] AS toks
        FROM documents
        WHERE doc_id % 3 = 0
          AND array_length(string_split(text, ' ')) >= 40),
    shl AS (
        SELECT DISTINCT id_l, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        FROM (SELECT id_l, toks,
                     unnest(range(1, array_length(toks) - 1)) AS i
              FROM lt)),
    shr AS (
        SELECT DISTINCT id_r, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        FROM (SELECT id_r, toks,
                     unnest(range(1, array_length(toks) - 1)) AS i
              FROM rt)),
    cardl AS (SELECT id_l, count(*) AS n_l FROM shl GROUP BY id_l),
    cardr AS (SELECT id_r, count(*) AS n_r FROM shr GROUP BY id_r),
    dfc AS (
        SELECT s, count(*) AS df FROM (
            SELECT s FROM shl UNION ALL SELECT s FROM shr) GROUP BY s),
    rare AS (SELECT s FROM dfc WHERE df <= 8),
    cand AS (
        SELECT DISTINCT l.id_l, r.id_r
        FROM shl l JOIN rare USING (s) JOIN shr r ON r.s = l.s),
    ints AS (
        SELECT c.id_l, c.id_r, count(*) AS inter
        FROM cand c
        JOIN shl a ON a.id_l = c.id_l
        JOIN shr b ON b.id_r = c.id_r AND b.s = a.s
        GROUP BY c.id_l, c.id_r)
    SELECT i.id_l, i.id_r,
           CAST(cl.n_l AS BIGINT) AS n_l,
           CAST(cr.n_r AS BIGINT) AS n_r,
           CAST(i.inter AS BIGINT) AS inter,
           CAST(i.inter AS DOUBLE) / (cl.n_l + cr.n_r - i.inter) AS jaccard
    FROM ints i
    JOIN cardl cl USING (id_l)
    JOIN cardr cr USING (id_r)
    WHERE CAST(i.inter AS DOUBLE) / (cl.n_l + cr.n_r - i.inter) >= 0.5
"""

ORACLES["similarity_self_join_docs"] = """
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents
        WHERE array_length(string_split(text, ' ')) >= 40),
    idx AS (
        SELECT doc_id, toks, unnest(range(1, array_length(toks) - 1)) AS i
        FROM docs),
    sh AS (
        SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        FROM idx),
    card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    ints AS (
        SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT u AS id1, v AS id2,
           CAST(ca.n AS BIGINT) AS n1,
           CAST(cb.n AS BIGINT) AS n2,
           CAST(i AS BIGINT) AS inter,
           CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
    FROM ints
    JOIN card ca ON ca.doc_id = u
    JOIN card cb ON cb.doc_id = v
    WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
"""

ORACLES["incremental_dedup_docs"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE doc_id % 7 IN (0, 3)
                 AND array_length(string_split(text, ' ')) >= 40)
                AS BIGINT) AS n_shard,
           CAST(count(*) FILTER (WHERE doc_id % 7 = 0
                 AND array_length(string_split(text, ' ')) >= 40)
                AS BIGINT) AS anchored_exact,
           CAST(count(*) FILTER (WHERE doc_id % 7 = 3
                 AND array_length(string_split(text, ' ')) >= 40)
                AS BIGINT) AS anchored_near,
           CAST(0 AS BIGINT) AS merges
    FROM documents
"""

ORACLES["minhash_dedup_docs"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(3 * count(*) AS BIGINT) AS n_pages,
           CAST(3 * count(*) AS BIGINT) AS n_truth_pairs,
           CAST(3 * count(*) - 8 AS BIGINT) AS pairs_recovered,
           CAST(0.994667 AS DOUBLE) AS recall
    FROM documents
"""

ORACLES["embed_cosine_dedup_docs"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(3 * count(*) AS BIGINT) AS n_pages,
           CAST(3 * count(*) AS BIGINT) AS n_truth_pairs,
           CAST(3 * count(*) AS BIGINT) AS pairs_recovered,
           CAST(1.0 AS DOUBLE) AS recall
    FROM documents
"""

ORACLES["ann_topk_lsh"] = """
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(10 AS BIGINT), CAST(7 AS BIGINT),
         CAST(0.7 AS DOUBLE)),
        (1, 10, 5, 0.5), (2, 10, 4, 0.4), (3, 10, 7, 0.7), (4, 10, 7, 0.7)
    ) AS t(query_id, n_exact, n_hits, recall)
"""

ORACLES["ann_topk_ivf"] = """
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(10 AS BIGINT), CAST(8 AS BIGINT),
         CAST(0.8 AS DOUBLE)),
        (1, 10, 8, 0.8), (2, 10, 7, 0.7), (3, 10, 7, 0.7), (4, 10, 9, 0.9)
    ) AS t(query_id, n_exact, n_hits, recall)
"""

# Folded-standardization logistic weights (w/std, b - mean·w/std) from the
# zero-RNG full-batch trainer on sf0.01 embeddings; DuckDB rescores every
# row.  Regenerate with tools/gen_logistic_oracle.py after trainer changes.
ORACLES["logistic_score_embeddings"] = """
SELECT vec_id,
               round(1.0 / (1.0 + exp(-(list_dot_product(
                   CAST(embedding AS DOUBLE[]), [1.0074824286209587, 0.5891292844514168, 0.8488574826825733, 0.9309591603728893, 1.595284485696593, -0.007898581875813635, -0.2224020733902187, 0.379245372826537, 0.7712355771697805, -0.507031122706534, -0.6413222042494826, 0.5168109852784812, 0.7100980763123967, -0.11555603435922057, 0.30070643934084157, -0.5486919797084585, -1.402059779780778, -0.1488610286801665, 1.5960355042100463, -0.012939244658457614, 1.7566040173098427, -0.5246618141011462, -0.31169611514401635, -0.7709288626602303, -0.7293174627870701, -1.382235374062081, -0.7414298398491294, 0.19715185984205194, -1.1798096677706218, -1.0103444461315374, -0.6151292335958712, 0.6366929703812187, 0.06418726376978598, -1.378927702069413, 0.19515384337028005, 2.6078296336855713, -0.24482202195613015, -1.580755864461683, -0.6212834833400156, 0.5667704673825325, -1.5055234623196287, 0.04724094709273491, 1.1963909811248057, -0.4154762979284011, 0.384137837084397, -0.8919653109063118, 1.5767185268381516, 0.0808127729804011, -0.939659311859967, 1.0353076287970413, 0.7542042572131096, -0.40042332494537547, 1.9474641715975578, -0.1258645115574239, -0.12131849673262417, 1.6974406406013616, -0.6070101783032111, 0.1696675779839412, 1.0684434385206678, 1.0987454601951494, 0.0701210552548053, -0.9719506653534001, 0.8683279925395044, -0.6032925916402285]) + (0.03963358999811028)))), 6)
                   AS score,
               CAST(1.0 / (1.0 + exp(-(list_dot_product(
                   CAST(embedding AS DOUBLE[]), [1.0074824286209587, 0.5891292844514168, 0.8488574826825733, 0.9309591603728893, 1.595284485696593, -0.007898581875813635, -0.2224020733902187, 0.379245372826537, 0.7712355771697805, -0.507031122706534, -0.6413222042494826, 0.5168109852784812, 0.7100980763123967, -0.11555603435922057, 0.30070643934084157, -0.5486919797084585, -1.402059779780778, -0.1488610286801665, 1.5960355042100463, -0.012939244658457614, 1.7566040173098427, -0.5246618141011462, -0.31169611514401635, -0.7709288626602303, -0.7293174627870701, -1.382235374062081, -0.7414298398491294, 0.19715185984205194, -1.1798096677706218, -1.0103444461315374, -0.6151292335958712, 0.6366929703812187, 0.06418726376978598, -1.378927702069413, 0.19515384337028005, 2.6078296336855713, -0.24482202195613015, -1.580755864461683, -0.6212834833400156, 0.5667704673825325, -1.5055234623196287, 0.04724094709273491, 1.1963909811248057, -0.4154762979284011, 0.384137837084397, -0.8919653109063118, 1.5767185268381516, 0.0808127729804011, -0.939659311859967, 1.0353076287970413, 0.7542042572131096, -0.40042332494537547, 1.9474641715975578, -0.1258645115574239, -0.12131849673262417, 1.6974406406013616, -0.6070101783032111, 0.1696675779839412, 1.0684434385206678, 1.0987454601951494, 0.0701210552548053, -0.9719506653534001, 0.8683279925395044, -0.6032925916402285]) + (0.03963358999811028)))) >= 0.5
                   AS BIGINT) AS pred
        FROM embeddings
"""

ORACLES["concat_title_abstract"] = """
    SELECT doc_id,
           concat(coalesce(source, 'nan'), coalesce(CAST(text AS VARCHAR),
               'nan')) AS fulltext
    FROM documents
"""

# RE2 pattern shared with stages/textstats.py::BPE_SPLIT_PATTERN (kept as a
# literal here so the oracle string is self-contained for the driver).
ORACLES["bpe_token_counts_docs"] = r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
           len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
               AS n_bpe_tokens
    FROM documents
"""


# Generated from stages/urlnorm.py rule constants via oracle_sql_expr at
# import time — the oracle applies the SAME RE2 rules inside DuckDB, so
# kernel and oracle cannot drift.
from dedup_ray.stages.urlnorm import oracle_sql_expr as _url_oracle_expr

def _webclean_oracles() -> dict[str, str]:
    from dedup_ray.stages.webclean import (
        LINE_WIDTH,
        NGRAM_WIDTH,
        QUALITY_BOUNDS,
        pii_oracle_exprs,
    )

    qb = QUALITY_BOUNDS
    w = NGRAM_WIDTH
    out: dict[str, str] = {}
    out["line_dedup_docs"] = f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, i, toks[i] AS token
                FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
        lines AS (SELECT doc_id, (i - 1) // {LINE_WIDTH} AS line_no,
                         string_agg(token, ' ' ORDER BY i) AS line
                  FROM tok GROUP BY doc_id, (i - 1) // {LINE_WIDTH}),
        ranked AS (SELECT doc_id, line_no, line,
                          row_number() OVER (
                              PARTITION BY line ORDER BY doc_id, line_no
                          ) AS rn
                   FROM lines)
        SELECT doc_id, line_no, line FROM ranked WHERE rn = 1
    """
    out["host_boilerplate_docs"] = f"""
        WITH d AS (SELECT doc_id,
                          'site' || (doc_id % 13) || '.example.com' AS host,
                          '{HB_HEADER}' || (doc_id % 13) || ' ' ||
                          COALESCE(text, '') AS txt
                   FROM documents),
        t AS (SELECT doc_id, host, string_split(txt, ' ') AS toks FROM d),
        tok AS (SELECT doc_id, host, i, toks[i] AS token
                FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
        lines AS (SELECT doc_id, host, (i - 1) // {LINE_WIDTH} AS line_no,
                         string_agg(token, ' ' ORDER BY i) AS line
                  FROM tok GROUP BY doc_id, host, (i - 1) // {LINE_WIDTH}),
        df AS (SELECT host, line, count(DISTINCT doc_id) AS ndocs
               FROM lines GROUP BY host, line),
        kept AS (SELECT l.doc_id, l.line_no, l.line
                 FROM lines l JOIN df USING (host, line)
                 WHERE df.ndocs < 3)
        SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text
        FROM kept GROUP BY doc_id
    """
    out["intradoc_dedup_docs"] = f"""
        WITH d AS (SELECT doc_id,
                          'rep' || (doc_id % 7) || ' {INTRADOC_TAIL} ' ||
                          'rep' || (doc_id % 7) || ' {INTRADOC_TAIL} ' ||
                          COALESCE(text, '') AS txt
                   FROM documents),
        t AS (SELECT doc_id, string_split(txt, ' ') AS toks FROM d),
        tok AS (SELECT doc_id, i, toks[i] AS token
                FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
        lines AS (SELECT doc_id, (i - 1) // {LINE_WIDTH} AS line_no,
                         string_agg(token, ' ' ORDER BY i) AS line
                  FROM tok GROUP BY doc_id, (i - 1) // {LINE_WIDTH}),
        kept AS (SELECT doc_id, line, min(line_no) AS line_no
                 FROM lines GROUP BY doc_id, line)
        SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text
        FROM kept GROUP BY doc_id
    """
    clean_expr, count_exprs = pii_oracle_exprs("txt")
    count_cols = ",\n               ".join(
        f"CAST({e} AS BIGINT) AS {n}" for n, e in count_exprs.items()
    )
    out["redact_pii_docs"] = f"""
        WITH raw AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id || '@Example' ||
                   (doc_id % 7) || '.COM now' ||
                   CASE WHEN doc_id % 3 = 0 THEN
                        ' call +1-' || (300 + doc_id % 700) || '-' ||
                        (100 + doc_id % 900) || '-' || (1000 + doc_id % 9000)
                   ELSE '' END ||
                   CASE WHEN doc_id % 4 = 0 THEN
                        ' from 10.' || (doc_id % 256) || '.' ||
                        (doc_id % 200) || '.' || (doc_id % 250)
                   ELSE '' END AS txt
            FROM documents)
        SELECT doc_id, {clean_expr} AS clean,
               {count_cols}
        FROM raw
    """
    out["repetition_quality_docs"] = f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, i, toks[i] AS token
                FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
        base AS (SELECT doc_id, count(*) AS n_words,
                        sum(length(token)) AS sum_len
                 FROM tok GROUP BY doc_id),
        g2 AS (SELECT doc_id, token || ' ' ||
                      lead(token) OVER (PARTITION BY doc_id ORDER BY i) AS g
               FROM tok QUALIFY g IS NOT NULL),
        d2 AS (SELECT doc_id, count(*) AS tot, count(DISTINCT g) AS dist
               FROM g2 GROUP BY doc_id),
        tc AS (SELECT doc_id, token, count(*) AS c FROM tok
               GROUP BY doc_id, token),
        tt AS (SELECT doc_id, max(c) AS maxc FROM tc GROUP BY doc_id),
        m AS (SELECT b.doc_id, b.n_words,
                     b.sum_len * 1.0 / b.n_words AS mwl,
                     COALESCE((d2.tot - d2.dist) * 1.0 / d2.tot, 0.0) AS dupf,
                     tt.maxc * 1.0 / b.n_words AS topf
              FROM base b LEFT JOIN d2 USING (doc_id)
              JOIN tt USING (doc_id))
        SELECT doc_id, n_words,
               round(mwl, 6) AS mean_word_len,
               round(dupf, 6) AS dup_2gram_frac,
               round(topf, 6) AS top_token_frac,
               CAST(CASE WHEN n_words BETWEEN {qb["min_words"]}
                              AND {qb["max_words"]}
                         AND dupf <= {qb["max_dup_2gram_frac"]}
                         AND topf <= {qb["max_top_token_frac"]}
                         AND mwl >= {qb["min_mean_word_len"]}
                         AND mwl <= {qb["max_mean_word_len"]}
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM m
    """
    out["decontaminate_docs"] = f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i,
                     array_to_string(toks[i:i+{w - 1}], ' ') AS gram
              FROM t, UNNEST(range(1, len(toks) - {w - 2})) AS r(i)
              WHERE len(toks) >= {w}),
        b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        hits AS (SELECT g.doc_id, count(*) AS n_contam
                 FROM g JOIN b USING (gram)
                 WHERE g.doc_id % 50 <> 0 GROUP BY g.doc_id)
        SELECT d.doc_id,
               COALESCE(h.n_contam, 0) AS n_contam,
               CAST(CASE WHEN COALESCE(h.n_contam, 0) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % 50 <> 0
    """
    out["host_page_stats"] = """
        WITH u AS (SELECT 'site' || (doc_id % 13) || '.example.com' AS host,
                          md5(text) AS dg
                   FROM documents)
        SELECT host, count(*) AS n_pages,
               count(DISTINCT dg) AS n_distinct,
               round(1.0 - count(DISTINCT dg) * 1.0 / count(*), 6)
                   AS dup_rate
        FROM u GROUP BY host
    """
    out["host_links_docs"] = r"""
        WITH d AS (SELECT doc_id,
                          'site' || (doc_id % 13) || '.example.com'
                              AS src_host,
                          COALESCE(text, '')
                          || ' <a href="http://site' || ((doc_id + 1) % 13)
                          || '.example.com/p' || doc_id || '">x</a>'
                          || ' <a href="http://site' || ((doc_id + 2) % 13)
                          || '.example.com/p' || doc_id || '">x</a>'
                          || ' <a href="http://site' || ((doc_id + 3) % 13)
                          || '.example.com/p' || doc_id || '">x</a>' AS txt
                   FROM documents),
        links AS (SELECT src_host,
                         UNNEST(regexp_extract_all(txt, 'href="([^"]*)"', 1))
                             AS u
                  FROM d),
        edges AS (SELECT src_host,
                         lower(regexp_extract(
                             u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
                             AS dst_host
                  FROM links)
        SELECT src_host, dst_host, count(*) AS n_links
        FROM edges GROUP BY src_host, dst_host
    """
    return out


ORACLES.update(_webclean_oracles())

ORACLES["anchor_text_docs"] = r"""
    WITH d AS (SELECT doc_id, COALESCE(text, '')
        || ' <a href="http://site' || ((doc_id + 1) % 13)
        || '.example.com/p/' || doc_id || '">'
        || CASE ((doc_id + 1) % 3) WHEN 0 THEN 'click here'
               WHEN 1 THEN 'read more' ELSE 'home page' END || '</a>'
        || ' <a href="http://site' || ((doc_id + 2) % 13)
        || '.example.com/p/' || doc_id || '">'
        || CASE ((doc_id + 2) % 3) WHEN 0 THEN 'click here'
               WHEN 1 THEN 'read more' ELSE 'home page' END || '</a>'
        || ' <a href="http://site' || ((doc_id + 3) % 13)
        || '.example.com/p/' || doc_id || '">'
        || CASE ((doc_id + 3) % 3) WHEN 0 THEN 'click here'
               WHEN 1 THEN 'read more' ELSE 'home page' END || '</a>'
        AS txt FROM documents),
    m AS (SELECT
            UNNEST(regexp_extract_all(txt,
                'href="([^"]*)">([^<]*)</a>', 1)) AS href,
            UNNEST(regexp_extract_all(txt,
                'href="([^"]*)">([^<]*)</a>', 2)) AS anchor
          FROM d),
    h AS (SELECT lower(regexp_extract(href,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS dst_host,
              anchor
          FROM m)
    SELECT dst_host, count(*) AS n_refs,
           count(DISTINCT anchor) AS n_anchor_texts,
           string_agg(DISTINCT anchor, ',' ORDER BY anchor) AS anchors_csv
    FROM h GROUP BY dst_host
"""

ORACLES["template_fingerprint_docs"] = r"""
    WITH d AS (SELECT doc_id,
        '<html><head><title>s</title></head><body>'
        || CASE WHEN doc_id % 3 = 0
               THEN '<nav><ul><li>x</li><li>y</li></ul></nav>' ELSE '' END
        || repeat('<p>t</p>', CAST(1 + doc_id % 4 AS INTEGER))
        || CASE WHEN doc_id % 2 = 0 THEN '<footer>f</footer>' ELSE '' END
        || '</body></html>' AS html FROM documents),
    s AS (SELECT doc_id,
                 regexp_extract_all(html, '<([a-z0-9]+)', 1) AS tags
          FROM d)
    SELECT md5(COALESCE(array_to_string(tags, '>'), '')) AS fingerprint,
           count(*) AS n_pages,
           CAST(min(len(tags)) AS BIGINT) AS n_tags,
           min(doc_id) AS min_doc_id
    FROM s GROUP BY 1
"""

ORACLES["reciprocal_links_docs"] = r"""
    WITH e AS (
        SELECT 'site' || (doc_id % 13) AS src,
               'site' || ((doc_id + k) % 13) AS dst
        FROM documents CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS k) ks
        UNION ALL
        SELECT 'site' || (doc_id % 13), 'site' || ((doc_id + 12) % 13)
        FROM documents WHERE doc_id % 4 = 0),
    o AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                 CASE WHEN src < dst THEN 1 ELSE 0 END AS fwd
          FROM e WHERE src <> dst)
    SELECT a, b, CAST(sum(fwd) AS DOUBLE) AS w_ab,
           CAST(sum(1 - fwd) AS DOUBLE) AS w_ba
    FROM o GROUP BY a, b
    HAVING sum(fwd) > 0 AND sum(1 - fwd) > 0
"""

def _curate_oracle() -> str:
    from dedup_ray.stages.webclean import (
        LINE_WIDTH,
        QUALITY_BOUNDS,
        pii_oracle_exprs,
    )

    clean_expr, _ = pii_oracle_exprs("text")
    b = QUALITY_BOUNDS
    return f"""
        WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
        tok0 AS (SELECT doc_id, i, toks[i] AS token
                 FROM t0, UNNEST(range(1, len(toks) + 1)) AS r(i)),
        base AS (SELECT doc_id, count(*) AS n_words,
                        sum(length(token)) AS sum_len
                 FROM tok0 GROUP BY doc_id),
        g2 AS (SELECT doc_id, token || ' ' ||
                      lead(token) OVER (PARTITION BY doc_id ORDER BY i) AS g
               FROM tok0 QUALIFY g IS NOT NULL),
        d2 AS (SELECT doc_id, count(*) AS tot, count(DISTINCT g) AS dist
               FROM g2 GROUP BY doc_id),
        tc AS (SELECT doc_id, token, count(*) AS c FROM tok0
               GROUP BY doc_id, token),
        tt AS (SELECT doc_id, max(c) AS maxc FROM tc GROUP BY doc_id),
        m AS (SELECT bb.doc_id, bb.n_words,
                     bb.sum_len * 1.0 / bb.n_words AS mwl,
                     COALESCE((d2.tot - d2.dist) * 1.0 / d2.tot, 0.0)
                         AS dupf,
                     tt.maxc * 1.0 / bb.n_words AS topf
              FROM base bb LEFT JOIN d2 USING (doc_id)
              JOIN tt USING (doc_id)),
        keepids AS (SELECT doc_id FROM m
                    WHERE n_words BETWEEN {b["min_words"]}
                          AND {b["max_words"]}
                      AND dupf <= {b["max_dup_2gram_frac"]}
                      AND topf <= {b["max_top_token_frac"]}
                      AND mwl >= {b["min_mean_word_len"]}
                      AND mwl <= {b["max_mean_word_len"]}),
        src AS (SELECT d.doc_id, {clean_expr} AS text
                FROM documents d JOIN keepids USING (doc_id)),
        t2 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM src),
        tok2 AS (SELECT doc_id, i, toks[i] AS token
                 FROM t2, UNNEST(range(1, len(toks) + 1)) AS r(i)),
        lines AS (SELECT doc_id, (i - 1) // {LINE_WIDTH} AS line_no,
                         string_agg(token, ' ' ORDER BY i) AS line
                  FROM tok2 GROUP BY doc_id, (i - 1) // {LINE_WIDTH}),
        ranked AS (SELECT doc_id, line_no, line, row_number() OVER (
                       PARTITION BY line ORDER BY doc_id, line_no) AS rn
                   FROM lines),
        kept AS (SELECT doc_id, line_no, line FROM ranked WHERE rn = 1)
        SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text
        FROM kept GROUP BY doc_id
    """


ORACLES["curate_docs"] = _curate_oracle()

ORACLES["salted_stats_events"] = """
    SELECT event_type, count(value) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY event_type
"""

ORACLES["media_pipeline_docs"] = """
    SELECT doc_id,
           CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS BIGINT)
               AS img_in_bytes,
           CAST(48 AS BIGINT) AS img_out_bytes,
           CAST(2 + doc_id % 6 AS BIGINT) AS n_frames,
           CAST((2 + doc_id % 6 + 1) // 2 AS BIGINT) AS n_sampled_frames,
           CAST(GREATEST(1, (700 + doc_id % 600) // 256) AS BIGINT)
               AS n_audio_windows
    FROM documents
"""

ORACLES["avi_frames_docs"] = """
    SELECT doc_id,
           CAST((2 + doc_id % 6 + 1) // 2 AS BIGINT) AS n_sampled_frames,
           CAST((2 + doc_id % 3) * (2 + doc_id % 2) * 3 AS BIGINT)
               AS frame_bytes,
           CAST(((2 + doc_id % 6 + 1) // 2)
                * (2 + doc_id % 3) * (2 + doc_id % 2) * 3 AS BIGINT)
               AS sampled_bytes
    FROM documents
"""

ORACLES["skew_join_events"] = """
    WITH e AS (
        SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id % 10 END
                   AS hub,
               event_type, value
        FROM events),
    dim AS (SELECT hub, event_type AS dim_type, count(*) AS type_n
            FROM e GROUP BY hub, event_type)
    SELECT e.hub,
           count(*) AS joined_rows,
           CAST(sum(type_n) AS BIGINT) AS type_n_total,
           round(sum(value), 3) AS value_total
    FROM e JOIN dim ON e.hub = dim.hub
    GROUP BY e.hub
"""

_HEX = "0123456789abcdef"
_DSIR_BUCKET_SQL = (
    f"(strpos('{_HEX}', substr(md5(token), 1, 1)) - 1) * 256 + "
    f"(strpos('{_HEX}', substr(md5(token), 2, 1)) - 1) * 16 + "
    f"(strpos('{_HEX}', substr(md5(token), 3, 1)) - 1)"
)
ORACLES["dsir_llr_docs"] = f"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split(coalesce(text, ''), ' ')) AS token
        FROM documents),
    tb AS (SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS bucket FROM tok),
    raw AS (SELECT bucket, count(*) AS c FROM tb GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS c FROM tb
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM tb) AS rn,
                   (SELECT count(*) FROM tb
                    WHERE lang = '{DSIR_TARGET_LANG}') AS tn),
    ratio AS (
        SELECT raw.bucket,
               ln((coalesce(tgt.c, 0) + 1.0) / (tot.tn + 4096.0))
               - ln((raw.c + 1.0) / (tot.rn + 4096.0)) AS r
        FROM raw LEFT JOIN tgt USING (bucket), tot)
    SELECT tb.doc_id, round(sum(ratio.r), 6) AS llr
    FROM tb JOIN ratio USING (bucket)
    GROUP BY tb.doc_id
"""

ORACLES["scd2_intervals_events"] = """
    WITH e AS (
        SELECT user_id, event_type,
               epoch_us(ts) AS tsu, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn2
        FROM events),
    isl AS (
        SELECT user_id, event_type, min(tsu) AS valid_from,
               count(*) AS n_events, min(rn) AS first_rn
        FROM e GROUP BY user_id, event_type, rn - rn2)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY first_rn) AS valid_to,
           n_events,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY first_rn) IS NULL AS is_current
    FROM isl
"""

_SA_SUF_CTE = f"""
    WITH sufpos AS (
        SELECT doc_id,
               unnest(range(0, length(coalesce(text, '')))) AS upos,
               text
        FROM documents),
    suf AS (SELECT doc_id, CAST(upos AS BIGINT) AS pos,
                   substr(text, CAST(upos AS INT) + 1, {SA_DEPTH}) AS pref
            FROM sufpos)
"""

ORACLES["suffix_array_docs"] = _SA_SUF_CTE + """
    SELECT doc_id, pos,
           row_number() OVER (ORDER BY pref, doc_id, pos) - 1 AS srank
    FROM suf
"""

ORACLES["sa_coverage_docs"] = _SA_SUF_CTE + """
    , flagged AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY pref
                                  ORDER BY doc_id, pos) > 1 AS is_dup
        FROM suf)
    SELECT doc_id, count(*) AS n_pos,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_pos
    FROM flagged GROUP BY doc_id
"""

ORACLES["perplexity_docs"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), ' '))
                   AS token
        FROM documents),
    tb AS (SELECT doc_id, {_DSIR_BUCKET_SQL} AS bucket FROM tok),
    cnt AS (SELECT bucket, count(*) AS c FROM tb GROUP BY bucket),
    tot AS (SELECT count(*) AS n FROM tb),
    lp AS (SELECT bucket, -ln((c + 1.0) / (n + 4096.0)) AS nl
           FROM cnt, tot),
    d AS (SELECT tb.doc_id, count(*) AS n_tokens,
                 round(sum(lp.nl) / count(*), 6) AS nll
          FROM tb JOIN lp USING (bucket) GROUP BY tb.doc_id)
    SELECT doc_id, n_tokens, nll, round(exp(nll), 3) AS ppl FROM d
"""

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)
ORACLES["bm25_topk_docs"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), ' '))
                   AS token
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
              WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY token),
    idf AS (SELECT token, ln(1 + (n - df + 0.5) / (df + 0.5)) AS w
            FROM dfreq, stats),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token),
    scored AS (
        SELECT tf.doc_id,
               sum(w * tf * ({BM25_K1} + 1) /
                   (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl
                                      / stats.avgdl))) AS s
        FROM tf JOIN idf USING (token)
                JOIN dl ON tf.doc_id = dl.doc_id, stats
        GROUP BY tf.doc_id)
    SELECT doc_id, round(s, 6) AS score FROM scored
    WHERE s > 0
    ORDER BY round(s, 6) DESC, doc_id
    LIMIT {BM25_K}
"""

ORACLES["full_outer_counts_events"] = f"""
    WITH c AS (SELECT user_id, count(*) AS clicks FROM events
               WHERE event_type = 'click'
               GROUP BY user_id HAVING count(*) >= {FULLOUTER_MIN}),
    p AS (SELECT user_id, count(*) AS purchases FROM events
          WHERE event_type = 'purchase'
          GROUP BY user_id HAVING count(*) >= {FULLOUTER_MIN})
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(clicks, 0) AS clicks,
           coalesce(purchases, 0) AS purchases
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""

ORACLES["bloom_semi_lineitem"] = f"""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_totalprice > {PUSHDOWN_PRICE})
    GROUP BY l_returnflag
"""

ORACLES["pushdown_read_orders"] = f"""
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice > {PUSHDOWN_PRICE}
    GROUP BY o_orderpriority
"""

def _k_core_oracle_sql() -> str:
    base = f"""
    WITH hubs AS MATERIALIZED (SELECT doc_id AS n FROM documents
                  WHERE doc_id % {KCORE_CLIQUE_STEP} = 0),
    e0 AS MATERIALIZED (
        SELECT doc_id AS a, doc_id // 2 AS b FROM documents
        WHERE doc_id >= 1
        UNION ALL
        SELECT h1.n AS a, h2.n AS b FROM hubs h1 JOIN hubs h2
        ON h1.n < h2.n)"""
    parts = [base]
    for i in range(1, KCORE_ROUNDS + 1):
        p, c = i - 1, i
        parts.append(f""",
    d{c} AS MATERIALIZED (SELECT node, count(*) AS d FROM (
        SELECT a AS node FROM e{p} UNION ALL SELECT b FROM e{p})
        GROUP BY node),
    e{c} AS MATERIALIZED (SELECT a, b FROM e{p}
             WHERE a IN (SELECT node FROM d{c} WHERE d >= {KCORE_K})
               AND b IN (SELECT node FROM d{c} WHERE d >= {KCORE_K}))""")
    parts.append(f"""
    SELECT a, b FROM e{KCORE_ROUNDS} ORDER BY a, b""")
    return "".join(parts)


ORACLES["k_core_docs"] = _k_core_oracle_sql()


def _cluster_split_oracle_sql() -> str:
    from dedup_ray.stages.mixing import split_case_expr

    case = split_case_expr(SPLIT_FRACTIONS, id_col="cluster_id",
                           seed=SPLIT_SEED)
    return f"""
    WITH cl AS (SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY md5(coalesce(text,
                           ''))) AS cluster_id
                FROM documents)
    SELECT doc_id, {case} AS split FROM cl
"""


ORACLES["cluster_split_docs"] = _cluster_split_oracle_sql()

ORACLES["route_media_docs"] = """
    SELECT doc_id,
           CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                WHEN 2 THEN 'wav' WHEN 3 THEN 'avi'
                ELSE 'other' END AS content_type,
           CASE doc_id % 5
                WHEN 0 THEN 3 + doc_id % 4
                WHEN 1 THEN 3 + doc_id % 4
                WHEN 2 THEN 500 + doc_id % 300
                WHEN 3 THEN 2 + doc_id % 4
                ELSE NULL END AS dim1,
           CASE doc_id % 5
                WHEN 0 THEN 2 + doc_id % 3
                WHEN 1 THEN 2 + doc_id % 3
                WHEN 2 THEN 8000
                WHEN 3 THEN 3 + doc_id % 4
                ELSE NULL END AS dim2
    FROM documents
"""

ORACLES["jpeg_roundtrip_docs"] = """
    SELECT doc_id,
           CAST(9 + doc_id % 8 AS BIGINT) AS width,
           CAST(9 + doc_id % 5 AS BIGINT) AS height,
           TRUE AS ok
    FROM documents
"""

ORACLES["top_tokens_docs"] = """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents)
    SELECT token, count(*) AS n FROM tok
    GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
"""

ORACLES["hll_token_registers_docs"] = """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents),
    h AS (SELECT md5(token) AS hx FROM tok),
    parts AS (SELECT
        (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 +
        (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS idx,
        length(regexp_extract(substr(hx, 3, 13), '^0*')) AS lz,
        substr(hx,
               3 + length(regexp_extract(substr(hx, 3, 13), '^0*')),
               1) AS d0
      FROM h),
    r AS (SELECT idx,
                 CASE WHEN lz >= 13 THEN 53
                      ELSE 4 * lz + 1 +
                           CASE WHEN d0 IN ('8','9','a','b','c','d','e','f')
                                    THEN 0
                                WHEN d0 IN ('4','5','6','7') THEN 1
                                WHEN d0 IN ('2','3') THEN 2
                                ELSE 3 END
                 END AS rho
          FROM parts)
    SELECT CAST(idx AS BIGINT) AS idx, CAST(max(rho) AS BIGINT) AS rho
    FROM r GROUP BY idx
"""

ORACLES["jsonl_roundtrip_docs"] = """
    SELECT doc_id,
           length(coalesce(text, '')) AS n_chars_rt,
           string_split(coalesce(text, ''), ' ')[1] AS first_token
    FROM documents
"""

ORACLES["edit_distance_parts"] = f"""
    WITH capped AS (
        SELECT p_brand, p_partkey, p_name,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_partkey) AS rn
        FROM part)
    SELECT a.p_brand,
           a.p_partkey AS k1, b.p_partkey AS k2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM capped a JOIN capped b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.rn <= {EDIT_CAP} AND b.rn <= {EDIT_CAP}
"""

ORACLES["hll_user_registers_events"] = """
    WITH h AS (SELECT event_type,
                      md5(CAST(user_id AS VARCHAR)) AS hx
               FROM events),
    parts AS (SELECT event_type,
        (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 +
        (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS idx,
        length(regexp_extract(substr(hx, 3, 13), '^0*')) AS lz,
        substr(hx,
               3 + length(regexp_extract(substr(hx, 3, 13), '^0*')),
               1) AS d0
      FROM h),
    r AS (SELECT event_type, idx,
                 CASE WHEN lz >= 13 THEN 53
                      ELSE 4 * lz + 1 +
                           CASE WHEN d0 IN ('8','9','a','b','c','d','e','f')
                                    THEN 0
                                WHEN d0 IN ('4','5','6','7') THEN 1
                                WHEN d0 IN ('2','3') THEN 2
                                ELSE 3 END
                 END AS rho
          FROM parts)
    SELECT event_type, CAST(idx AS BIGINT) AS idx,
           CAST(max(rho) AS BIGINT) AS rho
    FROM r GROUP BY event_type, idx
"""

ORACLES["novelty_curve_docs"] = f"""
    WITH d AS (SELECT doc_id,
                      min(doc_id) OVER (PARTITION BY md5(text)) AS first_id
               FROM documents)
    SELECT CAST(doc_id // {NOVELTY_BUCKET} AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(doc_id > first_id AS BIGINT)) AS BIGINT)
               AS n_dup,
           round(sum(CAST(doc_id > first_id AS BIGINT)) / count(*), 6)
               AS dup_rate
    FROM d GROUP BY bucket
"""

ORACLES["chunk_tokens_docs"] = f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '') AS toks
               FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    c AS (SELECT doc_id, toks, n,
                 unnest(range(0, greatest(n - {CHUNK_WINDOW - CHUNK_STRIDE}, 1),
                              {CHUNK_STRIDE})) AS start
          FROM n)
    SELECT doc_id, CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(toks[start + 1 : start + {CHUNK_WINDOW}], ' ')
               AS chunk_text
    FROM c
"""

ORACLES["token_logfreq_score_docs"] = TOKENS_CTE + """
    , c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
    SELECT t.doc_id, round(avg(ln(c.cnt)), 6) AS logfreq_score
    FROM toks t JOIN c USING (token)
    GROUP BY t.doc_id
"""

ORACLES["token_budget_select_docs"] = f"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '') AS toks
               FROM documents),
    f AS (SELECT doc_id,
                 CAST(length(list_distinct(toks)) AS BIGINT) AS score,
                 CAST(length(toks) AS BIGINT) AS n_tokens
          FROM t),
    w AS (SELECT doc_id, score, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM f)
    SELECT doc_id, score, n_tokens FROM w WHERE cum <= {TOKEN_BUDGET}
"""

ORACLES["lang_token_budget_docs"] = f"""
    WITH f AS (SELECT doc_id, lang,
                      CAST(length(list_filter(
                          string_split(coalesce(text, ''), ' '),
                          x -> x <> '')) AS BIGINT) AS score
               FROM documents),
    w AS (SELECT doc_id, lang, score, score AS n_tokens,
                 SUM(score) OVER (PARTITION BY lang
                                  ORDER BY score DESC, doc_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum
          FROM f)
    SELECT doc_id, lang, score, n_tokens
    FROM w WHERE cum <= {LANG_TOKEN_BUDGET}
"""

ORACLES["q3_shipping_priority"] = f"""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l_shipdate > TIMESTAMP '{Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""

ORACLES["cms_token_registers_docs"] = """
    WITH tok AS (SELECT unnest(string_split(coalesce(text, ''), ' '))
                     AS token
                 FROM documents),
    h AS (SELECT md5(token) AS hx FROM tok),
    b AS (SELECT r.j AS hrow,
                 (strpos('0123456789abcdef', substr(hx, 2 * r.j + 1, 1)) - 1)
                     * 16 +
                 (strpos('0123456789abcdef', substr(hx, 2 * r.j + 2, 1)) - 1)
                     AS bucket
          FROM h CROSS JOIN (SELECT unnest(range(4)) AS j) r)
    SELECT CAST(hrow AS BIGINT) AS hrow, CAST(bucket AS BIGINT) AS bucket,
           count(*) AS cnt
    FROM b GROUP BY hrow, bucket
"""

ORACLES["shuffle_rank_docs"] = f"""
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5(doc_id || ':{SHUFFLE_SEED}'), doc_id
           ) - 1 AS BIGINT) AS rank
    FROM documents
"""

ORACLES["pack_sequences_docs"] = f"""
    WITH c AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT)
                          AS n_tokens
               FROM documents),
    s AS (SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS before
          FROM c)
    SELECT doc_id, n_tokens,
           CAST(before // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(before % {PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM s
"""

ORACLES["doc_length_quantiles"] = f"""
    WITH c AS (SELECT n_chars, count(*) AS cnt FROM documents
               GROUP BY n_chars),
    o AS (SELECT n_chars, SUM(cnt) OVER (ORDER BY n_chars) AS cum,
                 (SELECT count(*) FROM documents) AS n
          FROM c),
    qs AS (SELECT unnest({QUANTILE_QS!r}) AS q)
    SELECT CAST(q AS DOUBLE) AS q, CAST(min(n_chars) AS BIGINT) AS v
    FROM o, qs
    WHERE cum >= floor(CAST(q AS DOUBLE) * (n - 1)) + 1
    GROUP BY q
"""

ORACLES["normalize_urls_docs"] = f"""
    WITH raw AS (
        SELECT doc_id,
               'HTTPS://Site' || (doc_id % 13) || '.Example.COM:443/p/' ||
               doc_id || '/?utm_source=feed&utm_campaign=c' || (doc_id % 3)
               || '&id=' || doc_id || '&fbclid=x#s' || (doc_id % 5) AS url
        FROM documents)
    SELECT doc_id, url,
           {_url_oracle_expr("url")} AS url_norm,
           lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host
    FROM raw
"""


# Pinned sf0.01 oracles for the deterministic fixed-point / zlib queries
# (ap_cluster_docs, semdedup_embeddings, compression_ratio_docs) — same
# accepted technique as ann_topk_lsh / logistic_score_embeddings: the Ray
# output measured once, reproduced as a VALUES table.  Regenerate with
# tools/gen_pinned_oracles.py after any change to those operators.
try:
    from dedup_ray.pipelines.pinned_oracles import PINNED as _PINNED

    ORACLES.update(_PINNED)
except ImportError:  # generated file absent: those queries stay rows-only
    pass


# --------------------------------------------------------------------------
# Catalog ordering for the driver's correctness sweep.  The round-2 driver
# checked the first ~50 entries before its time budget ran out
# (CORRECTNESS_r02.json); every remaining oracle was verified
# independently, but the driver record should cover the whole catalog.
# Reorder so the entries the driver has never checked run FIRST (cheap
# ones up front, the known-slow pipelines at the end of that block), then
# --- sixth-sitting additions: registered after the literal so the diff is
# append-only; the catalog-order rebuild below folds them in ---------------
QUERIES["edit1_token_join_docs"] = edit1_token_join_docs
QUERIES["kmv_set_ops_docs"] = kmv_set_ops_docs
QUERIES["exact_quantiles_events"] = exact_quantiles_events
QUERIES["minimizer_sketch_docs"] = minimizer_sketch_docs
QUERIES["hilbert_key_events"] = hilbert_key_events

ORACLES["edit1_token_join_docs"] = """
    WITH base AS (
        SELECT unnest(string_split(p_name, ' ')) AS token FROM part
        UNION ALL
        SELECT substr(t, 1, 1) || substr(t, 3) AS token
        FROM (SELECT string_split(p_name, ' ')[1] AS t
              FROM part WHERE p_partkey % 7 = 0)
        UNION ALL
        SELECT substr(t, 1, 2) || substr(t, 4) AS token
        FROM (SELECT string_split(p_name, ' ')[-1] AS t
              FROM part WHERE p_partkey % 5 = 0)),
    u AS (SELECT DISTINCT token FROM base WHERE length(token) >= 4),
    vars AS (
        SELECT token, token AS variant FROM u
        UNION ALL
        SELECT token,
               substr(token, 1, i - 1) || substr(token, i + 1) AS variant
        FROM (SELECT token,
                     unnest(range(1, length(token) + 1)) AS i FROM u)),
    cand AS (
        SELECT DISTINCT a.token AS t1, b.token AS t2
        FROM vars a JOIN vars b
          ON a.variant = b.variant AND a.token < b.token)
    SELECT t1, t2 FROM cand WHERE levenshtein(t1, t2) <= 1
"""

ORACLES["kmv_set_ops_docs"] = f"""
    WITH tk AS (
        SELECT source,
               unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    h AS (SELECT DISTINCT source, substr(md5(token), 1, 16) AS hv FROM tk),
    sk AS (SELECT source, hv FROM (
            SELECT source, hv,
                   row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
            FROM h) WHERE rn <= {KMV_SKETCH_K}),
    pairs AS (
        SELECT a.source AS s1, b.source AS s2
        FROM (SELECT DISTINCT source FROM sk) a,
             (SELECT DISTINCT source FROM sk) b
        WHERE a.source < b.source),
    uni AS (
        SELECT p.s1, p.s2, s.hv FROM pairs p
        JOIN sk s ON s.source = p.s1 OR s.source = p.s2
        GROUP BY p.s1, p.s2, s.hv),
    rk AS (
        SELECT s1, s2, hv,
               row_number() OVER (PARTITION BY s1, s2 ORDER BY hv) AS rn,
               count(*) OVER (PARTITION BY s1, s2) AS nu
        FROM uni),
    th AS (
        SELECT s1, s2, max(nu) AS nu,
               max(CASE WHEN rn = {KMV_SKETCH_K} THEN hv END) AS theta
        FROM rk GROUP BY s1, s2),
    calc AS (
        SELECT t.s1, t.s2, t.nu,
               CASE WHEN t.nu < {KMV_SKETCH_K} THEN NULL
                    ELSE ('0x' || t.theta)::UBIGINT::DOUBLE
                         / 18446744073709551616.0 END AS tf,
               (SELECT count(*) FROM sk a JOIN sk b
                 ON b.hv = a.hv AND a.source = t.s1 AND b.source = t.s2)
                   AS ni_all,
               (SELECT count(*) FROM sk a JOIN sk b
                 ON b.hv = a.hv AND a.source = t.s1 AND b.source = t.s2
                WHERE a.hv < t.theta) AS ni_lt
        FROM th t)
    SELECT s1 AS g1, s2 AS g2,
           round(CASE WHEN nu < {KMV_SKETCH_K} THEN CAST(nu AS DOUBLE)
                      ELSE ({KMV_SKETCH_K} - 1) / tf END, 4) AS union_est,
           round(CASE WHEN nu < {KMV_SKETCH_K} THEN CAST(ni_all AS DOUBLE)
                      ELSE ni_lt / tf END, 4) AS intersect_est,
           round(CASE WHEN nu < {KMV_SKETCH_K}
                      THEN CAST(ni_all AS DOUBLE) / nu
                      ELSE CAST(ni_lt AS DOUBLE) / ({KMV_SKETCH_K} - 1)
                      END, 4) AS jaccard_est
    FROM calc
"""

ORACLES["exact_quantiles_events"] = f"""
    WITH s AS (SELECT value,
                      row_number() OVER (ORDER BY value) AS rn,
                      count(*) OVER () AS n
               FROM events),
    qq AS (SELECT unnest({EXACT_QS!r}) AS q)
    SELECT q, round(value, 6) AS value
    FROM qq JOIN s ON s.rn = 1 + CAST(floor(q * (n - 1)) AS BIGINT)
"""

ORACLES["minimizer_sketch_docs"] = f"""
    WITH pos AS (
        SELECT doc_id, text,
               unnest(range(1, length(text) - {MINIMIZER_K} + 2)) AS i
        FROM documents WHERE length(text) >= {MINIMIZER_K}),
    ph AS (
        SELECT doc_id, i,
               substr(md5(substr(text, CAST(i AS INT), {MINIMIZER_K})),
                      1, 16) AS h,
               count(*) OVER (PARTITION BY doc_id) AS p
        FROM pos),
    wm AS (
        SELECT doc_id, i, p,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {MINIMIZER_W - 1} FOLLOWING) AS m
        FROM ph)
    SELECT DISTINCT doc_id, m AS minimizer
    FROM wm WHERE i <= greatest(1, p - {MINIMIZER_W} + 1)
"""


QUERIES["heavy_hitters_docs"] = heavy_hitters_docs
QUERIES["rendezvous_shard_docs"] = rendezvous_shard_docs
QUERIES["minimizer_pairs_docs"] = minimizer_pairs_docs
QUERIES["random_walks_docs"] = random_walks_docs

ORACLES["heavy_hitters_docs"] = f"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT token, count(*) AS cnt FROM toks, tot
    GROUP BY token, tot.n HAVING count(*) * {HH_PHI} > tot.n
"""






QUERIES["scc_docs"] = scc_docs


QUERIES["bootstrap_mean_docs"] = bootstrap_mean_docs

from dedup_ray.stages.mixing import POISSON1_CDF as _P1

_BOOT_W = ("CASE " + " ".join(
    f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(_P1)) + " ELSE 6 END")

ORACLES["bootstrap_mean_docs"] = f"""
    WITH reps AS (SELECT unnest(range({BOOT_REPS})) AS rep),
    draws AS (
        SELECT rep, n_chars,
               ('0x' || substr(md5('boot:' || doc_id || ':' || rep), 1, 16))
                   ::UBIGINT::DOUBLE / 18446744073709551616.0 AS u
        FROM documents, reps),
    w AS (SELECT rep, n_chars, {{_BOOT_W}} AS wt FROM draws)
    SELECT rep, round(sum(wt * n_chars) / sum(wt), 6) AS boot_mean
    FROM w GROUP BY rep
""".replace("{_BOOT_W}", _BOOT_W)


QUERIES["rrf_fusion_docs"] = rrf_fusion_docs

ORACLES["rrf_fusion_docs"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), ' '))
                   AS token
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
              WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY token),
    idf AS (SELECT token, ln(1 + (n - df + 0.5) / (df + 0.5)) AS w
            FROM dfreq, stats),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token),
    scored AS (
        SELECT tf.doc_id,
               sum(w * tf * ({BM25_K1} + 1) /
                   (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl
                                      / stats.avgdl))) AS s
        FROM tf JOIN idf USING (token)
                JOIN dl ON tf.doc_id = dl.doc_id, stats
        GROUP BY tf.doc_id),
    ra AS (SELECT doc_id,
                  row_number() OVER (ORDER BY round(s, 6) DESC, doc_id)
                      AS r
           FROM scored WHERE s > 0
           QUALIFY r <= {RRF_POOL}),
    tc AS (SELECT doc_id, sum(tf) AS cnt FROM tf GROUP BY doc_id),
    rb AS (SELECT doc_id,
                  row_number() OVER (ORDER BY cnt DESC, doc_id) AS r
           FROM tc WHERE cnt > 0
           QUALIFY r <= {RRF_POOL}),
    fused AS (SELECT doc_id, sum(1.0 / ({RRF_C} + r)) AS rrf
              FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
              GROUP BY doc_id)
    SELECT doc_id, round(rrf, 6) AS rrf FROM fused
    ORDER BY round(rrf, 6) DESC, doc_id LIMIT {RRF_K}
"""


QUERIES["f2_selfjoin_docs"] = f2_selfjoin_docs

ORACLES["f2_selfjoin_docs"] = """
    WITH toks AS (
        SELECT unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    tf AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    pj AS (SELECT token, n, unnest(range(5)) AS j FROM tf),
    cells AS (
        SELECT j,
               ('0x' || substr(md5(token), CAST(2 * j + 1 AS INT), 2))
                   ::UBIGINT::BIGINT AS bucket,
               n * (CASE WHEN ('0x' || substr(md5(token),
                                              CAST(11 + j AS INT), 1))
                              ::UBIGINT % 2 = 0
                         THEN 1 ELSE -1 END) AS sv
        FROM pj),
    reg AS (SELECT j, bucket, sum(sv) AS v FROM cells GROUP BY j, bucket),
    est AS (SELECT j, sum(v * v) AS e FROM reg GROUP BY j)
    SELECT CAST(e AS BIGINT) AS f2_est
    FROM (SELECT e, row_number() OVER (ORDER BY e) AS rn FROM est)
    WHERE rn = 3
"""


QUERIES["mis_docs"] = mis_docs
QUERIES["weighted_minhash_docs"] = weighted_minhash_docs
QUERIES["char_entropy_docs"] = char_entropy_docs

ORACLES["weighted_minhash_docs"] = f"""
    {TOKENS_CTE},
    tf AS (SELECT doc_id, token, count(*) AS w
           FROM toks GROUP BY doc_id, token),
    inst AS (SELECT doc_id, token || '#' || j AS it
             FROM tf, unnest(range(w)) AS u(j)),
    perms AS (SELECT unnest(range({WMH_PERMS})) AS p),
    regs AS (SELECT doc_id, p,
                    min(substr(md5(p || ':' || it), 1, 16)) AS reg
             FROM inst, perms GROUP BY doc_id, p),
    a AS (SELECT doc_id, p, reg FROM regs WHERE doc_id % 2 = 0),
    b AS (SELECT doc_id, p, reg FROM regs WHERE doc_id % 2 = 1)
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           round(avg(CASE WHEN a.reg = b.reg THEN 1.0 ELSE 0.0 END), 6)
               AS wjacc_est
    FROM a JOIN b ON b.doc_id = a.doc_id + 1 AND b.p = a.p
    GROUP BY a.doc_id, b.doc_id
"""

ORACLES["char_entropy_docs"] = f"""
    WITH ch AS (
        SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
        FROM (SELECT doc_id, text,
                     unnest(range(1, length(text) + 1)) AS i
              FROM documents WHERE length(coalesce(text, '')) > 0)),
    f AS (SELECT doc_id, count(*) AS n FROM ch GROUP BY doc_id, c),
    h AS (SELECT doc_id,
                 log2(sum(n)) - sum(n * log2(n)) / sum(n) AS ent
          FROM f GROUP BY doc_id)
    SELECT doc_id, round(ent, 4) AS char_entropy,
           CAST(round(ent, 4) < {ENTROPY_FLAG_BITS} AS BIGINT) AS low_flag
    FROM h
"""


from dedup_ray.stages.mixing import rendezvous_shard_sql as _rdz_sql

ORACLES["rendezvous_shard_docs"] = f"""
    SELECT doc_id, shard8, shard9,
           CASE WHEN shard8 = shard9 THEN 0 ELSE 1 END AS moved
    FROM (SELECT doc_id,
                 {_rdz_sql('doc_id', 8, out_col='shard8')},
                 {_rdz_sql('doc_id', 9, out_col='shard9')}
          FROM documents)
"""

ORACLES["minimizer_pairs_docs"] = f"""
    WITH pos AS (
        SELECT doc_id, text,
               unnest(range(1, length(text) - {MINIMIZER_K} + 2)) AS i
        FROM documents WHERE length(text) >= {MINIMIZER_K}),
    ph AS (
        SELECT doc_id, i,
               substr(md5(substr(text, CAST(i AS INT), {MINIMIZER_K})),
                      1, 16) AS h,
               count(*) OVER (PARTITION BY doc_id) AS p
        FROM pos),
    wm AS (
        SELECT doc_id, i, p,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {MINIMIZER_W - 1} FOLLOWING) AS m
        FROM ph),
    mins AS (SELECT DISTINCT doc_id, m
             FROM wm WHERE i <= greatest(1, p - {MINIMIZER_W} + 1))
    SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
    FROM mins a JOIN mins b ON a.m = b.m AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id HAVING count(*) >= {MINPAIR_SHARED}
"""

ORACLES["random_walks_docs"] = '''WITH ids AS (SELECT doc_id FROM documents),
    e0 AS (SELECT 'site' || (doc_id % 13) AS src,
                  'site' || ((doc_id + k) % 13) AS dst
           FROM ids, unnest([1, 2, 3]) AS t(k)),
    e AS (SELECT DISTINCT src, dst FROM e0),
    r AS (SELECT src, dst,
                 row_number() OVER (PARTITION BY src ORDER BY dst) - 1
                     AS rk,
                 count(*) OVER (PARTITION BY src) AS deg FROM e),
    w0 AS (SELECT DISTINCT src AS walk_id, src AS node FROM e),
    w1 AS (SELECT w.walk_id, r.dst AS node FROM w0 w JOIN r ON r.src = w.node AND r.rk = CAST(('0x' || substr(md5('walk:' || w.node || ':1'), 1, 8))::UBIGINT::BIGINT % r.deg AS BIGINT)),
    w2 AS (SELECT w.walk_id, r.dst AS node FROM w1 w JOIN r ON r.src = w.node AND r.rk = CAST(('0x' || substr(md5('walk:' || w.node || ':2'), 1, 8))::UBIGINT::BIGINT % r.deg AS BIGINT)),
    w3 AS (SELECT w.walk_id, r.dst AS node FROM w2 w JOIN r ON r.src = w.node AND r.rk = CAST(('0x' || substr(md5('walk:' || w.node || ':3'), 1, 8))::UBIGINT::BIGINT % r.deg AS BIGINT)),
    w4 AS (SELECT w.walk_id, r.dst AS node FROM w3 w JOIN r ON r.src = w.node AND r.rk = CAST(('0x' || substr(md5('walk:' || w.node || ':4'), 1, 8))::UBIGINT::BIGINT % r.deg AS BIGINT))
SELECT walk_id, 1 AS step, node FROM w1 UNION ALL SELECT walk_id, 2 AS step, node FROM w2 UNION ALL SELECT walk_id, 3 AS step, node FROM w3 UNION ALL SELECT walk_id, 4 AS step, node FROM w4'''


from dedup_ray.stages.ordering import hilbert_sql as _hilbert_sql

ORACLES["hilbert_key_events"] = _hilbert_sql(
    "event_id", "user_id % 256", "event_id % 256", "events",
    bits=HILBERT_BITS)


FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FUNNEL_WINDOW_US = 3 * 86_400 * 1_000_000  # each step within 3 days


def funnel_events(sf_dir: str):
    """Windowed funnel progression (``ops/relational.py::
    funnel_steps``): per user, the longest prefix of signup → view →
    click → purchase where each later step is STRICTLY later than the
    previous step's completion and within 3 days of it; rolled up to
    (steps_completed, n_users).  One user-keyed exchange, chain
    vectorized across users (len(steps) masked grouped-min passes);
    strict ``>`` / ``<=`` on integer microseconds keeps tie semantics
    engine-independent."""
    from dedup_ray.ops.relational import funnel_steps

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_steps(ds, "user_id", "ts", "event_type",
                        list(FUNNEL_STEPS), window_us=FUNNEL_WINDOW_US)


def _funnel_oracle() -> str:
    w = FUNNEL_WINDOW_US
    s1, s2, s3, s4 = FUNNEL_STEPS
    return f"""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    s1 AS (SELECT user_id AS u, min(t) AS t FROM ev
           WHERE event_type = '{s1}' GROUP BY 1),
    s2 AS (SELECT e.user_id AS u, min(e.t) AS t FROM ev e
           JOIN s1 ON e.user_id = s1.u
           WHERE e.event_type = '{s2}' AND e.t > s1.t
             AND e.t <= s1.t + {w} GROUP BY 1),
    s3 AS (SELECT e.user_id AS u, min(e.t) AS t FROM ev e
           JOIN s2 ON e.user_id = s2.u
           WHERE e.event_type = '{s3}' AND e.t > s2.t
             AND e.t <= s2.t + {w} GROUP BY 1),
    s4 AS (SELECT e.user_id AS u, min(e.t) AS t FROM ev e
           JOIN s3 ON e.user_id = s3.u
           WHERE e.event_type = '{s4}' AND e.t > s3.t
             AND e.t <= s3.t + {w} GROUP BY 1),
    au AS (SELECT DISTINCT user_id AS u FROM events),
    d AS (SELECT au.u,
                 CASE WHEN s4.u IS NOT NULL THEN 4
                      WHEN s3.u IS NOT NULL THEN 3
                      WHEN s2.u IS NOT NULL THEN 2
                      WHEN s1.u IS NOT NULL THEN 1
                      ELSE 0 END AS steps_completed
          FROM au LEFT JOIN s1 ON au.u = s1.u
                  LEFT JOIN s2 ON au.u = s2.u
                  LEFT JOIN s3 ON au.u = s3.u
                  LEFT JOIN s4 ON au.u = s4.u)
    SELECT steps_completed::BIGINT AS steps_completed,
           count(*)::BIGINT AS n_users
    FROM d GROUP BY 1
"""


ORACLES["funnel_events"] = _funnel_oracle()


def event_transitions_events(sf_dir: str):
    """First-order Markov transition counts
    (``ops/relational.py::event_transitions``): consecutive event-type
    pairs per user summed into the (prev_type, next_type, n) navigation
    matrix.  One user-keyed exchange + a shifted-column compare per
    partition; event_id breaks timestamp ties so both engines see the
    same sequence."""
    from dedup_ray.ops.relational import event_transitions

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return event_transitions(ds, "user_id", "ts", "event_type", "event_id")


ORACLES["event_transitions_events"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events)
    SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
"""


NTILE_BUCKETS = 10


def ntile_orders(sf_dir: str):
    """Equi-depth decile binning (``stages/ordering.py::ntile_bucket``):
    orders ranked by (o_totalprice, o_orderkey) and cut into 10
    equal-depth buckets with the SQL NTILE remainder rule — built on
    the sample-based range rank, so no full-table sort: one boundary
    sample pass + one bucket exchange, bucket = pure function of
    (rank, total)."""
    from dedup_ray.stages.ordering import ntile_bucket

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ntile_bucket(ds, "o_totalprice", "o_orderkey", NTILE_BUCKETS)


ORACLES["ntile_orders"] = f"""
    SELECT o_orderkey, o_totalprice,
           (row_number() OVER (ORDER BY o_totalprice, o_orderkey)
            - 1)::BIGINT AS rank,
           ntile({NTILE_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey)
               ::BIGINT AS bucket
    FROM orders
"""


# the 50 already-green entries.  Pure reordering — keys and callables are
# untouched, and tools/check_oracles.py sees the identical catalog.
_R02_DRIVER_CHECKED = frozenset((
    "ann_topk", "anti_join_customers", "ap_cluster_docs",
    "asof_join_events", "balanced_sample_events", "block_pairs_docs",
    "bpe_encode_docs", "bpe_token_counts_docs", "bpe_train_docs",
    "cc_chain_docs", "cluster_rep_longest", "concat_title_abstract",
    "diff_nchars_pairs", "distinct_lang_source", "doc_token_counts",
    "dup_user_events", "embed_cosine_dup_pairs", "embed_pair_features",
    "eval_source_vs_lang", "exact_dedup_docs", "exact_substring_docs",
    "group_collect_lang", "grouped_stats_events", "last_token_part",
    "left_join_orders", "line_dedup_docs", "mode_event_type",
    "ngram_jaccard_pairs", "normalize_part_names", "normalize_urls_docs",
    "pair_token_overlap", "pearson_qty_price", "pivot_event_counts",
    "q1_pricing_summary", "quantile_sketch_by_type_events",
    "quantile_sketch_events", "range_join_events", "range_rank_orders",
    "rolling_mean_events", "semi_join_customers", "sessionize_events",
    "soft_dedup_weights_docs", "tag_parts_multilabel", "text_quality",
    "token_idf", "tokenize_docs", "top_orders", "topk_per_user_events",
    "window_hopping_events", "window_tumbling_events",
))
_SLOW_TAIL = (
    # heavyweight multi-stage pipelines: run them after every light
    # never-checked entry has banked its green row
    "similarity_self_join_docs", "embed_cosine_dedup_docs",
    "minhash_dedup_docs", "profile_events", "dedup_tier_report",
    "incremental_dedup_docs",
)


def _catalog_order(keys):
    head, slow, tail = [], [], []
    for k in keys:
        if k in _SLOW_TAIL:
            slow.append(k)
        elif k in _R02_DRIVER_CHECKED:
            tail.append(k)
        else:
            head.append(k)
    return head + slow + tail


FS_BLOCKS = 50  # linkage blocking: doc_id % FS_BLOCKS
FS_LEN_BUCKET = 200  # n_chars // bucket equality as a comparison field


def fs_linkage_docs(sf_dir: str):
    """Fellegi–Sunter probabilistic record linkage
    (``ops/linkage.py``): within doc_id-modulo blocks, every canonical
    pair is compared on three fields (lang equality, n_chars length
    bucket, first text character); m/u agreement probabilities are
    estimated as Laplace-smoothed INTEGER rationals from the labeled
    training half (even blocks; label = same source), and every pair is
    scored with the log-likelihood ratio — one bounded count pass
    (driver state = 4·F ints) + one broadcast 2^F-pattern gather, zero
    extra shuffles.  Scores are floor(ln(num/den)·1e6+0.5)/1e6 so the
    SQL oracle reproduces them from the same exact fractions."""
    from dedup_ray.ops.linkage import fellegi_sunter_score
    from dedup_ray.ops.relational import block_pairs

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "source", "n_chars", "text"])

    def prep(t: pa.Table) -> pa.Table:
        txt = pc.coalesce(t["text"], pa.scalar(""))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "blk": pa.array((ids % FS_BLOCKS).astype(np.int64)),
            "lang": t["lang"],
            "source": t["source"],
            "lb": pa.array(np.floor(nch / FS_LEN_BUCKET).astype(np.int64)),
            "c1": pc.utf8_slice_codeunits(txt, 0, 1),
        })

    docs = ds.map_batches(prep, batch_format="pyarrow")
    pairs = block_pairs(docs, "blk", "doc_id",
                        value_cols=["lang", "source", "lb", "c1"])

    def flags(t: pa.Table) -> pa.Table:
        eq = lambda c: pc.cast(  # noqa: E731
            pc.equal(t[f"{c}_1"], t[f"{c}_2"]), pa.int64())
        return pa.table({
            "blk": t["blk"], "id1": t["id1"], "id2": t["id2"],
            "a_lang": eq("lang"), "a_len": eq("lb"), "a_chr": eq("c1"),
            "label": eq("source"),
            "is_train": pa.array(
                (t["blk"].to_numpy(zero_copy_only=False) % 2 == 0)
                .astype(np.int64)),
        })

    pair_flags = pairs.map_batches(flags, batch_format="pyarrow")
    scored, _w = fellegi_sunter_score(
        pair_flags, ["a_lang", "a_len", "a_chr"])
    return scored


ORACLES["fs_linkage_docs"] = f"""
    WITH d AS (SELECT doc_id, lang, source,
                      doc_id % {FS_BLOCKS} AS blk,
                      floor(n_chars::DOUBLE / {FS_LEN_BUCKET})::BIGINT
                          AS lb,
                      substr(coalesce(text, ''), 1, 1) AS c1
               FROM documents),
    p AS (SELECT a.blk, a.doc_id AS id1, b.doc_id AS id2,
                 (a.lang = b.lang)::BIGINT AS a_lang,
                 (a.lb = b.lb)::BIGINT AS a_len,
                 (a.c1 = b.c1)::BIGINT AS a_chr,
                 (a.source = b.source)::BIGINT AS label,
                 (a.blk % 2 = 0)::BIGINT AS is_train
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id),
    s AS (SELECT sum(label)::HUGEINT + 2 AS md,
                 sum(1 - label)::HUGEINT + 2 AS ud,
                 sum(label * a_lang)::HUGEINT + 1 AS mn1,
                 sum((1 - label) * a_lang)::HUGEINT + 1 AS un1,
                 sum(label * a_len)::HUGEINT + 1 AS mn2,
                 sum((1 - label) * a_len)::HUGEINT + 1 AS un2,
                 sum(label * a_chr)::HUGEINT + 1 AS mn3,
                 sum((1 - label) * a_chr)::HUGEINT + 1 AS un3
          FROM p WHERE is_train = 1),
    sc AS (SELECT p.*,
                  (CASE WHEN a_lang = 1 THEN mn1 ELSE md - mn1 END) * ud
                * (CASE WHEN a_len  = 1 THEN mn2 ELSE md - mn2 END) * ud
                * (CASE WHEN a_chr  = 1 THEN mn3 ELSE md - mn3 END) * ud
                      AS num,
                  (CASE WHEN a_lang = 1 THEN un1 ELSE ud - un1 END) * md
                * (CASE WHEN a_len  = 1 THEN un2 ELSE ud - un2 END) * md
                * (CASE WHEN a_chr  = 1 THEN un3 ELSE ud - un3 END) * md
                      AS den
           FROM p CROSS JOIN s)
    SELECT blk, id1, id2, a_lang, a_len, a_chr, label, is_train,
           floor(ln(num::DOUBLE / den::DOUBLE) * 1e6 + 0.5) / 1e6 AS llr,
           (floor(ln(num::DOUBLE / den::DOUBLE) * 1e6 + 0.5) / 1e6 > 0)
               ::BIGINT AS is_match
    FROM sc
"""


GRAM_SCALE = 1_000_000


def embedding_gram_docs(sf_dir: str):
    """Exact distributed Gram matrix over the embedding column
    (``ops/matrix.py::gram_matrix``): embeddings are int64-scaled
    (floor(x·1e6 + 0.5), identical in numpy and SQL) so every upper-
    triangle entry and column sum is an exact integer — per-batch
    XᵀX partials are d×d regardless of batch size (a true combiner),
    one bounded single-partition combine, driver state O(d²).  The
    reduction behind corpus-scale PCA/whitening; the spectral step
    (power iteration) runs on the d×d result on the driver."""
    from dedup_ray.ops.matrix import gram_matrix

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    return gram_matrix(ds, "embedding", scale=GRAM_SCALE)


ORACLES["embedding_gram_docs"] = f"""
    WITH v AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               floor(unnest(embedding)::DOUBLE * {GRAM_SCALE} + 0.5)
                   ::BIGINT AS x
        FROM embeddings),
    tri AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x)::BIGINT AS g
            FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2),
    sums AS (SELECT i, 0::BIGINT AS j, sum(x)::BIGINT AS g
             FROM v GROUP BY 1)
    SELECT i::BIGINT AS i, j, g FROM tri
    UNION ALL
    SELECT i::BIGINT AS i, j, g FROM sums
"""


def soundex_parts(sf_dir: str):
    """Soundex phonetic blocking keys (``stages/phonetic.py``): the
    classic record-linkage blocking function — names that sound alike
    share a 4-char key, so candidate pairs generate within key groups
    instead of all-pairs (the fuzzier variant of the reference's
    author-name blocking, ``Makefile:6-25``).  The kernel automaton is
    vectorized across rows (numpy state arrays loop over the bounded
    character positions); the oracle is the SAME automaton unrolled
    position-by-position in SQL, generated from the same code table."""
    from dedup_ray.stages.phonetic import soundex_array

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        tok = batch["p_name"].str.split(" ").str[-1]
        return pd.DataFrame({
            "p_partkey": batch["p_partkey"],
            "token": tok,
            "soundex": soundex_array(tok),
        })

    return as_arrow(ds.map_batches(f, batch_format="pandas"))


def _soundex_oracle() -> str:
    from dedup_ray.stages.phonetic import soundex_sql

    return f"""
    WITH names AS (SELECT p_partkey,
                          string_split(p_name, ' ')[-1] AS nm FROM part),
    __soundex_src AS (SELECT DISTINCT nm FROM names),
    sx AS ({soundex_sql('nm')})
    SELECT n.p_partkey, n.nm AS token, sx.soundex
    FROM names n JOIN sx ON n.nm = sx.nm
"""


ORACLES["soundex_parts"] = _soundex_oracle()


BOOL_QUERY_TERMS = ("query", "window", "merge")


def bool_retrieval_docs(sf_dir: str):
    """Boolean AND retrieval (inverted-index intersection): documents
    containing ALL query terms.  Tokens are filtered to the (broadcast)
    term set BEFORE any movement, deduped per (doc, term), and a doc
    qualifies when its distinct-term count equals len(terms) — one
    narrow grouped count over at most n_docs × n_terms rows, the
    conjunctive companion to BM25's ranked retrieval."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = set(BOOL_QUERY_TERMS)
    k = len(terms)

    def hits(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split(" ")
        ex = batch[["doc_id"]].join(toks.rename("token")).explode("token")
        ex = ex[ex["token"].isin(terms)].drop_duplicates()
        return ex

    hit_rows = ds.map_batches(hits, batch_format="pandas")

    def count(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch dedup above is per batch; re-dedup whole partition
        df = df.drop_duplicates()
        c = df.groupby("doc_id").size()
        out = c[c == k].index.to_numpy()
        return pd.DataFrame({"doc_id": np.sort(out).astype("int64")})

    from dedup_ray.util.dsutil import partitioned_group_apply

    return partitioned_group_apply(hit_rows, ["doc_id"], count,
                                   num_partitions=8)


def _bool_retrieval_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BOOL_QUERY_TERMS)
    return f"""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(string_split(coalesce(text, ''), ' ')) AS token
        FROM documents),
    hit AS (SELECT doc_id, count(*) AS c FROM toks
            WHERE token IN ({terms}) GROUP BY doc_id)
    SELECT doc_id FROM hit WHERE c = {len(BOOL_QUERY_TERMS)}
"""


ORACLES["bool_retrieval_docs"] = _bool_retrieval_oracle()


JW_BLOCKS = 100
JW_SIM_CUTOFF = 0.85


def jaro_winkler_parts(sf_dir: str):
    """Jaro–Winkler name-field comparator (``ops/strsim.py``): graded
    string similarity over canonical within-block pairs of part-name
    last tokens — the standard record-linkage comparator, pinned
    value-for-value to DuckDB's ``jaro_winkler_similarity`` (floored
    transpositions, both-empty = 0, 0.7 boost threshold; a 13k-pair
    fuzz test holds exact equality).  Each batch scores every DISTINCT
    token pair once (vocabulary-bounded, not corpus-bounded) and
    scatters back; scores are floor(x·1e6+0.5)/1e6 in both engines."""
    from dedup_ray.ops.relational import block_pairs
    from dedup_ray.ops.strsim import jaro_winkler_column

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pk": batch["p_partkey"],
            "blk": (batch["p_partkey"] % JW_BLOCKS).astype("int64"),
            "tok": batch["p_name"].str.split(" ").str[-1],
        })

    toks = ds.map_batches(prep, batch_format="pandas")
    pairs = block_pairs(toks, "blk", "pk", value_cols=["tok"])
    scored = jaro_winkler_column(pairs, "tok_1", "tok_2")

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_sim"] = (df["jw"] >= JW_SIM_CUTOFF).astype("int64")
        return df

    return scored.map_batches(flag, batch_format="pandas")


ORACLES["jaro_winkler_parts"] = f"""
    WITH t AS (SELECT p_partkey AS pk,
                      p_partkey % {JW_BLOCKS} AS blk,
                      string_split(p_name, ' ')[-1] AS tok FROM part),
    p AS (SELECT a.blk, a.pk AS id1, b.pk AS id2,
                 a.tok AS tok_1, b.tok AS tok_2
          FROM t a JOIN t b ON a.blk = b.blk AND a.pk < b.pk),
    s AS (SELECT *, floor(jaro_winkler_similarity(tok_1, tok_2) * 1e6
                          + 0.5) / 1e6 AS jw FROM p)
    SELECT blk, id1, id2, tok_1, tok_2, jw,
           (jw >= {JW_SIM_CUTOFF})::BIGINT AS is_sim
    FROM s
"""


ER_JW_TAU = 0.88


def er_name_variants_parts(sf_dir: str):
    """Entity resolution composed WHOLE — the reference's full
    record-linkage skeleton (block → candidate pairs → graded
    similarity → threshold → graph clustering, SURVEY §0) as ONE Ray
    pipeline over part-name last tokens: Soundex phonetic blocking
    (``stages/phonetic.py``), canonical within-block pairs on the
    DISTINCT token vocabulary (vocabulary-bounded — pair space never
    scales with corpus rows, the same argument as BPE encode), graded
    Jaro–Winkler comparison (``ops/strsim.py``), τ-threshold edges, CC
    entities (``stages/cc.py::assign_clusters``, singletons = own
    token; entity = lexicographic-min variant), and the per-variant
    part-count rollup joined back.  The oracle replays every stage:
    the soundex automaton CTE, DuckDB ``jaro_winkler_similarity`` with
    the shared rounding, and a recursive-CTE transitive closure over
    the bounded variant graph."""
    from ray.data.aggregate import Count

    from dedup_ray.ops.relational import block_pairs
    from dedup_ray.ops.strsim import jaro_winkler_column
    from dedup_ray.stages.cc import assign_clusters
    from dedup_ray.stages.phonetic import soundex_array
    from dedup_ray.util.dsutil import hash_join

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        # deterministic typo channel: every 7th part drops the token's
        # 2nd character ("gear"→"gar") so the corpus actually contains
        # name VARIANTS to resolve (the clean corpus has none); the
        # oracle applies the same substr surgery
        tok = batch["p_name"].str.split(" ").str[-1]
        typo = tok.str[:1] + tok.str[2:]
        sel = (batch["p_partkey"] % 7 == 0).to_numpy()
        return pd.DataFrame({"tok": np.where(sel, typo, tok)})

    vocab = (ds.map_batches(toks, batch_format="pandas")
             .groupby("tok").aggregate(Count(alias_name="n_parts")))

    def add_sdx(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tok": batch["tok"],
            "soundex": soundex_array(batch["tok"]),
            "n_parts": batch["n_parts"].astype("int64"),
        })

    vocab = vocab.map_batches(add_sdx, batch_format="pandas").materialize()
    pairs = block_pairs(vocab, "soundex", "tok")
    scored = jaro_winkler_column(pairs, "id1", "id2")

    def accept(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t["jw"], pa.scalar(ER_JW_TAU))
        return t.filter(keep).select(["id1", "id2"])

    edges = scored.map_batches(accept, batch_format="pyarrow")
    clusters = assign_clusters(vocab, edges, id_col="tok")
    out = hash_join(clusters, vocab, on="tok",
                    left_cols=["tok", "cluster_id"],
                    right_cols=["tok", "soundex", "n_parts"], how="inner")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "tok": t["tok"],
            "soundex": t["soundex"],
            "entity": t["cluster_id"],
            "n_parts": pc.cast(t["n_parts"], pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _er_name_variants_oracle() -> str:
    from dedup_ray.stages.phonetic import soundex_sql

    return f"""
    WITH RECURSIVE
    base AS (SELECT p_partkey, string_split(p_name, ' ')[-1] AS t
             FROM part),
    names AS (SELECT CASE WHEN p_partkey % 7 = 0
                          THEN substr(t, 1, 1) || substr(t, 3)
                          ELSE t END AS nm
              FROM base),
    cnt AS (SELECT nm, count(*) AS n_parts FROM names GROUP BY nm),
    __soundex_src AS (SELECT nm FROM cnt),
    sx AS ({soundex_sql('nm')}),
    p AS (SELECT a.nm AS id1, b.nm AS id2
          FROM sx a JOIN sx b ON a.soundex = b.soundex AND a.nm < b.nm
          WHERE floor(jaro_winkler_similarity(a.nm, b.nm) * 1e6 + 0.5)
                / 1e6 >= {ER_JW_TAU}),
    e AS (SELECT id1 AS a, id2 AS b FROM p
          UNION SELECT id2, id1 FROM p
          UNION SELECT nm, nm FROM cnt),
    walk AS (
        SELECT a, b FROM e
        UNION
        SELECT w.a, e.b FROM walk w JOIN e ON w.b = e.a
    ),
    comp AS (SELECT a AS nm, min(b) AS entity FROM walk GROUP BY a)
    SELECT c.nm AS tok, sx.soundex, comp.entity, c.n_parts
    FROM cnt c JOIN sx ON c.nm = sx.nm JOIN comp ON c.nm = comp.nm
"""


ORACLES["er_name_variants_parts"] = _er_name_variants_oracle()


DIAMETER_MAX_HOPS = 40


def diameter_docs(sf_dir: str):
    """Diameter lower bound by double-sweep BFS
    (``ops/graph.py::diameter_double_sweep``, Magnien–Latapy–Habib
    2009): two :func:`multi_source_bfs` frontier expansions instead of
    all-pairs — the standard cheap eccentricity probe for web-graph
    audits.  Link graph = the symmetrized ``doc_id ↔ doc_id // 2``
    binary tree (double-sweep is EXACT on trees, so the lower bound
    equals the true diameter here); start node, peak tie-break
    (max dist → min node) and hop cap are deterministic, and the oracle
    replays both sweeps as recursive CTEs with UNION-dedup on
    ``(node, dist)`` so cyclic back-and-forth walks stay bounded."""
    from dedup_ray.ops.graph import diameter_double_sweep

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = ids[ids >= 1]
        return pa.table({
            "src": pa.array(np.r_[src, src // 2], pa.int64()),
            "dst": pa.array(np.r_[src // 2, src], pa.int64()),
        })

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    return diameter_double_sweep(edges, max_hops=DIAMETER_MAX_HOPS,
                                 num_partitions=8)


ORACLES["diameter_docs"] = f"""
    WITH RECURSIVE
    edges AS (
        SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
        WHERE doc_id >= 1
        UNION ALL
        SELECT doc_id // 2, doc_id FROM documents WHERE doc_id >= 1
    ),
    start AS (SELECT min(v) AS s FROM (
        SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
    b1 AS (
        SELECT s AS node, 0 AS dist FROM start
        UNION
        SELECT e.dst, b1.dist + 1 FROM b1 JOIN edges e ON b1.node = e.src
        WHERE b1.dist < {DIAMETER_MAX_HOPS}
    ),
    d1 AS (SELECT node, min(dist) AS dist FROM b1 GROUP BY node),
    peak AS (SELECT node FROM d1 ORDER BY dist DESC, node LIMIT 1),
    b2 AS (
        SELECT node, 0 AS dist FROM peak
        UNION
        SELECT e.dst, b2.dist + 1 FROM b2 JOIN edges e ON b2.node = e.src
        WHERE b2.dist < {DIAMETER_MAX_HOPS}
    ),
    d2 AS (SELECT node, min(dist) AS dist FROM b2 GROUP BY node)
    SELECT (SELECT s FROM start) AS start_node,
           (SELECT node FROM peak) AS peak_node,
           (SELECT max(dist) FROM d2) AS diameter_lb
"""


QUERIES["funnel_events"] = funnel_events
QUERIES["fs_linkage_docs"] = fs_linkage_docs
QUERIES["embedding_gram_docs"] = embedding_gram_docs
QUERIES["soundex_parts"] = soundex_parts
QUERIES["bool_retrieval_docs"] = bool_retrieval_docs
QUERIES["jaro_winkler_parts"] = jaro_winkler_parts
QUERIES["diameter_docs"] = diameter_docs
QUERIES["er_name_variants_parts"] = er_name_variants_parts
QUERIES["event_transitions_events"] = event_transitions_events
QUERIES["ntile_orders"] = ntile_orders

def link_predict_docs(sf_dir: str):
    """Link prediction (``ops/graph.py::link_predict``): common-neighbor
    count + Adamic–Adar score for every ABSENT host pair with a shared
    neighbor — the "which hosts will interlink next" ranker (Liben-Nowell
    & Kleinberg 2003) downstream of the co-citation projection.  Host
    graph synthesized from doc_id arithmetic (undirected edges
    ``doc_id % 50 — (doc_id % 50 + doc_id % 7 + 1) % 50``); the oracle
    rebuilds neighbor sets, joins wedges, sums ``1/ln(deg)`` and strikes
    existing edges with NOT EXISTS."""
    from dedup_ray.ops.graph import link_predict

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        x = ids % 50
        y = (ids % 50 + ids % 7 + 1) % 50
        return pa.table({"a": pa.array(x, pa.int64()),
                         "b": pa.array(y, pa.int64())})

    return link_predict(ds.map_batches(mk_edges, batch_format="pyarrow"),
                        num_partitions=8)


ORACLES["link_predict_docs"] = """
    WITH raw AS (SELECT doc_id % 50 AS x,
                        (doc_id % 50 + doc_id % 7 + 1) % 50 AS y
                 FROM documents),
    e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM raw),
    nb AS (SELECT u AS node, v AS nb FROM e
           UNION SELECT v, u FROM e),
    deg AS (SELECT node, count(*) AS d FROM nb GROUP BY node),
    wedge AS (SELECT n1.nb AS u, n2.nb AS v, n1.node AS z
              FROM nb n1 JOIN nb n2
              ON n1.node = n2.node AND n1.nb < n2.nb),
    sc AS (SELECT u, v, count(*) AS cn,
                  round(sum(1.0 / ln(d)), 6) AS aa
           FROM wedge JOIN deg ON wedge.z = deg.node
           GROUP BY u, v)
    SELECT u, v, CAST(cn AS BIGINT) AS cn, aa
    FROM sc
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = sc.u AND e.v = sc.v)
"""


QUERIES["link_predict_docs"] = link_predict_docs


def nmi_eval_docs(sf_dir: str):
    """NMI + V-measure of the chain-CC clustering vs the block-of-4 truth
    (``ops/evaluate.py::nmi_score``, Rosenberg & Hirschberg 2007) — the
    information-theoretic agreement next to ``ari_eval_docs`` /
    ``bcubed_eval_docs``, over the SAME distributed contingency counts;
    only three entropy sums and N reach the driver."""
    from dedup_ray.ops.evaluate import nmi_score

    return nmi_score(None, None, num_partitions=4,
                  sums=_eval_sums(sf_dir))


ORACLES["nmi_eval_docs"] = _CHAIN_COMP_CTE + """,
    truth AS (SELECT doc_id, doc_id // 4 AS truth_id FROM documents),
    j AS (SELECT c.doc_id, c.cluster_id, t.truth_id
          FROM comp c JOIN truth t USING (doc_id)),
    nn AS (SELECT count(*)::DOUBLE AS n FROM j),
    hu AS (SELECT -sum((cnt / nn.n) * ln(cnt / nn.n)) AS v FROM (
               SELECT count(*)::DOUBLE AS cnt FROM j GROUP BY cluster_id),
           nn),
    hv AS (SELECT -sum((cnt / nn.n) * ln(cnt / nn.n)) AS v FROM (
               SELECT count(*)::DOUBLE AS cnt FROM j GROUP BY truth_id),
           nn),
    sc AS (SELECT sum((cnt / nn.n) * ln(cnt / nn.n)) AS v FROM (
               SELECT count(*)::DOUBLE AS cnt FROM j
               GROUP BY cluster_id, truth_id),
           nn)
    SELECT round((hu.v + hv.v + sc.v) / sqrt(hu.v * hv.v), 6) AS nmi,
           round(2 * (hu.v + hv.v + sc.v) / (hu.v + hv.v), 6) AS v_measure,
           round((hu.v + hv.v + sc.v) / hv.v, 6) AS homogeneity,
           round((hu.v + hv.v + sc.v) / hu.v, 6) AS completeness
    FROM hu, hv, sc
"""


QUERIES["nmi_eval_docs"] = nmi_eval_docs


def cosine_self_join_docs(sf_dir: str):
    """Exact tf-cosine all-pairs self-join at τ=0.9 over the documents
    table (``ops/simjoin.py::cosine_self_join``, AllPairs prefix filter —
    Bayardo et al. 2007).  Recall is exactly 1, so the oracle is BRUTE
    FORCE: SQL replays tf vectors and every pairwise dot product, and the
    engine's prefix-filtered output must equal it row for row — the
    guarantee itself is what's checked, as with the ppjoin-family query."""
    from dedup_ray.ops.simjoin import cosine_self_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return cosine_self_join(ds, "doc_id", "text", tau=0.9,
                            num_partitions=8)


_COS_TAU2 = repr(0.9 * 0.9)

ORACLES["cosine_self_join_docs"] = f"""
    WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d),
    tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
           FROM tok GROUP BY doc_id, tok),
    n2 AS (SELECT doc_id, sum(tf * tf)::BIGINT AS n2
           FROM tf GROUP BY doc_id),
    dots AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                    sum(a.tf * b.tf)::BIGINT AS dot
             FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
             GROUP BY a.doc_id, b.doc_id)
    SELECT id1, id2, x.n2 AS n2_1, y.n2 AS n2_2, dot,
           dot / sqrt(x.n2 * y.n2) AS cosine
    FROM dots JOIN n2 x ON x.doc_id = id1 JOIN n2 y ON y.doc_id = id2
    WHERE CAST(dot AS DOUBLE) * dot >= {_COS_TAU2} * x.n2 * y.n2
"""


QUERIES["cosine_self_join_docs"] = cosine_self_join_docs


def bigram_backoff_docs(sf_dir: str):
    """Stupid-backoff bigram LM score per doc (``stages/selection.py::
    bigram_backoff_score``, Brants et al. 2007): count-pruned bigram
    table (min_count=2), backoff ``0.4·c(w2)/total`` for pruned/unseen
    bigrams, mean ln score per doc — counts attached by three
    co-partitioned joins, no broadcast vocabulary.  The oracle replays
    tokenization, pruning, the backoff CASE and the join-key law
    (``w1||chr(31)||w2``) verbatim."""
    from dedup_ray.stages.selection import bigram_backoff_score

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_backoff_score(ds, "doc_id", "text", alpha=0.4,
                                min_count=2, num_partitions=8)


ORACLES["bigram_backoff_docs"] = """
    WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    t AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM d),
    tot AS (SELECT count(*)::DOUBLE AS n FROM t),
    uni AS (SELECT w, count(*)::BIGINT AS c1 FROM t GROUP BY w),
    big AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    c2 AS (SELECT w1 || chr(31) || w2 AS k12, count(*)::BIGINT AS c
           FROM big GROUP BY w1 || chr(31) || w2
           HAVING count(*) >= 2),
    sc AS (SELECT big.doc_id,
                  CASE WHEN c2.c IS NOT NULL
                       THEN ln(c2.c / CAST(u1.c1 AS DOUBLE))
                       ELSE ln(0.4 * u2.c1 / tot.n) END AS s
           FROM big
           LEFT JOIN c2 ON c2.k12 = big.w1 || chr(31) || big.w2
           JOIN uni u1 ON u1.w = big.w1
           JOIN uni u2 ON u2.w = big.w2, tot),
    per AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                   round(sum(s) / count(*), 6) AS bigram_lp
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
           per.bigram_lp
    FROM d LEFT JOIN per USING (doc_id)
"""


QUERIES["bigram_backoff_docs"] = bigram_backoff_docs


KCENTER_K = 8


def kcenter_select_embeddings(sf_dir: str):
    """Greedy k-center coreset over the embeddings table
    (``stages/selection.py::kcenter_select``, Gonzalez 1985): seed = min
    vec_id, then 7 farthest-point rounds — one map_batches champion pass
    per round, driver state = the ≤k selected vectors.  The oracle
    UNROLLS all rounds as CTEs (the k-means oracle technique): each
    round's argmax replayed with ``list_distance`` over the same
    DOUBLE-cast vectors, ties to the smallest id."""
    from dedup_ray.stages.selection import kcenter_select

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kcenter_select(ds, k=KCENTER_K)


def _kcenter_oracle_sql() -> str:
    parts = ["""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    sel0 AS MATERIALIZED (
        SELECT 0 AS rank, vec_id, v, 0.0 AS dist
        FROM e ORDER BY vec_id LIMIT 1)"""]
    for r in range(1, KCENTER_K):
        parts.append(f""",
    d{r} AS MATERIALIZED (
        SELECT e.vec_id, e.v,
               (SELECT min(list_distance(e.v, c.v)) FROM sel{r - 1} c)
                   AS dist
        FROM e
        WHERE e.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})),
    s{r} AS MATERIALIZED (
        SELECT {r} AS rank, vec_id, v, dist FROM d{r}
        ORDER BY dist DESC, vec_id LIMIT 1),
    sel{r} AS MATERIALIZED (
        SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM s{r})""")
    parts.append(f"""
    SELECT CAST(rank AS BIGINT) AS rank, vec_id, round(dist, 6) AS dist
    FROM sel{KCENTER_K - 1}""")
    return "".join(parts)


ORACLES["kcenter_select_embeddings"] = _kcenter_oracle_sql()
QUERIES["kcenter_select_embeddings"] = kcenter_select_embeddings


def scalar_quantize_embeddings(sf_dir: str):
    """SQ8 scalar quantization codes over the embeddings table
    (``stages/ann.py::scalar_quantize_codes``): per-dim min/max in one
    d-bounded partial pass, affine 0..255 codes in one broadcast pass —
    zero shuffles.  ``floor(z+0.5)`` rounding so the oracle replays the
    arithmetic bit for bit over the same DOUBLE-cast vectors."""
    from dedup_ray.stages.ann import scalar_quantize_codes

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return scalar_quantize_codes(ds)


ORACLES["scalar_quantize_embeddings"] = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    x AS (SELECT vec_id, r.i AS dim, v[r.i] AS val
          FROM e CROSS JOIN range(1, 65) AS r(i)),
    mm AS (SELECT dim, min(val) AS mn, max(val) AS mx FROM x GROUP BY dim)
    SELECT vec_id, CAST(x.dim AS BIGINT) AS dim,
           CAST(CASE WHEN mx = mn THEN 0
                ELSE floor((val - mn) * 255.0 / (mx - mn) + 0.5)
                END AS BIGINT) AS code
    FROM x JOIN mm USING (dim)
"""
QUERIES["scalar_quantize_embeddings"] = scalar_quantize_embeddings


PHRASE_TERMS = ("slow", "hash", "batch")


def phrase_search_docs(sf_dir: str):
    """Exact consecutive-token phrase retrieval (``ops/retrieval.py::
    phrase_search``): postings pruned to the phrase's terms before the
    single doc-keyed exchange, adjacency checked with integer key-set
    chains.  Oracle replays the position law and the adjacency self-joins
    from the same phrase constant."""
    from dedup_ray.ops.retrieval import phrase_search

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return phrase_search(ds, list(PHRASE_TERMS), num_partitions=8)


def _phrase_oracle_sql() -> str:
    w1, w2, w3 = PHRASE_TERMS
    return f"""
    WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    t AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM d),
    m AS (SELECT a.doc_id, a.pos FROM t a
          JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                      AND b.w = '{w2}'
          JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
                      AND c.w = '{w3}'
          WHERE a.w = '{w1}')
    SELECT doc_id, count(*)::BIGINT AS n_matches,
           min(pos)::BIGINT AS first_pos
    FROM m GROUP BY doc_id
"""


ORACLES["phrase_search_docs"] = _phrase_oracle_sql()
QUERIES["phrase_search_docs"] = phrase_search_docs


def vocab_growth_docs(sf_dir: str):
    """Heaps-law vocabulary growth per 50-doc arrival bucket
    (``stages/textstats.py::vocab_growth``): first-occurrence bucket per
    token type via one grouped min, bucket token totals via one grouped
    count, cumulative sums over ≤ n_docs/50 driver rows.  Integer-only —
    the oracle replays the M4 token law and window cumsums."""
    from dedup_ray.stages.textstats import vocab_growth

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return vocab_growth(ds, bucket_docs=50)


ORACLES["vocab_growth_docs"] = TOKENS_CTE + """,
    first AS (SELECT token, min(doc_id) // 50 AS bucket
              FROM toks GROUP BY token),
    nt AS (SELECT bucket, count(*)::BIGINT AS new_types
           FROM first GROUP BY bucket),
    bt AS (SELECT doc_id // 50 AS bucket, count(*)::BIGINT AS bucket_tokens
           FROM toks GROUP BY doc_id // 50)
    SELECT bt.bucket,
           coalesce(nt.new_types, 0) AS new_types,
           sum(coalesce(nt.new_types, 0))
               OVER (ORDER BY bt.bucket)::BIGINT AS cum_types,
           bt.bucket_tokens,
           sum(bt.bucket_tokens)
               OVER (ORDER BY bt.bucket)::BIGINT AS cum_tokens
    FROM bt LEFT JOIN nt USING (bucket)
"""
QUERIES["vocab_growth_docs"] = vocab_growth_docs


def path_template_docs(sf_dir: str):
    """Crawl-trap path-template census (``stages/urlnorm.py::
    path_template_census``): URLs synthesized from doc_id (three site
    structures across 7 hosts — numeric item pages with hex session ids,
    category lists, a static page), templated by the shared RE2 rewrite
    chain, counted per (host, template).  Oracle rebuilds the same URLs
    in SQL and applies the GENERATED template expression."""
    from dedup_ray.stages.urlnorm import path_template_census

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        s = ids.astype(str)
        host = np.char.add(np.char.add("http://site", (ids % 7).astype(str)),
                           ".example.com")
        path = np.where(
            ids % 3 == 0,
            np.char.add(np.char.add("/item/", s),
                        np.char.add("/view?sid=deadbeef", s)),
            np.where(
                ids % 3 == 1,
                np.char.add(np.char.add("/cat/", (ids % 5).astype(str)),
                            "/list"),
                "/about"),
        )
        return pa.table({
            "url": pa.array(np.char.add(host, path), pa.string()),
        })

    return path_template_census(ds.map_batches(mk, batch_format="pyarrow"),
                                min_pages=2)


def _path_template_oracle_sql() -> str:
    from dedup_ray.stages.urlnorm import path_template_sql

    url = ("'http://site' || (doc_id % 7) || '.example.com' || "
           "CASE WHEN doc_id % 3 = 0 THEN "
           "'/item/' || doc_id || '/view?sid=deadbeef' || doc_id "
           "WHEN doc_id % 3 = 1 THEN '/cat/' || (doc_id % 5) || '/list' "
           "ELSE '/about' END")
    return f"""
    WITH u AS (SELECT {url} AS url FROM documents),
    t AS (SELECT lower(regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                 {path_template_sql('url')} AS template
          FROM u)
    SELECT host, template, count(*)::BIGINT AS n_pages
    FROM t GROUP BY host, template HAVING count(*) >= 2
"""


ORACLES["path_template_docs"] = _path_template_oracle_sql()
QUERIES["path_template_docs"] = path_template_docs


def script_profile_docs(sf_dir: str):
    """Unicode script profile (``stages/textstats.py::script_profile``)
    over mixed-script pages synthesized from doc_id (Latin base plus
    Cyrillic / Greek / CJK+Arabic admixtures by ``doc_id % 4``): per-doc
    char counts per script class and the dominant script — shuffle-free,
    one UTF-32 decode per batch.  Oracle rebuilds the same strings in
    SQL and counts with the GENERATED RE2 class expressions."""
    from dedup_ray.stages.textstats import script_profile

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = []
        for i in ids:
            s = "abc " * (int(i) % 3 + 1)
            m = int(i) % 4
            if m == 1:
                s += "при" * (int(i) % 2 + 1)
            elif m == 2:
                s += "γεια"
            elif m == 3:
                s += "漢字مرحبا"
            texts.append(s)
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(texts, pa.string())})

    return script_profile(ds.map_batches(mk, batch_format="pyarrow"))


def _script_profile_oracle_sql() -> str:
    from dedup_ray.stages.textstats import script_profile_sql

    return f"""
    WITH d AS (SELECT doc_id,
        repeat('abc ', (doc_id % 3)::INT + 1) ||
        CASE doc_id % 4
             WHEN 1 THEN repeat('при', (doc_id % 2)::INT + 1)
             WHEN 2 THEN 'γεια'
             WHEN 3 THEN '漢字مرحبا'
             ELSE '' END AS text
        FROM documents)
    SELECT doc_id, {script_profile_sql('text')} FROM d
"""


ORACLES["script_profile_docs"] = _script_profile_oracle_sql()
QUERIES["script_profile_docs"] = script_profile_docs


def stitch_candidates_docs(sf_dir: str):
    """Pagination-stitch detection (``stages/webclean.py::
    stitch_candidates``): every 7th document is split into a page-1
    (full text) and a page-2 (its last 8 tokens + a fixed continuation),
    and the operator must pair them by tail-gram == head-gram over one
    gram-keyed exchange.  Oracle replays the page synthesis and the
    8-token boundary-gram law with list slicing."""
    from dedup_ray.stages.webclean import stitch_candidates

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 7 == 3
        ids = ids[keep]
        texts = [x or "" for x in pa.Table.from_arrays(
            [t["text"]], names=["text"]).filter(
            pa.array(keep))["text"].to_pylist()]
        out_ids, out_txt = [], []
        for i, txt in zip(ids, texts):
            toks = txt.split(" ")
            out_ids.append(int(i) * 2)
            out_txt.append(txt)
            out_ids.append(int(i) * 2 + 1)
            out_txt.append(" ".join(toks[-8:]) +
                           " continuation of page two")
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "text": pa.array(out_txt, pa.string())})

    return stitch_candidates(ds.map_batches(mk, batch_format="pyarrow"),
                             k=8, num_partitions=8)


ORACLES["stitch_candidates_docs"] = """
    WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents
               WHERE doc_id % 7 = 3),
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d),
    pages AS (
        SELECT doc_id * 2 AS id, toks FROM t
        UNION ALL
        SELECT doc_id * 2 + 1,
               string_split(
                   array_to_string(
                       toks[greatest(len(toks) - 7, 1):len(toks)], ' ')
                   || ' continuation of page two', ' ')
        FROM t),
    g AS (SELECT id, toks, len(toks) AS n FROM pages),
    tails AS (SELECT id AS id_a,
                     array_to_string(toks[n - 7:n], ' ') AS gram
              FROM g WHERE n >= 8),
    heads AS (SELECT id AS id_b,
                     array_to_string(toks[1:8], ' ') AS gram
              FROM g WHERE n >= 8)
    SELECT id_a, id_b, gram
    FROM tails JOIN heads USING (gram)
    WHERE id_a <> id_b
"""
QUERIES["stitch_candidates_docs"] = stitch_candidates_docs


def interval_overlap_events(sf_dir: str):
    """Tiled interval-overlap self-join (``ops/relational.py::
    interval_overlap_join``): events of every 5th user become half-open
    intervals ``[ts, ts + floor(value·10⁶) µs)``; overlapping pairs are
    found by hour-tile replication with each pair claimed exactly once
    by the tile of the later start.  Oracle: the plain inequality
    self-join."""
    from dedup_ray.ops.relational import interval_overlap_join

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "value"])
    ds = ds.filter(lambda r: r["user_id"] % 5 == 0)

    def mk(t: pa.Table) -> pa.Table:
        s = t["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "s": pa.array(s, pa.int64()),
                         "e": pa.array(s + dur, pa.int64())})

    return interval_overlap_join(
        ds.map_batches(mk, batch_format="pyarrow"),
        "event_id", "s", "e", tile_us=3_600_000_000, num_partitions=8)


ORACLES["interval_overlap_events"] = """
    WITH iv AS (SELECT event_id AS id, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + CAST(floor(value * 1000000.0) AS BIGINT) AS e
                FROM events WHERE user_id % 5 = 0)
    SELECT a.id AS id1, b.id AS id2,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
    FROM iv a JOIN iv b
    ON a.id < b.id AND a.s < b.e AND b.s < a.e
"""
QUERIES["interval_overlap_events"] = interval_overlap_events


def grouped_mad_events(sf_dir: str):
    """Robust outlier census per event type (``ops/relational.py::
    grouped_mad``): median, MAD = median(|v − median|), and the count of
    values beyond 3·MAD — one group-keyed histogram exchange, moving
    state bounded by distinct (group, value) pairs.  Oracle recomputes
    median/MAD/outlier bands with DuckDB's own ``median`` over the
    deviation join."""
    from dedup_ray.ops.relational import grouped_mad

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_mad(ds, "event_type", "value", k=3.0, num_partitions=4)


ORACLES["grouped_mad_events"] = """
    WITH med AS (SELECT event_type, median(value) AS med, count(*) AS n
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_type, abs(e.value - m.med) AS d
            FROM events e JOIN med m USING (event_type)),
    mad AS (SELECT event_type, median(d) AS mad FROM dev GROUP BY event_type)
    SELECT m.event_type, m.n, round(m.med, 6) AS median,
           round(a.mad, 6) AS mad,
           (SELECT count(*) FROM dev d
            WHERE d.event_type = m.event_type
              AND d.d > 3.0 * a.mad) AS n_outliers
    FROM med m JOIN mad a USING (event_type)
"""
QUERIES["grouped_mad_events"] = grouped_mad_events


def recency_scores_events(sf_dir: str):
    """Exponential time-decay activity score per user (``ops/
    relational.py::recency_decay_scores``): each event contributes
    ``exp(−Δdays/7)`` against the corpus-max timestamp — streaming
    global max, then per-batch partial sums before ONE user-keyed
    exchange.  Oracle replays the decay sum with identical
    parenthesization over integer-µs age."""
    from dedup_ray.ops.relational import recency_decay_scores

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return recency_decay_scores(ds, "user_id", "ts", tau_days=7.0,
                                num_partitions=4)


ORACLES["recency_scores_events"] = """
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT user_id, count(*) AS n,
           round(sum(exp(-((date_diff('microsecond', ts,
                                      (SELECT m FROM mx))
                            / 86400000000.0) / 7.0))), 6) AS recency
    FROM events GROUP BY user_id
"""
QUERIES["recency_scores_events"] = recency_scores_events


def frontier_schedule_docs(sf_dir: str):
    """Politeness-aware crawl-frontier scheduling (``stages/urlnorm.py::
    frontier_schedule``): hosts synthesized as ``doc_id % 13`` with a
    host-determined crawl delay, each host's queue slotted one fetch per
    delay in deterministic id order — one host-keyed exchange.  Oracle:
    ``row_number() − 1`` per host times the same delay."""
    from dedup_ray.stages.urlnorm import frontier_schedule

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        host = pc.binary_join_element_wise(
            "site", pa.array((ids % 13).astype(str)), ".example.com", "")
        return pa.table({
            "url_id": t["doc_id"],
            "host": host,
            "delay_ms": pa.array(200 + (ids % 13) * 100, pa.int64()),
        })

    return frontier_schedule(ds.map_batches(mk, batch_format="pyarrow"),
                             "host", "url_id", "delay_ms",
                             num_partitions=8)


ORACLES["frontier_schedule_docs"] = """
    WITH u AS (SELECT doc_id AS url_id,
                      'site' || (doc_id % 13)::VARCHAR || '.example.com'
                          AS host,
                      200 + (doc_id % 13) * 100 AS delay_ms
               FROM documents)
    SELECT url_id, host,
           row_number() OVER (PARTITION BY host ORDER BY url_id) - 1
               AS seq,
           (row_number() OVER (PARTITION BY host ORDER BY url_id) - 1)
               * delay_ms AS fetch_at_ms
    FROM u
"""
QUERIES["frontier_schedule_docs"] = frontier_schedule_docs


def burstiness_events(sf_dir: str):
    """Inter-arrival burstiness per user (``ops/relational.py::
    interarrival_stats``): gap count, mean gap, CV and the Goh–Barabási
    index over each user's sorted event times — the bot-vs-organic
    traffic screen, one user-keyed exchange.  Oracle replays the gaps
    with a lag window and ``stddev_pop``."""
    from dedup_ray.ops.relational import interarrival_stats

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return interarrival_stats(ds, "user_id", "ts", num_partitions=4)


ORACLES["burstiness_events"] = """
    WITH g AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          AS pts
               FROM events),
    d AS (SELECT user_id,
                 date_diff('microsecond', pts, ts) / 1000000.0 AS gap
          FROM g WHERE pts IS NOT NULL)
    SELECT user_id, count(*) AS n_gaps,
           round(avg(gap), 6) AS mean_gap_s,
           round(stddev_pop(gap) / avg(gap), 6) AS cv,
           round((stddev_pop(gap) - avg(gap))
                 / (stddev_pop(gap) + avg(gap)), 6) AS burstiness
    FROM d GROUP BY user_id HAVING count(*) >= 1
"""
QUERIES["burstiness_events"] = burstiness_events


def host_top_terms_docs(sf_dir: str):
    """Distinctive-term profile per host (``stages/textstats.py::
    group_top_terms``): top-3 tokens by ``tf·ln(G/df)`` with hosts
    synthesized as ``doc_id % 13`` — two narrow exchanges (token-keyed
    df attach, host-keyed top-k), raw text never shuffled.  Oracle:
    the same tf/df arithmetic with a ``row_number`` QUALIFY."""
    from dedup_ray.stages.textstats import group_top_terms

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        host = pc.binary_join_element_wise(
            "site", pa.array((ids % 13).astype(str)), "", "")
        return pa.table({"host": host, "text": t["text"]})

    return group_top_terms(ds.map_batches(mk, batch_format="pyarrow"),
                           "host", "text", k=3, n_groups=13,
                           num_partitions=8)


ORACLES["host_top_terms_docs"] = """
    WITH toks AS (
        SELECT 'site' || (doc_id % 13)::VARCHAR AS host,
               unnest(string_split(coalesce(text, ''), ' ')) AS token
        FROM documents),
    tf AS (SELECT host, token, count(*) AS tf FROM toks
           WHERE token <> '' GROUP BY host, token),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
    SELECT host, token, tf,
           round(tf * ln(13.0 / df), 6) AS score
    FROM tf JOIN df USING (token)
    QUALIFY row_number() OVER (
        PARTITION BY host
        ORDER BY tf * ln(13.0 / df) DESC, token) <= 3
"""
QUERIES["host_top_terms_docs"] = host_top_terms_docs

def cube_events(sf_dir: str):
    """Full-lattice CUBE over (event_type, user bucket)
    (``ops/relational.py::cube_aggregate``): all four grouping sets'
    sums and counts in ONE exchange — each batch emits partials for
    every subset, the reduce is one grouped sum.  ``gset`` carries the
    SQL ``GROUPING()`` bitmask; oracle is a literal ``GROUP BY CUBE``."""
    from dedup_ray.ops.relational import cube_aggregate

    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def mk(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ub = pc.binary_join_element_wise(
            "u", pa.array((uid % 3).astype(str)), "")
        return pa.table({"event_type": t["event_type"], "ubucket": ub,
                         "value": t["value"]})

    return cube_aggregate(ds.map_batches(mk, batch_format="pyarrow"),
                          ["event_type", "ubucket"], "value",
                          num_partitions=4)


ORACLES["cube_events"] = """
    WITH e AS (SELECT event_type,
                      'u' || (user_id % 3)::VARCHAR AS ubucket, value
               FROM events)
    SELECT event_type, ubucket,
           round(sum(value), 4) AS sum_value,
           count(value) AS n,
           grouping(event_type) * 2 + grouping(ubucket) AS gset
    FROM e GROUP BY CUBE(event_type, ubucket)
"""
QUERIES["cube_events"] = cube_events


def unpivot_events(sf_dir: str):
    """Wide-to-long unpivot (``ops/relational.py::melt_columns``):
    ``value`` and ``user_id`` melted to ``(event_id, metric, val)``
    rows — zero exchanges, pure per-batch reshape with a float64 cast
    + round shared with the SQL ``UNPIVOT`` twin."""
    from dedup_ray.ops.relational import melt_columns

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return melt_columns(ds, ["event_id"], ["value", "user_id"])


ORACLES["unpivot_events"] = """
    WITH t AS (SELECT event_id,
                      round(CAST(value AS DOUBLE), 6) AS value,
                      round(CAST(user_id AS DOUBLE), 6) AS user_id
               FROM events)
    SELECT event_id, metric, val
    FROM (UNPIVOT t ON value, user_id INTO NAME metric VALUE val)
"""
QUERIES["unpivot_events"] = unpivot_events

def supershingle_pairs_docs(sf_dir: str):
    """Broder super-shingles (``stages/minhash.py::supershingle_md5`` /
    ``supershingle_pairs``): 12 md5 min-hashes per doc grouped into 6
    bands of 2, each band's concatenation hashed once more; docs
    sharing a super-shingle pair up and a second narrow exchange counts
    agreeing bands — the AltaVista-era "sketch of sketches" candidate
    tier.  md5 spec twin: the oracle replays min-hash, band concat,
    outer md5, the self-join AND the shared-band count."""
    from dedup_ray.stages.minhash import supershingle_md5, supershingle_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ss = supershingle_md5(ds, n_perms=12, group=2)
    return supershingle_pairs(ss, num_partitions=8)


ORACLES["supershingle_pairs_docs"] = """
    WITH tl AS (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '') AS t
                FROM documents),
    sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= 3 THEN list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
             ELSE [CAST(doc_id AS VARCHAR)] END) AS shingle
      FROM tl
    ),
    dt AS (SELECT DISTINCT doc_id, shingle FROM sh),
    h AS (SELECT doc_id, p.i AS perm,
                 min(md5(p.i || ':' || shingle)) AS mh
          FROM dt CROSS JOIN range(0, 12) p(i)
          GROUP BY doc_id, p.i),
    ss AS (SELECT doc_id, perm // 2 AS band,
                  md5(string_agg(mh, '|' ORDER BY perm)) AS ss
           FROM h GROUP BY doc_id, perm // 2)
    SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
    FROM ss a JOIN ss b
      ON a.band = b.band AND a.ss = b.ss AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""
QUERIES["supershingle_pairs_docs"] = supershingle_pairs_docs


def chi2_source_lang_docs(sf_dir: str):
    """Chi-squared independence test + Cramér's V between crawl source
    and language (``ops/stats.py::chi2_independence``): per-batch partial
    contingency cells, one single-partition reduce that rebuilds the FULL
    source×lang grid from the marginals (zero-observed cells contribute
    their expectation — a cells-only sum silently understates chi2).
    The corpus-audit question 'are my sources language-balanced'."""
    from dedup_ray.ops.stats import chi2_independence

    ds = _read(sf_dir, "documents", columns=["source", "lang"])
    return chi2_independence(ds, "source", "lang")


ORACLES["chi2_source_lang_docs"] = """
    WITH cells AS (SELECT source, lang, count(*) AS c
                   FROM documents GROUP BY source, lang),
    rt AS (SELECT source, sum(c) AS rc FROM cells GROUP BY source),
    ct AS (SELECT lang, sum(c) AS cc FROM cells GROUP BY lang),
    n AS (SELECT sum(c) AS n FROM cells),
    grid AS (SELECT rt.source, ct.lang,
                    coalesce(cells.c, 0) AS o,
                    rt.rc * ct.cc / n.n AS e
             FROM rt CROSS JOIN ct CROSS JOIN n
             LEFT JOIN cells ON cells.source = rt.source
                            AND cells.lang = ct.lang),
    s AS (SELECT sum((o - e) * (o - e) / e) AS chi2,
                 count(DISTINCT source) AS r, count(DISTINCT lang) AS c
          FROM grid)
    SELECT round(chi2, 6) AS chi2,
           (r - 1) * (c - 1) AS dof,
           round(sqrt(chi2 / (n.n * (least(r, c) - 1))), 6) AS cramers_v,
           CAST(n.n AS BIGINT) AS n
    FROM s, n
"""
QUERIES["chi2_source_lang_docs"] = chi2_source_lang_docs


def acf_events(sf_dir: str):
    """Per-event-type autocorrelation at lags 1..3 over the value series
    in timestamp order (``ops/stats.py::acf``): one exchange keyed on the
    type, a vectorized lag pass per partition — the burstiness/seasonality
    probe on a metric stream.  Biased estimator with shared denominator
    (|acf| ≤ 1); oracle replays the row_number ordering and both sums."""
    from dedup_ray.ops.stats import acf

    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "event_id", "value"])
    return acf(ds, "event_type", "ts", "value", "event_id", max_lag=3)


ORACLES["acf_events"] = """
    WITH s AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    m AS (SELECT event_type, avg(value) AS mu FROM events
          GROUP BY event_type),
    d AS (SELECT s.event_type,
                 sum((value - mu) * (value - mu)) AS den
          FROM s JOIN m USING (event_type) GROUP BY s.event_type),
    l AS (SELECT a.event_type, k.k AS lag,
                 sum((a.value - m.mu) * (b.value - m.mu)) AS num
          FROM s a
          CROSS JOIN range(1, 4) k(k)
          JOIN s b ON b.event_type = a.event_type AND b.rn = a.rn + k.k
          JOIN m ON m.event_type = a.event_type
          GROUP BY a.event_type, k.k)
    SELECT l.event_type, l.lag, round(l.num / d.den, 6) AS acf
    FROM l JOIN d ON d.event_type = l.event_type
    WHERE d.den <> 0
"""
QUERIES["acf_events"] = acf_events


def ks_events(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov D between the 'click' and
    'view' value distributions (``ops/stats.py::ks_two_sample``) WITHOUT
    a global sort: a bucket-count pass pins per-bucket cumulative
    offsets (driver state = the bucket grid), then one bucket-keyed
    exchange scores every distinct value with globally correct ECDF
    counts and reports per-partition maxima.  The drift gate between two
    segments of a stream."""
    from dedup_ray.ops.stats import ks_two_sample

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return ks_two_sample(ds, "event_type", "value", "click", "view")


ORACLES["ks_events"] = """
    WITH x AS (SELECT value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS w1,
                      CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS w2
               FROM events WHERE event_type IN ('click', 'view')),
    t AS (SELECT sum(w1) AS n1, sum(w2) AS n2 FROM x),
    c AS (SELECT value, sum(w1) AS a, sum(w2) AS b FROM x GROUP BY value),
    cum AS (SELECT value,
                   sum(a) OVER (ORDER BY value) AS ca,
                   sum(b) OVER (ORDER BY value) AS cb
            FROM c)
    SELECT round(max(abs(ca / CAST(n1 AS DOUBLE)
                        - cb / CAST(n2 AS DOUBLE))), 6) AS ks_d,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
    FROM cum, t GROUP BY n1, n2
"""
QUERIES["ks_events"] = ks_events


def token_gini_docs(sf_dir: str):
    """Token-mass concentration audit (``ops/stats.py::gini_entropy``):
    Gini coefficient + Shannon entropy over the token frequency table —
    the 'how Zipfian is this corpus' scalar a curation report carries
    beside the Zipf OLS fit.  Corpus reduces to the vocab-bounded count
    table before the single gather; sorted-rank Gini closed form is
    tie-order-invariant."""
    from dedup_ray.ops.stats import gini_entropy

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    toks = tokenize_explode(ds)

    def cnt(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "c"])

    from dedup_ray.util.exchange import exchange_group_apply

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("token").aggregate([("c", "sum")])
        return g.rename_columns(["token", "c"])

    counts = exchange_group_apply(
        toks.map_batches(cnt, batch_format="pyarrow"), ["token"], fold,
        num_partitions=8,
        empty_schema=pa.schema([("token", pa.string()), ("c", pa.int64())]),
    )
    return gini_entropy(counts.select_columns(["c"]), "c")


ORACLES["token_gini_docs"] = f"""
    {TOKENS_CTE},
    cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    r AS (SELECT c, row_number() OVER (ORDER BY c) AS i FROM cnt),
    s AS (SELECT sum(i * c) AS ic, sum(c) AS tot, count(*) AS k FROM r),
    e AS (SELECT sum(p * ln(p)) * -1 AS ent
          FROM (SELECT c / (SELECT sum(c) FROM cnt) AS p FROM cnt))
    SELECT round(2.0 * ic / (k * tot) - (k + 1.0) / k, 6) AS gini,
           round(ent, 6) AS entropy,
           round(CASE WHEN k > 1 THEN ent / ln(k) ELSE 0 END, 6)
               AS norm_entropy,
           CAST(k AS BIGINT) AS k, CAST(tot AS BIGINT) AS total
    FROM s, e
"""
QUERIES["token_gini_docs"] = token_gini_docs


_NB_MODEL_CACHE: dict = {}


def _nb_model(sf_dir: str, ds) -> dict:
    """Per-process memo of the deterministic NB model: five catalog
    entries (scoring, calibration, conformal, isotonic, agreement)
    share one fit per corpus instead of five identical training
    exchanges.  Keyed by sf_dir; the model is a pure function of the
    table, so caching cannot change any result."""
    from dedup_ray.stages.nbayes import nb_train

    if sf_dir not in _NB_MODEL_CACHE:
        _NB_MODEL_CACHE[sf_dir] = nb_train(ds, label_col="lang")
    return _NB_MODEL_CACHE[sf_dir]


def nb_lang_docs(sf_dir: str):
    """Multinomial Naive Bayes lang classifier, trained AND scored
    in-engine (``stages/nbayes.py``): one token-keyed exchange folds the
    (label, token) counts, the V×C Laplace-smoothed log-prob matrix is
    broadcast once, one stateless pass scores every doc — the trainable
    counterpart of the artifact scorers (ST4), fully SQL-replayable.
    Argmax at 6-dp rounding with lexicographic tie-break written into
    both engines."""
    from dedup_ray.stages.nbayes import nb_score, nb_train

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    model = _nb_model(sf_dir, ds)
    return nb_score(ds, model, out_col="nb_lang")


ORACLES["nb_lang_docs"] = f"""
    {TOKENS_CTE},
    tc AS (SELECT doc_id, token, count(*) AS tf FROM toks
           GROUP BY doc_id, token),
    lab AS (SELECT doc_id, lang FROM documents),
    cls AS (SELECT lang, count(*) AS nd FROM documents GROUP BY lang),
    nt AS (SELECT lab.lang, toks.token, count(*) AS n
           FROM toks JOIN lab USING (doc_id) GROUP BY lab.lang, toks.token),
    vt AS (SELECT DISTINCT token FROM toks),
    v AS (SELECT count(*) AS v FROM vt),
    ctot AS (SELECT lang, sum(n) AS ntot FROM nt GROUP BY lang),
    prior AS (SELECT lang,
                     ln(nd / (SELECT CAST(sum(nd) AS DOUBLE) FROM cls))
                         AS lp
              FROM cls),
    logp AS (SELECT ctot.lang, vt.token,
                    ln((coalesce(nt.n, 0) + 1.0) / (ctot.ntot + v.v))
                        AS logp
             FROM vt CROSS JOIN ctot CROSS JOIN v
             LEFT JOIN nt ON nt.lang = ctot.lang AND nt.token = vt.token),
    sc AS (SELECT tc.doc_id, logp.lang,
                  round(any_value(prior.lp) + sum(tc.tf * logp.logp), 6)
                      AS score
           FROM tc
           JOIN logp ON logp.token = tc.token
           JOIN prior ON prior.lang = logp.lang
           GROUP BY tc.doc_id, logp.lang),
    best AS (SELECT doc_id, lang, score,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, lang) AS rk
             FROM sc)
    SELECT doc_id, lang AS nb_lang, score AS nb_score
    FROM best WHERE rk = 1
"""
QUERIES["nb_lang_docs"] = nb_lang_docs


def jl_project_embeddings(sf_dir: str):
    """Johnson–Lindenstrauss Rademacher projection of the 64-dim
    embeddings to 8 dims (``stages/embed.py::jl_project``): deterministic
    ±1 signs from md5(i ':' j) parity, the matrix built once per actor,
    one float64 matmul per batch, zero shuffles.  The dimensionality-
    reduction front end for the ANN / SemDeDup tiers; oracle rebuilds
    every sign and cell."""
    from dedup_ray.stages.embed import jl_project

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return jl_project(ds, out_dim=8)


ORACLES["jl_project_embeddings"] = """
    WITH x AS (SELECT vec_id,
                      generate_subscripts(embedding, 1) AS i,
                      CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings),
    s AS (SELECT i.i, j.j,
                 CASE WHEN strpos('02468ace',
                                  substr(md5(i.i || ':' || j.j), 1, 1)) > 0
                      THEN 1.0 ELSE -1.0 END AS sgn
          FROM (SELECT DISTINCT i FROM x) i CROSS JOIN range(1, 9) j(j))
    SELECT x.vec_id, s.j,
           round(sum(x.v * s.sgn) / sqrt(8.0), 6) AS y
    FROM x JOIN s ON s.i = x.i
    GROUP BY x.vec_id, s.j
"""
QUERIES["jl_project_embeddings"] = jl_project_embeddings

KTRUSS_K, KTRUSS_ROUNDS, KTRUSS_CLIQUE_STEP = 4, 4, 50


def k_truss_docs(sf_dir: str):
    """Distributed k-truss peeling (``ops/graph.py::k_truss``) over a
    derived doc graph: a triangle STRIP ``(i,i+1),(i,i+2)`` — whose
    chord edges sit in one triangle (support 1, peel round 1) and whose
    spine edges then cascade (support 2 → 0, peel round 2) — plus a
    clique over every ``doc_id %% 50 == 0`` node whose edges carry
    support 8 and survive k=4.  Unlike k-core, membership needs
    TRIANGLES, so the whole strip dies while the clique stands.  Both
    engines run exactly ``KTRUSS_ROUNDS`` rounds (removal-free rounds
    are no-ops — the k-core bounded-replay convention)."""
    from dedup_ray.ops.graph import k_truss

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    mx = int(docs.max("doc_id"))

    def strip(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        a1, b1 = ids[ids + 1 <= mx], ids[ids + 1 <= mx] + 1
        a2, b2 = ids[ids + 2 <= mx], ids[ids + 2 <= mx] + 2
        return pa.table({
            "a": pa.array(np.concatenate([a1, a2]), pa.int64()),
            "b": pa.array(np.concatenate([b1, b2]), pa.int64()),
        })

    def hub_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(
            ids[ids % KTRUSS_CLIQUE_STEP == 0], pa.int64())})

    hubs = sorted(
        r["doc_id"] for r in
        docs.map_batches(hub_filter, batch_format="pyarrow").take_all()
    )  # bounded: n_docs / 50 ids
    clique = pa.table({
        "a": pa.array([x for i, x in enumerate(hubs)
                       for _ in hubs[i + 1:]], pa.int64()),
        "b": pa.array([y for i, x in enumerate(hubs)
                       for y in hubs[i + 1:]], pa.int64()),
    })
    edges = docs.map_batches(strip, batch_format="pyarrow").union(
        ray.data.from_arrow(clique))
    truss = k_truss(edges, k=KTRUSS_K, max_rounds=KTRUSS_ROUNDS,
                    num_partitions=8)
    return truss.sort(["a", "b"])


def _k_truss_oracle_sql(k: int = KTRUSS_K,
                        rounds: int = KTRUSS_ROUNDS) -> str:
    sql = f"""
    WITH ids AS (SELECT doc_id AS i FROM documents),
    mx AS (SELECT max(i) AS m FROM ids),
    raw AS (
      SELECT i AS a, i + 1 AS b FROM ids, mx WHERE i + 1 <= m
      UNION ALL SELECT i, i + 2 FROM ids, mx WHERE i + 2 <= m
      UNION ALL
      SELECT h1.i, h2.i
      FROM (SELECT i FROM ids WHERE i % {KTRUSS_CLIQUE_STEP} = 0) h1
      JOIN (SELECT i FROM ids WHERE i % {KTRUSS_CLIQUE_STEP} = 0) h2
        ON h1.i < h2.i),
    e0 AS (SELECT DISTINCT a, b FROM raw)"""
    for r in range(rounds):
        sql += f""",
    nb{r} AS (SELECT a AS u, b AS v FROM e{r}
              UNION ALL SELECT b, a FROM e{r}),
    sup{r} AS (SELECT e.a, e.b, count(*) AS s
               FROM e{r} e
               JOIN nb{r} n1 ON n1.u = e.a
               JOIN nb{r} n2 ON n2.u = e.b AND n2.v = n1.v
               GROUP BY e.a, e.b),
    e{r + 1} AS (SELECT e.a, e.b FROM e{r} e
                 JOIN sup{r} s USING (a, b) WHERE s.s >= {k - 2})"""
    return sql + f" SELECT a, b FROM e{rounds} ORDER BY a, b"


ORACLES["k_truss_docs"] = _k_truss_oracle_sql()
QUERIES["k_truss_docs"] = k_truss_docs

TEXTRANK_K, TEXTRANK_ITERS = 15, 8


def textrank_docs(sf_dir: str):
    """TextRank keyword extraction (``stages/textstats.py::
    textrank_keywords``): weighted PageRank over the adjacent-token
    co-occurrence graph, 8 fixed iterations from WS=1 — one vectorized
    pair pass + one count exchange does the corpus work; the graph at
    the reduce is vocab²-bounded.  Oracle rebuilds the window-2 edges
    with the list_transform trick and unrolls all 8 rounds."""
    from dedup_ray.stages.textstats import textrank_keywords

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return textrank_keywords(ds, top_k=TEXTRANK_K,
                             iterations=TEXTRANK_ITERS)


def _textrank_oracle_sql(top_k: int = TEXTRANK_K,
                         iters: int = TEXTRANK_ITERS) -> str:
    sql = """
    WITH tl AS (SELECT list_filter(string_split(text, ' '),
                                   x -> x <> '') AS t
                FROM documents),
    pk AS (SELECT unnest(list_transform(
                    range(1, len(t)),
                    i -> CASE WHEN t[i] < t[i + 1]
                              THEN t[i] || '|' || t[i + 1]
                              ELSE t[i + 1] || '|' || t[i] END)) AS p
           FROM tl WHERE len(t) >= 2),
    e AS (SELECT string_split(p, '|')[1] AS w1,
                 string_split(p, '|')[2] AS w2, count(*) AS n
          FROM pk
          WHERE string_split(p, '|')[1] <> string_split(p, '|')[2]
          GROUP BY 1, 2),
    und AS (SELECT w1 AS u, w2 AS v, n FROM e
            UNION ALL SELECT w2, w1, n FROM e),
    wout AS (SELECT u, sum(n) AS wu FROM und GROUP BY u),
    r0 AS (SELECT u AS v, 1.0 AS r FROM wout)"""
    for i in range(iters):
        sql += f""",
    r{i + 1} AS (SELECT und.v,
                        0.15 + 0.85 * sum(und.n / wout.wu * r{i}.r) AS r
                 FROM und
                 JOIN wout ON wout.u = und.u
                 JOIN r{i} ON r{i}.v = und.u
                 GROUP BY und.v)"""
    return sql + f"""
    SELECT v AS token, round(r, 6) AS rank FROM r{iters}
    ORDER BY round(r, 6) DESC, v LIMIT {top_k}"""


ORACLES["textrank_docs"] = _textrank_oracle_sql()
QUERIES["textrank_docs"] = textrank_docs

METABLOCK_CAP = 64


def metablocking_parts(sf_dir: str):
    """Meta-blocking over two redundant blocking schemes
    (``ops/linkage.py::meta_block_pairs``, Papadakis et al. 2014):
    parts block by BOTH the exact (first, last) name-token pair AND the
    coarser soundex-of-last-token key; pair weight = # common blocks
    (CBS), oversized blocks purged (the soundex tier purges at corpus
    scale — that observable degradation is the point of purging),
    weighted-edge pruning keeps pairs STRICTLY above the mean weight
    via the exact integer predicate ``w·n > Σw`` — the candidate-pair
    thinning pass between blocking and pair scoring in the ER tier."""
    from dedup_ray.ops.linkage import meta_block_pairs
    from dedup_ray.stages.phonetic import soundex_array

    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def blocks(batch: pd.DataFrame) -> pd.DataFrame:
        last = batch["p_name"].str.split(" ").str[-1]
        first = batch["p_name"].str.split(" ").str[0]
        ent = pd.concat([batch["p_partkey"], batch["p_partkey"]],
                        ignore_index=True)
        btype = pd.Series(["fl"] * len(batch) + ["sx"] * len(batch))
        bkey = pd.concat([first + "|" + last,
                          pd.Series(soundex_array(last))],
                         ignore_index=True)
        return pd.DataFrame({"ent": ent, "btype": btype, "bkey": bkey})

    blk = as_arrow(ds.map_batches(blocks, batch_format="pandas"))
    return meta_block_pairs(blk, max_block_size=METABLOCK_CAP,
                            num_partitions=8)


def _metablocking_oracle() -> str:
    from dedup_ray.stages.phonetic import soundex_sql

    return f"""
    WITH names AS (SELECT p_partkey,
                          string_split(p_name, ' ')[-1] AS nm,
                          string_split(p_name, ' ')[1] AS ft
                   FROM part),
    __soundex_src AS (SELECT DISTINCT nm FROM names),
    sx AS ({soundex_sql('nm')}),
    blocks AS (
      SELECT n.p_partkey AS ent, 'sx' AS btype, sx.soundex AS bkey
      FROM names n JOIN sx ON sx.nm = n.nm
      UNION ALL
      SELECT p_partkey, 'fl', ft || '|' || nm FROM names),
    db AS (SELECT DISTINCT ent, btype, bkey FROM blocks),
    sized AS (SELECT btype, bkey FROM db GROUP BY btype, bkey
              HAVING count(*) BETWEEN 2 AND {METABLOCK_CAP}),
    pb AS (SELECT db.* FROM db JOIN sized USING (btype, bkey)),
    pairs AS (SELECT a.ent AS id1, b.ent AS id2, count(*) AS w
              FROM pb a JOIN pb b
                ON a.btype = b.btype AND a.bkey = b.bkey
               AND a.ent < b.ent
              GROUP BY a.ent, b.ent),
    tot AS (SELECT sum(w) AS tw, count(*) AS np FROM pairs)
    SELECT id1, id2, w FROM pairs, tot WHERE w * np >= tw
"""


ORACLES["metablocking_parts"] = _metablocking_oracle()
QUERIES["metablocking_parts"] = metablocking_parts


def _host_token_counts(sf_dir: str):
    """(host, t) token census, host = 'site' || doc_id % 13 (the shared
    URL synthesis); one partial pass + one narrow host-keyed fold."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from dedup_ray.stages.textstats import explode_tokens

        _, _, n = explode_tokens(t["text"], t.num_rows)
        n = np.maximum(n, 1)  # empty docs carry their sentinel token
        host = pc.binary_join_element_wise(
            "site",
            pa.array((t["doc_id"].to_numpy(zero_copy_only=False) % 13)
                     .astype(str)), "")
        g = pa.table({"host": host, "t": pa.array(n, pa.int64())}) \
            .group_by("host").aggregate([("t", "sum")])
        return g.rename_columns(["host", "t"])

    def fold(part: pa.Table) -> pa.Table:
        g = part.group_by("host").aggregate([("t", "sum")])
        return g.rename_columns(["host", "t"])

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["host"], fold,
        num_partitions=4,
        empty_schema=pa.schema([("host", pa.string()), ("t", pa.int64())]),
    )


_HOST_TOKENS_SQL = """
    ht AS (SELECT 'site' || (doc_id % 13)::VARCHAR AS host,
                  greatest(len(list_filter(string_split(text, ' '),
                                           x -> x <> '')), 1) AS nt
           FROM documents),
    cnt AS (SELECT host, sum(nt) AS t FROM ht GROUP BY host)
"""


def waterfill_budget_docs(sf_dir: str):
    """Water-filling per-host token budget (``stages/mixing.py::
    waterfill_allocation``): cap the head hosts so that total allocated
    tokens hit EXACTLY 60%% of the corpus — the anti-head-domain step
    of a training-data recipe, solved in closed form on the
    host-bounded census (cap ``c`` with ``Σ min(t_h, c) = B``; the
    segment test runs on the identical double division in both
    engines)."""
    from dedup_ray.stages.mixing import waterfill_allocation

    counts = _host_token_counts(sf_dir).materialize()
    tot = int(counts.sum("t"))
    return waterfill_allocation(counts, "host", "t", (3 * tot) // 5)


ORACLES["waterfill_budget_docs"] = f"""
    WITH {_HOST_TOKENS_SQL},
    tot AS (SELECT sum(t) AS tot, count(*) AS n FROM cnt),
    b AS (SELECT (3 * tot) // 5 AS bud FROM tot),
    s AS (SELECT host, t,
                 row_number() OVER (ORDER BY t, host) AS rn,
                 coalesce(sum(t) OVER (ORDER BY t, host
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS pre,
                 lag(t) OVER (ORDER BY t, host) AS lo
          FROM cnt),
    cand AS (SELECT s.*, (b.bud - s.pre)
                         / CAST(tot.n - s.rn + 1 AS DOUBLE) AS c
             FROM s, b, tot),
    pick AS (SELECT c FROM cand
             WHERE (lo IS NULL OR c >= lo) AND c < t
             ORDER BY rn LIMIT 1)
    SELECT cnt.host, CAST(cnt.t AS BIGINT) AS t,
           round(CASE WHEN b.bud >= tot.tot THEN CAST(cnt.t AS DOUBLE)
                      ELSE least(CAST(cnt.t AS DOUBLE),
                                 (SELECT c FROM pick)) END, 6) AS alloc
    FROM cnt, b, tot
"""
QUERIES["waterfill_budget_docs"] = waterfill_budget_docs


def temperature_mix_docs(sf_dir: str):
    """Temperature-scaled sampling weights over the host census
    (``stages/mixing.py::temperature_weights``, the CC-100 / mT5
    multilingual recipe: ``p_h ∝ t_h^0.3`` upweights tail hosts); one
    narrow fold exchange + a host-bounded reduce."""
    from dedup_ray.stages.mixing import temperature_weights

    return temperature_weights(_host_token_counts(sf_dir), "host", "t",
                               alpha=0.3)


ORACLES["temperature_mix_docs"] = f"""
    WITH {_HOST_TOKENS_SQL}
    SELECT host, CAST(t AS BIGINT) AS t,
           round(pow(t, 0.3) / (SELECT sum(pow(t, 0.3)) FROM cnt), 6)
               AS weight
    FROM cnt
"""
QUERIES["temperature_mix_docs"] = temperature_mix_docs


def calibration_nb_docs(sf_dir: str):
    """Reliability diagram of the NB classifier (``stages/nbayes.py``,
    ``with_prob``): the softmax posterior of each prediction binned into
    ten confidence buckets, per-bin count / mean confidence / empirical
    accuracy — the ECE inputs a model-quality audit reports.  True
    labels ride the scoring batch (``keep_cols``), so calibration costs
    ZERO joins: one partial pass + one 10-row fold."""
    from dedup_ray.stages.nbayes import nb_score, nb_train
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    model = _nb_model(sf_dir, ds)
    scored = nb_score(ds, model, out_col="nb_lang", with_prob=True,
                      keep_cols=("lang",))

    def partial(t: pa.Table) -> pa.Table:
        p = t["nb_prob"].to_numpy(zero_copy_only=False)
        ok = pc.equal(t["nb_lang"], t["lang"]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        b = np.minimum(np.floor(p * 10).astype(np.int64), 9)
        df = pd.DataFrame({"bin": b, "n": 1, "sp": p, "sok": ok})
        g = df.groupby("bin", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "conf": pa.array([], pa.float64()),
                             "acc": pa.array([], pa.float64())})
        df = part.to_pandas().groupby("bin", sort=True).sum().reset_index()
        return pa.table({
            "bin": pa.array(df["bin"], pa.int64()),
            "n": pa.array(df["n"], pa.int64()),
            "conf": pa.array(np.round(df["sp"] / df["n"], 6), pa.float64()),
            "acc": pa.array(np.round(df["sok"] / df["n"], 6), pa.float64()),
        })

    return exchange_group_apply(
        scored.map_batches(partial, batch_format="pyarrow"), ["bin"], fold,
        num_partitions=2,
        empty_schema=pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                                ("sp", pa.float64()),
                                ("sok", pa.float64())]),
    )


_NB_SC_CTES = """
    tc AS (SELECT doc_id, token, count(*) AS tf FROM toks
           GROUP BY doc_id, token),
    lab AS (SELECT doc_id, lang FROM documents),
    cls AS (SELECT lang, count(*) AS nd FROM documents GROUP BY lang),
    nt AS (SELECT lab.lang, toks.token, count(*) AS n
           FROM toks JOIN lab USING (doc_id) GROUP BY lab.lang, toks.token),
    vt AS (SELECT DISTINCT token FROM toks),
    v AS (SELECT count(*) AS v FROM vt),
    ctot AS (SELECT lang, sum(n) AS ntot FROM nt GROUP BY lang),
    prior AS (SELECT lang,
                     ln(nd / (SELECT CAST(sum(nd) AS DOUBLE) FROM cls))
                         AS lp
              FROM cls),
    logp AS (SELECT ctot.lang, vt.token,
                    ln((coalesce(nt.n, 0) + 1.0) / (ctot.ntot + v.v))
                        AS logp
             FROM vt CROSS JOIN ctot CROSS JOIN v
             LEFT JOIN nt ON nt.lang = ctot.lang AND nt.token = vt.token),
    sc AS (SELECT tc.doc_id, logp.lang,
                  round(any_value(prior.lp) + sum(tc.tf * logp.logp), 6)
                      AS score
           FROM tc
           JOIN logp ON logp.token = tc.token
           JOIN prior ON prior.lang = logp.lang
           GROUP BY tc.doc_id, logp.lang)
"""

ORACLES["calibration_nb_docs"] = f"""
    {TOKENS_CTE},
    {_NB_SC_CTES},
    mx AS (SELECT doc_id, max(score) AS smax FROM sc GROUP BY doc_id),
    z AS (SELECT sc.doc_id, sum(exp(sc.score - mx.smax)) AS z
          FROM sc JOIN mx USING (doc_id) GROUP BY sc.doc_id),
    best AS (SELECT doc_id, lang AS pred FROM (
               SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) AS rk
               FROM sc) WHERE rk = 1),
    probs AS (SELECT z.doc_id, best.pred, round(1.0 / z.z, 6) AS p
              FROM z JOIN best USING (doc_id)),
    j AS (SELECT least(CAST(floor(p.p * 10) AS BIGINT), 9) AS bin,
                 p.p,
                 CASE WHEN p.pred = d.lang THEN 1.0 ELSE 0.0 END AS ok
          FROM probs p JOIN documents d USING (doc_id))
    SELECT bin, count(*) AS n, round(sum(p) / count(*), 6) AS conf,
           round(sum(ok) / count(*), 6) AS acc
    FROM j GROUP BY bin
"""
QUERIES["calibration_nb_docs"] = calibration_nb_docs


def _lpa_graph(sf_dir: str):
    """The LPA block-star graph with bridges (shared with
    ``lpa_communities_docs``), self-loops included as synthesized."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ctr = (ids // 10) * 10
        bridge = ids[(ids % 10 == 0) & ((ids // 10) % 2 == 0)]
        return pa.table({
            "a": pa.array(np.r_[ids, bridge], pa.int64()),
            "b": pa.array(np.r_[ctr, bridge + 10], pa.int64()),
        })

    return ds.map_batches(mk_edges, batch_format="pyarrow")


_LPA_EDGES_SQL = """
    e0 AS (
        SELECT doc_id AS a, (doc_id // 10) * 10 AS b FROM documents
        UNION ALL
        SELECT doc_id AS a, doc_id + 10 AS b FROM documents
        WHERE doc_id % 10 = 0 AND (doc_id // 10) % 2 = 0),
    e AS (SELECT a, b FROM e0 WHERE a <> b)
"""


def modularity_docs(sf_dir: str):
    """Newman modularity of the LPA communities (``ops/graph.py::
    modularity``): Q = Σ_c (e_c/m − (d_c/2m)²) over the block-star
    graph, labels from the SAME fixed-round label propagation the LPA
    catalog entry checks — the community-quality scalar that tells a
    curation run whether its host communities are real.  Two label
    joins + one community-bounded gather."""
    from dedup_ray.ops.graph import label_propagation, modularity

    edges = _lpa_graph(sf_dir)
    labels = label_propagation(edges, rounds=LPA_ROUNDS, num_partitions=8)
    return modularity(edges, labels, num_partitions=8)


def _modularity_oracle() -> str:
    lpa = _lpa_oracle_sql(LPA_ROUNDS)
    lpa_body = lpa[: lpa.rfind("SELECT node, label")].rstrip().rstrip(",")
    return f"""{lpa_body},
    e AS (SELECT a, b FROM e0 WHERE a <> b),
    m AS (SELECT count(*) AS m FROM e),
    lab AS (SELECT node, label FROM l{LPA_ROUNDS}),
    intra AS (SELECT l1.label, count(*) AS ec
              FROM e JOIN lab l1 ON l1.node = e.a
                     JOIN lab l2 ON l2.node = e.b AND l2.label = l1.label
              GROUP BY l1.label),
    deg AS (SELECT node, count(*) AS k FROM (
              SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node),
    dc AS (SELECT lab.label, sum(deg.k) AS d
           FROM deg JOIN lab ON lab.node = deg.node GROUP BY lab.label)
    SELECT round(sum(coalesce(intra.ec, 0) * 1.0 / m.m
                     - (dc.d / (2.0 * m.m)) ^ 2), 6) AS q,
           CAST(m.m AS BIGINT) AS m,
           count(*) AS n_communities
    FROM dc LEFT JOIN intra ON intra.label = dc.label, m
    GROUP BY m.m
"""


ORACLES["modularity_docs"] = _modularity_oracle()
QUERIES["modularity_docs"] = modularity_docs


def assortativity_docs(sf_dir: str):
    """Degree assortativity (Newman 2002) of the block-star graph
    (``ops/graph.py::degree_assortativity``): Pearson correlation of
    endpoint degrees over the directed doubling — the hub-and-spoke
    synthesis should come out strongly NEGATIVE (leaves attach to
    hubs).  One degree count + two tag joins; five partial sums reach
    the driver."""
    from dedup_ray.ops.graph import degree_assortativity

    return degree_assortativity(_lpa_graph(sf_dir), num_partitions=8)


ORACLES["assortativity_docs"] = f"""
    WITH {_LPA_EDGES_SQL},
    deg AS (SELECT node, count(*) AS k FROM (
              SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node),
    pts AS (SELECT da.k AS x, db.k AS y
            FROM e JOIN deg da ON da.node = e.a
                   JOIN deg db ON db.node = e.b
            UNION ALL
            SELECT db.k, da.k
            FROM e JOIN deg da ON da.node = e.a
                   JOIN deg db ON db.node = e.b)
    SELECT round(corr(x, y), 6) AS assortativity,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS m
    FROM pts
"""
QUERIES["assortativity_docs"] = assortativity_docs


def luhn_screen_docs(sf_dir: str):
    """Luhn mod-10 checksum validation (``stages/webclean.py::
    luhn_valid_array``): the verification pass behind credit-card PII
    detection — a bare 16-digit regex false-positives on order ids;
    the checksum screens them at ~90%.  Candidate numbers synthesized
    deterministically from doc_id on BOTH sides; zero shuffles, the
    digit matrix is a zero-copy uint32 view (no per-row Python)."""
    from dedup_ray.stages.webclean import luhn_valid_array

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        body = (ids.astype(np.int64) * 7919 + 11) % 10**15
        cc = pa.array(["4" + str(b).zfill(15) for b in body], pa.string())
        return pa.table({
            "doc_id": t["doc_id"],
            "cc": cc,
            "luhn_ok": luhn_valid_array(cc),
        })

    return ds.map_batches(f, batch_format="pyarrow")


ORACLES["luhn_screen_docs"] = """
    WITH cand AS (SELECT doc_id,
                         '4' || lpad(CAST((doc_id * 7919 + 11) % 1000000000000000
                                          AS VARCHAR), 15, '0') AS cc
                  FROM documents),
    d AS (SELECT doc_id, cc, p.i,
                 CAST(substr(cc, p.i, 1) AS INT) AS dig
          FROM cand CROSS JOIN range(1, 17) p(i)),
    w AS (SELECT doc_id, cc,
                 CASE WHEN i % 2 = 1
                      THEN CASE WHEN dig * 2 > 9 THEN dig * 2 - 9
                                ELSE dig * 2 END
                      ELSE dig END AS v
          FROM d)
    SELECT doc_id, cc,
           CAST(CASE WHEN sum(v) % 10 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS luhn_ok
    FROM w GROUP BY doc_id, cc
"""
QUERIES["luhn_screen_docs"] = luhn_screen_docs


def trimmed_mean_events(sf_dir: str):
    """Per-type 10%%-trimmed mean (``ops/relational.py::
    grouped_trimmed_mean``): the outlier-robust location estimate read
    off the per-group VALUE HISTOGRAM (one exchange; moving state =
    distinct (group, value) pairs, never rows) — tie multiplicities
    straddling a cut split exactly as a row sort would; oracle replays
    the histogram arithmetic with window cumsums."""
    from dedup_ray.ops.relational import grouped_trimmed_mean

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_trimmed_mean(ds, "event_type", "value", trim=0.1,
                                num_partitions=4)


ORACLES["trimmed_mean_events"] = """
    WITH h AS (SELECT event_type AS g, value AS v, count(*) AS c
               FROM events GROUP BY event_type, value),
    w AS (SELECT g, v, c,
                 sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
                 sum(c) OVER (PARTITION BY g) AS n
          FROM h),
    kk AS (SELECT g, v, c, cum, n,
                  CAST(floor(n * 0.1) AS BIGINT) AS k FROM w),
    kept AS (SELECT g, n, k, v,
                    greatest(least(cum, n - k) - greatest(cum - c, k), 0)
                        AS kc
             FROM kk)
    SELECT g AS event_type, CAST(any_value(n) AS BIGINT) AS n,
           round(sum(v * kc) / (any_value(n) - 2 * any_value(k)), 6)
               AS trimmed_mean
    FROM kept GROUP BY g HAVING any_value(n) - 2 * any_value(k) > 0
"""
QUERIES["trimmed_mean_events"] = trimmed_mean_events


def spearman_qty_price(sf_dir: str):
    """Spearman rank correlation of quantity vs price WITHOUT a global
    sort or a row identity (``ops/stats.py::spearman``): the corpus
    folds into the distinct (x, y) pair histogram, each column's
    DISTINCT values get midranks via the bucket-offset trick (driver
    state = the bucket grid), two unique-key joins tag the histogram,
    and Pearson runs on c-weighted CENTERED partials (midrank mean is
    exactly (n+1)/2 — centering kills the n³ cancellation raw rank
    sums hit at corpus scale).  The robust companion of the A8 Pearson
    screen."""
    from dedup_ray.ops.stats import spearman

    ds = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])
    return spearman(ds, "l_quantity", "l_extendedprice",
                    x_bucket=1.0, y_bucket=256.0, num_partitions=8)


ORACLES["spearman_qty_price"] = """
    WITH r AS (SELECT
        rank() OVER (ORDER BY l_quantity)
          + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
        rank() OVER (ORDER BY l_extendedprice)
          + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ry
      FROM lineitem)
    SELECT round(corr(rx, ry), 6) AS spearman,
           CAST(count(*) AS BIGINT) AS n
    FROM r
"""
QUERIES["spearman_qty_price"] = spearman_qty_price


def cross_source_dups_docs(sf_dir: str):
    """Cross-source template attribution matrix: for every unordered
    source pair, how many doc pairs share an OPENING FINGERPRINT (md5 of
    the first 8 tokens — the boilerplate/template signal; the corpus has
    no byte-exact dups, which this audit would surface as an empty
    matrix) — tells a curation run which feeds share templates.  One
    digest-keyed exchange computes per-group source-composition counts
    (pairs by the product/choose formulas — never enumerated), then a
    tiny (s1, s2) fold."""
    import hashlib

    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def sig(t: pa.Table) -> pa.Table:
        dg = [
            hashlib.md5(
                " ".join([w for w in (x or "").split(" ") if w][:8])
                .encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({
            "dg": pa.array(dg, pa.string()),
            "source": t["source"],
        })

    pair_schema = pa.schema([("s1", pa.string()), ("s2", pa.string()),
                             ("n_pairs", pa.int64())])

    def per_digest(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pair_schema.empty_table()
        df = pd.DataFrame({"dg": part["dg"].to_pylist(),
                           "source": part["source"].to_pylist()})
        out = {}
        for _, sub in df.groupby("dg", sort=False):
            vc = sub["source"].value_counts().sort_index()
            ss = vc.index.tolist()
            cs = vc.to_numpy()
            for i in range(len(ss)):
                if cs[i] > 1:
                    k = (ss[i], ss[i])
                    out[k] = out.get(k, 0) + int(cs[i] * (cs[i] - 1) // 2)
                for j in range(i + 1, len(ss)):
                    k = (ss[i], ss[j])
                    out[k] = out.get(k, 0) + int(cs[i] * cs[j])
        if not out:
            return pair_schema.empty_table()
        keys = sorted(out)
        return pa.table({
            "s1": pa.array([k[0] for k in keys], pa.string()),
            "s2": pa.array([k[1] for k in keys], pa.string()),
            "n_pairs": pa.array([out[k] for k in keys], pa.int64()),
        })

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pair_schema.empty_table()
        g = part.group_by(["s1", "s2"]).aggregate([("n_pairs", "sum")])
        return g.rename_columns(["s1", "s2", "n_pairs"])

    partials = exchange_group_apply(
        ds.map_batches(sig, batch_format="pyarrow"), ["dg"], per_digest,
        8, empty_schema=pa.schema([("dg", pa.string()),
                                   ("source", pa.string())]),
    )
    return exchange_group_apply(
        partials, ["s1", "s2"], fold, 4, empty_schema=pair_schema,
    )


ORACLES["cross_source_dups_docs"] = """
    WITH d AS (SELECT doc_id, source,
                      md5(array_to_string(
                            list_filter(string_split(coalesce(text, ''),
                                                     ' '),
                                        x -> x <> '')[1:8],
                            ' ')) AS dg
               FROM documents)
    SELECT least(a.source, b.source) AS s1,
           greatest(a.source, b.source) AS s2,
           count(*) AS n_pairs
    FROM d a JOIN d b ON a.dg = b.dg AND a.doc_id < b.doc_id
    GROUP BY least(a.source, b.source), greatest(a.source, b.source)
"""
QUERIES["cross_source_dups_docs"] = cross_source_dups_docs


def benford_events(sf_dir: str):
    """Benford's-law first-digit audit (``ops/stats.py::
    benford_audit``) over the positive event values: observed digit
    shares vs log10(1+1/d) with the chi-squared divergence — the
    fabricated-feed screen; EXACT digit extraction via integer scaling
    + decimal-string head (libm pow/log10 flip boundary values between
    engines — found live on this table), 9-cell partials, one tiny
    reduce."""
    from dedup_ray.ops.stats import benford_audit

    ds = _read(sf_dir, "events", columns=["value"])
    return benford_audit(ds, "value", int_scale=100)


ORACLES["benford_events"] = """
    WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS s FROM events
               WHERE value > 0 AND isfinite(value)),
    d AS (SELECT CAST(substr(CAST(s AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM v WHERE s >= 1),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    digs AS (SELECT unnest(range(1, 10)) AS digit),
    fl AS (SELECT digs.digit, coalesce(c.n, 0) AS n
           FROM digs LEFT JOIN c USING (digit)),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM fl),
    e AS (SELECT digit, n, log10(1 + 1.0 / digit) AS p FROM fl),
    chi AS (SELECT round(sum((n - tot * p) * (n - tot * p)
                             / (tot * p)), 6) AS chi2
            FROM e, t)
    SELECT e.digit, CAST(e.n AS BIGINT) AS n,
           round(t.tot * e.p, 6) AS expected,
           round(e.n / t.tot, 6) AS p_obs,
           chi.chi2
    FROM e, t, chi
"""
QUERIES["benford_events"] = benford_events

DBSCAN_EPS, DBSCAN_MINPTS = 0.35, 5


def dbscan_embeddings(sf_dir: str):
    """Grid DBSCAN over the 4-d JL projection (``stages/dbscan.py``):
    density clustering with eps-grid cells + 40 lexicographically-
    positive probe offsets (each cross-cell pair materializes exactly
    once), core = ≥5 neighbors incl. self, clusters = exact CC of the
    core-core eps-graph (min member id), border points take the
    smallest core neighbor's cluster, noise = −1.  Projections rounded
    to 6 dp BEFORE any distance math, and the 4-term distance
    expression is written in the same operand order in both engines —
    the boundary can never disagree.  Oracle replays signs, pairs,
    cores, a recursive-CTE CC and the border join."""
    from dedup_ray.stages.dbscan import dbscan_grid

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dbscan_grid(ds, eps=DBSCAN_EPS, min_pts=DBSCAN_MINPTS,
                       num_partitions=8)


ORACLES["dbscan_embeddings"] = f"""
    WITH RECURSIVE x AS (SELECT vec_id,
                      generate_subscripts(embedding, 1) AS i,
                      CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings),
    s AS (SELECT i.i, j.j,
                 CASE WHEN strpos('02468ace',
                                  substr(md5(i.i || ':' || j.j), 1, 1)) > 0
                      THEN 1.0 ELSE -1.0 END AS sgn
          FROM (SELECT DISTINCT i FROM x) i CROSS JOIN range(1, 5) j(j)),
    p0 AS (SELECT x.vec_id, s.j,
                  round(sum(x.v * s.sgn) / sqrt(4.0), 6) AS y
           FROM x JOIN s ON s.i = x.i GROUP BY x.vec_id, s.j),
    p AS (SELECT vec_id,
                 max(CASE WHEN j = 1 THEN y END) AS y1,
                 max(CASE WHEN j = 2 THEN y END) AS y2,
                 max(CASE WHEN j = 3 THEN y END) AS y3,
                 max(CASE WHEN j = 4 THEN y END) AS y4
          FROM p0 GROUP BY vec_id),
    e0 AS (SELECT a.vec_id AS u, b.vec_id AS v
           FROM p a JOIN p b ON a.vec_id < b.vec_id
           WHERE (a.y1 - b.y1) * (a.y1 - b.y1)
               + (a.y2 - b.y2) * (a.y2 - b.y2)
               + (a.y3 - b.y3) * (a.y3 - b.y3)
               + (a.y4 - b.y4) * (a.y4 - b.y4)
               <= {DBSCAN_EPS * DBSCAN_EPS!r}),
    deg AS (SELECT id, count(*) AS c FROM (
              SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0)
            GROUP BY id),
    core AS (SELECT id FROM deg WHERE c + 1 >= {DBSCAN_MINPTS}),
    ce AS (SELECT u, v FROM e0
           WHERE u IN (SELECT id FROM core)
             AND v IN (SELECT id FROM core)
           UNION ALL
           SELECT v, u FROM e0
           WHERE u IN (SELECT id FROM core)
             AND v IN (SELECT id FROM core)),
    reach(node, lbl) AS (
        SELECT id, id FROM core
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN ce e ON e.u = r.node),
    comp AS (SELECT node AS id, min(lbl) AS cluster FROM reach
             GROUP BY node),
    adj AS (SELECT u AS pp, v AS q FROM e0
            UNION ALL SELECT v, u FROM e0),
    br AS (SELECT adj.pp, min(comp.cluster) AS cluster
           FROM adj JOIN comp ON comp.id = adj.q
           WHERE adj.pp NOT IN (SELECT id FROM core)
           GROUP BY adj.pp)
    SELECT emb.vec_id,
           coalesce(comp.cluster, br.cluster, -1) AS cluster
    FROM embeddings emb
    LEFT JOIN comp ON comp.id = emb.vec_id
    LEFT JOIN br ON br.pp = emb.vec_id
"""
QUERIES["dbscan_embeddings"] = dbscan_embeddings


def keyness_docs(sf_dir: str):
    """Token–class association ranking (``stages/textstats.py::
    token_class_association``): per token, the 2×2 presence grid
    against the majority language scores BOTH mutual information and
    Dunning's G² (the significance-calibrated keyness statistic that
    does not overweight rare tokens) — the feature-selection pass of a
    corpus study.  One vocab-bounded presence exchange, one reduce,
    +0.5 cell smoothing mirrored exactly in SQL."""
    from dedup_ray.stages.textstats import token_class_association

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return token_class_association(ds, label_col="lang", top_k=20)


ORACLES["keyness_docs"] = f"""
    {TOKENS_CTE},
    dt AS (SELECT DISTINCT doc_id, token FROM toks),
    lab AS (SELECT doc_id, lang FROM documents),
    tgt AS (SELECT lang FROM documents GROUP BY lang
            ORDER BY count(*) DESC, lang LIMIT 1),
    nt AS (SELECT count(*) AS n FROM documents
           WHERE lang = (SELECT lang FROM tgt)),
    nr AS (SELECT count(*) AS n FROM documents
           WHERE lang <> (SELECT lang FROM tgt)),
    ab AS (SELECT dt.token,
                  sum(CASE WHEN lab.lang = (SELECT lang FROM tgt)
                           THEN 1 ELSE 0 END) AS a,
                  sum(CASE WHEN lab.lang <> (SELECT lang FROM tgt)
                           THEN 1 ELSE 0 END) AS b
           FROM dt JOIN lab USING (doc_id) GROUP BY dt.token),
    cells AS (SELECT token, a, b,
                     a + 0.5 AS c1, b + 0.5 AS c2,
                     nt.n - a + 0.5 AS c3, nr.n - b + 0.5 AS c4
              FROM ab, nt, nr),
    sc AS (SELECT token, a, b, c1, c2, c3, c4,
                  c1 + c2 + c3 + c4 AS tot,
                  c1 + c2 AS r1, c3 + c4 AS r2,
                  c1 + c3 AS k1, c2 + c4 AS k2
           FROM cells),
    g AS (SELECT token, a, b,
                 round(2 * (c1 * ln(c1 / (r1 * k1 / tot))
                          + c2 * ln(c2 / (r1 * k2 / tot))
                          + c3 * ln(c3 / (r2 * k1 / tot))
                          + c4 * ln(c4 / (r2 * k2 / tot))), 6) AS g2,
                 round((c1 / tot) * ln(c1 / (r1 * k1 / tot))
                     + (c2 / tot) * ln(c2 / (r1 * k2 / tot))
                     + (c3 / tot) * ln(c3 / (r2 * k1 / tot))
                     + (c4 / tot) * ln(c4 / (r2 * k2 / tot)), 6) AS mi
          FROM sc)
    SELECT token, CAST(a AS BIGINT) AS n_target,
           CAST(b AS BIGINT) AS n_rest, mi, g2
    FROM g ORDER BY g2 DESC, token LIMIT 20
"""
QUERIES["keyness_docs"] = keyness_docs


def survival_users_events(sf_dir: str):
    """Kaplan–Meier user-retention curve (``ops/stats.py::
    kaplan_meier``): per-user lifetimes (first→last event) with honest
    right-censoring (a user last seen within 1 day of the corpus end
    counts as at-risk, never as a death — these streams are dense, so
    the horizon is tight); S(t) = Π(1 − d_i/n_i) over
    distinct death days.  One user-keyed fold, user-bounded duration
    table, window-``product()`` oracle multiplying in the same
    ascending order as the kernel."""
    from dedup_ray.ops.stats import kaplan_meier

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return kaplan_meier(ds, "user_id", "ts", censor_horizon_days=1)


ORACLES["survival_users_events"] = """
    WITH ul AS (SELECT user_id, min(ts) AS f, max(ts) AS l
                FROM events GROUP BY user_id),
    mx AS (SELECT max(ts) AS m FROM events),
    d AS (SELECT CAST(floor((epoch_us(l) - epoch_us(f))
                            / 86400000000.0) AS BIGINT) AS dur,
                 CASE WHEN l < m - INTERVAL 1 DAY THEN 1 ELSE 0 END
                     AS death
          FROM ul, mx),
    h AS (SELECT dur, count(*) AS n, sum(death) AS dd FROM d
          GROUP BY dur),
    w AS (SELECT dur, n, dd,
                 (SELECT count(*) FROM d)
                   - coalesce(sum(n) OVER (ORDER BY dur
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS at_risk
          FROM h),
    s AS (SELECT dur, at_risk, dd,
                 product(1.0 - CAST(dd AS DOUBLE) / at_risk)
                     OVER (ORDER BY dur) AS surv
          FROM w)
    SELECT dur AS t_days, CAST(at_risk AS BIGINT) AS at_risk,
           CAST(dd AS BIGINT) AS deaths, round(surv, 6) AS survival
    FROM s WHERE dd > 0
"""
QUERIES["survival_users_events"] = survival_users_events

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorize_events(sf_dir: str):
    """Winsorization at the exact p5/p95 (composition: the histogram-
    bisection ``exact_quantiles`` pins both cutoffs without a sort or
    sketch error, then one stateless clip pass) — the standard
    outlier-taming transform before a mean-based rollup.  Clip bounds
    are the 6-dp-rounded exact quantiles in BOTH engines."""
    from dedup_ray.stages.ordering import exact_quantiles

    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    qt = exact_quantiles(ds, "value", [WINSOR_LO, WINSOR_HI])
    vals = dict(zip((q.as_py() for q in qt["q"]),
                    (v.as_py() for v in qt["value"])))
    lo, hi = vals[WINSOR_LO], vals[WINSOR_HI]

    def clip(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t["event_id"],
            "value": t["value"],
            "wvalue": pa.array(np.round(np.clip(v, lo, hi), 6),
                               pa.float64()),
        })

    return ds.map_batches(clip, batch_format="pyarrow")


ORACLES["winsorize_events"] = f"""
    WITH s AS (SELECT value,
                      row_number() OVER (ORDER BY value) AS rn,
                      count(*) OVER () AS n
               FROM events),
    lo AS (SELECT round(value, 6) AS v FROM s
           WHERE rn = 1 + CAST(floor({WINSOR_LO!r} * (n - 1)) AS BIGINT)),
    hi AS (SELECT round(value, 6) AS v FROM s
           WHERE rn = 1 + CAST(floor({WINSOR_HI!r} * (n - 1)) AS BIGINT))
    SELECT event_id, value,
           round(least(greatest(value, lo.v), hi.v), 6) AS wvalue
    FROM events, lo, hi
"""
QUERIES["winsorize_events"] = winsorize_events

TRIGRAM_TOPK = 12


def event_trigrams_events(sf_dir: str):
    """Frequent contiguous event-type TRIGRAMS per user stream
    (sequential pattern mining, the PrefixSpan-depth-3 slice): one
    user-keyed exchange orders each stream by (ts, event_id), a
    vectorized shift pass emits trigram partials, a trigram-keyed fold
    plus a type³-bounded reduce reports the global top-{TRIGRAM_TOPK}
    by (count DESC, trigram ASC).  Oracle replays with two lead
    windows."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    tri_schema = pa.schema([("tri", pa.string()), ("c", pa.int64())])

    def per_user(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return tri_schema.empty_table()
        df = part.to_pandas().sort_values(["ts", "event_id"],
                                          kind="mergesort")
        outs = []
        for _, sub in df.groupby("user_id", sort=False):
            et = sub["event_type"].to_numpy()
            if len(et) < 3:
                continue
            tri = pd.Series(et[:-2]) + ">" + pd.Series(et[1:-1]) \
                + ">" + pd.Series(et[2:])
            outs.append(tri)
        if not outs:
            return tri_schema.empty_table()
        allt = pd.concat(outs, ignore_index=True).value_counts()
        return pa.table({"tri": pa.array(allt.index, pa.string()),
                         "c": pa.array(allt.to_numpy(), pa.int64())})

    partials = exchange_group_apply(
        ds, ["user_id"], per_user, 8,
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("ts", pa.timestamp("us")),
                                ("event_id", pa.int64()),
                                ("event_type", pa.string())]),
    )

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tri_schema.empty_table()
        df = t.to_pandas().groupby("tri", sort=True).sum().reset_index()
        df = df.sort_values(["c", "tri"], ascending=[False, True],
                            kind="mergesort").head(TRIGRAM_TOPK)
        return pa.table({"tri": pa.array(df["tri"], pa.string()),
                         "c": pa.array(df["c"], pa.int64())})

    return exchange_group_apply(
        partials, ["tri"], topk, num_partitions=1,
        empty_schema=tri_schema,
    )


ORACLES["event_trigrams_events"] = f"""
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type, 1) OVER w AS e2,
                      lead(event_type, 2) OVER w AS e3
               FROM events
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY ts, event_id)),
    tri AS (SELECT event_type || '>' || e2 || '>' || e3 AS tri
            FROM s WHERE e3 IS NOT NULL)
    SELECT tri, count(*) AS c FROM tri GROUP BY tri
    ORDER BY c DESC, tri LIMIT {TRIGRAM_TOPK}
"""
QUERIES["event_trigrams_events"] = event_trigrams_events

KANON_K, KANON_L = 5, 3


def k_anonymity_docs(sf_dir: str):
    """k-anonymity / l-diversity audit over quasi-identifiers (source,
    lang, length bucket) with the synthesized host as the sensitive
    attribute: per QI group, its size, distinct sensitive values, and
    the k≥5 / l≥3 pass flags — the privacy re-identification screen a
    release pipeline runs before publishing.  One grouped partial pass
    (per-batch distinct fold) + one narrow exchange; groups below k are
    exactly the re-identifiable rows."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lb = (t["n_chars"].to_numpy(zero_copy_only=False) // 500) * 500
        host = pc.binary_join_element_wise(
            "site", pa.array((ids % 13).astype(str)), "")
        return pa.table({
            "source": t["source"], "lang": t["lang"],
            "len_bucket": pa.array(lb, pa.int64()),
            "host": host,
        })

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["source", "lang", "len_bucket", "host"],
                       sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    out_schema = pa.schema([
        ("source", pa.string()), ("lang", pa.string()),
        ("len_bucket", pa.int64()), ("n", pa.int64()),
        ("l_distinct", pa.int64()), ("k_ok", pa.int64()),
        ("l_ok", pa.int64()),
    ])

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        df = part.to_pandas().groupby(
            ["source", "lang", "len_bucket", "host"], sort=True) \
            .sum().reset_index()
        g = df.groupby(["source", "lang", "len_bucket"], sort=True).agg(
            n=("c", "sum"), l_distinct=("host", "nunique")).reset_index()
        g["k_ok"] = (g["n"] >= KANON_K).astype(np.int64)
        g["l_ok"] = (g["l_distinct"] >= KANON_L).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return exchange_group_apply(
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow"),
        ["source", "lang", "len_bucket"], fold, 8,
        empty_schema=pa.schema([
            ("source", pa.string()), ("lang", pa.string()),
            ("len_bucket", pa.int64()), ("host", pa.string()),
            ("c", pa.int64())]),
    )


ORACLES["k_anonymity_docs"] = f"""
    WITH q AS (SELECT source, lang, (n_chars // 500) * 500 AS len_bucket,
                      'site' || (doc_id % 13)::VARCHAR AS host
               FROM documents)
    SELECT source, lang, len_bucket, count(*) AS n,
           count(DISTINCT host) AS l_distinct,
           CAST(CASE WHEN count(*) >= {KANON_K} THEN 1 ELSE 0 END
                AS BIGINT) AS k_ok,
           CAST(CASE WHEN count(DISTINCT host) >= {KANON_L}
                THEN 1 ELSE 0 END AS BIGINT) AS l_ok
    FROM q GROUP BY source, lang, len_bucket
"""
QUERIES["k_anonymity_docs"] = k_anonymity_docs

RICHCLUB_KS = (1, 2, 3, 5, 8)


def richclub_docs(sf_dir: str):
    """Rich-club coefficient φ(k) of the block-star graph: among nodes
    of degree > k, the realized fraction of possible edges — the
    'do hubs preferentially interlink' audit (link-farm detection
    signal).  One degree fold + per-k membership joins on the
    degree-filtered node set; only (k, counts) scalars reach the
    driver.  ALL k thresholds ride ONE degree-tagged edge pass — the
    per-k work is a filter, not a join, so the threshold list adds no
    exchange rounds."""
    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    edges_ds = _lpa_graph(sf_dir).map_batches(
        lambda t: t.filter(pc.not_equal(t["a"], t["b"])),
        batch_format="pyarrow").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([t["a"].combine_chunks(),
                                  t["b"].combine_chunks()])
        g = pa.table({"node": nodes}).group_by("node").aggregate(
            [([], "count_all")])
        return g.rename_columns(["node", "d"])

    def deg_fold(part: pa.Table) -> pa.Table:
        g = part.group_by("node").aggregate([("d", "sum")])
        return g.rename_columns(["node", "d"])

    deg = exchange_group_apply(
        edges_ds.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"], deg_fold, 8,
        empty_schema=pa.schema([("node", pa.int64()),
                                ("d", pa.int64())])).materialize()

    # nk per threshold: one pass over the (bounded-per-block) degree table
    def nk_partial(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(list(RICHCLUB_KS), pa.int64()),
            "n": pa.array([int((d > k).sum()) for k in RICHCLUB_KS],
                          pa.int64()),
        })

    nk_df = deg.map_batches(nk_partial, batch_format="pyarrow") \
               .to_pandas().groupby("k").sum()

    # tag each edge with BOTH endpoint degrees (two joins, once total)
    ea = exchange_join(
        edges_ds, deg.map_batches(
            lambda t: t.rename_columns(["a", "da"]),
            batch_format="pyarrow"),
        on="a", num_partitions=8,
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("da", pa.int64())]))
    eab = exchange_join(
        ea, deg.map_batches(lambda t: t.rename_columns(["b", "db"]),
                            batch_format="pyarrow"),
        on="b", num_partitions=8,
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("da", pa.int64()), ("db", pa.int64())]))

    def ek_partial(t: pa.Table) -> pa.Table:
        da = t["da"].to_numpy(zero_copy_only=False)
        db = t["db"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(list(RICHCLUB_KS), pa.int64()),
            "e": pa.array([int(((da > k) & (db > k)).sum())
                           for k in RICHCLUB_KS], pa.int64()),
        })

    ek_df = eab.map_batches(ek_partial, batch_format="pyarrow") \
               .to_pandas().groupby("k").sum()

    rows = []
    for k in RICHCLUB_KS:
        nk = int(nk_df["n"].get(k, 0))
        ek = int(ek_df["e"].get(k, 0)) if nk >= 2 else 0
        phi = round(2.0 * ek / (nk * (nk - 1)), 6) if nk >= 2 else 0.0
        rows.append((k, nk, ek, phi))
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "n_rich": pa.array([r[1] for r in rows], pa.int64()),
        "e_rich": pa.array([r[2] for r in rows], pa.int64()),
        "phi": pa.array([r[3] for r in rows], pa.float64()),
    })


ORACLES["richclub_docs"] = f"""
    WITH {_LPA_EDGES_SQL},
    deg AS (SELECT node, count(*) AS d FROM (
              SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node),
    ks AS (SELECT unnest({list(RICHCLUB_KS)!r}) AS k),
    rich AS (SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k),
    nk AS (SELECT k, count(*) AS n_rich FROM rich GROUP BY k),
    ek AS (SELECT r1.k, count(*) AS e_rich
           FROM e JOIN rich r1 ON r1.node = e.a
                  JOIN rich r2 ON r2.node = e.b AND r2.k = r1.k
           GROUP BY r1.k)
    SELECT ks.k, coalesce(nk.n_rich, 0) AS n_rich,
           CASE WHEN coalesce(nk.n_rich, 0) >= 2
                THEN coalesce(ek.e_rich, 0) ELSE 0 END AS e_rich,
           CASE WHEN coalesce(nk.n_rich, 0) >= 2
                THEN round(2.0 * coalesce(ek.e_rich, 0)
                           / (nk.n_rich * (nk.n_rich - 1)), 6)
                ELSE 0.0 END AS phi
    FROM ks LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)
"""
QUERIES["richclub_docs"] = richclub_docs

JSD_SRC_A, JSD_SRC_B = "src0", "src1"


def js_divergence_docs(sf_dir: str):
    """Jensen–Shannon divergence between two sources' token
    distributions (the symmetric, bounded drift measure a mixing
    recipe tracks between feeds): ``JSD = ½KL(P‖M) + ½KL(Q‖M)``,
    M = (P+Q)/2, MLE probabilities over the union vocabulary (zero-mass
    terms contribute exactly 0 — no smoothing needed because M > 0
    wherever P or Q is).  One (source, token) count exchange over the
    two sources, vocab-bounded reduce.  Output one row
    ``(jsd, n_a, n_b, vocab)``; nats, 6 dp."""
    from dedup_ray.stages.textstats import explode_tokens
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.or_(pc.equal(t["source"], JSD_SRC_A),
                      pc.equal(t["source"], JSD_SRC_B))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        flat, parents, n = explode_tokens(t["text"], t.num_rows)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        g = pa.table({"source": src.take(pa.array(parents)),
                      "token": flat}) \
            .group_by(["source", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "token", "c"])

    def fold(part: pa.Table) -> pa.Table:
        g = part.group_by(["source", "token"]).aggregate([("c", "sum")])
        return g.rename_columns(["source", "token", "c"])

    counts = exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], fold,
        4, empty_schema=pa.schema([("source", pa.string()),
                                   ("token", pa.string()),
                                   ("c", pa.int64())]),
    )

    out_schema = pa.schema([("jsd", pa.float64()), ("n_a", pa.int64()),
                            ("n_b", pa.int64()), ("vocab", pa.int64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        piv = df.pivot_table(index="token", columns="source", values="c",
                             aggfunc="sum", fill_value=0).sort_index()
        a = piv[JSD_SRC_A].to_numpy(np.float64) \
            if JSD_SRC_A in piv.columns else np.zeros(len(piv))
        b = piv[JSD_SRC_B].to_numpy(np.float64) \
            if JSD_SRC_B in piv.columns else np.zeros(len(piv))
        na, nb_ = a.sum(), b.sum()
        p, q = a / na, b / nb_
        m = (p + q) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            kl_p = np.where(p > 0, p * np.log(p / m), 0.0).sum()
            kl_q = np.where(q > 0, q * np.log(q / m), 0.0).sum()
        jsd = round(0.5 * kl_p + 0.5 * kl_q, 6)
        return pa.table({
            "jsd": pa.array([jsd], pa.float64()),
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb_)], pa.int64()),
            "vocab": pa.array([len(piv)], pa.int64()),
        })

    return exchange_group_apply(
        counts, ["token"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("source", pa.string()),
                                ("token", pa.string()),
                                ("c", pa.int64())]),
    )


ORACLES["js_divergence_docs"] = f"""
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS token
        FROM documents WHERE source IN ('{JSD_SRC_A}', '{JSD_SRC_B}')),
    c AS (SELECT token,
                 sum(CASE WHEN source = '{JSD_SRC_A}' THEN 1 ELSE 0 END)
                     AS ca,
                 sum(CASE WHEN source = '{JSD_SRC_B}' THEN 1 ELSE 0 END)
                     AS cb
          FROM toks GROUP BY token),
    t AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
                 CAST(sum(cb) AS DOUBLE) AS nb FROM c),
    pq AS (SELECT ca / na AS p, cb / nb AS q,
                  (ca / na + cb / nb) / 2.0 AS m
           FROM c, t),
    kl AS (SELECT sum(CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END)
                      AS klp,
                  sum(CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END)
                      AS klq
           FROM pq)
    SELECT round(0.5 * klp + 0.5 * klq, 6) AS jsd,
           CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
           (SELECT count(*) FROM c) AS vocab
    FROM kl, t
"""
QUERIES["js_divergence_docs"] = js_divergence_docs

CONF_ALPHA = 0.1


def conformal_nb_docs(sf_dir: str):
    """Split-conformal coverage over the NB classifier
    (``stages/nbayes.py::nb_true_class_prob``): nonconformity
    ``s = 1 − p_true`` on the ``doc_id %% 5 == 0`` calibration split,
    threshold = the ⌈(n+1)(1−α)⌉-th smallest calibration score (exact
    order statistic read off the 6-dp VALUE histogram — distinct-value-
    bounded, never a sort), every test doc flagged ``covered = s ≤ q̂``
    — the finite-sample coverage guarantee a model-audit reports.
    Model trained on the full table (calibration-demo convention,
    noted); α = 0.1."""
    from dedup_ray.stages.nbayes import nb_train, nb_true_class_prob
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    model = _nb_model(sf_dir, ds)
    probs = nb_true_class_prob(ds, model, "lang").materialize()

    def calib_hist(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        p = t["p_true"].to_numpy(zero_copy_only=False)
        s = np.round(1.0 - p[ids % 5 == 0], 6)
        if len(s) == 0:
            return pa.table({"s": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        g = pd.DataFrame({"s": s, "c": 1}).groupby("s", sort=False) \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def qhat_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"qhat": pa.array([], pa.float64())})
        df = t.to_pandas().groupby("s", sort=True).sum()
        n = int(df["c"].sum())
        k = min(int(np.ceil((n + 1) * (1.0 - CONF_ALPHA))), n)
        cum = df["c"].cumsum()
        qhat = float(df.index[(cum >= k).argmax()])
        return pa.table({"qhat": pa.array([qhat], pa.float64())})

    qhat = exchange_group_apply(
        probs.map_batches(calib_hist, batch_format="pyarrow"), ["s"],
        qhat_reduce, num_partitions=1,
        empty_schema=pa.schema([("s", pa.float64()), ("c", pa.int64())]),
    ).take_all()[0]["qhat"]

    def test_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        p = t["p_true"].to_numpy(zero_copy_only=False)
        keep = ids % 5 != 0
        s = np.round(1.0 - p[keep], 6)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "p_true": pa.array(p[keep], pa.float64()),
            "covered": pa.array((s <= qhat).astype(np.int64), pa.int64()),
        })

    return probs.map_batches(test_rows, batch_format="pyarrow")


ORACLES["conformal_nb_docs"] = f"""
    {TOKENS_CTE},
    {_NB_SC_CTES},
    mx AS (SELECT doc_id, max(score) AS smax FROM sc GROUP BY doc_id),
    z AS (SELECT sc.doc_id, sum(exp(sc.score - mx.smax)) AS z
          FROM sc JOIN mx USING (doc_id) GROUP BY sc.doc_id),
    st AS (SELECT sc.doc_id, sc.score FROM sc
           JOIN documents d ON d.doc_id = sc.doc_id
                           AND d.lang = sc.lang),
    pt AS (SELECT st.doc_id,
                  round(exp(st.score - mx.smax) / z.z, 6) AS p
           FROM st JOIN mx USING (doc_id) JOIN z USING (doc_id)),
    nc AS (SELECT doc_id, p, round(1.0 - p, 6) AS s FROM pt),
    cal AS (SELECT s FROM nc WHERE doc_id % 5 = 0),
    k AS (SELECT CAST(ceil((count(*) + 1) * {1.0 - CONF_ALPHA!r})
                      AS BIGINT) AS k,
                 count(*) AS n FROM cal),
    q AS (SELECT s AS qhat FROM (
            SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cal), k
          WHERE rn = least(k.k, k.n))
    SELECT nc.doc_id, nc.p AS p_true,
           CAST(CASE WHEN nc.s <= q.qhat THEN 1 ELSE 0 END AS BIGINT)
               AS covered
    FROM nc, q WHERE nc.doc_id % 5 <> 0
"""
QUERIES["conformal_nb_docs"] = conformal_nb_docs

WOE_QS = [round(0.1 * i, 1) for i in range(1, 10)]


def woe_iv_events(sf_dir: str):
    """Weight-of-evidence / information-value feature audit (the
    credit-scoring classic): event value binned at the EXACT deciles
    (histogram-bisection cutoffs, 6-dp-rounded in both engines; bin =
    # cutoffs strictly below the value), label = purchase vs rest;
    per-bin WOE = ln(p_b/q_b) with +0.5 smoothing and the IV scalar
    Σ(p_b−q_b)·WOE_b repeated per row.  One quantile pass + one
    10-cell fold."""
    from dedup_ray.stages.ordering import exact_quantiles
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    qt = exact_quantiles(ds, "value", WOE_QS)
    cuts = np.array([v.as_py() for v in qt["value"]], dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        pos = pc.equal(t["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False)
        b = (v[:, None] > cuts[None, :]).sum(axis=1).astype(np.int64)
        df = pd.DataFrame({"bin": b, "pos": pos.astype(np.int64),
                           "neg": (~pos).astype(np.int64)})
        g = df.groupby("bin", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out_schema = pa.schema([("bin", pa.int64()), ("n_pos", pa.int64()),
                            ("n_neg", pa.int64()), ("woe", pa.float64()),
                            ("iv", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("bin", sort=True).sum()
        full = df.reindex(range(10), fill_value=0)
        pos = full["pos"].to_numpy(np.float64)
        neg = full["neg"].to_numpy(np.float64)
        p = (pos + 0.5) / (pos.sum() + 5.0)
        q = (neg + 0.5) / (neg.sum() + 5.0)
        woe = np.round(np.log(p / q), 6)
        iv = round(float(((p - q) * np.log(p / q)).sum()), 6)
        return pa.table({
            "bin": pa.array(np.arange(10), pa.int64()),
            "n_pos": pa.array(pos.astype(np.int64), pa.int64()),
            "n_neg": pa.array(neg.astype(np.int64), pa.int64()),
            "woe": pa.array(woe, pa.float64()),
            "iv": pa.array([iv] * 10, pa.float64()),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["bin"],
        reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("bin", pa.int64()), ("pos", pa.int64()),
                                ("neg", pa.int64())]),
    )


ORACLES["woe_iv_events"] = f"""
    WITH s AS (SELECT value,
                      row_number() OVER (ORDER BY value) AS rn,
                      count(*) OVER () AS n
               FROM events),
    qq AS (SELECT unnest({WOE_QS!r}) AS q),
    cuts AS (SELECT round(value, 6) AS c
             FROM qq JOIN s ON s.rn = 1 + CAST(floor(q * (n - 1))
                                               AS BIGINT)),
    b AS (SELECT (SELECT count(*) FROM cuts WHERE e.value > cuts.c)
                     AS bin,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                     AS pos
          FROM events e),
    g0 AS (SELECT bin, sum(pos) AS pos, sum(1 - pos) AS neg FROM b
           GROUP BY bin),
    bins AS (SELECT unnest(range(0, 10)) AS bin),
    g AS (SELECT bins.bin, coalesce(g0.pos, 0) AS pos,
                 coalesce(g0.neg, 0) AS neg
          FROM bins LEFT JOIN g0 USING (bin)),
    tt AS (SELECT CAST(sum(pos) AS DOUBLE) AS tp,
                  CAST(sum(neg) AS DOUBLE) AS tn FROM g),
    w AS (SELECT bin, pos, neg,
                 (pos + 0.5) / (tp + 5.0) AS p,
                 (neg + 0.5) / (tn + 5.0) AS q
          FROM g, tt),
    iv AS (SELECT round(sum((p - q) * ln(p / q)), 6) AS iv FROM w)
    SELECT w.bin, CAST(w.pos AS BIGINT) AS n_pos,
           CAST(w.neg AS BIGINT) AS n_neg,
           round(ln(w.p / w.q), 6) AS woe, iv.iv
    FROM w, iv
"""
QUERIES["woe_iv_events"] = woe_iv_events

CUSUM_HOURS_US = 3_600_000_000


def cusum_events(sf_dir: str):
    """One-sided CUSUM change-point monitor over the hourly event-rate
    series per type (``S_t = max(0, S_{{t-1}} + x_t − μ − 0.5μ)``,
    flag when ``S_t > 2μ`` — the pipeline-drift alarm): the hour grid
    comes from the global [min, max] timestamps (two driver scalars),
    missing hours count 0, and the recurrence runs in identical
    operand order in the kernel and the oracle's recursive CTE, so
    flagged hours can never disagree.  One type-keyed exchange; state
    is hours-bounded."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    lo = pd.Timestamp(ds.min("ts")).value // 1000
    hi = pd.Timestamp(ds.max("ts")).value // 1000
    h0, h1 = lo // CUSUM_HOURS_US, hi // CUSUM_HOURS_US
    n_hours = int(h1 - h0 + 1)

    out_schema = pa.schema([("event_type", pa.string()),
                            ("hour", pa.int64()), ("s", pa.float64())])

    def per_type(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame({
            "et": t["event_type"].to_pylist(),
            "h": (us.to_numpy(zero_copy_only=False)
                  // CUSUM_HOURS_US) - h0,
        })
        ets, hours, svals = [], [], []
        for et, sub in df.groupby("et", sort=True):
            x = np.bincount(sub["h"].to_numpy(), minlength=n_hours) \
                .astype(np.float64)
            mu = x.sum() / n_hours
            kk, hthr = 0.5 * mu, 2.0 * mu
            s = 0.0
            for h in range(n_hours):
                s = max(0.0, s + x[h] - mu - kk)
                if s > hthr:
                    ets.append(et)
                    hours.append(int(h0 + h))
                    svals.append(round(s, 6))
        return pa.table({"event_type": pa.array(ets, pa.string()),
                         "hour": pa.array(hours, pa.int64()),
                         "s": pa.array(svals, pa.float64())})

    sch = pa.schema([("event_type", pa.string()),
                     ("ts", pa.timestamp("us"))])
    return exchange_group_apply(ds, ["event_type"], per_type, 4,
                                empty_schema=sch)


ORACLES["cusum_events"] = f"""
    WITH RECURSIVE bounds AS (
        SELECT epoch_us(min(ts)) // {CUSUM_HOURS_US} AS h0,
               epoch_us(max(ts)) // {CUSUM_HOURS_US} AS h1
        FROM events),
    hours AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                  AS h
              FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (SELECT event_type,
                   epoch_us(ts) // {CUSUM_HOURS_US}
                     - (SELECT h0 FROM bounds) AS h,
                   count(*) AS c
            FROM events GROUP BY event_type, h),
    grid AS (SELECT t.event_type, hours.h,
                    CAST(coalesce(cnt.c, 0) AS DOUBLE) AS x
             FROM types t CROSS JOIN hours
             LEFT JOIN cnt ON cnt.event_type = t.event_type
                          AND cnt.h = hours.h),
    mu AS (SELECT event_type,
                  sum(x) / (SELECT CAST(h1 - h0 + 1 AS DOUBLE)
                            FROM bounds) AS mu
           FROM grid GROUP BY event_type),
    rec(event_type, h, s) AS (
        SELECT g.event_type, g.h,
               greatest(0.0, 0.0 + g.x - mu.mu - 0.5 * mu.mu)
        FROM grid g JOIN mu USING (event_type) WHERE g.h = 0
        UNION ALL
        SELECT g.event_type, g.h,
               greatest(0.0, r.s + g.x - mu.mu - 0.5 * mu.mu)
        FROM rec r
        JOIN grid g ON g.event_type = r.event_type AND g.h = r.h + 1
        JOIN mu ON mu.event_type = g.event_type)
    SELECT r.event_type,
           CAST(r.h + (SELECT h0 FROM bounds) AS BIGINT) AS hour,
           round(r.s, 6) AS s
    FROM rec r JOIN mu ON mu.event_type = r.event_type
    WHERE r.s > 2.0 * mu.mu
"""
QUERIES["cusum_events"] = cusum_events


def isotonic_nb_docs(sf_dir: str):
    """Isotonic calibration of the NB confidence (``ops/stats.py::
    isotonic_calibration``): the PAVA fit computed by the MINIMAX
    closed form — ``ŷ_i = max_{{j≤i}} min_{{k≥i}} avg(y over j..k)`` —
    because two windowed scans over the distinct-score-bounded table
    replay exactly in SQL where PAVA's data-dependent pooling loop
    could not.  The monotone companion of the binned calibration
    diagram: per distinct confidence, the raw and isotonically-
    calibrated accuracy."""
    from dedup_ray.ops.stats import isotonic_calibration
    from dedup_ray.stages.nbayes import nb_score, nb_train

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    model = _nb_model(sf_dir, ds)
    scored = nb_score(ds, model, out_col="nb_lang", with_prob=True,
                      keep_cols=("lang",))

    def xy(t: pa.Table) -> pa.Table:
        ok = pc.equal(t["nb_lang"], t["lang"])
        return pa.table({
            "x": t["nb_prob"],
            "y": pa.array(ok.to_numpy(zero_copy_only=False)
                          .astype(np.float64), pa.float64()),
        })

    return isotonic_calibration(
        scored.map_batches(xy, batch_format="pyarrow"), "x", "y")


ORACLES["isotonic_nb_docs"] = f"""
    {TOKENS_CTE},
    {_NB_SC_CTES},
    mx AS (SELECT doc_id, max(score) AS smax FROM sc GROUP BY doc_id),
    z AS (SELECT sc.doc_id, sum(exp(sc.score - mx.smax)) AS z
          FROM sc JOIN mx USING (doc_id) GROUP BY sc.doc_id),
    best AS (SELECT doc_id, lang AS pred FROM (
               SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score DESC, lang) AS rk
               FROM sc) WHERE rk = 1),
    pr AS (SELECT z.doc_id, round(1.0 / z.z, 6) AS x,
                  CASE WHEN best.pred = d.lang THEN 1.0 ELSE 0.0 END AS y
           FROM z JOIN best USING (doc_id)
           JOIN documents d ON d.doc_id = z.doc_id),
    h AS (SELECT x, count(*) AS w, sum(y) AS sy FROM pr GROUP BY x),
    o AS (SELECT x, w, sy, row_number() OVER (ORDER BY x) AS i,
                 sum(w) OVER (ORDER BY x) AS cw,
                 sum(sy) OVER (ORDER BY x) AS cy
          FROM h),
    a AS (SELECT j.i AS j, k.i AS k,
                 (k.cy - (j.cy - j.sy)) / (k.cw - (j.cw - j.w)) AS avg
          FROM o j JOIN o k ON j.i <= k.i),
    m AS (SELECT j, k AS i,
                 min(avg) OVER (PARTITION BY j ORDER BY k DESC
                                ROWS UNBOUNDED PRECEDING) AS mn
          FROM a),
    iso AS (SELECT i, max(mn) AS iso FROM m GROUP BY i)
    SELECT o.x, CAST(o.w AS BIGINT) AS n,
           round(o.sy / o.w, 6) AS rate,
           round(iso.iso, 6) AS iso
    FROM o JOIN iso ON iso.i = o.i
"""
QUERIES["isotonic_nb_docs"] = isotonic_nb_docs


def source_jaccard_docs(sf_dir: str):
    """Pairwise VOCABULARY Jaccard between all sources: |V_a ∩ V_b| /
    |V_a ∪ V_b| over distinct token sets — the source-similarity
    matrix a mixing recipe consults before merging feeds.  One
    token-keyed exchange reduces each token to its source membership
    list; per-token pair increments fold into the sources²-bounded
    matrix (never enumerated per doc).  Output: ``(s1, s2, n_inter,
    n_union, jaccard)`` for s1 < s2."""
    from dedup_ray.stages.textstats import explode_tokens
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        flat, parents, n = explode_tokens(t["text"], t.num_rows)
        src = t["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        df = pd.DataFrame({
            "token": flat.to_pylist(),
            "source": src.take(pa.array(parents)).to_pylist(),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pair_schema = pa.schema([("s1", pa.string()), ("s2", pa.string()),
                             ("inter", pa.int64())])
    size_schema = pa.schema([("s", pa.string()), ("v", pa.int64())])

    def per_token(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"s1": pa.array([], pa.string()),
                             "s2": pa.array([], pa.string()),
                             "inter": pa.array([], pa.int64())})
        df = pd.DataFrame({"token": part["token"].to_pylist(),
                           "source": part["source"].to_pylist()}) \
            .drop_duplicates()
        inter: dict = {}
        vocab: dict = {}
        for _, sub in df.groupby("token", sort=False):
            ss = sorted(sub["source"].unique())
            for i, a in enumerate(ss):
                vocab[a] = vocab.get(a, 0) + 1
                for b in ss[i + 1:]:
                    inter[(a, b)] = inter.get((a, b), 0) + 1
        keys = sorted(inter)
        return pa.table({
            "s1": pa.array([k[0] for k in keys]
                           + [s for s in sorted(vocab)], pa.string()),
            "s2": pa.array([k[1] for k in keys]
                           + ["" for _ in vocab], pa.string()),
            "inter": pa.array([inter[k] for k in keys]
                              + [vocab[s] for s in sorted(vocab)],
                              pa.int64()),
        })

    partials = exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"],
        per_token, 8,
        empty_schema=pa.schema([("token", pa.string()),
                                ("source", pa.string())]),
    )

    out_schema = pa.schema([("s1", pa.string()), ("s2", pa.string()),
                            ("n_inter", pa.int64()),
                            ("n_union", pa.int64()),
                            ("jaccard", pa.float64())])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby(["s1", "s2"], sort=True).sum() \
            .reset_index()
        sizes = df[df["s2"] == ""].set_index("s1")["inter"]
        pairs = df[df["s2"] != ""]
        n_int = pairs["inter"].to_numpy(np.int64)
        v1 = sizes.reindex(pairs["s1"]).to_numpy(np.int64)
        v2 = sizes.reindex(pairs["s2"]).to_numpy(np.int64)
        uni = v1 + v2 - n_int
        return pa.table({
            "s1": pa.array(pairs["s1"], pa.string()),
            "s2": pa.array(pairs["s2"], pa.string()),
            "n_inter": pa.array(n_int, pa.int64()),
            "n_union": pa.array(uni, pa.int64()),
            "jaccard": pa.array(
                np.round(n_int / uni.astype(np.float64), 6),
                pa.float64()),
        })

    return exchange_group_apply(
        partials, ["s1", "s2"], fold, num_partitions=1,
        empty_schema=pair_schema,
    )


ORACLES["source_jaccard_docs"] = """
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS token
        FROM documents),
    st AS (SELECT DISTINCT source, token FROM toks),
    sizes AS (SELECT source, count(*) AS v FROM st GROUP BY source),
    inter AS (SELECT a.source AS s1, b.source AS s2, count(*) AS n_inter
              FROM st a JOIN st b
                ON a.token = b.token AND a.source < b.source
              GROUP BY a.source, b.source)
    SELECT i.s1, i.s2, i.n_inter,
           za.v + zb.v - i.n_inter AS n_union,
           round(i.n_inter
                 / CAST(za.v + zb.v - i.n_inter AS DOUBLE), 6)
               AS jaccard
    FROM inter i JOIN sizes za ON za.source = i.s1
                 JOIN sizes zb ON zb.source = i.s2
"""
QUERIES["source_jaccard_docs"] = source_jaccard_docs

CCF_A, CCF_B, CCF_MAXLAG = "click", "purchase", 3


def ccf_events(sf_dir: str):
    """Cross-correlation function between the hourly 'click' and
    'purchase' rate series at lags −3..+3 (the lead–lag detector:
    positive-lag peaks mean clicks LEAD purchases): hour grid from the
    global [min, max] (two driver scalars, missing hours zero), counts
    fold through one narrow (type, hour) exchange, and the hours-
    bounded pair of series reaches a single reduce.  ``ccf_k =
    Σ(x_t−x̄)(y_{{t+k}}−ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²)`` with full-series
    means (the standard estimator).  Output ``(lag, ccf)``."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    lo = pd.Timestamp(ds.min("ts")).value // 1000
    hi = pd.Timestamp(ds.max("ts")).value // 1000
    h0 = lo // CUSUM_HOURS_US
    n_hours = int(hi // CUSUM_HOURS_US - h0 + 1)

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.or_(pc.equal(t["event_type"], CCF_A),
                      pc.equal(t["event_type"], CCF_B))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({"et": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame({
            "et": t["event_type"].to_pylist(),
            "h": (us.to_numpy(zero_copy_only=False)
                  // CUSUM_HOURS_US) - h0,
            "c": 1,
        }).groupby(["et", "h"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    out_schema = pa.schema([("lag", pa.int64()), ("ccf", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby(["et", "h"], sort=True).sum() \
            .reset_index()
        x = np.zeros(n_hours)
        y = np.zeros(n_hours)
        for _, r in df.iterrows():
            (x if r["et"] == CCF_A else y)[int(r["h"])] = r["c"]
        dx = x - x.sum() / n_hours
        dy = y - y.sum() / n_hours
        den = np.sqrt(float(dx @ dx) * float(dy @ dy))
        if den == 0:
            return out_schema.empty_table()
        lags, vals = [], []
        for k in range(-CCF_MAXLAG, CCF_MAXLAG + 1):
            if k >= 0:
                num = float(dx[:n_hours - k] @ dy[k:]) if k else \
                    float(dx @ dy)
            else:
                num = float(dx[-k:] @ dy[:n_hours + k])
            lags.append(k)
            vals.append(round(num / den, 6))
        return pa.table({"lag": pa.array(lags, pa.int64()),
                         "ccf": pa.array(vals, pa.float64())})

    counts = exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["et"],
        lambda t: t, 2,
        empty_schema=pa.schema([("et", pa.string()), ("h", pa.int64()),
                                ("c", pa.int64())]),
    )
    return exchange_group_apply(
        counts, ["et"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("et", pa.string()), ("h", pa.int64()),
                                ("c", pa.int64())]),
    )


ORACLES["ccf_events"] = f"""
    WITH bounds AS (
        SELECT epoch_us(min(ts)) // {CUSUM_HOURS_US} AS h0,
               epoch_us(max(ts)) // {CUSUM_HOURS_US} AS h1
        FROM events),
    hours AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT))) AS h,
                     CAST(h1 - h0 + 1 AS DOUBLE) AS nh
              FROM bounds),
    cnt AS (SELECT event_type,
                   epoch_us(ts) // {CUSUM_HOURS_US}
                     - (SELECT h0 FROM bounds) AS h,
                   count(*) AS c
            FROM events WHERE event_type IN ('{CCF_A}', '{CCF_B}')
            GROUP BY event_type, h),
    g AS (SELECT hours.h, hours.nh,
                 CAST(coalesce(cx.c, 0) AS DOUBLE) AS x,
                 CAST(coalesce(cy.c, 0) AS DOUBLE) AS y
          FROM hours
          LEFT JOIN cnt cx ON cx.event_type = '{CCF_A}'
                          AND cx.h = hours.h
          LEFT JOIN cnt cy ON cy.event_type = '{CCF_B}'
                          AND cy.h = hours.h),
    mm AS (SELECT sum(x) / any_value(nh) AS mx,
                  sum(y) / any_value(nh) AS my FROM g),
    d AS (SELECT h, x - mm.mx AS dx, y - mm.my AS dy FROM g, mm),
    den AS (SELECT sqrt(sum(dx * dx) * (SELECT sum(dy * dy) FROM d))
                AS den
            FROM d),
    lags AS (SELECT unnest(range(-{CCF_MAXLAG}, {CCF_MAXLAG + 1}))
                 AS lag),
    num AS (SELECT lags.lag, sum(a.dx * b.dy) AS num
            FROM lags JOIN d a ON true
            JOIN d b ON b.h = a.h + lags.lag
            GROUP BY lags.lag)
    SELECT num.lag, round(num.num / den.den, 6) AS ccf
    FROM num, den
"""
QUERIES["ccf_events"] = ccf_events

# punct_ratio is constant 0 on this corpus: zero variance makes corr
# undefined (SQL NULL, kernel guard) — excluded from the matrix
QCORR_COLS = ["n_chars", "n_tokens", "avg_token_len", "stopword_ratio"]


def quality_corr_docs(sf_dir: str):
    """Quality-signal redundancy audit (``ops/stats.py::
    correlation_matrix``): the pairwise Pearson matrix over the five
    per-doc quality metrics from ONE pass of moment partials — two
    signals correlating near 1 are one signal, the check a curation
    recipe runs before weighting its filters (the four varying
    metrics; punct_ratio is constant on this corpus).  Metrics come
    from the same ``quality_stats`` kernel the text_quality entry
    verifies."""
    from dedup_ray.ops.stats import correlation_matrix
    from dedup_ray.stages.textstats import quality_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    q = as_arrow(quality_stats(ds))
    return correlation_matrix(q, QCORR_COLS)


def _quality_corr_oracle() -> str:
    base = ORACLES["text_quality"]
    pairs = []
    for i in range(len(QCORR_COLS)):
        for j in range(i + 1, len(QCORR_COLS)):
            a, b = QCORR_COLS[i], QCORR_COLS[j]
            pairs.append(
                f"SELECT '{a}' AS m1, '{b}' AS m2, "
                f"round(corr({a}, {b}), 6) AS corr FROM q"
            )
    return f"WITH q AS ({base}) " + " UNION ALL ".join(pairs)


ORACLES["quality_corr_docs"] = _quality_corr_oracle()
QUERIES["quality_corr_docs"] = quality_corr_docs


def youden_threshold_embeddings(sf_dir: str):
    """Youden-J optimal threshold selection (the standard cutoff choice
    after an ROC audit — same score/label convention as the
    ``auc_embeddings`` entry): over DISTINCT scores as candidate
    thresholds (predict positive when score ≥ t), maximize
    ``J = TPR − FPR``; ties at 6 dp resolve to the smallest threshold.
    One (score, label) histogram exchange, distinct-score-bounded
    reduce with a descending cumsum — no global sort of rows."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        score = np.asarray(
            pc.list_element(emb, 0).to_numpy(zero_copy_only=False),
            dtype=np.float64)
        lab = (t["label"].to_numpy(zero_copy_only=False) % 2 == 0) \
            .astype(np.int64)
        df = pd.DataFrame({"score": score, "pos": lab,
                           "neg": 1 - lab})
        g = df.groupby("score", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out_schema = pa.schema([("threshold", pa.float64()),
                            ("tpr", pa.float64()), ("fpr", pa.float64()),
                            ("j", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("score", sort=True).sum() \
            .sort_index(ascending=False)
        pos, neg = float(df["pos"].sum()), float(df["neg"].sum())
        if pos == 0 or neg == 0:
            return out_schema.empty_table()
        tpr = df["pos"].cumsum().to_numpy(np.float64) / pos
        fpr = df["neg"].cumsum().to_numpy(np.float64) / neg
        j = np.round(tpr - fpr, 6)
        # max J, tie -> smallest threshold (last index in desc order)
        best = len(j) - 1 - int(np.argmax(j[::-1]))
        return pa.table({
            "threshold": pa.array([round(float(df.index[best]), 6)],
                                  pa.float64()),
            "tpr": pa.array([round(float(tpr[best]), 6)], pa.float64()),
            "fpr": pa.array([round(float(fpr[best]), 6)], pa.float64()),
            "j": pa.array([float(j[best])], pa.float64()),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["score"],
        reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("score", pa.float64()),
                                ("pos", pa.int64()),
                                ("neg", pa.int64())]),
    )


ORACLES["youden_threshold_embeddings"] = """
    WITH d AS (SELECT CAST(embedding[1] AS DOUBLE) AS score,
                      CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS lab
               FROM embeddings),
    h AS (SELECT score, sum(lab) AS pos, sum(1 - lab) AS neg FROM d
          GROUP BY score),
    t AS (SELECT CAST(sum(pos) AS DOUBLE) AS tp,
                 CAST(sum(neg) AS DOUBLE) AS tn FROM h),
    c AS (SELECT score,
                 sum(pos) OVER (ORDER BY score DESC) / t.tp AS tpr,
                 sum(neg) OVER (ORDER BY score DESC) / t.tn AS fpr
          FROM h, t),
    j AS (SELECT score, tpr, fpr, round(tpr - fpr, 6) AS j FROM c)
    SELECT round(score, 6) AS threshold, round(tpr, 6) AS tpr,
           round(fpr, 6) AS fpr, j
    FROM j ORDER BY j DESC, score ASC LIMIT 1
"""
QUERIES["youden_threshold_embeddings"] = youden_threshold_embeddings

SCURVE_CONFIGS = [(8, 16), (16, 8), (32, 4), (64, 2)]
SCURVE_TS = [round(0.1 * i, 1) for i in range(1, 10)]


def lsh_scurve_plan(sf_dir: str):
    """LSH band-planner S-curve table: for each (bands b, rows r)
    config splitting the same 128-perm signature and each Jaccard
    level t, the candidate-catch probability ``1 − (1 − t^r)^b`` — the
    closed form behind the flagship's banding choice (pick the config
    whose inflection brackets the dedup threshold).  Pure per-row
    math, zero shuffles; the oracle replays the identical double
    expression, so this tuning table ships as oracle-checked data
    rather than narrative."""
    rows = []
    for b, r in SCURVE_CONFIGS:
        for t in SCURVE_TS:
            rows.append((b, r, t,
                         round(1.0 - (1.0 - t ** r) ** b, 6)))
    return pa.table({
        "bands": pa.array([x[0] for x in rows], pa.int64()),
        "rows_per_band": pa.array([x[1] for x in rows], pa.int64()),
        "t": pa.array([x[2] for x in rows], pa.float64()),
        "p_candidate": pa.array([x[3] for x in rows], pa.float64()),
    })


ORACLES["lsh_scurve_plan"] = f"""
    WITH cfg AS (SELECT unnest({[c[0] for c in SCURVE_CONFIGS]!r})
                     AS bands,
                 unnest({[c[1] for c in SCURVE_CONFIGS]!r})
                     AS rows_per_band),
    ts AS (SELECT unnest({SCURVE_TS!r}) AS t)
    SELECT cfg.bands, cfg.rows_per_band, ts.t,
           round(1.0 - pow(1.0 - pow(ts.t, cfg.rows_per_band),
                           cfg.bands), 6) AS p_candidate
    FROM cfg CROSS JOIN ts
"""
QUERIES["lsh_scurve_plan"] = lsh_scurve_plan

EXPLAIN_TOPK = 3


def explain_pairs_docs(sf_dir: str):
    """Dup-pair EXPLANATIONS: for every near-dup candidate pair (the
    ngram_jaccard_pairs set), the top-3 most DISTINCTIVE shared
    3-gram shingles — shared evidence ranked by ascending corpus
    document frequency, the 'why did these two match' review surface a
    dedup audit ships beside the pair list.  Pipeline: pair set ⋈
    grams(id1) → composite-key semi join against grams(id2) (the
    multi-key exchange) → df join → per-pair top-3.  Output:
    ``(id1, id2, gram, df)``."""
    from dedup_ray.stages.textstats import explode_tokens
    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    pairs = as_arrow(ngram_jaccard_pairs(sf_dir)).map_batches(
        lambda t: t.select(["id1", "id2"]), batch_format="pyarrow")

    def grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, parents, n = explode_tokens(t["text"], t.num_rows)
        toks = flat.to_pylist()
        starts = np.zeros(len(n) + 1, np.int64)
        np.cumsum(n, out=starts[1:])
        out_id, out_g = [], []
        idl = ids.to_pylist()
        for row in range(t.num_rows):
            tt = toks[starts[row]:starts[row + 1]]
            seen = {" ".join(tt[i:i + 3]) for i in range(len(tt) - 2)}
            out_id.extend([idl[row]] * len(seen))
            out_g.extend(sorted(seen))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "gram": pa.array(out_g, pa.string())})

    G = ds.map_batches(grams, batch_format="pyarrow").materialize()

    def df_fold(part: pa.Table) -> pa.Table:
        g = part.group_by("gram").aggregate([([], "count_all")])
        return g.rename_columns(["gram", "df"])

    DF = exchange_group_apply(
        G, ["gram"], df_fold, 8,
        empty_schema=pa.schema([("doc_id", pa.int64()),
                                ("gram", pa.string())]))

    j1 = exchange_join(
        pairs, G.map_batches(lambda t: t.rename_columns(["id1", "gram"]),
                             batch_format="pyarrow"),
        on="id1", num_partitions=8,
        empty_schema=pa.schema([("id1", pa.int64()), ("id2", pa.int64()),
                                ("gram", pa.string())]))
    shared = exchange_join(
        j1, G.map_batches(lambda t: t.rename_columns(["id2", "gram"]),
                          batch_format="pyarrow"),
        on=["id2", "gram"], how="semi", num_partitions=8,
        empty_schema=pa.schema([("id1", pa.int64()), ("id2", pa.int64()),
                                ("gram", pa.string())]))
    with_df = exchange_join(
        shared, DF, on="gram", num_partitions=8,
        empty_schema=pa.schema([("id1", pa.int64()), ("id2", pa.int64()),
                                ("gram", pa.string()),
                                ("df", pa.int64())]))

    out_schema = pa.schema([("id1", pa.int64()), ("id2", pa.int64()),
                            ("gram", pa.string()), ("df", pa.int64())])

    def topk(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        df = part.to_pandas().sort_values(["id1", "id2", "df", "gram"],
                                          kind="mergesort")
        df = df.groupby(["id1", "id2"], sort=False).head(EXPLAIN_TOPK)
        return pa.Table.from_pandas(
            df[["id1", "id2", "gram", "df"]], preserve_index=False)

    return exchange_group_apply(
        with_df, ["id1", "id2"], topk, 8, empty_schema=out_schema)


ORACLES["explain_pairs_docs"] = """
    WITH tl AS (SELECT doc_id, source,
                       list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS t
                FROM documents),
    g0 AS (SELECT doc_id, source, unnest(
             CASE WHEN len(t) >= 3 THEN list_transform(
                    range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
                  ELSE [] END) AS gram
           FROM tl),
    g AS (SELECT DISTINCT doc_id, source, gram FROM g0),
    sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
              FROM g a JOIN g b ON a.gram = b.gram
                                AND a.source = b.source
                                AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    pairs AS (SELECT id1, id2 FROM inter
              JOIN sz a ON a.doc_id = id1
              JOIN sz b ON b.doc_id = id2
              WHERE i * 1.0 / (a.n + b.n - i) >= 0.05),
    dfreq AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
    shared AS (SELECT p.id1, p.id2, ga.gram
               FROM pairs p
               JOIN g ga ON ga.doc_id = p.id1
               JOIN g gb ON gb.doc_id = p.id2 AND gb.gram = ga.gram),
    ranked AS (SELECT s.id1, s.id2, s.gram, dfreq.df,
                      row_number() OVER (PARTITION BY s.id1, s.id2
                                         ORDER BY dfreq.df, s.gram)
                          AS rk
               FROM shared s JOIN dfreq ON dfreq.gram = s.gram)
    SELECT id1, id2, gram, CAST(df AS BIGINT) AS df
    FROM ranked WHERE rk <= 3
"""
QUERIES["explain_pairs_docs"] = explain_pairs_docs

PPMI_DIMS = 4


def ppmi_vectors_docs(sf_dir: str):
    """Count-based word vectors: PPMI over the adjacent-token
    co-occurrence counts (symmetric window 1), projected to 4 dims with
    md5-parity Rademacher signs keyed by the CONTEXT token — the
    classic pre-neural embedding (PPMI + random projection stands in
    for the SVD step, deterministic and exactly SQL-replayable).
    Corpus work is the same pair-count exchange TextRank uses; the
    vocab²-bounded PPMI table reaches one reduce.  Output:
    ``(token, j, y)``, j 1-based, 6 dp."""
    import hashlib

    from dedup_ray.stages.textstats import explode_tokens
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        flat, parents, n = explode_tokens(t["text"], t.num_rows)
        toks = np.asarray(flat.to_pylist(), dtype=object)
        par = np.asarray(parents, dtype=np.int64)
        if len(toks) < 2:
            return pa.table({"w": pa.array([], pa.string()),
                             "c": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        adj = par[1:] == par[:-1]
        x, y = toks[:-1][adj], toks[1:][adj]
        df = pd.DataFrame({"w": np.concatenate([x, y]),
                           "c": np.concatenate([y, x])})
        g = df.groupby(["w", "c"], sort=False).size() \
              .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(part: pa.Table) -> pa.Table:
        g = part.group_by(["w", "c"]).aggregate([("n", "sum")])
        return g.rename_columns(["w", "c", "n"])

    edges = exchange_group_apply(
        ds.map_batches(pairs, batch_format="pyarrow"), ["w", "c"], fold,
        8, empty_schema=pa.schema([("w", pa.string()), ("c", pa.string()),
                                   ("n", pa.int64())]),
    )

    out_schema = pa.schema([("token", pa.string()), ("j", pa.int64()),
                            ("y", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby(["w", "c"], sort=True).sum() \
            .reset_index()
        tot = float(df["n"].sum())
        nw = df.groupby("w")["n"].sum()
        nc = df.groupby("c")["n"].sum()
        pmi = np.log(df["n"].to_numpy(np.float64) * tot
                     / (nw.reindex(df["w"]).to_numpy(np.float64)
                        * nc.reindex(df["c"]).to_numpy(np.float64)))
        ppmi = np.maximum(pmi, 0.0)
        ctx = df["c"].to_numpy()
        signs = np.empty((len(df), PPMI_DIMS))
        uniq_ctx = sorted(set(ctx))
        smap = {}
        for cx in uniq_ctx:
            smap[cx] = [
                1.0 if int(hashlib.md5(f"{cx}:{j}".encode())
                           .hexdigest()[0], 16) % 2 == 0 else -1.0
                for j in range(1, PPMI_DIMS + 1)]
        for j in range(PPMI_DIMS):
            signs[:, j] = [smap[cx][j] for cx in ctx]
        contrib = ppmi[:, None] * signs / np.sqrt(float(PPMI_DIMS))
        out = pd.DataFrame(contrib,
                           columns=[f"d{j}" for j in range(PPMI_DIMS)])
        out["token"] = df["w"].to_numpy()
        agg = out.groupby("token", sort=True).sum()
        toks_out, js, ys = [], [], []
        for tok, row in agg.iterrows():
            for j in range(PPMI_DIMS):
                toks_out.append(tok)
                js.append(j + 1)
                ys.append(round(float(row[f"d{j}"]), 6))
        return pa.table({"token": pa.array(toks_out, pa.string()),
                         "j": pa.array(js, pa.int64()),
                         "y": pa.array(ys, pa.float64())})

    return exchange_group_apply(
        edges, ["w"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("w", pa.string()), ("c", pa.string()),
                                ("n", pa.int64())]),
    )


ORACLES["ppmi_vectors_docs"] = """
    WITH tl AS (SELECT list_filter(string_split(coalesce(text, ''), ' '),
                                   x -> x <> '') AS t
                FROM documents),
    bp AS (SELECT unnest(list_transform(range(1, len(t)),
                                        i -> t[i] || '|' || t[i + 1]))
               AS p
           FROM tl WHERE len(t) >= 2),
    e AS (SELECT string_split(p, '|')[1] AS w,
                 string_split(p, '|')[2] AS c, count(*) AS n
          FROM bp GROUP BY 1, 2),
    und AS (SELECT w, c, CAST(sum(n) AS DOUBLE) AS n FROM (
              SELECT w, c, n FROM e UNION ALL SELECT c, w, n FROM e)
            GROUP BY w, c),
    tot AS (SELECT sum(n) AS tot FROM und),
    mw AS (SELECT w, sum(n) AS nw FROM und GROUP BY w),
    mc AS (SELECT c, sum(n) AS nc FROM und GROUP BY c),
    ppmi AS (SELECT und.w, und.c,
                    greatest(ln(und.n * tot.tot / (mw.nw * mc.nc)), 0.0)
                        AS v
             FROM und JOIN mw USING (w) JOIN mc USING (c), tot),
    dims AS (SELECT unnest(range(1, 5)) AS j),
    sg AS (SELECT c, dims.j,
                  CASE WHEN strpos('02468ace',
                                   substr(md5(c || ':' || dims.j), 1, 1))
                            > 0
                       THEN 1.0 ELSE -1.0 END AS sgn
           FROM (SELECT DISTINCT c FROM und) CROSS JOIN dims)
    SELECT ppmi.w AS token, sg.j,
           round(sum(ppmi.v * sg.sgn) / sqrt(4.0), 6) AS y
    FROM ppmi JOIN sg ON sg.c = ppmi.c
    GROUP BY ppmi.w, sg.j
"""
QUERIES["ppmi_vectors_docs"] = ppmi_vectors_docs


def classifier_agreement_docs(sf_dir: str):
    """Inter-classifier agreement audit: Cohen's κ between the NB
    classifier and the stopword lang-id heuristic (chance-corrected
    label agreement over the 5×5 table) plus McNemar's test of their
    CORRECTNESS against the true lang (discordant counts b, c and
    ``(b−c)²/(b+c)``) — the standard pair of statistics for 'are these
    two labelers interchangeable, and is one actually better'.  Three
    label streams join doc-aligned; only the classes²-bounded
    contingency reaches the reduce."""
    from dedup_ray.stages.nbayes import nb_score, nb_train
    from dedup_ray.stages.textstats import lang_id
    from dedup_ray.util.exchange import exchange_group_apply, exchange_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    model = _nb_model(sf_dir, ds)
    nb = nb_score(ds, model, out_col="nb_lang", keep_cols=("lang",)) \
        .map_batches(lambda t: t.select(["doc_id", "nb_lang", "lang"]),
                     batch_format="pyarrow")
    li = as_arrow(lang_id(ds, concurrency=2)).map_batches(
        lambda t: t.select(["doc_id", "lang_pred"]),
        batch_format="pyarrow")
    joined = exchange_join(
        nb, li, on="doc_id", num_partitions=8,
        empty_schema=pa.schema([("doc_id", pa.int64()),
                                ("nb_lang", pa.string()),
                                ("lang", pa.string()),
                                ("lang_pred", pa.string())]))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": t["nb_lang"].to_pylist(),
            "b": t["lang_pred"].to_pylist(),
            "y": t["lang"].to_pylist(),
        })
        g = df.groupby(["a", "b"], sort=False).size() \
            .reset_index(name="c")
        ok = pd.DataFrame({
            "a": "", "b": "",
            "nb_ok": (df["a"] == df["y"]).astype(int),
            "li_ok": (df["b"] == df["y"]).astype(int),
        })
        g2 = ok.groupby(["nb_ok", "li_ok"], sort=False).size() \
            .reset_index(name="c")
        g["nb_ok"] = -1
        g["li_ok"] = -1
        g2["a"] = ""
        g2["b"] = ""
        return pa.Table.from_pandas(
            pd.concat([g[["a", "b", "nb_ok", "li_ok", "c"]],
                       g2[["a", "b", "nb_ok", "li_ok", "c"]]],
                      ignore_index=True), preserve_index=False)

    out_schema = pa.schema([
        ("kappa", pa.float64()), ("po", pa.float64()),
        ("pe", pa.float64()), ("mcnemar_b", pa.int64()),
        ("mcnemar_c", pa.int64()), ("mcnemar_chi2", pa.float64()),
        ("n", pa.int64()),
    ])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby(["a", "b", "nb_ok", "li_ok"],
                                   sort=True).sum().reset_index()
        lab = df[df["nb_ok"] == -1]
        n = float(lab["c"].sum())
        po = float(lab.loc[lab["a"] == lab["b"], "c"].sum()) / n
        ra = lab.groupby("a")["c"].sum()
        cb = lab.groupby("b")["c"].sum()
        langs = sorted(set(ra.index) | set(cb.index))
        pe = float(sum((ra.get(l, 0) / n) * (cb.get(l, 0) / n)
                       for l in langs))
        kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else 0.0
        okd = df[df["nb_ok"] != -1]
        b = int(okd.loc[(okd["nb_ok"] == 1) & (okd["li_ok"] == 0),
                        "c"].sum())
        c = int(okd.loc[(okd["nb_ok"] == 0) & (okd["li_ok"] == 1),
                        "c"].sum())
        chi2 = round((b - c) ** 2 / (b + c), 6) if b + c else 0.0
        return pa.table({
            "kappa": pa.array([round(kappa, 6)], pa.float64()),
            "po": pa.array([round(po, 6)], pa.float64()),
            "pe": pa.array([round(pe, 6)], pa.float64()),
            "mcnemar_b": pa.array([b], pa.int64()),
            "mcnemar_c": pa.array([c], pa.int64()),
            "mcnemar_chi2": pa.array([chi2], pa.float64()),
            "n": pa.array([int(n)], pa.int64()),
        })

    return exchange_group_apply(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["a", "b"], reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                                ("nb_ok", pa.int64()),
                                ("li_ok", pa.int64()),
                                ("c", pa.int64())]),
    )


def _classifier_agreement_oracle() -> str:
    li = _lang_id_oracle()
    return f"""
    {TOKENS_CTE},
    {_NB_SC_CTES},
    nbp AS (SELECT doc_id, lang AS nb_lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, lang) AS rk
              FROM sc) WHERE rk = 1),
    lip AS (SELECT * FROM ({li}) t),
    j AS (SELECT nbp.doc_id, nbp.nb_lang AS a, lip.lang_pred AS b,
                 d.lang AS y
          FROM nbp JOIN lip USING (doc_id)
          JOIN documents d USING (doc_id)),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM j),
    po AS (SELECT sum(CASE WHEN a = b THEN 1 ELSE 0 END)
                      / any_value(n.n) AS po
           FROM j, n),
    ra AS (SELECT a AS l, count(*) AS c FROM j GROUP BY a),
    cb AS (SELECT b AS l, count(*) AS c FROM j GROUP BY b),
    ls AS (SELECT l FROM ra UNION SELECT l FROM cb),
    pe AS (SELECT sum((coalesce(ra.c, 0) / n.n)
                      * (coalesce(cb.c, 0) / n.n)) AS pe
           FROM ls LEFT JOIN ra USING (l) LEFT JOIN cb USING (l), n),
    mc AS (SELECT sum(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END)
                      AS b_,
                  sum(CASE WHEN a <> y AND b = y THEN 1 ELSE 0 END)
                      AS c_
           FROM j)
    SELECT round((po.po - pe.pe) / (1.0 - pe.pe), 6) AS kappa,
           round(po.po, 6) AS po, round(pe.pe, 6) AS pe,
           CAST(mc.b_ AS BIGINT) AS mcnemar_b,
           CAST(mc.c_ AS BIGINT) AS mcnemar_c,
           CASE WHEN mc.b_ + mc.c_ = 0 THEN 0.0
                ELSE round((mc.b_ - mc.c_) * (mc.b_ - mc.c_) * 1.0
                           / (mc.b_ + mc.c_), 6) END AS mcnemar_chi2,
           CAST(n.n AS BIGINT) AS n
    FROM po, pe, mc, n
"""


ORACLES["classifier_agreement_docs"] = _classifier_agreement_oracle()
QUERIES["classifier_agreement_docs"] = classifier_agreement_docs


def ab_test_events(sf_dir: str):
    """Two-proportion z-test (the A/B readout): purchase rate of the
    even-user bucket vs the odd-user bucket, pooled-variance z and the
    |z| > 1.96 significance flag — one grouped count pass, four
    integers to the reduce."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        grp = (t["user_id"].to_numpy(zero_copy_only=False) % 2) \
            .astype(np.int64)
        pos = pc.equal(t["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": grp, "pos": pos, "n": 1})
        g = df.groupby("g", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out_schema = pa.schema([
        ("p_a", pa.float64()), ("p_b", pa.float64()),
        ("z", pa.float64()), ("significant", pa.int64()),
        ("n_a", pa.int64()), ("n_b", pa.int64()),
    ])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("g", sort=True).sum()
        if 0 not in df.index or 1 not in df.index:
            return out_schema.empty_table()
        xa, na = float(df.loc[0, "pos"]), float(df.loc[0, "n"])
        xb, nb_ = float(df.loc[1, "pos"]), float(df.loc[1, "n"])
        pa_, pb_ = xa / na, xb / nb_
        pool = (xa + xb) / (na + nb_)
        z = (pa_ - pb_) / np.sqrt(pool * (1 - pool)
                                  * (1 / na + 1 / nb_))
        return pa.table({
            "p_a": pa.array([round(pa_, 6)], pa.float64()),
            "p_b": pa.array([round(pb_, 6)], pa.float64()),
            "z": pa.array([round(float(z), 6)], pa.float64()),
            "significant": pa.array([int(abs(z) > 1.96)], pa.int64()),
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb_)], pa.int64()),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["g"],
        reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("g", pa.int64()), ("pos", pa.int64()),
                                ("n", pa.int64())]),
    )


ORACLES["ab_test_events"] = """
    WITH g AS (SELECT user_id % 2 AS g,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                          AS pos
               FROM events),
    s AS (SELECT g, CAST(sum(pos) AS DOUBLE) AS x,
                 CAST(count(*) AS DOUBLE) AS n
          FROM g GROUP BY g),
    w AS (SELECT max(CASE WHEN g = 0 THEN x END) AS xa,
                 max(CASE WHEN g = 0 THEN n END) AS na,
                 max(CASE WHEN g = 1 THEN x END) AS xb,
                 max(CASE WHEN g = 1 THEN n END) AS nb
          FROM s),
    zz AS (SELECT xa / na AS pa_, xb / nb AS pb_,
                  (xa + xb) / (na + nb) AS pool, xa, na, xb, nb
           FROM w),
    z AS (SELECT pa_, pb_,
                 (pa_ - pb_) / sqrt(pool * (1 - pool)
                                    * (1 / na + 1 / nb)) AS z,
                 na, nb
          FROM zz)
    SELECT round(pa_, 6) AS p_a, round(pb_, 6) AS p_b,
           round(z, 6) AS z,
           CAST(CASE WHEN abs(z) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
               AS significant,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
    FROM z
"""
QUERIES["ab_test_events"] = ab_test_events

SIMHASH_PLAN_BITS = 64
SIMHASH_PLAN_KS = (2, 4, 6, 8)
SIMHASH_PLAN_SIMS = [round(0.80 + 0.02 * i, 2) for i in range(10)]


def simhash_scurve_plan(sf_dir: str):
    """SimHash verify-threshold planner (companion of the LSH S-curve
    table): for 64-bit fingerprints, each bit flips independently with
    ``p = arccos(s)/π`` between docs of cosine similarity ``s``
    (Charikar 2002), so ``P(hamming ≤ k) = Σ_{{i≤k}} C(64,i) p^i
    (1−p)^{{64−i}}`` — the exact catch probability behind the hamming
    cutoffs the SimHash tier uses.  Binomial coefficients are exact
    integer constants shared with the SQL (math, not measurement);
    pure per-row math, zero shuffles."""
    import math

    rows = []
    for k in SIMHASH_PLAN_KS:
        for s in SIMHASH_PLAN_SIMS:
            p = math.acos(s) / math.pi
            prob = sum(math.comb(SIMHASH_PLAN_BITS, i)
                       * p ** i * (1 - p) ** (SIMHASH_PLAN_BITS - i)
                       for i in range(k + 1))
            rows.append((k, s, round(prob, 6)))
    return pa.table({
        "hamming_k": pa.array([r[0] for r in rows], pa.int64()),
        "cos_sim": pa.array([r[1] for r in rows], pa.float64()),
        "p_catch": pa.array([r[2] for r in rows], pa.float64()),
    })


def _simhash_scurve_oracle() -> str:
    import math

    combs = [math.comb(SIMHASH_PLAN_BITS, i)
             for i in range(max(SIMHASH_PLAN_KS) + 1)]
    return f"""
    WITH ks AS (SELECT unnest({list(SIMHASH_PLAN_KS)!r}) AS hamming_k),
    ss AS (SELECT unnest({SIMHASH_PLAN_SIMS!r}) AS cos_sim),
    cf AS (SELECT unnest(range(0, {max(SIMHASH_PLAN_KS) + 1})) AS i,
                  unnest({combs!r}) AS c),
    terms AS (SELECT ks.hamming_k, ss.cos_sim, cf.i,
                     cf.c * pow(acos(ss.cos_sim) / pi(), cf.i)
                          * pow(1.0 - acos(ss.cos_sim) / pi(),
                                {SIMHASH_PLAN_BITS} - cf.i) AS t
              FROM ks CROSS JOIN ss CROSS JOIN cf
              WHERE cf.i <= ks.hamming_k)
    SELECT hamming_k, cos_sim, round(sum(t), 6) AS p_catch
    FROM terms GROUP BY hamming_k, cos_sim
"""


ORACLES["simhash_scurve_plan"] = _simhash_scurve_oracle()
QUERIES["simhash_scurve_plan"] = simhash_scurve_plan

ATTR_WINDOW_US = 3_600_000_000  # last-touch lookback: 1 hour


def attribution_events(sf_dir: str):
    """Last-touch attribution: every purchase credits the SAME USER's
    most recent non-purchase event within the 1-hour lookback (ties on
    timestamp resolve to the larger event_id — the later-logged touch);
    purchases with no touch in window credit 'direct'.  One user-keyed
    exchange + a vectorized backward scan per stream; output =
    credited-touch counts by type — the classic marketing rollup, here
    standing in for any 'what preceded this conversion' audit.  Oracle
    replays the lookback with a QUALIFY-ranked self join."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    out_schema = pa.schema([("touch", pa.string()), ("n", pa.int64())])

    def per_user(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        us = pc.cast(pc.cast(part["ts"], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame({
            "u": part["user_id"].to_numpy(zero_copy_only=False),
            "ts": us.to_numpy(zero_copy_only=False),
            "eid": part["event_id"].to_numpy(zero_copy_only=False),
            "et": part["event_type"].to_pylist(),
        }).sort_values(["u", "ts", "eid"], kind="mergesort")
        touches = []
        for _, sub in df.groupby("u", sort=False):
            ts = sub["ts"].to_numpy()
            et = sub["et"].to_numpy()
            for i in np.flatnonzero(et == "purchase"):
                credited = "direct"
                for j in range(i - 1, -1, -1):
                    if ts[i] - ts[j] > ATTR_WINDOW_US:
                        break
                    if et[j] != "purchase":
                        credited = et[j]
                        break
                touches.append(credited)
        if not touches:
            return out_schema.empty_table()
        vc = pd.Series(touches).value_counts()
        return pa.table({"touch": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    partials = exchange_group_apply(
        ds, ["user_id"], per_user, 8,
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("ts", pa.timestamp("us")),
                                ("event_id", pa.int64()),
                                ("event_type", pa.string())]),
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        g = t.group_by("touch").aggregate([("n", "sum")])
        return g.rename_columns(["touch", "n"])

    return exchange_group_apply(partials, ["touch"], fold, 2,
                                empty_schema=out_schema)


ORACLES["attribution_events"] = f"""
    WITH p AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase'),
    cand AS (SELECT p.user_id, p.event_id AS pid, e.event_type,
                    row_number() OVER (
                        PARTITION BY p.user_id, p.event_id
                        ORDER BY e.ts DESC, e.event_id DESC) AS rk
             FROM p JOIN events e
               ON e.user_id = p.user_id
              AND e.event_type <> 'purchase'
              AND (e.ts < p.ts OR (e.ts = p.ts
                                   AND e.event_id < p.event_id))
              AND epoch_us(p.ts) - epoch_us(e.ts) <= {ATTR_WINDOW_US}),
    last_touch AS (SELECT pid, event_type FROM cand WHERE rk = 1),
    credited AS (SELECT coalesce(lt.event_type, 'direct') AS touch
                 FROM p LEFT JOIN last_touch lt ON lt.pid = p.event_id)
    SELECT touch, count(*) AS n FROM credited GROUP BY touch
"""
QUERIES["attribution_events"] = attribution_events

SPRT_RATE_LIFT, SPRT_BOUND = 1.5, 2.944439  # ln(19): alpha=beta=0.05


def sprt_events(sf_dir: str):
    """Wald's SPRT over the time-ordered purchase stream: H1 = the
    purchase rate is 1.5× the whole-corpus rate vs H0 = it is the
    corpus rate; the log-likelihood-ratio walk
    ``Σ x·ln(p1/p0) + (1−x)·ln((1−p1)/(1−p0))`` stops at the first
    ±ln(19) crossing — the early-stopping experiment readout.  The
    walk is a CUMSUM, not a recursion, so one ordered scan computes it
    and the oracle replays it with a window sum; the stream order
    (ts, event_id) is the operator's contract.  Output one row
    ``(decision, n_obs, llr)``."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["ts", "event_id", "event_type"])
    n = ds.count()
    n_pos = ds.map_batches(
        lambda t: pa.table({"c": pa.array(
            [int(pc.sum(pc.cast(pc.equal(t["event_type"], "purchase"),
                                pa.int64())).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").sum("c")
    p0 = n_pos / n
    p1 = min(SPRT_RATE_LIFT * p0, 0.999999)
    w_pos = np.log(p1 / p0)
    w_neg = np.log((1 - p1) / (1 - p0))

    out_schema = pa.schema([("decision", pa.string()),
                            ("n_obs", pa.int64()), ("llr", pa.float64())])

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame({
            "ts": us.to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "x": pc.equal(t["event_type"], "purchase")
                 .to_numpy(zero_copy_only=False).astype(np.float64),
        }).sort_values(["ts", "eid"], kind="mergesort")
        inc = df["x"].to_numpy() * w_pos + (1 - df["x"].to_numpy()) * w_neg
        llr = np.cumsum(inc)
        hit = np.flatnonzero((llr >= SPRT_BOUND) | (llr <= -SPRT_BOUND))
        if len(hit):
            i = int(hit[0])
            dec = "accept_h1" if llr[i] >= SPRT_BOUND else "accept_h0"
            return pa.table({
                "decision": pa.array([dec], pa.string()),
                "n_obs": pa.array([i + 1], pa.int64()),
                "llr": pa.array([round(float(llr[i]), 6)], pa.float64()),
            })
        return pa.table({
            "decision": pa.array(["continue"], pa.string()),
            "n_obs": pa.array([len(llr)], pa.int64()),
            "llr": pa.array([round(float(llr[-1]), 6)], pa.float64()),
        })

    return exchange_group_apply(
        ds.map_batches(lambda t: t.append_column(
            "k", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow"),
        ["k"], lambda t: scan(t), num_partitions=1,
        empty_schema=pa.schema([("ts", pa.timestamp("us")),
                                ("event_id", pa.int64()),
                                ("event_type", pa.string()),
                                ("k", pa.int64())]),
    )


ORACLES["sprt_events"] = f"""
    WITH t AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS DOUBLE) AS np
               FROM events),
    pp AS (SELECT np / n AS p0,
                  least({SPRT_RATE_LIFT!r} * np / n, 0.999999) AS p1
           FROM t),
    w AS (SELECT ln(p1 / p0) AS wp, ln((1 - p1) / (1 - p0)) AS wn
          FROM pp),
    s AS (SELECT ts, event_id,
                 CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END
                     AS x,
                 row_number() OVER (ORDER BY ts, event_id) AS rn
          FROM events),
    walk AS (SELECT rn,
                    sum(x * w.wp + (1 - x) * w.wn)
                        OVER (ORDER BY rn) AS llr
             FROM s, w),
    hit AS (SELECT rn, llr FROM walk
            WHERE llr >= {SPRT_BOUND!r} OR llr <= -{SPRT_BOUND!r}
            ORDER BY rn LIMIT 1),
    last AS (SELECT rn, llr FROM walk ORDER BY rn DESC LIMIT 1)
    SELECT CASE WHEN hit.rn IS NOT NULL
                THEN CASE WHEN hit.llr >= {SPRT_BOUND!r}
                          THEN 'accept_h1' ELSE 'accept_h0' END
                ELSE 'continue' END AS decision,
           CAST(coalesce(hit.rn, last.rn) AS BIGINT) AS n_obs,
           round(coalesce(hit.llr, last.llr), 6) AS llr
    FROM last LEFT JOIN hit ON true
"""
QUERIES["sprt_events"] = sprt_events


def readability_docs(sf_dir: str):
    """Flesch–Kincaid grade level per doc (the classic readability
    screen): words = the standard tokenizer, sentences = runs of
    ``[.!?]`` (min 1), syllables = vowel-group count per word with
    vowel-less words counting 1 (the documented heuristic — both
    engines run the same RE2 patterns, so the counts are exact).
    Vectorized Arrow regex; zero-token docs are excluded (grade
    undefined)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        from dedup_ray.stages.textstats import explode_tokens

        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, pa.scalar("", txt.type))
        flat, parents, n = explode_tokens(txt, t.num_rows)
        groups = pc.count_substring_regex(flat, "[aeiouy]+") \
            .to_numpy(zero_copy_only=False)
        syl_per_tok = np.maximum(groups, 1)
        syl = np.zeros(t.num_rows, np.int64)
        np.add.at(syl, np.asarray(parents), syl_per_tok)
        sent = np.maximum(
            pc.count_substring_regex(txt, "[.!?]+")
            .to_numpy(zero_copy_only=False), 1)
        keep = n > 0
        w = n[keep].astype(np.float64)
        s = sent[keep].astype(np.float64)
        sy = syl[keep].astype(np.float64)
        fk = 0.39 * (w / s) + 11.8 * (sy / w) - 15.59
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(w.astype(np.int64), pa.int64()),
            "n_sentences": pa.array(s.astype(np.int64), pa.int64()),
            "n_syllables": pa.array(sy.astype(np.int64), pa.int64()),
            "fk_grade": pa.array(np.round(fk, 6), pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


ORACLES["readability_docs"] = """
    WITH tk AS (SELECT doc_id,
                       unnest(list_filter(string_split(coalesce(text, ''),
                                                       ' '),
                                          x -> x <> '')) AS tok
                FROM documents),
    syl AS (SELECT doc_id, count(*) AS w,
                   sum(greatest(len(regexp_extract_all(tok,
                                                       '[aeiouy]+')), 1))
                       AS sy
            FROM tk GROUP BY doc_id),
    sent AS (SELECT doc_id,
                    greatest(len(regexp_extract_all(coalesce(text, ''),
                                                    '[.!?]+')), 1) AS s
             FROM documents)
    SELECT syl.doc_id,
           CAST(syl.w AS BIGINT) AS n_words,
           CAST(sent.s AS BIGINT) AS n_sentences,
           CAST(syl.sy AS BIGINT) AS n_syllables,
           round(0.39 * (syl.w / CAST(sent.s AS DOUBLE))
                 + 11.8 * (syl.sy / CAST(syl.w AS DOUBLE)) - 15.59, 6)
               AS fk_grade
    FROM syl JOIN sent USING (doc_id)
"""
QUERIES["readability_docs"] = readability_docs


ALLEN_GAP_NAMES = [
    "before", "meets", "overlaps", "starts", "during", "finishes",
    "equals",
]


def allen_relations_events(sf_dir: str):
    """Allen interval-algebra census: per user, the activity interval
    [min ts, max ts] of each event type; every ordered type pair
    (a < b lexicographically) classifies into one of Allen's 13
    relations (the 7 canonical names; inverses report as
    ``inv_<name>``) — the temporal-reasoning audit of how activity
    windows nest and chain.  Exact µs-integer endpoint comparisons in
    both engines; one user-keyed exchange, relation census fold."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    out_schema = pa.schema([("relation", pa.string()),
                            ("n", pa.int64())])

    def classify(s1, e1, s2, e2) -> str:
        if e1 < s2:
            return "before"
        if e1 == s2:
            return "meets"
        if s1 == s2 and e1 == e2:
            return "equals"
        if s1 == s2:
            return "starts" if e1 < e2 else "inv_starts"
        if e1 == e2:
            return "finishes" if s1 > s2 else "inv_finishes"
        if s1 > s2 and e1 < e2:
            return "during"
        if s1 < s2 and e1 > e2:
            return "inv_during"
        if s1 < s2 and e1 > s2 and e1 < e2:
            return "overlaps"
        if s2 < s1 and e2 > s1 and e2 < e1:
            return "inv_overlaps"
        if s2 > e1:
            return "before"
        return "inv_before" if s1 > e2 else (
            "inv_meets" if s1 == e2 else "inv_overlaps")

    def per_user(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        us = pc.cast(pc.cast(part["ts"], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame({
            "u": part["user_id"].to_numpy(zero_copy_only=False),
            "et": part["event_type"].to_pylist(),
            "ts": us.to_numpy(zero_copy_only=False),
        })
        iv = df.groupby(["u", "et"]).agg(s=("ts", "min"),
                                         e=("ts", "max")).reset_index()
        rels = []
        for _, sub in iv.groupby("u", sort=False):
            rows = sub.sort_values("et").to_numpy()
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    rels.append(classify(rows[i][2], rows[i][3],
                                         rows[j][2], rows[j][3]))
        if not rels:
            return out_schema.empty_table()
        vc = pd.Series(rels).value_counts()
        return pa.table({"relation": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    partials = exchange_group_apply(
        ds, ["user_id"], per_user, 8,
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("event_type", pa.string()),
                                ("ts", pa.timestamp("us"))]),
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        g = t.group_by("relation").aggregate([("n", "sum")])
        return g.rename_columns(["relation", "n"])

    return exchange_group_apply(partials, ["relation"], fold, 2,
                                empty_schema=out_schema)


ORACLES["allen_relations_events"] = """
    WITH iv AS (SELECT user_id, event_type,
                       epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
                FROM events GROUP BY user_id, event_type),
    pr AS (SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
           FROM iv a JOIN iv b
             ON a.user_id = b.user_id AND a.event_type < b.event_type),
    rel AS (SELECT CASE
                WHEN e1 < s2 THEN 'before'
                WHEN e1 = s2 THEN 'meets'
                WHEN s1 = s2 AND e1 = e2 THEN 'equals'
                WHEN s1 = s2 THEN
                    CASE WHEN e1 < e2 THEN 'starts' ELSE 'inv_starts' END
                WHEN e1 = e2 THEN
                    CASE WHEN s1 > s2 THEN 'finishes'
                         ELSE 'inv_finishes' END
                WHEN s1 > s2 AND e1 < e2 THEN 'during'
                WHEN s1 < s2 AND e1 > e2 THEN 'inv_during'
                WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
                WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'inv_overlaps'
                WHEN s2 > e1 THEN 'before'
                WHEN s1 > e2 THEN 'inv_before'
                WHEN s1 = e2 THEN 'inv_meets'
                ELSE 'inv_overlaps' END AS relation
            FROM pr)
    SELECT relation, count(*) AS n FROM rel GROUP BY relation
"""
QUERIES["allen_relations_events"] = allen_relations_events


def markov_entropy_events(sf_dir: str):
    """Entropy rate of the per-user event-type Markov chain:
    ``H = −Σ_st (n_st/N)·ln(n_st/n_s·)`` over consecutive-event
    transition counts (empirical stationary weights) — how predictable
    the stream is, in nats/step; the information-theoretic summary of
    the transition matrix the event_transitions entry materializes.
    One user-keyed exchange emits bigram partials, a states²-bounded
    reduce closes the formula."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    big_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("n", pa.int64())])

    def per_user(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return big_schema.empty_table()
        df = part.to_pandas().sort_values(["ts", "event_id"],
                                          kind="mergesort")
        outs = []
        for _, sub in df.groupby("user_id", sort=False):
            et = sub["event_type"].to_numpy()
            if len(et) < 2:
                continue
            outs.append(pd.DataFrame({"a": et[:-1], "b": et[1:]}))
        if not outs:
            return big_schema.empty_table()
        g = pd.concat(outs, ignore_index=True) \
            .groupby(["a", "b"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = exchange_group_apply(
        ds, ["user_id"], per_user, 8,
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("ts", pa.timestamp("us")),
                                ("event_id", pa.int64()),
                                ("event_type", pa.string())]),
    )

    out_schema = pa.schema([("entropy_rate", pa.float64()),
                            ("n_transitions", pa.int64()),
                            ("n_states", pa.int64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby(["a", "b"], sort=True).sum() \
            .reset_index()
        n = float(df["n"].sum())
        ns = df.groupby("a")["n"].sum()
        nst = df["n"].to_numpy(np.float64)
        nsrow = ns.reindex(df["a"]).to_numpy(np.float64)
        h = -float(((nst / n) * np.log(nst / nsrow)).sum())
        return pa.table({
            "entropy_rate": pa.array([round(h, 6)], pa.float64()),
            "n_transitions": pa.array([int(n)], pa.int64()),
            "n_states": pa.array([df["a"].nunique()], pa.int64()),
        })

    return exchange_group_apply(partials, ["a", "b"], reduce_fn, 1,
                                empty_schema=big_schema)


ORACLES["markov_entropy_events"] = """
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          AS nxt
               FROM events),
    big AS (SELECT event_type AS a, nxt AS b, count(*) AS n
            FROM s WHERE nxt IS NOT NULL GROUP BY a, b),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM big),
    row_ AS (SELECT a, CAST(sum(n) AS DOUBLE) AS ns FROM big GROUP BY a)
    SELECT round(-sum((big.n / t.tot) * ln(big.n / row_.ns)), 6)
               AS entropy_rate,
           CAST(t.tot AS BIGINT) AS n_transitions,
           (SELECT count(*) FROM row_) AS n_states
    FROM big JOIN row_ USING (a), t
    GROUP BY t.tot
"""
QUERIES["markov_entropy_events"] = markov_entropy_events


def hll_error_audit_events(sf_dir: str):
    """Sketch-accuracy audit: per event type, the HLL distinct-user
    ESTIMATE (bias-corrected harmonic mean over the replayable md5
    registers, small-range correction included) against the exact
    distinct count, with the relative error — the 'can I trust the
    sketch at this cardinality' table a pipeline publishes beside its
    sketches.  Registers and estimator both replay in SQL, so the
    accuracy claim itself is oracle-checked."""
    from dedup_ray.stages.sketch import hll_estimate, hll_grouped_registers

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    regs = hll_grouped_registers(ds, "event_type", "user_id") \
        .to_pandas()  # groups × 256 bounded

    def exact_distinct(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pylist(),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from dedup_ray.util.exchange import exchange_group_apply

    def fold(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates()
        g = df.groupby("event_type").size().reset_index(name="exact")
        return pa.Table.from_pandas(g, preserve_index=False)

    ex = exchange_group_apply(
        ds.map_batches(exact_distinct, batch_format="pyarrow"),
        ["event_type"], fold, 4,
        empty_schema=pa.schema([("event_type", pa.string()),
                                ("user_id", pa.int64())]),
    ).to_pandas()  # types-bounded

    rows = []
    for et, sub in regs.groupby("event_type", sort=True):
        est = hll_estimate(sub[["idx", "rho"]])
        exact_n = int(ex.set_index("event_type")["exact"].loc[et])
        rows.append((et, exact_n, round(est, 6),
                     round((est - exact_n) / exact_n, 6)))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "exact": pa.array([r[1] for r in rows], pa.int64()),
        "est": pa.array([r[2] for r in rows], pa.float64()),
        "rel_err": pa.array([r[3] for r in rows], pa.float64()),
    })


ORACLES["hll_error_audit_events"] = """
    WITH h AS (SELECT event_type,
                      md5(CAST(user_id AS VARCHAR)) AS hx
               FROM events),
    parts AS (SELECT event_type,
        (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 +
        (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS idx,
        length(regexp_extract(substr(hx, 3, 13), '^0*')) AS lz,
        substr(hx,
               3 + length(regexp_extract(substr(hx, 3, 13), '^0*')),
               1) AS d0
      FROM h),
    r AS (SELECT event_type, idx,
                 CASE WHEN lz >= 13 THEN 53
                      ELSE 4 * lz + 1 +
                           CASE WHEN d0 IN ('8','9','a','b','c','d','e','f')
                                    THEN 0
                                WHEN d0 IN ('4','5','6','7') THEN 1
                                WHEN d0 IN ('2','3') THEN 2
                                ELSE 3 END
                 END AS rho
          FROM parts),
    regs AS (SELECT event_type, idx, max(rho) AS rho FROM r
             GROUP BY event_type, idx),
    agg AS (SELECT event_type, sum(pow(2.0, -rho)) AS stouch,
                   count(*) AS touched
            FROM regs GROUP BY event_type),
    est0 AS (SELECT event_type,
                    0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0
                        / (stouch + (256 - touched)) AS e,
                    256 - touched AS zeros
             FROM agg),
    est AS (SELECT event_type,
                   CASE WHEN e <= 2.5 * 256.0 AND zeros > 0
                        THEN 256.0 * ln(256.0 / zeros) ELSE e END AS est
            FROM est0),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS exact
           FROM events GROUP BY event_type)
    SELECT ex.event_type, CAST(ex.exact AS BIGINT) AS exact,
           round(est.est, 6) AS est,
           round((est.est - ex.exact) / ex.exact, 6) AS rel_err
    FROM ex JOIN est USING (event_type)
"""
QUERIES["hll_error_audit_events"] = hll_error_audit_events


def fisher_exact_events(sf_dir: str):
    """Fisher's exact test on the A/B purchase 2×2 (the small-sample
    companion of the z-test): hypergeometric tail with the two-sided
    'as extreme' convention (sum pmf(k) over all k with pmf(k) ≤
    pmf(observed)·(1+1e-7), the scipy rule) — pmfs via lgamma, the
    SAME libm both engines link, and the tolerance absorbs the last
    ulp.  Four integers to the reduce; everything else is closed
    form."""
    import math

    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        grp = (t["user_id"].to_numpy(zero_copy_only=False) % 2) \
            .astype(np.int64)
        pos = pc.equal(t["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": grp, "pos": pos, "n": 1})
        g = df.groupby("g", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("c", pa.int64()), ("d", pa.int64()),
                            ("p_value", pa.float64())])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("g", sort=True).sum()
        if 0 not in df.index or 1 not in df.index:
            return out_schema.empty_table()
        a = int(df.loc[0, "pos"])
        b = int(df.loc[0, "n"]) - a
        c = int(df.loc[1, "pos"])
        d = int(df.loc[1, "n"]) - c
        r1, r2 = a + b, c + d
        c1 = a + c
        n = r1 + r2
        lg = math.lgamma

        def lpmf(k: int) -> float:
            return (lg(r1 + 1) - lg(k + 1) - lg(r1 - k + 1)
                    + lg(r2 + 1) - lg(c1 - k + 1)
                    - lg(r2 - c1 + k + 1)
                    - (lg(n + 1) - lg(c1 + 1) - lg(n - c1 + 1)))

        kmin, kmax = max(0, c1 - r2), min(r1, c1)
        p_obs = math.exp(lpmf(a))
        p = sum(math.exp(lpmf(k)) for k in range(kmin, kmax + 1)
                if math.exp(lpmf(k)) <= p_obs * (1 + 1e-7))
        return pa.table({
            "a": pa.array([a], pa.int64()),
            "b": pa.array([b], pa.int64()),
            "c": pa.array([c], pa.int64()),
            "d": pa.array([d], pa.int64()),
            "p_value": pa.array([round(min(p, 1.0), 6)], pa.float64()),
        })

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["g"],
        reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("g", pa.int64()), ("pos", pa.int64()),
                                ("n", pa.int64())]),
    )


ORACLES["fisher_exact_events"] = """
    WITH g AS (SELECT user_id % 2 AS g,
                      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                          AS pos
               FROM events),
    s AS (SELECT g, sum(pos) AS x, count(*) AS n FROM g GROUP BY g),
    w AS (SELECT max(CASE WHEN g = 0 THEN x END) AS a,
                 max(CASE WHEN g = 0 THEN n END)
                   - max(CASE WHEN g = 0 THEN x END) AS b,
                 max(CASE WHEN g = 1 THEN x END) AS c,
                 max(CASE WHEN g = 1 THEN n END)
                   - max(CASE WHEN g = 1 THEN x END) AS d
          FROM s),
    m AS (SELECT a, b, c, d, a + b AS r1, c + d AS r2, a + c AS c1,
                 a + b + c + d AS nn
          FROM w),
    ks AS (SELECT m.*, k.k FROM m
           CROSS JOIN range(0, 1000000) k(k)
           WHERE k.k >= greatest(0, m.c1 - m.r2)
             AND k.k <= least(m.r1, m.c1)),
    pmf AS (SELECT k, a,
                   exp(lgamma(r1 + 1) - lgamma(k + 1)
                       - lgamma(r1 - k + 1) + lgamma(r2 + 1)
                       - lgamma(c1 - k + 1) - lgamma(r2 - c1 + k + 1)
                       - (lgamma(nn + 1) - lgamma(c1 + 1)
                          - lgamma(nn - c1 + 1))) AS p
            FROM ks),
    pobs AS (SELECT p AS po FROM pmf WHERE k = a)
    SELECT CAST(m.a AS BIGINT) AS a, CAST(m.b AS BIGINT) AS b,
           CAST(m.c AS BIGINT) AS c, CAST(m.d AS BIGINT) AS d,
           round(least((SELECT sum(p) FROM pmf, pobs
                        WHERE p <= po * (1 + 1e-7)), 1.0), 6)
               AS p_value
    FROM m
"""
QUERIES["fisher_exact_events"] = fisher_exact_events

GEOMED_ITERS = 8


def geomedian_embeddings(sf_dir: str):
    """Weiszfeld geometric median of the embedding cloud
    (``ops/matrix.py::geometric_median``): the robust center that
    ignores outlier vectors a mean would chase, run a FIXED 8 rounds
    from the mean — one (d+1)-float streaming pass per round, two
    d-vectors on the driver, and the oracle unrolls the identical
    rounds so convergence is never assumed."""
    from dedup_ray.ops.matrix import geometric_median

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return geometric_median(ds, iterations=GEOMED_ITERS)


def _geomedian_oracle(iters: int = GEOMED_ITERS) -> str:
    # each round references the previous CTE exactly ONCE (the weight
    # sum rides the per-dim group — every vec appears once per dim), so
    # the chain stays linear however the engine inlines CTEs
    sql = """
    WITH x AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) AS d,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
    m0 AS MATERIALIZED (SELECT d, sum(v) / count(*) AS mu
                        FROM x GROUP BY d)"""
    for r in range(iters):
        sql += f""",
    dist{r} AS MATERIALIZED (
        SELECT x.vec_id,
               greatest(sqrt(sum((x.v - m{r}.mu) * (x.v - m{r}.mu))),
                        1e-9) AS dd
        FROM x JOIN m{r} USING (d) GROUP BY x.vec_id),
    m{r + 1} AS MATERIALIZED (
        SELECT x.d, sum(x.v / dist{r}.dd) / sum(1.0 / dist{r}.dd) AS mu
        FROM x JOIN dist{r} USING (vec_id) GROUP BY x.d)"""
    return sql + f"""
    SELECT d AS dim, round(mu, 6) AS value FROM m{iters}"""


ORACLES["geomedian_embeddings"] = _geomedian_oracle()
QUERIES["geomedian_embeddings"] = geomedian_embeddings

WILSON_Z = 1.959964


def wilson_ci_events(sf_dir: str):
    """Wilson score 95%% interval per event type for the even-user
    share (the interval that behaves at small n and extreme rates,
    unlike the Wald interval) — the uncertainty column every rate
    report should carry.  Closed form on two integers per group;
    identical double expression both engines."""
    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        even = (t["user_id"].to_numpy(zero_copy_only=False) % 2 == 0) \
            .astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "x": even, "n": 1})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out_schema = pa.schema([
        ("event_type", pa.string()), ("n", pa.int64()),
        ("p", pa.float64()), ("lo", pa.float64()), ("hi", pa.float64()),
    ])

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().groupby("event_type", sort=True).sum()
        z = WILSON_Z
        ets, ns, ps, los, his = [], [], [], [], []
        for et, row in df.iterrows():
            n, x = float(row["n"]), float(row["x"])
            p = x / n
            denom = 1 + z * z / n
            center = (p + z * z / (2 * n)) / denom
            half = (z * np.sqrt(p * (1 - p) / n
                                + z * z / (4 * n * n))) / denom
            ets.append(et)
            ns.append(int(n))
            ps.append(round(p, 6))
            los.append(round(center - half, 6))
            his.append(round(center + half, 6))
        return pa.table({"event_type": pa.array(ets, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "p": pa.array(ps, pa.float64()),
                         "lo": pa.array(los, pa.float64()),
                         "hi": pa.array(his, pa.float64())})

    return exchange_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), ["event_type"],
        reduce_fn, num_partitions=1,
        empty_schema=pa.schema([("event_type", pa.string()),
                                ("x", pa.int64()), ("n", pa.int64())]),
    )


ORACLES["wilson_ci_events"] = f"""
    WITH s AS (SELECT event_type,
                      CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
                               END) AS DOUBLE) AS x,
                      CAST(count(*) AS DOUBLE) AS n
               FROM events GROUP BY event_type),
    w AS (SELECT event_type, n, x / n AS p,
                 {WILSON_Z!r} AS z FROM s)
    SELECT event_type, CAST(n AS BIGINT) AS n, round(p, 6) AS p,
           round((p + z * z / (2 * n)) / (1 + z * z / n)
                 - (z * sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
                   / (1 + z * z / n), 6) AS lo,
           round((p + z * z / (2 * n)) / (1 + z * z / n)
                 + (z * sqrt(p * (1 - p) / n + z * z / (4 * n * n)))
                   / (1 + z * z / n), 6) AS hi
    FROM w
"""
QUERIES["wilson_ci_events"] = wilson_ci_events

CANOPY_T1, CANOPY_T2 = 0.15, 0.5
CANOPY_BLOCKS, CANOPY_ROUNDS = 512, 28


def canopy_docs(sf_dir: str):
    """Canopy clustering (McCallum et al. 2000;
    ``ops/linkage.py::canopy_cluster``): the cheap-distance blocking
    pass of classical record linkage — docs route to content blocks by
    the md5 of their smallest word-bigram shingle (near-dups share it),
    each block runs the greedy loop a FIXED 28 rounds (loose t1=0.15
    membership, tight t2=0.5 removal), leftovers flag as center -1.
    One explode pass + one exchange; per-block pairwise Jaccard is a
    bool doc×shingle matmul, never per-pair Python."""
    return _canopy(sf_dir)


def _canopy_oracle() -> str:
    t1, t2, nb, k_rounds = CANOPY_T1, CANOPY_T2, CANOPY_BLOCKS, CANOPY_ROUNDS
    sql = f"""
    WITH tt AS MATERIALIZED (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
    g0 AS MATERIALIZED (SELECT doc_id,
            unnest(CASE WHEN len(toks) >= 2
                   THEN list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i + 1])
                   ELSE [CAST(doc_id AS VARCHAR)] END) AS sh
        FROM tt),
    gd AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM g0),
    b AS MATERIALIZED (SELECT doc_id,
            CAST(('0x' || substr(md5(min(sh)), 1, 8)) AS BIGINT)
                % {nb} AS blk
        FROM gd GROUP BY doc_id),
    g AS MATERIALIZED (SELECT gd.doc_id, b.blk, gd.sh
        FROM gd JOIN b ON b.doc_id = gd.doc_id),
    n AS MATERIALIZED (SELECT doc_id, count(*) AS nt FROM g
        GROUP BY doc_id),
    p AS MATERIALIZED (
        SELECT a.blk AS blk, a.doc_id AS i, bb.doc_id AS j,
               count(*) * 1.0 / (na.nt + nb2.nt - count(*)) AS jac
        FROM g a JOIN g bb ON a.sh = bb.sh AND a.blk = bb.blk
                          AND a.doc_id < bb.doc_id
        JOIN n na ON na.doc_id = a.doc_id
        JOIN n nb2 ON nb2.doc_id = bb.doc_id
        GROUP BY a.blk, a.doc_id, bb.doc_id, na.nt, nb2.nt),
    alive0 AS MATERIALIZED (SELECT doc_id, blk FROM b)"""
    for k in range(k_rounds):
        sql += f""",
    c{k} AS MATERIALIZED (SELECT blk, min(doc_id) AS c FROM alive{k}
        GROUP BY blk),
    alive{k + 1} AS MATERIALIZED (
        SELECT a.doc_id, a.blk FROM alive{k} a JOIN c{k} USING (blk)
        WHERE a.doc_id <> c{k}.c AND NOT EXISTS (
            SELECT 1 FROM p WHERE p.blk = a.blk
              AND ((p.i = c{k}.c AND p.j = a.doc_id)
                OR (p.j = c{k}.c AND p.i = a.doc_id))
              AND p.jac >= {t2!r}))"""
    centers = " UNION ALL ".join(
        f"SELECT blk, c FROM c{k}" for k in range(k_rounds))
    return sql + f""",
    centers AS MATERIALIZED ({centers})
    SELECT ctr.blk AS blk, ctr.c AS center_id, m.doc_id AS doc_id,
           round(CASE WHEN m.doc_id = ctr.c THEN 1.0 ELSE pp.jac END, 6)
               AS jac
    FROM centers ctr
    JOIN b m ON m.blk = ctr.blk
    LEFT JOIN p pp ON pp.blk = ctr.blk
      AND ((pp.i = ctr.c AND pp.j = m.doc_id)
        OR (pp.j = ctr.c AND pp.i = m.doc_id))
    WHERE m.doc_id = ctr.c OR pp.jac >= {t1!r}
    UNION ALL
    SELECT blk, -1 AS center_id, doc_id, 0.0 AS jac FROM alive{k_rounds}
"""


ORACLES["canopy_docs"] = _canopy_oracle()
QUERIES["canopy_docs"] = canopy_docs

_CANOPY_CACHE: dict = {}


def _canopy(sf_dir: str):
    """Per-process memo of the canopy membership (the _chain_cc
    convention): canopy_docs and blocking_quality_docs share one
    materialized run per corpus.  Pure function of the doc table."""
    from dedup_ray.ops.linkage import canopy_cluster

    if sf_dir not in _CANOPY_CACHE:
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        # block_doc_cap=None: the DuckDB oracle replays the UNCAPPED
        # greedy algorithm, so the oracle-checked path must stay
        # cap-free at any block size (the cap is exercised separately
        # via explicit params — test_canopy_block_doc_cap_*)
        _CANOPY_CACHE[sf_dir] = canopy_cluster(
            ds, t1=CANOPY_T1, t2=CANOPY_T2, num_blocks=CANOPY_BLOCKS,
            max_rounds=CANOPY_ROUNDS, block_doc_cap=None).materialize()
    return _CANOPY_CACHE[sf_dir]


def kneser_ney_docs(sf_dir: str):
    """Interpolated Kneser-Ney bigram LM score per doc
    (``stages/selection.py::kneser_ney_score``, Kneser & Ney 1995) —
    the smoothing the CCNet/KenLM perplexity-filter recipe ships, next
    to ``bigram_backoff_docs``'s stupid-backoff: discounted bigram mass
    interpolated with the CONTINUATION unigram (how many contexts a
    word completes, not how often it occurs).  Counts are
    co-partitioned joins (no broadcast vocab); one scalar — the
    bigram-type count N1+(··) — reaches the driver."""
    from dedup_ray.stages.selection import kneser_ney_score

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return kneser_ney_score(ds)


ORACLES["kneser_ney_docs"] = """
    WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    t AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM d),
    big AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    c2 AS (SELECT w1 || chr(31) || w2 AS k12, count(*)::BIGINT AS c2
           FROM big GROUP BY w1 || chr(31) || w2),
    ctx AS (SELECT w1, count(*)::BIGINT AS c1v,
                   count(DISTINCT w2)::BIGINT AS n1v
            FROM big GROUP BY w1),
    cont AS (SELECT w2, count(DISTINCT w1)::BIGINT AS n1w
             FROM big GROUP BY w2),
    bt AS (SELECT count(*)::DOUBLE AS b FROM c2),
    sc AS (SELECT big.doc_id,
                  ln((c2.c2 - 0.75) / CAST(ctx.c1v AS DOUBLE)
                     + 0.75 * ctx.n1v / CAST(ctx.c1v AS DOUBLE)
                       * (cont.n1w / bt.b)) AS s
           FROM big
           JOIN c2 ON c2.k12 = big.w1 || chr(31) || big.w2
           JOIN ctx ON ctx.w1 = big.w1
           JOIN cont ON cont.w2 = big.w2, bt),
    per AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                   round(sum(s) / count(*), 6) AS kn_lp
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams, per.kn_lp
    FROM d LEFT JOIN per USING (doc_id)
"""
QUERIES["kneser_ney_docs"] = kneser_ney_docs

PLSA_ROUNDS = 2


def plsa_topics_docs(sf_dir: str):
    """PLSA topic decomposition (Hofmann 1999;
    ``stages/topics.py::plsa_topics``): P(z|d) posteriors for k=3
    topics after a FIXED 2 EM rounds — md5-seeded deterministic init,
    broadcast topic-word model per round, doc-topic posteriors
    recomputed per pass from the model history (no doc-keyed exchange
    at all).  The oracle unrolls both rounds plus the final E-step as
    pivoted CTEs with the identical left-associated 3-term sums."""
    from dedup_ray.stages.topics import plsa_topics

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out, _model = plsa_topics(ds, k=3, rounds=PLSA_ROUNDS)
    return out


def _plsa_oracle(rounds: int = PLSA_ROUNDS) -> str:
    def md5u(z: int) -> str:
        return ("1.0 + CAST(('0x' || substr(md5('plsa:" + str(z)
                + ":' || w), 1, 8)) AS BIGINT) / 4294967296.0")

    sql = f"""
    WITH toks AS MATERIALIZED (SELECT doc_id,
            unnest(list_filter(string_split(coalesce(text, ''), ' '),
                               x -> x <> '')) AS w
        FROM documents),
    dw AS MATERIALIZED (SELECT doc_id, w, count(*)::DOUBLE AS c
        FROM toks GROUP BY doc_id, w),
    cd AS MATERIALIZED (SELECT doc_id, sum(c) AS cd FROM dw
        GROUP BY doc_id),
    vs AS MATERIALIZED (SELECT DISTINCT w FROM dw),
    u AS MATERIALIZED (SELECT w, {md5u(0)} AS a0, {md5u(1)} AS a1,
            {md5u(2)} AS a2
        FROM vs),
    tz0 AS (SELECT sum(a0) AS t0, sum(a1) AS t1, sum(a2) AS t2 FROM u),
    pwz0 AS MATERIALIZED (SELECT w, a0 / t0 AS q0, a1 / t1 AS q1,
            a2 / t2 AS q2
        FROM u, tz0),
    pzd0 AS MATERIALIZED (SELECT doc_id, 1.0 / 3.0 AS p0,
            1.0 / 3.0 AS p1, 1.0 / 3.0 AS p2
        FROM cd)"""
    for r in range(rounds):
        sql += f""",
    g{r} AS MATERIALIZED (SELECT dw.doc_id, dw.w, dw.c,
            z.p0 * x.q0 AS n0, z.p1 * x.q1 AS n1, z.p2 * x.q2 AS n2,
            z.p0 * x.q0 + z.p1 * x.q1 + z.p2 * x.q2 AS den
        FROM dw JOIN pzd{r} z USING (doc_id) JOIN pwz{r} x USING (w)),
    mw{r} AS MATERIALIZED (SELECT w, sum(c * n0 / den) AS s0,
            sum(c * n1 / den) AS s1, sum(c * n2 / den) AS s2
        FROM g{r} GROUP BY w),
    mz{r} AS (SELECT sum(s0) AS t0, sum(s1) AS t1, sum(s2) AS t2
        FROM mw{r}),
    pwz{r + 1} AS MATERIALIZED (SELECT w, s0 / t0 AS q0, s1 / t1 AS q1,
            s2 / t2 AS q2
        FROM mw{r}, mz{r}),
    pzd{r + 1} AS MATERIALIZED (SELECT g.doc_id,
            sum(c * n0 / den) / any_value(cd.cd) AS p0,
            sum(c * n1 / den) / any_value(cd.cd) AS p1,
            sum(c * n2 / den) / any_value(cd.cd) AS p2
        FROM g{r} g JOIN cd USING (doc_id) GROUP BY g.doc_id)"""
    r = rounds
    return sql + f""",
    gf AS (SELECT dw.doc_id, dw.c,
            z.p0 * x.q0 AS n0, z.p1 * x.q1 AS n1, z.p2 * x.q2 AS n2,
            z.p0 * x.q0 + z.p1 * x.q1 + z.p2 * x.q2 AS den
        FROM dw JOIN pzd{r} z USING (doc_id) JOIN pwz{r} x USING (w))
    SELECT gf.doc_id AS doc_id,
           round(sum(c * n0 / den) / any_value(cd.cd), 6) AS pz0,
           round(sum(c * n1 / den) / any_value(cd.cd), 6) AS pz1,
           round(sum(c * n2 / den) / any_value(cd.cd), 6) AS pz2
    FROM gf JOIN cd USING (doc_id) GROUP BY gf.doc_id
"""


ORACLES["plsa_topics_docs"] = _plsa_oracle()
QUERIES["plsa_topics_docs"] = plsa_topics_docs

HARDNEG_ANCHORS = 32


def hard_negatives_embeddings(sf_dir: str):
    """Hard-negative mining (``stages/ann.py::hard_negatives``): for
    each of the first 32 vectors (the "training batch" of anchors), the
    most-cosine-similar corpus vector with a DIFFERENT label — the
    contrastive-training staple (ANCE-style corpus-level negatives).
    Anchor set broadcasts once; the corpus streams through a vectorized
    masked-argmax champion pass; ties resolve (cos 6dp DESC, id ASC)."""
    from dedup_ray.stages.ann import hard_negatives

    emb = _read(sf_dir, "embeddings",
                columns=["vec_id", "embedding", "label"])
    adf = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"],
                                       pa.scalar(HARDNEG_ANCHORS))),
            batch_format="pyarrow")
        .to_pandas().sort_values("vec_id")
    )
    avecs = np.asarray([list(v) for v in adf["embedding"]],
                       dtype=np.float64)
    return hard_negatives(emb, adf["vec_id"].tolist(), avecs,
                          adf["label"].tolist())


ORACLES["hard_negatives_embeddings"] = f"""
    SELECT vec_id, neg_id, cos_sim FROM (
        SELECT a.vec_id AS vec_id, b.vec_id AS neg_id,
               round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) DESC,
                       b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.label <> a.label
        WHERE a.vec_id < {HARDNEG_ANCHORS})
    WHERE rk = 1
"""
QUERIES["hard_negatives_embeddings"] = hard_negatives_embeddings

WAND_TERMS = ["dup", "window", "vector"]
_WAND_TERMS_SQL = ", ".join(f"'{t}'" for t in WAND_TERMS)


def wand_topk_docs(sf_dir: str):
    """WAND max-score pruned BM25 (``ops/retrieval.py::wand_topk``,
    Broder et al. 2003): EXACTLY the bm25 top-25 for a query with one
    rare term, but docs whose presence-mask upper bound falls below the
    seed-pass threshold θ never reach tf counting — the oracle is the
    plain BM25 SQL, so the equality-to-exact guarantee is itself
    driver-checked."""
    from dedup_ray.ops.retrieval import wand_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return wand_topk(ds, WAND_TERMS, k=BM25_K, k1=BM25_K1, b=BM25_B)


ORACLES["wand_topk_docs"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), ' '))
                   AS token
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
              WHERE token IN ({_WAND_TERMS_SQL}) GROUP BY token),
    idf AS (SELECT token, ln(1 + (n - df + 0.5) / (df + 0.5)) AS w
            FROM dfreq, stats),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token IN ({_WAND_TERMS_SQL}) GROUP BY doc_id, token),
    scored AS (
        SELECT tf.doc_id,
               sum(w * tf * ({{k1}} + 1) /
                   (tf + {{k1}} * (1 - {{b}} + {{b}} * dl.dl
                                      / stats.avgdl))) AS s
        FROM tf JOIN idf USING (token)
                JOIN dl ON tf.doc_id = dl.doc_id, stats
        GROUP BY tf.doc_id)
    SELECT doc_id, round(s, 6) AS score FROM scored
    WHERE s > 0
    ORDER BY round(s, 6) DESC, doc_id
    LIMIT {{k}}
""".format(k1=BM25_K1, b=BM25_B, k=BM25_K)
QUERIES["wand_topk_docs"] = wand_topk_docs

FL_K, FL_POOL = 8, 64


def facility_location_embeddings(sf_dir: str):
    """Greedy facility-location coreset
    (``stages/selection.py::facility_location_select``): 8 rounds of
    submodular coverage maximization over a 64-candidate pool — the
    diversity selection that picks dense-cluster representatives, next
    to k-center's extremes.  One map_batches coverage pass per round;
    per-item state recomputed from the broadcast selection (max-chains
    are selection-only, bit-equal across engines)."""
    from dedup_ray.stages.selection import facility_location_select

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return facility_location_select(ds, k=FL_K, pool=FL_POOL)


def _fl_oracle(k: int = FL_K, pool: int = FL_POOL) -> str:
    sql = f"""
    WITH e AS MATERIALIZED (SELECT vec_id,
            CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pl AS MATERIALIZED (SELECT vec_id AS pid, v AS pvec FROM e
        WHERE vec_id < {pool}),
    s AS MATERIALIZED (SELECT e.vec_id AS i, pl.pid AS p,
            greatest(list_cosine_similarity(e.v, pl.pvec), 0.0) AS sim
        FROM e, pl),
    cur0 AS MATERIALIZED (SELECT vec_id AS i, 0.0 AS c FROM e)"""
    for r in range(k):
        excl = ""
        if r:
            prior = " UNION ALL ".join(
                f"SELECT pid FROM sel{j}" for j in range(r))
            excl = f"WHERE s.p NOT IN ({prior})"
        sql += f""",
    g{r} AS MATERIALIZED (SELECT s.p AS p,
            round(sum(greatest(cur{r}.c, s.sim)), 6) AS gain
        FROM s JOIN cur{r} ON cur{r}.i = s.i {excl}
        GROUP BY s.p),
    sel{r} AS MATERIALIZED (SELECT p AS pid, gain FROM g{r}
        ORDER BY gain DESC, p LIMIT 1),
    cur{r + 1} AS MATERIALIZED (SELECT cur{r}.i AS i,
            greatest(cur{r}.c, s.sim) AS c
        FROM cur{r} JOIN s ON s.i = cur{r}.i
        JOIN sel{r} ON s.p = sel{r}.pid)"""
    rounds = " UNION ALL ".join(
        f"SELECT {r} AS round, pid AS sel_id, gain AS coverage "
        f"FROM sel{r}" for r in range(k))
    return sql + f"\n    {rounds}"


ORACLES["facility_location_embeddings"] = _fl_oracle()
QUERIES["facility_location_embeddings"] = facility_location_embeddings

MMR_POOL, MMR_K, MMR_LAM = 20, 10, 0.7


def mmr_rerank_docs(sf_dir: str):
    """MMR diversity re-ranking (``ops/retrieval.py::mmr_rerank``,
    Carbonell & Goldstein 1998): the BM25 top-20 re-ranked with
    λ=0.7 relevance / 0.3 diversity using each doc's embedding row
    (vec_id = doc_id in the synthetic corpus) — near-dup search
    results demoted.  Corpus-scale work = the BM25 pass + one
    broadcast-filter embedding fetch; the greedy runs on the bounded
    pool."""
    from dedup_ray.ops.retrieval import mmr_rerank

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return mmr_rerank(docs, emb, BM25_TERMS, k_pool=MMR_POOL,
                      k_out=MMR_K, lam=MMR_LAM, k1=BM25_K1, b=BM25_B)


def _mmr_oracle(k: int = MMR_K) -> str:
    lam, one_m = MMR_LAM, 1.0 - MMR_LAM
    sql = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), ' '))
                   AS token
        FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
              WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY token),
    idf AS (SELECT token, ln(1 + (n - df + 0.5) / (df + 0.5)) AS w
            FROM dfreq, stats),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token),
    scored AS (
        SELECT tf.doc_id,
               sum(w * tf * ({BM25_K1} + 1) /
                   (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl
                                      / stats.avgdl))) AS s
        FROM tf JOIN idf USING (token)
                JOIN dl ON tf.doc_id = dl.doc_id, stats
        GROUP BY tf.doc_id),
    pool AS MATERIALIZED (SELECT doc_id, round(s, 6) AS rel FROM scored
        WHERE s > 0 ORDER BY round(s, 6) DESC, doc_id LIMIT {MMR_POOL}),
    pv AS MATERIALIZED (SELECT pool.doc_id, pool.rel,
            CAST(e.embedding AS DOUBLE[]) AS v
        FROM pool JOIN embeddings e ON e.vec_id = pool.doc_id),
    sim AS MATERIALIZED (SELECT a.doc_id AS i, b.doc_id AS j,
            round(list_cosine_similarity(a.v, b.v), 6) AS s
        FROM pv a, pv b),
    cur0 AS MATERIALIZED (SELECT doc_id, rel, 0.0 AS c FROM pv)"""
    for r in range(k):
        excl = ""
        if r:
            prior = " UNION ALL ".join(
                f"SELECT doc_id FROM sel{j}" for j in range(r))
            excl = f"WHERE doc_id NOT IN ({prior})"
        sql += f""",
    m{r} AS MATERIALIZED (SELECT doc_id,
            round({lam!r} * rel - {one_m!r} * c, 6) AS mmr
        FROM cur{r} {excl}),
    sel{r} AS MATERIALIZED (SELECT doc_id, mmr FROM m{r}
        ORDER BY mmr DESC, doc_id LIMIT 1),
    cur{r + 1} AS MATERIALIZED (SELECT cur{r}.doc_id AS doc_id,
            cur{r}.rel AS rel, greatest(cur{r}.c, sim.s) AS c
        FROM cur{r} JOIN sim ON sim.i = cur{r}.doc_id
        JOIN sel{r} ON sim.j = sel{r}.doc_id)"""
    rounds = " UNION ALL ".join(
        f"SELECT {r} AS rank, doc_id, mmr FROM sel{r}" for r in range(k))
    return sql + f"\n    {rounds}"


ORACLES["mmr_rerank_docs"] = _mmr_oracle()
QUERIES["mmr_rerank_docs"] = mmr_rerank_docs

HOLT_A, HOLT_B = 0.5, 0.3


def holt_forecast_events(sf_dir: str):
    """Holt double-exponential smoothing of the per-type hourly event
    rate (``ops/stats.py::holt_forecast``): level + trend + one-step
    forecast per hour — the drift monitor that tracks a steadily
    growing feed the flat EWMA lags.  Same hour grid as the CUSUM
    monitor; identical-operand-order recurrence, recursive-CTE twin."""
    from dedup_ray.ops.stats import holt_forecast

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    return holt_forecast(ds, "event_type", "ts", alpha=HOLT_A,
                         beta=HOLT_B, bucket_us=CUSUM_HOURS_US)


ORACLES["holt_forecast_events"] = f"""
    WITH RECURSIVE bounds AS (
        SELECT epoch_us(min(ts)) // {CUSUM_HOURS_US} AS h0,
               epoch_us(max(ts)) // {CUSUM_HOURS_US} AS h1
        FROM events),
    hours AS (SELECT unnest(range(0, CAST(h1 - h0 + 1 AS BIGINT)))
                  AS h
              FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (SELECT event_type,
                   epoch_us(ts) // {CUSUM_HOURS_US}
                     - (SELECT h0 FROM bounds) AS h,
                   count(*) AS c
            FROM events GROUP BY event_type, h),
    grid AS (SELECT t.event_type, hours.h,
                    CAST(coalesce(cnt.c, 0) AS DOUBLE) AS x
             FROM types t CROSS JOIN hours
             LEFT JOIN cnt ON cnt.event_type = t.event_type
                          AND cnt.h = hours.h),
    rec(event_type, h, l, b) AS (
        SELECT g.event_type, g.h, g.x,
               CASE WHEN (SELECT h1 - h0 FROM bounds) > 0
                    THEN coalesce(g1.x, 0.0) - g.x ELSE 0.0 END
        FROM grid g
        LEFT JOIN grid g1 ON g1.event_type = g.event_type AND g1.h = 1
        WHERE g.h = 0
        UNION ALL
        SELECT g.event_type, g.h,
               {HOLT_A!r} * g.x
                   + {1.0 - HOLT_A!r} * (r.l + r.b),
               {HOLT_B!r} * (({HOLT_A!r} * g.x
                   + {1.0 - HOLT_A!r} * (r.l + r.b)) - r.l)
                   + {1.0 - HOLT_B!r} * r.b
        FROM rec r
        JOIN grid g ON g.event_type = r.event_type AND g.h = r.h + 1)
    SELECT event_type,
           CAST(h + (SELECT h0 FROM bounds) AS BIGINT) AS hour,
           floor(l * 1000000 + 0.5) / 1000000 AS level,
           floor(b * 1000000 + 0.5) / 1000000 AS trend,
           floor((l + b) * 1000000 + 0.5) / 1000000 AS forecast
    FROM rec
"""
QUERIES["holt_forecast_events"] = holt_forecast_events



SRCCOVER_K = 5


def source_cover_docs(sf_dir: str):
    """Greedy maximum-coverage source selection
    (``stages/selection.py::greedy_source_cover``): the 5 sources whose
    distinct word-trigram union covers the most vocabulary — the
    "which feeds add content" audit a mixing recipe starts from.
    One trigram-keyed exchange; coverage recomputed per round from the
    broadcast selection; all-integer arithmetic."""
    from dedup_ray.stages.selection import greedy_source_cover

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return greedy_source_cover(ds, k=SRCCOVER_K)


def _source_cover_oracle(k: int = SRCCOVER_K) -> str:
    sql = """
    WITH t AS MATERIALIZED (SELECT source,
            list_filter(string_split(coalesce(text, ''), ' '),
                        x -> x <> '') AS toks
        FROM documents),
    g0 AS (SELECT source,
            unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                   i -> toks[i] || ' ' || toks[i + 1] || ' '
                        || toks[i + 2])) AS gram
        FROM t),
    pairs AS MATERIALIZED (SELECT DISTINCT source, gram FROM g0),
    cov0 AS MATERIALIZED (SELECT gram FROM pairs WHERE 1 = 0)"""
    for r in range(k):
        sql += f""",
    gain{r} AS MATERIALIZED (SELECT source, count(*) AS g FROM pairs
        WHERE gram NOT IN (SELECT gram FROM cov{r})
        GROUP BY source HAVING count(*) > 0),
    sel{r} AS MATERIALIZED (SELECT source, g FROM gain{r}
        ORDER BY g DESC, source LIMIT 1),
    cov{r + 1} AS MATERIALIZED (
        SELECT gram FROM cov{r}
        UNION
        SELECT pairs.gram FROM pairs JOIN sel{r} USING (source))"""
    rounds = " UNION ALL ".join(
        f"SELECT {r} AS round, source, g FROM sel{r}" for r in range(k))
    return sql + f""",
    sels AS ({rounds})
    SELECT round, source AS sel_source, CAST(g AS BIGINT) AS new_grams,
           CAST(sum(g) OVER (ORDER BY round) AS BIGINT) AS cum_grams
    FROM sels
"""


ORACLES["source_cover_docs"] = _source_cover_oracle()
QUERIES["source_cover_docs"] = source_cover_docs

TCLOSE_T = 0.3


def t_closeness_docs(sf_dir: str):
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the third leg of the release-privacy trio next to
    ``k_anonymity_docs``'s k/l flags: per quasi-identifier group
    (source, lang, 500-char length bucket), the total-variation
    distance between the group's sensitive-host distribution and the
    GLOBAL one (categorical EMD), flagged at t ≤ 0.3.  A group passing
    k-anonymity can still leak through a skewed sensitive histogram —
    exactly what this distance catches.  One grouped partial pass +
    one QI-keyed exchange with the 13-value global histogram broadcast
    (driver state = the support, never rows)."""
    import ray

    from dedup_ray.util.exchange import exchange_group_apply

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lb = (t["n_chars"].to_numpy(zero_copy_only=False) // 500) * 500
        host = pc.binary_join_element_wise(
            "site", pa.array((ids % 13).astype(str)), "")
        return pa.table({
            "source": t["source"], "lang": t["lang"],
            "len_bucket": pa.array(lb, pa.int64()),
            "host": host,
        })

    base = ds.map_batches(prep, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["source", "lang", "len_bucket", "host"],
                       sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = base.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    gh = counts.to_pandas().groupby("host", sort=True)["c"].sum()
    hosts = gh.index.to_numpy()
    gc = gh.to_numpy().astype(np.int64)   # global host counts C_h
    n_total = int(gc.sum())
    href = ray.put((hosts, gc))

    out_schema = pa.schema([
        ("source", pa.string()), ("lang", pa.string()),
        ("len_bucket", pa.int64()), ("n", pa.int64()),
        ("tvd", pa.float64()), ("t_close", pa.int64()),
    ])

    def per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        hvals, gcv = ray.get(href)
        hidx = {h: i for i, h in enumerate(hvals)}
        df = t.to_pandas()
        rows = {k: [] for k in ("source", "lang", "len_bucket", "n",
                                "tvd", "t_close")}
        for key, g in df.groupby(["source", "lang", "len_bucket"],
                                 sort=True):
            n = int(g["c"].sum())
            cg = np.zeros(len(hvals), np.int64)
            for h, c in zip(g["host"], g["c"]):  # per-batch partials:
                cg[hidx[h]] += c                 # same host may repeat
            # EXACT integer form: TVD = Σ|c_h·N − C_h·n| / (2·n·N),
            # so the value is one identical division and the <= t flag
            # is a pure integer predicate — no rounding boundary exists
            m = int(np.abs(cg * n_total - gcv * n).sum())
            rows["source"].append(key[0])
            rows["lang"].append(key[1])
            rows["len_bucket"].append(int(key[2]))
            rows["n"].append(n)
            rows["tvd"].append(m / (2.0 * n * n_total))
            rows["t_close"].append(int(10 * m <= 6 * n * n_total))
        return pa.table({
            "source": pa.array(rows["source"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "len_bucket": pa.array(rows["len_bucket"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "tvd": pa.array(rows["tvd"], pa.float64()),
            "t_close": pa.array(rows["t_close"], pa.int64()),
        })

    return exchange_group_apply(
        counts, ["source", "lang", "len_bucket"], per_group,
        num_partitions=8,
        empty_schema=pa.schema([
            ("source", pa.string()), ("lang", pa.string()),
            ("len_bucket", pa.int64()), ("host", pa.string()),
            ("c", pa.int64())]),
    )


ORACLES["t_closeness_docs"] = f"""
    WITH b AS (SELECT source, lang,
                      (n_chars // 500) * 500 AS len_bucket,
                      'site' || CAST(doc_id % 13 AS VARCHAR) AS host
               FROM documents),
    nt AS (SELECT count(*) AS nn FROM b),
    gq AS (SELECT host, count(*) AS ch FROM b GROUP BY host),
    gg AS (SELECT source, lang, len_bucket, host, count(*) AS c
           FROM b GROUP BY source, lang, len_bucket, host),
    gn AS (SELECT source, lang, len_bucket, sum(c) AS n FROM gg
           GROUP BY source, lang, len_bucket),
    tv AS (SELECT gn.source, gn.lang, gn.len_bucket,
                  CAST(gn.n AS BIGINT) AS n,
                  sum(abs(coalesce(gg.c, 0) * nt.nn
                          - gq.ch * gn.n))::BIGINT AS m
           FROM gn CROSS JOIN gq CROSS JOIN nt
           LEFT JOIN gg ON gg.source = gn.source
                       AND gg.lang = gn.lang
                       AND gg.len_bucket = gn.len_bucket
                       AND gg.host = gq.host
           GROUP BY gn.source, gn.lang, gn.len_bucket, gn.n)
    SELECT tv.source, tv.lang, tv.len_bucket, tv.n,
           tv.m / (2.0 * tv.n * nt.nn) AS tvd,
           CAST(10 * tv.m <= 6 * tv.n * nt.nn AS BIGINT) AS t_close
    FROM tv, nt
"""
QUERIES["t_closeness_docs"] = t_closeness_docs


def blocking_quality_docs(sf_dir: str):
    """Blocking-quality scorecard (the classic entity-resolution pair
    completeness / reduction ratio readout, Christen 2012): how good is
    the canopy blocking pass as a CANDIDATE GENERATOR for the exact
    similarity self-join?  PC = fraction of true near-dup pairs
    (3-shingle Jaccard ≥ 0.5 over ≥40-token docs — the
    ``similarity_self_join_docs`` truth) whose two docs share a canopy;
    RR = 1 − candidate-pairs / all-pairs.  The blocking stage every
    dedup pipeline tunes, scored with its own oracle-checked truth.
    Shuffle shape: canopy membership → one center-keyed pair explode →
    one pair-keyed distinct; three scalars reach the driver."""
    from dedup_ray.util.exchange import exchange_group_apply

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    mem = _canopy(sf_dir)

    def pairs_of(t: pa.Table) -> pa.Table:
        from dedup_ray.stages.lsh import triangle_pairs_grouped

        if t.num_rows == 0:
            return pa.table({"id1": pa.array([], pa.int64()),
                             "id2": pa.array([], pa.int64())})
        df = t.to_pandas()
        df = df[df.center_id >= 0][["center_id", "doc_id"]] \
            .drop_duplicates().sort_values(["center_id", "doc_id"])
        did = df["doc_id"].to_numpy()
        i1, i2 = triangle_pairs_grouped(df["center_id"].to_numpy())
        return pa.table({
            "id1": pa.array(did[i1], pa.int64()),
            "id2": pa.array(did[i2], pa.int64())})

    def dedupe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id1": pa.array([], pa.int64()),
                             "id2": pa.array([], pa.int64())})
        df = t.to_pandas().drop_duplicates(["id1", "id2"])
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = exchange_group_apply(
        exchange_group_apply(
            mem, ["center_id"], pairs_of, 8,
            empty_schema=pa.schema([
                ("blk", pa.int64()), ("center_id", pa.int64()),
                ("doc_id", pa.int64()), ("jac", pa.float64())]),
        ),
        ["id1", "id2"], dedupe, 8,
        empty_schema=pa.schema([("id1", pa.int64()),
                                ("id2", pa.int64())]),
    ).materialize()
    n_cand = cand.count()

    truth = _simjoin_truth(sf_dir)
    n_truth = truth.count()

    from dedup_ray.ops.relational import semi_join

    def pack(t: pa.Table) -> pa.Table:
        a = t["id1"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id2"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pk": pa.array(a * (1 << 32) + b, pa.int64())})

    caught = semi_join(
        truth.map_batches(pack, batch_format="pyarrow"),
        cand.map_batches(pack, batch_format="pyarrow"),
        on="pk").count()

    pc_v = 0.0 if n_truth == 0 else caught / n_truth
    total_pairs = n_docs * (n_docs - 1) // 2
    rr = 0.0 if total_pairs == 0 else 1.0 - n_cand / total_pairs
    return pa.table({
        "n_truth": pa.array([n_truth], pa.int64()),
        "n_cand": pa.array([n_cand], pa.int64()),
        "n_caught": pa.array([caught], pa.int64()),
        "pair_completeness": pa.array([round(pc_v, 6)], pa.float64()),
        "reduction_ratio": pa.array([round(rr, 6)], pa.float64()),
    })


ORACLES["blocking_quality_docs"] = f"""
    WITH mem AS ({_canopy_oracle()}),
    cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
             FROM mem a JOIN mem b
               ON a.center_id = b.center_id AND a.doc_id < b.doc_id
             WHERE a.center_id >= 0),
    docs2 AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents
        WHERE array_length(string_split(text, ' ')) >= 40),
    idx2 AS (
        SELECT doc_id, toks,
               unnest(range(1, array_length(toks) - 1)) AS i
        FROM docs2),
    sh2 AS (
        SELECT DISTINCT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        FROM idx2),
    card2 AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
    ints2 AS (
        SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
        FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    truth AS (
        SELECT u AS id1, v AS id2
        FROM ints2
        JOIN card2 ca ON ca.doc_id = u
        JOIN card2 cb ON cb.doc_id = v
        WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5),
    nums AS (SELECT
        (SELECT count(*) FROM truth) AS n_truth,
        (SELECT count(*) FROM cand) AS n_cand,
        (SELECT count(*) FROM truth t
         JOIN cand c ON c.id1 = t.id1 AND c.id2 = t.id2) AS n_caught,
        (SELECT count(*) FROM documents) AS nd)
    SELECT CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_caught AS BIGINT) AS n_caught,
           round(CASE WHEN n_truth = 0 THEN 0.0
                 ELSE n_caught / CAST(n_truth AS DOUBLE) END, 6)
               AS pair_completeness,
           round(CASE WHEN nd < 2 THEN 0.0
                 ELSE 1.0 - n_cand
                      / CAST(nd * (nd - 1) // 2 AS DOUBLE) END, 6)
               AS reduction_ratio
    FROM nums
"""
QUERIES["blocking_quality_docs"] = blocking_quality_docs


def wasserstein_sources_docs(sf_dir: str):
    """1-D Wasserstein (earth-mover) distance between each source's
    doc-length distribution and the POOLED one — the drift readout that
    weighs HOW FAR mass moved where KS only reports the worst gap and
    PSI needs arbitrary bins: ``W1 = Σ_v |F_s(v) − F(v)|·Δv`` over the
    pooled distinct-value grid.  Engine-exact: the integral is the
    INTEGER sum ``Σ |cum_s·N − cum·n_s|·gap`` divided once by
    ``n_s·N`` — no float accumulates.  Overflow bound (the
    quantile_normalize convention, ADVICE r3): the sum is bounded by
    ``N² · value_range`` and numpy int64 wraps SILENTLY past 2^63, so
    the vectorized path runs only while that bound holds (~10⁸ docs at
    n_chars ≤ 10⁶); past it the sum accumulates through Python ints
    (arbitrary precision).  One grouped count
    pass; driver state = the (source × distinct value) histogram, the
    same distinct-value bound as the exact-quantile family."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    h = ds.groupby(["source", "n_chars"]).count().to_pandas()
    h = h.rename(columns={"count()": "c"})
    vals = np.sort(h["n_chars"].unique())
    pool = h.groupby("n_chars")["c"].sum().reindex(vals,
                                                   fill_value=0)
    cum_pool = pool.to_numpy().astype(np.int64).cumsum()
    nn = int(cum_pool[-1]) if len(cum_pool) else 0
    gaps = np.diff(vals.astype(np.int64))
    srcs, w1s = [], []
    for src, g in h.groupby("source", sort=True):
        per = g.groupby("n_chars")["c"].sum().reindex(vals,
                                                      fill_value=0)
        cs = per.to_numpy().astype(np.int64).cumsum()
        ns = int(cs[-1])
        # int64 is exact while the whole sum < 2^63: Σ|…|·gap ≤
        # ns·N·Σgap ≤ N²·value_range (see docstring bound); past that
        # fall back to Python-int (object) accumulation
        vrange = int(vals[-1] - vals[0]) if len(vals) else 0
        if nn * nn <= 2 ** 62 // max(vrange, 1):
            m = int((np.abs(cs[:-1] * nn - cum_pool[:-1] * ns)
                     * gaps).sum())
        else:
            m = int(np.abs(cs[:-1].astype(object) * nn
                           - cum_pool[:-1].astype(object) * ns)
                    .dot(gaps.astype(object)))
        srcs.append(src)
        w1s.append(m / (ns * nn))
    return pa.table({"source": pa.array(srcs, pa.string()),
                     "w1": pa.array(w1s, pa.float64())})


ORACLES["wasserstein_sources_docs"] = """
    WITH h AS (SELECT source, n_chars AS v, count(*) AS c
               FROM documents GROUP BY source, n_chars),
    vals AS (SELECT DISTINCT v FROM h),
    grid AS (SELECT v, lead(v) OVER (ORDER BY v) AS nxt FROM vals),
    ns AS (SELECT source, sum(c)::BIGINT AS n FROM h GROUP BY source),
    nt AS (SELECT sum(c)::BIGINT AS nn FROM h),
    pcum AS (SELECT g.v, g.nxt,
                    (SELECT sum(c)::BIGINT FROM h WHERE h.v <= g.v)
                        AS cum
             FROM grid g WHERE g.nxt IS NOT NULL),
    scum AS (SELECT ns.source, ns.n, p.v, p.nxt, p.cum,
                    (SELECT coalesce(sum(c), 0)::BIGINT FROM h
                     WHERE h.source = ns.source AND h.v <= p.v)
                        AS cums
             FROM ns CROSS JOIN pcum p)
    SELECT s.source,
           sum(abs(s.cums * nt.nn - s.cum * s.n) * (s.nxt - s.v))
               / (any_value(s.n) * any_value(nt.nn)) AS w1
    FROM scum s, nt
    GROUP BY s.source
"""
QUERIES["wasserstein_sources_docs"] = wasserstein_sources_docs

SELFBLEU_PROBE = 16


def self_bleu_docs(sf_dir: str):
    """Self-BLEU-2 diversity probe (Zhu et al. 2018, Texygen;
    ``stages/textstats.py::self_bleu_probe``): clipped unigram/bigram
    precision of each of the first 16 docs against the REST of the
    corpus — the "is everything the same template" audit.  Clipping
    needs only each gram's top-2 per-doc counts: one gram-keyed
    exchange, integers until the final ratios."""
    from dedup_ray.stages.textstats import self_bleu_probe

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return self_bleu_probe(ds, list(range(SELFBLEU_PROBE)))


ORACLES["self_bleu_docs"] = f"""
    WITH tt AS (SELECT doc_id,
            list_filter(string_split(coalesce(text, ''), ' '),
                        x -> x <> '') AS toks
        FROM documents),
    u AS (SELECT doc_id, '1' || chr(31) || t AS gram, count(*) AS c
          FROM (SELECT doc_id, unnest(toks) AS t FROM tt)
          GROUP BY doc_id, t),
    b AS (SELECT doc_id, '2' || chr(31) || g AS gram, count(*) AS c
          FROM (SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(toks), 1)),
                           i -> toks[i] || ' ' || toks[i + 1])) AS g
                FROM tt)
          GROUP BY doc_id, g),
    al AS (SELECT * FROM u UNION ALL SELECT * FROM b),
    rk AS (SELECT gram, doc_id, c,
                  row_number() OVER (PARTITION BY gram
                                     ORDER BY c DESC, doc_id) AS rn
           FROM al),
    t1 AS (SELECT gram, doc_id AS top1_doc, c AS top1_c FROM rk
           WHERE rn = 1),
    t2 AS (SELECT gram, c AS top2_c FROM rk WHERE rn = 2),
    pj AS (SELECT a.doc_id, a.gram, a.c, t1.top1_doc, t1.top1_c,
                  coalesce(t2.top2_c, 0) AS top2_c
           FROM al a JOIN t1 USING (gram) LEFT JOIN t2 USING (gram)
           WHERE a.doc_id < {SELFBLEU_PROBE}),
    per AS (SELECT doc_id, substr(gram, 1, 1) AS n,
                   sum(least(c, CASE WHEN top1_doc = doc_id
                             THEN top2_c ELSE top1_c END)) AS num,
                   sum(c) AS den
            FROM pj GROUP BY doc_id, substr(gram, 1, 1)),
    piv AS (SELECT doc_id,
                   max(CASE WHEN n = '1' THEN num END) AS n1,
                   max(CASE WHEN n = '1' THEN den END) AS d1,
                   coalesce(max(CASE WHEN n = '2' THEN num END), 0)
                       AS n2,
                   coalesce(max(CASE WHEN n = '2' THEN den END), 0)
                       AS d2
            FROM per GROUP BY doc_id)
    SELECT doc_id, round(n1 / CAST(d1 AS DOUBLE), 6) AS p1,
           round(CASE WHEN d2 = 0 THEN 0.0
                 ELSE n2 / CAST(d2 AS DOUBLE) END, 6) AS p2,
           round(sqrt((n1 / CAST(d1 AS DOUBLE))
                 * (CASE WHEN d2 = 0 THEN 0.0
                    ELSE n2 / CAST(d2 AS DOUBLE) END)), 6)
               AS self_bleu2
    FROM piv WHERE d1 > 0
"""
QUERIES["self_bleu_docs"] = self_bleu_docs

PLATT_ROUNDS, PLATT_LR_NUM = 8, 2.0


def platt_scaling_embeddings(sf_dir: str):
    """Platt scaling (Platt 1999): fit ``σ(a·x + b)`` mapping the raw
    score (first embedding coordinate) to a calibrated probability of
    the even-class label — the parametric calibrator next to
    ``isotonic_nb_docs``'s monotone one.  A FIXED 8 gradient-descent
    rounds from (a, b) = (1, 0) at lr = 2/N (convergence never
    assumed); each round is one map_batches pass of (Σ(p−y)x, Σ(p−y))
    partials with the 2-float model broadcast — driver state is two
    floats, and the oracle unrolls the identical rounds."""
    import ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding",
                                              "label"])
    n = ds.count()
    if n == 0:  # empty corpus: nothing to fit
        return pa.table({"a": pa.array([], pa.float64()),
                         "b": pa.array([], pa.float64()),
                         "mean_nll": pa.array([], pa.float64())})
    lr = PLATT_LR_NUM / n
    a, b = 1.0, 0.0

    def partials(aa, bb):
        def f(t: pa.Table) -> pa.Table:
            col = t["embedding"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            x = np.asarray([v[0] for v in col.to_pylist()],
                           dtype=np.float64)
            y = (t["label"].to_numpy(zero_copy_only=False) % 2 == 0) \
                .astype(np.float64)
            p = 1.0 / (1.0 + np.exp(-(aa * x + bb)))
            return pa.table({
                "ga": [float(((p - y) * x).sum())],
                "gb": [float((p - y).sum())],
                "nll": [float(-(y * np.log(p)
                                + (1.0 - y) * np.log(1.0 - p)).sum())],
            })
        return f

    for _ in range(PLATT_ROUNDS):
        part = ds.map_batches(partials(a, b),
                              batch_format="pyarrow").to_pandas()
        a = a - lr * float(part["ga"].sum())
        b = b - lr * float(part["gb"].sum())

    part = ds.map_batches(partials(a, b),
                          batch_format="pyarrow").to_pandas()
    nll = float(part["nll"].sum()) / n
    return pa.table({
        "a": pa.array([round(a, 6)], pa.float64()),
        "b": pa.array([round(b, 6)], pa.float64()),
        "mean_nll": pa.array([round(nll, 6)], pa.float64()),
    })


def _platt_oracle(rounds: int = PLATT_ROUNDS) -> str:
    sql = f"""
    WITH x AS MATERIALIZED (SELECT
            CAST(embedding[1] AS DOUBLE) AS x,
            CASE WHEN label % 2 = 0 THEN 1.0 ELSE 0.0 END AS y
        FROM embeddings),
    nn AS (SELECT count(*)::DOUBLE AS n FROM x),
    m0 AS (SELECT 1.0 AS a, 0.0 AS b)"""
    for r in range(rounds):
        sql += f""",
    g{r} AS (SELECT
            sum((1.0 / (1.0 + exp(-(m{r}.a * x.x + m{r}.b))) - x.y)
                * x.x) AS ga,
            sum(1.0 / (1.0 + exp(-(m{r}.a * x.x + m{r}.b))) - x.y)
                AS gb
        FROM x, m{r}),
    m{r + 1} AS (SELECT m{r}.a - {PLATT_LR_NUM!r} / nn.n * g{r}.ga
                     AS a,
                 m{r}.b - {PLATT_LR_NUM!r} / nn.n * g{r}.gb AS b
        FROM m{r}, g{r}, nn)"""
    return sql + f"""
    SELECT round(m{rounds}.a, 6) AS a, round(m{rounds}.b, 6) AS b,
           round((SELECT sum(-(x.y * ln(1.0 / (1.0
                      + exp(-(m{rounds}.a * x.x + m{rounds}.b))))
                  + (1.0 - x.y) * ln(1.0 - 1.0 / (1.0
                      + exp(-(m{rounds}.a * x.x + m{rounds}.b))))))
                  FROM x) / nn.n, 6) AS mean_nll
    FROM m{rounds}, nn
"""


ORACLES["platt_scaling_embeddings"] = _platt_oracle()
QUERIES["platt_scaling_embeddings"] = platt_scaling_embeddings

PHASH_W, PHASH_H = 8, 8  # 7 gradients x 8 rows = 56-bit dHash (int64-safe)


def phash_dedup_docs(sf_dir: str):
    """Perceptual-hash image near-dup (dHash, the
    difference-hash variant of pHash): per doc an 8×8 greyscale image
    is synthesized arithmetically (pixel = ``((x + 3y + base)·(x + 7
    + base % 11)) % 229 + doc_id % 4`` with base = doc_id // 4 — docs
    in a block share the PATTERN but differ by a global brightness
    shift), the
    56-bit row-gradient fingerprint ``bit(x,y) = p(x+1,y) > p(x,y)``
    is computed vectorized, and exact-dHash clusters come out of one
    hash-keyed groupby (the ``exact_dedup_docs`` shape).  The planted
    invariance IS the point: dHash keys on gradients, so the
    brightness jitter never splits a block — the multimodal dedup
    pattern (pHash-bucket then verify) with the decode stage replaced
    by the arithmetic twin the oracle can replay bit-for-bit."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        base = ids // 4
        x = np.arange(PHASH_W)
        y = np.arange(PHASH_H)
        # (docs, H, W) int pixels — arithmetic, no RNG; the quadratic
        # x-term makes every block's GRADIENT pattern distinct (125
        # distinct hashes over 500 docs, all 4-blocks intact)
        px = ((x[None, None, :] + y[None, :, None] * 3
               + base[:, None, None])
              * (x[None, None, :] + 7 + (base % 11)[:, None, None])) \
            % 229 + (ids % 4)[:, None, None]
        bits = (px[:, :, 1:] > px[:, :, :-1]).astype(np.int64)
        pos = (y[:, None] * (PHASH_W - 1) + x[None, : PHASH_W - 1])
        h = (bits << pos[None, :, :]).sum(axis=(1, 2))
        return pa.table({"phash": pa.array(h, pa.int64()),
                         "doc_id": t["doc_id"]})

    from ray.data.aggregate import Count, Min

    out = docs.map_batches(hashes, batch_format="pyarrow") \
        .groupby("phash").aggregate(Min("doc_id", alias_name="keep_id"),
                                    Count(alias_name="n_copies"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "phash": t["phash"],
            "keep_id": pc.cast(t["keep_id"], pa.int64()),
            "n_copies": pc.cast(t["n_copies"], pa.int64()),
        })

    return out.map_batches(cast, batch_format="pyarrow")


ORACLES["phash_dedup_docs"] = f"""
    WITH px AS (
        SELECT d.doc_id, y.y, x.x,
               ((x.x + y.y * 3 + d.doc_id // 4)
                * (x.x + 7 + (d.doc_id // 4) % 11)) % 229
                   + d.doc_id % 4 AS v
        FROM documents d
        CROSS JOIN range(0, {PHASH_H}) y(y)
        CROSS JOIN range(0, {PHASH_W}) x(x)),
    bits AS (
        SELECT a.doc_id, a.y, a.x,
               CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y
                           AND b.x = a.x + 1
        WHERE a.x < {PHASH_W - 1}),
    h AS (SELECT doc_id,
                 sum(bit * (CAST(1 AS BIGINT)
                            << (y * {PHASH_W - 1} + x)))::BIGINT
                     AS phash
          FROM bits GROUP BY doc_id)
    SELECT phash, min(doc_id) AS keep_id,
           count(*)::BIGINT AS n_copies
    FROM h GROUP BY phash
"""
QUERIES["phash_dedup_docs"] = phash_dedup_docs

AFP_WINDOWS, AFP_WIN_LEN, AFP_PERIOD = 24, 256, 16


def audio_fingerprint_docs(sf_dir: str):
    """Audio energy-envelope fingerprint dedup (the
    sign-of-band-energy-difference scheme behind Chromaprint-family
    fingerprints, on windows instead of FFT bands): per doc a 6144-
    sample int16 PCM clip is synthesized arithmetically — a period-16
    waveform scaled by a per-window envelope ``a(w) = ((w + 3 + base)
    ·(w + 5 + base % 11)) % 127 + 1`` with base = doc_id // 4,
    START-SHIFTED by doc_id % 4 —
    then encoded to REAL WAV bytes, decoded back through
    ``stages/codecs.wav_decode`` (genuine binary-column plumbing), and
    fingerprinted: bit w = energy(w+1) > energy(w), 23 bits.  Because
    the window length is a multiple of the period, the per-doc phase
    shift leaves every window energy EXACTLY invariant — dHash's
    brightness story, in audio: 125 intact 4-blocks.  Exact-fingerprint
    clusters via one groupby; all-integer energies, oracle replays the
    synthesis arithmetically."""
    from dedup_ray.stages.codecs import wav_decode, wav_encode

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def fingerprints(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out = []
        tgrid = np.arange(AFP_WINDOWS * AFP_WIN_LEN)
        w_of = tgrid // AFP_WIN_LEN
        for d in ids.tolist():
            base, shift = d // 4, d % 4
            g = ((tgrid + shift) % AFP_PERIOD) - AFP_PERIOD // 2
            a = ((w_of + 3 + base) * (w_of + 5 + base % 11)) \
                % 127 + 1
            pcm = (a * g).astype(np.int16)
            # real binary round-trip: WAV container in, PCM back out
            dec, _rate = wav_decode(wav_encode(pcm))
            e = np.abs(dec.astype(np.int64)).reshape(
                AFP_WINDOWS, AFP_WIN_LEN).sum(axis=1)
            bits = (e[1:] > e[:-1]).astype(np.int64)
            out.append(int((bits << np.arange(AFP_WINDOWS - 1)).sum()))
        return pa.table({"afp": pa.array(out, pa.int64()),
                         "doc_id": t["doc_id"]})

    from ray.data.aggregate import Count, Min

    agg = docs.map_batches(fingerprints, batch_format="pyarrow") \
        .groupby("afp").aggregate(Min("doc_id", alias_name="keep_id"),
                                  Count(alias_name="n_copies"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "afp": t["afp"],
            "keep_id": pc.cast(t["keep_id"], pa.int64()),
            "n_copies": pc.cast(t["n_copies"], pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow")


ORACLES["audio_fingerprint_docs"] = f"""
    WITH s AS (
        SELECT d.doc_id, t.t // {AFP_WIN_LEN} AS w,
               abs(((((t.t // {AFP_WIN_LEN}) + 3 + d.doc_id // 4)
                     * ((t.t // {AFP_WIN_LEN}) + 5
                        + (d.doc_id // 4) % 11)) % 127 + 1)
                   * ((t.t + d.doc_id % 4) % {AFP_PERIOD}
                      - {AFP_PERIOD // 2})) AS av
        FROM documents d
        CROSS JOIN range(0, {AFP_WINDOWS * AFP_WIN_LEN}) t(t)),
    e AS (SELECT doc_id, w, sum(av) AS e FROM s GROUP BY doc_id, w),
    bits AS (SELECT a.doc_id, a.w,
                    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
             FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.w = a.w + 1
             WHERE a.w < {AFP_WINDOWS - 1}),
    h AS (SELECT doc_id,
                 sum(bit * (CAST(1 AS BIGINT) << w))::BIGINT AS afp
          FROM bits GROUP BY doc_id)
    SELECT afp, min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
    FROM h GROUP BY afp
"""
QUERIES["audio_fingerprint_docs"] = audio_fingerprint_docs

VFP_FRAMES, VFP_STRIDE = 6, 2


def video_fingerprint_docs(sf_dir: str):
    """Video near-dup by per-frame perceptual hashing — the third leg
    of the multimodal dedup trio (``phash_dedup_docs`` images,
    ``audio_fingerprint_docs`` audio): per doc a 6-frame 8×8 clip is
    synthesized arithmetically (frame f's pixels follow the
    ``phash_dedup_docs`` quadratic with base' = base·8 + f, plus the
    same per-doc brightness jitter), every 2nd frame is sampled (the
    ``VideoFrameSample`` decimation policy), each sampled frame gets
    the 56-bit dHash, and the clip fingerprint is the (h0, h2, h4)
    TUPLE — clustering on it via one groupby keeps all 125 planted
    4-blocks intact under the jitter.  All-integer, oracle-replayable."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def fps(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        base = ids // 4
        x = np.arange(PHASH_W)
        y = np.arange(PHASH_H)
        cols = {"doc_id": t["doc_id"]}
        for f in range(0, VFP_FRAMES, VFP_STRIDE):
            bb = base * 8 + f
            px = ((x[None, None, :] + y[None, :, None] * 3
                   + bb[:, None, None])
                  * (x[None, None, :] + 7 + (bb % 11)[:, None, None])) \
                % 229 + (ids % 4)[:, None, None]
            bits = (px[:, :, 1:] > px[:, :, :-1]).astype(np.int64)
            pos = (y[:, None] * (PHASH_W - 1) + x[None, : PHASH_W - 1])
            cols[f"h{f}"] = pa.array(
                (bits << pos[None, :, :]).sum(axis=(1, 2)), pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Count, Min

    hcols = [f"h{f}" for f in range(0, VFP_FRAMES, VFP_STRIDE)]
    agg = docs.map_batches(fps, batch_format="pyarrow") \
        .groupby(hcols).aggregate(Min("doc_id", alias_name="keep_id"),
                                  Count(alias_name="n_copies"))

    def cast(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in hcols}
        out["keep_id"] = pc.cast(t["keep_id"], pa.int64())
        out["n_copies"] = pc.cast(t["n_copies"], pa.int64())
        return pa.table(out)

    return agg.map_batches(cast, batch_format="pyarrow")


def _vfp_oracle() -> str:
    frame_hash = """
    SELECT d.doc_id, {f} AS f,
           sum(CASE WHEN ((x.x + 1 + y.y * 3 + (d.doc_id // 4) * 8 + {f})
                          * (x.x + 1 + 7
                             + ((d.doc_id // 4) * 8 + {f}) % 11)) % 229
                        > ((x.x + y.y * 3 + (d.doc_id // 4) * 8 + {f})
                           * (x.x + 7
                              + ((d.doc_id // 4) * 8 + {f}) % 11)) % 229
                    THEN CAST(1 AS BIGINT)
                         << (y.y * {wm1} + x.x) ELSE 0 END)::BIGINT AS h
    FROM documents d
    CROSS JOIN range(0, {h}) y(y)
    CROSS JOIN range(0, {wm1}) x(x)
    GROUP BY d.doc_id"""
    frames = [frame_hash.format(f=f, h=PHASH_H, wm1=PHASH_W - 1)
              for f in range(0, VFP_FRAMES, VFP_STRIDE)]
    sel = ", ".join(
        f"max(CASE WHEN f = {f} THEN h END) AS h{f}"
        for f in range(0, VFP_FRAMES, VFP_STRIDE))
    return f"""
    WITH fh AS ({' UNION ALL '.join(frames)}),
    piv AS (SELECT doc_id, {sel} FROM fh GROUP BY doc_id)
    SELECT h0, h2, h4, min(doc_id) AS keep_id,
           count(*)::BIGINT AS n_copies
    FROM piv GROUP BY h0, h2, h4
"""


ORACLES["video_fingerprint_docs"] = _vfp_oracle()
QUERIES["video_fingerprint_docs"] = video_fingerprint_docs


def quantile_normalize_docs(sf_dir: str):
    """Cross-source quantile normalization
    (``stages/mixing.py::quantile_normalize``, Bolstad et al. 2003):
    every source's n_chars distribution mapped onto the pooled one so
    per-source length/quality cutoffs become comparable before mixing.
    Integer rank arithmetic end to end — no float percentile can
    disagree between engines.  One source-keyed exchange + the
    distinct-value-bounded pooled histogram broadcast."""
    from dedup_ray.stages.mixing import quantile_normalize

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])
    return quantile_normalize(ds)


ORACLES["quantile_normalize_docs"] = """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS rs,
                 count(*) OVER (PARTITION BY source) AS ns
          FROM documents),
    g AS (SELECT doc_id, source, n_chars,
                 CASE WHEN ns > 1
                      THEN ((rs - 1) * (n - 1) * 2 + (ns - 1))
                           // (2 * (ns - 1))
                      ELSE (n - 1) // 2 END AS gpos
          FROM r, nn),
    gpool AS (SELECT n_chars AS gx,
                    row_number() OVER (ORDER BY n_chars, doc_id) - 1
                        AS grk
             FROM documents)
    SELECT g.doc_id, g.source, g.n_chars, gpool.gx AS qnorm
    FROM g JOIN gpool ON gpool.grk = g.gpos
"""
QUERIES["quantile_normalize_docs"] = quantile_normalize_docs

QUERIES = {k: QUERIES[k] for k in _catalog_order(QUERIES)}
ORACLES = {k: ORACLES[k] for k in _catalog_order(ORACLES)}
