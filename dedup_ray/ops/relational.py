"""Relational building blocks (SURVEY.md §2.4/§2.5/§2.6/§2.9).

Reference semantics re-expressed on Ray Data:

- semi/anti joins (``lfilter.py:10-16`` J3, ``valid_index.py:12-13`` J4):
  broadcast the key set via ``ray.put`` and filter inside ``map_batches`` —
  no shuffle when the key side is small (the reference's case); a
  hash-partitioned ``Dataset.join`` fallback covers large key sides.
- broadcast left join (``combine-at.R:11-20`` J1, IDF lookup J5).
- canonical within-block pair generation (``c_org.py:30-31`` P1 /
  ``id_pairs.py:21-23``): pairs enumerate in lexicographic ``(id1 < id2)``
  order inside each block, as keyed rows — never positional.
- grouped collect-to-cluster (``venue_bag.py:11-15`` A4) and grouped mode
  (``uni_glue_baseline.R:26`` A6/O3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.util.dsutil import as_arrow


def _key_set_ref(keys_ds, on: str):
    import ray

    vals = set()
    for b in keys_ds.select_columns([on]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        vals.update(b[on].to_pylist())
    return ray.put(frozenset(vals))


def semi_join(ds, keys_ds, on: str):
    """Keep rows whose ``on`` appears in keys_ds (broadcast membership)."""
    import ray

    ref = _key_set_ref(keys_ds, on)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([v in ks for v in batch[on].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join(ds, keys_ds, on: str):
    """Keep rows whose ``on`` does NOT appear in keys_ds."""
    import ray

    ref = _key_set_ref(keys_ds, on)

    def f(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([v not in ks for v in batch[on].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def broadcast_left_join(ds, small_df: pd.DataFrame, on: str):
    """Left join a small pandas side into every batch (J1/J5 pattern)."""
    import ray

    ref = ray.put(small_df)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how="left")

    return as_arrow(ds.map_batches(f, batch_format="pandas"))


def block_pairs(ds, block_col: str, id_col: str, value_cols: list[str] | None = None):
    """P1: all C(n,2) canonical pairs within each block, as keyed rows.

    Output columns: block_col, id1, id2 (+ ``<col>_1``/``<col>_2`` for each
    requested value column).  Order inside a block is lexicographic on the
    *distinct sorted* ids — the exact enumeration of pandas
    ``groupby('id')`` + ``itertools.combinations`` in the reference.
    """
    value_cols = value_cols or []

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        n = len(g)
        if n < 2:
            cols = {block_col: [], "id1": [], "id2": []}
            for c in value_cols:
                cols[f"{c}_1"] = []
                cols[f"{c}_2"] = []
            return pd.DataFrame(cols)
        i1, i2 = np.triu_indices(n, 1)
        out = {
            block_col: [group[block_col].iloc[0]] * len(i1),
            "id1": g[id_col].to_numpy()[i1],
            "id2": g[id_col].to_numpy()[i2],
        }
        for c in value_cols:
            out[f"{c}_1"] = g[c].to_numpy()[i1]
            out[f"{c}_2"] = g[c].to_numpy()[i2]
        return pd.DataFrame(out)

    return as_arrow(ds.groupby(block_col).map_groups(gen, batch_format="pandas"))


def group_collect(ds, key_col: str, id_col: str):
    """A4: exact-key clustering — each key's members get cluster_rep = min id.

    Output (key, id, cluster_rep, cluster_size): the keyed, orderless
    encoding of ``groupby(key)['id'].apply(list)``.
    """

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].sort_values()
        return pd.DataFrame(
            {
                key_col: group[key_col].iloc[0],
                id_col: ids,
                "cluster_rep": ids.iloc[0],
                "cluster_size": len(ids),
            }
        )

    return as_arrow(ds.groupby(key_col).map_groups(collect, batch_format="pandas"))


def grouped_mode(ds, key_col: str, value_col: str):
    """A6/O3: most frequent value per key; ties broken by value ordering."""

    def mode(group: pd.DataFrame) -> pd.DataFrame:
        counts = (
            group.groupby(value_col).size().reset_index(name="n")
            .sort_values(["n", value_col], ascending=[False, True])
        )
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                value_col: [counts[value_col].iloc[0]],
                "n": [int(counts["n"].iloc[0])],
            }
        )

    return as_arrow(ds.groupby(key_col).map_groups(mode, batch_format="pandas"))


def distinct_rows(ds, cols: list[str]):
    """D1: distinct over a column subset (groupby keep-first)."""

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group[cols].head(1)

    return as_arrow(ds.groupby(cols).map_groups(first, batch_format="pandas"))
