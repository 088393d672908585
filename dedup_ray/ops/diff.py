"""Corpus snapshot diff: added / removed / changed / same per document id
between two crawl versions — the delta pass an incremental pipeline runs
before deciding what to re-extract, re-sign and re-cluster (the
``pipelines/incremental.py`` shard mode consumes exactly the ``added`` +
``changed`` slice).

ONE co-partitioned exchange on the id; inside a partition both sides'
rows are present, so ``changed`` compares the TEXT ITSELF (no digest
collision caveat) via a vectorized sorted-id alignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from dedup_ray.util.exchange import hash_exchange


def corpus_diff(old_ds, new_ds, id_col: str = "doc_id",
                text_col: str = "text", num_partitions: int = 16):
    """``(id_col, status)`` with status in
    ``{'added', 'removed', 'changed', 'same'}``.

    ``added``/``removed`` are relative to the NEW snapshot (present only
    in new / only in old).  Ids are assumed unique per snapshot (crawl
    key = canonical url); duplicate ids compare positionally after an id
    sort and are reported per occurrence.
    """

    def reduce_fn(t_old: pa.Table, t_new: pa.Table) -> pa.Table:
        def frame(t):
            if t.num_rows == 0:
                return pd.DataFrame({id_col: [], text_col: []})
            texts = [s if s is not None else ""  # null text == empty page
                     for s in t[text_col].to_pylist()]
            return pd.DataFrame({
                id_col: t[id_col].to_numpy(zero_copy_only=False),
                text_col: pd.Series(texts, dtype=object),
            })

        m = frame(t_old).merge(frame(t_new), on=id_col, how="outer",
                               suffixes=("_old", "_new"), sort=True,
                               indicator=True)
        o = m[f"{text_col}_old"]
        n = m[f"{text_col}_new"]
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed",
                     np.where(o != n, "changed", "same")))
        id_type = pa.int64()
        for t in (t_new, t_old):
            if id_col in t.column_names:
                id_type = t[id_col].type
                break
        return pa.table({
            id_col: pa.array(m[id_col].to_numpy(), id_type),
            "status": pa.array(status, pa.string()),
        })

    return hash_exchange([old_ds, new_ds], [id_col, id_col], reduce_fn,
                         num_partitions)
