"""M1: nested-record exploder — pubs → long-form tables.

The reference's ingest (``data_transfer.R:26-45``) turns each publication
into rows of four long-form tables: ``item(id, title, venue, year)``,
``author(name, org, id, auseq)`` with a 1-based author-position column
(R's ``rownames``), ``abstract(id, abstract)`` for records that have one,
and ``keywords(keywords, id)`` one row per keyword.  Here each table is a
vectorized ``map_batches`` over the Arrow pubs batch: nested lists explode
via ``pc.list_flatten`` / ``pc.list_parent_indices`` — no Python loop over
records.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _item_batch(batch: pa.Table) -> pa.Table:
    return batch.select(["id", "title", "venue", "year"])


def _author_batch(batch: pa.Table) -> pa.Table:
    authors = batch["authors"].combine_chunks()
    flat = pc.list_flatten(authors)
    parent = pc.list_parent_indices(authors).to_numpy()
    lengths = pc.list_value_length(authors).fill_null(0).to_numpy()
    starts = np.r_[0, np.cumsum(lengths)[:-1]].astype(np.int64)
    # 1-based position within each record's author list (R rownames)
    auseq = np.arange(len(parent), dtype=np.int64) - starts[parent] + 1
    ids = batch["id"].combine_chunks().take(pa.array(parent))
    return pa.table(
        {
            "name": flat.field("name"),
            "org": flat.field("org"),
            "id": ids,
            "auseq": pa.array(auseq, pa.int64()),
        }
    )


def _abstract_batch(batch: pa.Table) -> pa.Table:
    t = batch.select(["id", "abstract"])
    return t.filter(pc.is_valid(t["abstract"]))


def _keywords_batch(batch: pa.Table) -> pa.Table:
    kw = batch["keywords"].combine_chunks()
    parent = pc.list_parent_indices(kw)
    return pa.table(
        {
            "keywords": pc.list_flatten(kw),
            "id": batch["id"].combine_chunks().take(parent),
        }
    )


def explode_pubs(pubs_ds) -> dict:
    """pubs Dataset → dict of the four long-form Datasets (S2 fan-out).

    The reference writes one CSV file set per name block; here block
    membership stays a COLUMN (SURVEY.md §1.4) and each logical table is
    its own Dataset, written with ``write_parquet(partition_cols=...)``
    when a filesystem layout is wanted.
    """
    return {
        "item": pubs_ds.map_batches(_item_batch, batch_format="pyarrow"),
        "author": pubs_ds.map_batches(_author_batch, batch_format="pyarrow"),
        "abstract": pubs_ds.map_batches(_abstract_batch, batch_format="pyarrow"),
        "keywords": pubs_ds.map_batches(_keywords_batch, batch_format="pyarrow"),
    }
