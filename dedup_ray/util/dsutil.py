"""Small Dataset helpers shared across stages."""

from __future__ import annotations


def as_arrow(ds):
    """Normalize a Dataset to Arrow blocks.

    ``groupby().map_groups(..., batch_format="pandas")`` emits pandas blocks;
    mixing them with Arrow blocks breaks ``union``/``iter_batches`` batch
    assembly.  An identity ``map_batches`` with ``batch_format="pyarrow"``
    re-encodes the blocks (cheap, streaming).
    """
    return ds.map_batches(lambda t: t, batch_format="pyarrow")
