"""Sequence packing (distributed prefix scan) vs a driver brute force."""

import numpy as np
import pyarrow as pa

import ray.data

from dedup_ray.stages.packing import pack_sequences, token_counts


def _mkcounts(ntoks):
    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(len(ntoks)), pa.int64()),
            "n_tokens": pa.array(ntoks, pa.int64()),
        })
    )


def _brute(ntoks, budget):
    before = np.r_[0, np.cumsum(ntoks)[:-1]]
    return before // budget, before % budget


def test_pack_matches_brute_force_across_buckets():
    rng = np.random.default_rng(3)
    ntoks = rng.integers(1, 90, 200).tolist()
    out = pack_sequences(
        _mkcounts(ntoks), budget=128, bucket_width=16, num_partitions=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    seq, off = _brute(np.array(ntoks), 128)
    assert out.seq_id.tolist() == seq.tolist()
    assert out.seq_offset.tolist() == off.tolist()
    assert out.n_tokens.tolist() == ntoks


def test_pack_doc_straddles_budget_boundary():
    # 100 + 100 tokens: second doc starts at offset 100 of seq 0, third
    # (huge) doc starts in seq 1 and swallows several budgets
    ntoks = [100, 100, 1000, 10]
    out = pack_sequences(
        _mkcounts(ntoks), budget=128, bucket_width=2, num_partitions=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.seq_id.tolist() == [0, 0, 1, 9]
    assert out.seq_offset.tolist() == [0, 100, 200 - 128, 1200 % 128]


def test_token_counts_plain_split():
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b c", "x"], pa.string())})
    )
    out = token_counts(ds).to_pandas().sort_values("doc_id")
    assert out.n_tokens.tolist() == [3, 1]


def test_chunk_tokens_coverage_and_overlap():
    """Every token appears in some chunk; consecutive chunks overlap by
    window-stride; empty docs emit exactly one empty chunk."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from dedup_ray.stages.packing import chunk_tokens

    toks = [f"t{i}" for i in range(53)]
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [" ".join(toks), "a b", ""]}
    )
    out = chunk_tokens(rd.from_pandas(df), window=10, stride=7).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_id")
    covered = []
    prev = None
    for _, row in d1.iterrows():
        c = row["chunk_text"].split(" ")
        assert len(c) <= 10
        if prev is not None:
            assert prev[-3:] == c[:3]  # overlap = window - stride
        covered.extend(c)
        prev = c
    assert set(covered) == set(toks)
    # short doc: single chunk, intact
    assert out[out["doc_id"] == 2]["chunk_text"].tolist() == ["a b"]
    # empty doc: one empty chunk
    assert out[out["doc_id"] == 3]["chunk_text"].tolist() == [""]
    with pytest.raises(ValueError):
        chunk_tokens(rd.from_pandas(df), window=5, stride=6)
