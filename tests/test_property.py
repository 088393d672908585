"""Property-based tests (hypothesis) for the hashing/pairing kernels.

No Ray needed — these exercise the pure numpy/pandas kernels that every
distributed stage is built from, under randomized inputs the example-based
tests don't reach.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_ray.config import DedupConfig
from dedup_ray.stages.lsh import _emit_pairs, emit_bucket_pairs
from dedup_ray.stages.minhash import pack_signatures, unpack_signatures
from dedup_ray.stages.substring import _CDC, unpack_chunks, pack_chunks
from dedup_ray.stages.cc import _UnionFind


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 20),
    perms=st.sampled_from([8, 16, 32]),
    offset=st.integers(0, 5),
)
def test_pack_unpack_signatures_roundtrip_with_slices(n, perms, offset):
    rng = np.random.default_rng(7)
    sigs = rng.integers(0, 1 << 63, size=(n, perms), dtype=np.uint64)
    col = pack_signatures(sigs)
    # fixed_size_binary path, with a non-zero offset slice
    sl = col.slice(min(offset, n), max(0, n - offset))
    got = unpack_signatures(sl, perms)
    assert np.array_equal(got, sigs[min(offset, n) :])
    # variable-width binary path (pandas round-trip re-encoding)
    var = pa.array(col.to_pylist(), pa.binary())
    got2 = unpack_signatures(var, perms)
    assert np.array_equal(got2, sigs)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=2000))
def test_cdc_chunks_partition_the_document(data):
    cdc = _CDC(DedupConfig())
    hashes, lens = cdc.chunks(data, "k")
    if len(data) == 0:
        assert lens == [0]
        return
    assert sum(lens) == len(data)
    assert all(ln > 0 for ln in lens)
    # deterministic across calls and stable through pack/unpack
    h2, l2 = cdc.chunks(data, "k")
    assert hashes == h2 and lens == l2
    hh, ll = unpack_chunks(pack_chunks(hashes, lens))
    assert np.array_equal(hh, np.asarray(hashes, dtype="<u8").view("<i8"))
    assert list(ll) == lens


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=24, max_size=600), cut=st.integers(1, 20))
def test_cdc_content_locality(data, cut):
    """Chunk boundaries are content-local in the resynchronization sense:
    once the full document and its suffix slice share a boundary at the
    same CONTENT position (past the rolling-window warm-up), every later
    boundary and chunk hash is identical — the boundary automaton's
    state is exactly (position of last boundary, content ahead).

    Unconditional tail alignment is NOT a CDC invariant and is not
    asserted: content with no natural anchors (e.g. zero runs) is cut
    at max_chunk intervals measured from the stream START, which a
    prefix cut shifts forever (hypothesis found exactly that)."""
    from dedup_ray.stages.substring import _WINDOW

    cdc = _CDC(DedupConfig())
    h1, l1 = cdc.chunks(data, "a")
    suffix = data[cut:]
    h3, l3 = cdc.chunks(suffix, "c")
    b1 = np.cumsum(l1)        # boundary end-positions, full doc
    b3 = np.cumsum(l3) + cut  # suffix boundaries in full-doc coordinates
    # interior boundaries only (the final end-of-data bound is appended
    # unconditionally); warm-up region excluded: an anchor at p needs the
    # window ending at p to be inside the shared suffix
    common = sorted(set(b1[:-1].tolist()) & set(b3[:-1].tolist()))
    common = [p for p in common if p >= cut + _WINDOW]
    if common:
        p = common[0]
        i1 = b1.tolist().index(p)
        i3 = b3.tolist().index(p)
        assert b1[i1 + 1:].tolist() == b3[i3 + 1:].tolist()
        assert h1[i1 + 1:] == h3[i3 + 1:]


@settings(max_examples=25, deadline=None)
@given(
    n_rows=st.integers(0, 300),
    n_keys=st.integers(1, 12),
    n_ids=st.integers(1, 40),
    cap=st.sampled_from([4, 16, 256]),
)
def test_emit_bucket_pairs_property(n_rows, n_keys, n_ids, cap):
    rng = np.random.default_rng(n_rows * 31 + n_keys)
    part = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, size=n_rows),
            "id": [f"i{int(x):03d}" for x in rng.integers(0, n_ids, size=n_rows)],
        }
    )
    got, _ = emit_bucket_pairs(part, ["k"], "id", cap=cap, window=2)
    # compare against per-group reference emitter
    expect = set()
    for _, sub in part.groupby("k"):
        ids = sub["id"].drop_duplicates().to_numpy()
        if len(ids) < 2:
            continue
        a, b, _c = _emit_pairs(ids, cap, 2)
        expect.update(zip(a.tolist(), b.tolist()))
    assert set(zip(got["id1"], got["id2"])) == expect
    # canonical order invariant
    assert (got["id1"] < got["id2"]).all()


@settings(max_examples=25, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=120
    )
)
def test_union_find_matches_networkx(edges):
    import networkx as nx

    uf = _UnionFind()
    g = nx.Graph()
    for a, b in edges:
        uf.union(a, b)
        g.add_edge(a, b)
    comp = {n: min(c) for c in nx.connected_components(g) for n in c}
    for n in g.nodes:
        assert uf.find(n) == comp[n]


@given(
    n_tokens=st.integers(0, 120),
    window=st.integers(1, 40),
    stride_off=st.integers(0, 39),
)
@settings(max_examples=40, deadline=None)
def test_chunk_reconstruction_property(n_tokens, window, stride_off):
    """Dropping each chunk's first (window-stride) tokens (except chunk 0)
    and concatenating reconstructs the original token stream exactly —
    the lossless-coverage invariant of overlapping chunking, for any
    (window, stride) with stride <= window."""
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.packing import chunk_tokens

    stride = max(1, window - stride_off)
    toks = [f"w{i}" for i in range(n_tokens)]
    df = pd.DataFrame({"doc_id": [7], "text": [" ".join(toks)]})
    out = (
        chunk_tokens(rd.from_pandas(df), window=window, stride=stride)
        .to_pandas().sort_values("chunk_id")
    )
    rebuilt = []
    for i, row in enumerate(out["chunk_text"]):
        parts = row.split(" ") if row else []
        rebuilt.extend(parts if i == 0 else parts[window - stride:])
    assert rebuilt == toks
