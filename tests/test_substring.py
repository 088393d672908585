"""CDC substring path: chunking determinism, shared runs, containment rule."""

import numpy as np

from dedup_ray.config import DedupConfig
from dedup_ray.stages.substring import (
    _CDC,
    longest_shared_run,
    pack_chunks,
    unpack_chunks,
)

CFG = DedupConfig()


def test_chunking_deterministic():
    cdc = _CDC(CFG)
    data = ("word%d " % 7).join(f"tok{i}" for i in range(200)).encode()
    h1, l1 = cdc.chunks(data, "a")
    h2, l2 = _CDC(CFG).chunks(data, "a")
    assert h1 == h2 and l1 == l2
    assert sum(l1) == len(data)


def test_shared_substring_chunks_resync():
    """A long substring shared at different offsets chunkifies identically."""
    cdc = _CDC(CFG)
    rng = np.random.default_rng(3)
    mid = " ".join("w%d" % x for x in rng.integers(0, 1000, size=120))
    docA = ("prefixA " * 10 + mid + " suffixA" * 5).encode()
    docB = ("completely different start text here " + mid + " and another end").encode()
    hA, lA = cdc.chunks(docA, "A")
    hB, _ = cdc.chunks(docB, "B")
    run = longest_shared_run(hA, lA, hB)
    assert run >= 0.7 * len(mid)


def test_longest_run_requires_consecutive():
    # shared chunks scattered (non-consecutive) must not sum
    h1, l1 = [1, 2, 3, 4, 5], [10, 10, 10, 10, 10]
    h2 = [1, 99, 3, 98, 5]
    assert longest_shared_run(h1, l1, h2) == 10
    h2b = [9, 2, 3, 4, 7]
    assert longest_shared_run(h1, l1, h2b) == 30


def test_skip_set_excludes_boilerplate():
    h1, l1 = [1, 2, 3], [40, 40, 40]
    h2 = [1, 2, 3]
    assert longest_shared_run(h1, l1, h2) == 120
    assert longest_shared_run(h1, l1, h2, skip={2}) == 40


def test_pack_roundtrip():
    h = [2**63 + 5, 17, 2**64 - 1]
    ln = [10, 20, 30]
    hh, ll = unpack_chunks(pack_chunks(h, ln))
    assert ll.tolist() == ln
    # hashes come back as the int64 *view* of the same bits
    assert hh.view(np.uint64).tolist() == h
