"""ExactSubstr coverage/cut (stages/exactsubstr.py) vs a brute-force
string-level reference: the operator's claim is EXACT duplicated-substring
coverage (Lee et al. 2022 semantics), so the oracle here works on real
substrings, catching both hash-kernel bugs and the coverage identity."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup_ray.stages.exactsubstr import (
    exact_substring_coverage,
    exact_substring_cut,
)


def _brute_cover(texts: list[str], L: int) -> list[set]:
    """Positions (per doc) covered by a substring of length >= L occurring
    more than once in the corpus == union of duplicated L-window spans."""
    from collections import Counter

    grams = Counter()
    for s in texts:
        for j in range(max(len(s) - L + 1, 0)):
            grams[s[j:j + L]] += 1
    covered = []
    for s in texts:
        cov = set()
        for j in range(max(len(s) - L + 1, 0)):
            if grams[s[j:j + L]] >= 2:
                cov.update(range(j, j + L))
        covered.append(cov)
    return covered


def _run(texts, L, ids=None, num_partitions=4, blocks=3):
    ids = list(range(len(texts))) if ids is None else ids
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(blocks)
    cov = exact_substring_coverage(
        ds, min_len=L, num_partitions=num_partitions
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    cut = exact_substring_cut(
        ds, min_len=L, num_partitions=num_partitions
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return cov, cut


CORPUS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "a wholly original document with no repeats at all in it anywhere",
    "the quick brown fox jumps over the lazy dog again and again tonight",
    "xx" * 40,                     # self-repetitive single doc
    "",                            # empty
    "short",                       # below L
]


def test_coverage_matches_bruteforce():
    L = 20
    ref = _brute_cover(CORPUS, L)
    cov, cut = _run(CORPUS, L)
    assert cov["nchars"].tolist() == [len(s) for s in CORPUS]
    assert cov["dup_chars"].tolist() == [len(c) for c in ref]
    want = ["".join(ch for j, ch in enumerate(s) if j not in c)
            for s, c in zip(CORPUS, ref)]
    assert cut["text"].tolist() == want
    # planted pair really was found
    assert cov["dup_chars"][0] > 0 and cov["dup_chars"][1] == 0


def test_partition_invariance():
    L = 20
    a, ca = _run(CORPUS, L, num_partitions=2, blocks=1)
    b, cb = _run(CORPUS, L, num_partitions=7, blocks=6)
    assert a.equals(b) and ca.equals(cb)


def test_non_ascii_char_semantics():
    # é is one CHAR; byte-window logic would misalign the shared span
    shared = "héllo wörld göes ön fine"  # 24 chars
    texts = ["A" + shared + "B", "C" + shared + "D", "unrelated ascii pad"]
    L = len(shared)
    ref = _brute_cover(texts, L)
    cov, cut = _run(texts, L)
    assert cov["dup_chars"].tolist() == [len(c) for c in ref] \
        == [L, L, 0]
    assert cut["text"].tolist() == ["AB", "CD", "unrelated ascii pad"]


def test_null_text_is_empty_page():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["abc" * 20, None], pa.string()),
    }))
    cov = exact_substring_coverage(ds, min_len=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert cov["nchars"].tolist() == [60, 0]
    assert cov["dup_chars"][0] > 0  # abcabc... self-repeats
    assert cov["dup_chars"][1] == 0


@pytest.mark.parametrize("L", [3, 8])
def test_random_corpus_property(L):
    rng = np.random.default_rng(0)
    texts = ["".join(rng.choice(list("abcd"), size=rng.integers(0, 60)))
             for _ in range(30)]
    ref = _brute_cover(texts, L)
    cov, cut = _run(texts, L)
    assert cov["dup_chars"].tolist() == [len(c) for c in ref]
    want = ["".join(ch for j, ch in enumerate(s) if j not in c)
            for s, c in zip(texts, ref)]
    assert cut["text"].tolist() == want


def test_joined_coverage_equals_broadcast():
    from dedup_ray.stages.exactsubstr import exact_substring_coverage_joined

    L = 20
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
        "text": pa.array(CORPUS, pa.string()),
    })).repartition(3)
    a = exact_substring_coverage(ds, min_len=L, num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = exact_substring_coverage_joined(ds, min_len=L, num_partitions=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
