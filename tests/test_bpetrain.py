"""Distributed BPE trainer vs an independent driver-side reference
implementing Sennrich-style get_stats + greedy leftmost merge with plain
Python loops (deliberately un-vectorized so the two share no code path)."""

from collections import Counter

import pyarrow as pa
import ray.data

from dedup_ray.stages.bpetrain import END_MARK, bpe_train


def _ref_bpe(texts: list[str], num_merges: int):
    hist = Counter(t for s in texts for t in s.split(" ") if t)
    vocab = {w: list(w) + [END_MARK] for w in hist}
    merges = []
    for r in range(1, num_merges + 1):
        stats: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += hist[w]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((r, a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):  # greedy leftmost non-overlapping
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _run(texts, num_merges, blocks=3):
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(blocks)
    out = bpe_train(ds, num_merges)
    return list(zip(out["merge_round"].to_pylist(),
                    out["left_sym"].to_pylist(),
                    out["right_sym"].to_pylist(),
                    out["pair_count"].to_pylist()))


def test_matches_reference_impl():
    texts = ["the cat sat on the mat", "the bat and the cat chat",
             "low lower lowest", "newer newest new"]
    assert _run(texts, 10) == _ref_bpe(texts, 10)


def test_repeated_symbol_parity():
    # 'aaaa' -> (a,a) counted 3x per word occurrence; greedy merges
    # positions 0 and 2 only (run parity) -> [aa, aa, </w>]; round 2 ties
    # (aa,aa) with (aa,</w>) and '<' sorts before 'a'
    texts = ["aaaa aaaa aaaa"]
    got = _run(texts, 3)
    assert got == _ref_bpe(texts, 3)
    assert got[0] == (1, "a", "a", 9)
    assert got[1] == (2, "aa", END_MARK, 3)


def test_partition_invariance_and_null():
    texts = ["repeat repeat repeat", None, "", "repeat offender"]
    clean = [t for t in texts if t]
    a = _run(texts, 5, blocks=1)
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(4)
    b = bpe_train(ds, 5)
    assert a == list(zip(b["merge_round"].to_pylist(),
                         b["left_sym"].to_pylist(),
                         b["right_sym"].to_pylist(),
                         b["pair_count"].to_pylist()))
    assert a == _ref_bpe(clean, 5)


def test_exhausted_corpus_stops_early():
    # one 2-symbol word type: round 1 merges it whole, round 2 has no pairs
    got = _run(["x x x"], 4)
    assert got == [(1, "x", END_MARK, 3)]


def test_encode_counts_match_reference():
    from dedup_ray.stages.bpetrain import bpe_encode_counts

    texts = ["the cat sat on the mat", "the bat and the cat chat",
             "low lower lowest", ""]
    hist_merges = _ref_bpe([t for t in texts if t], 6)
    # reference encode: replay merges per word
    vocab = {}
    for s in texts:
        for w in s.split(" "):
            if w:
                vocab[w] = list(w) + [END_MARK]
    for _, a, b, _ in hist_merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    want = [sum(len(vocab[w]) for w in s.split(" ") if w) for s in texts]

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    merges = bpe_train(ds, 6)
    out = bpe_encode_counts(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_bpe"].tolist() == want


def test_local_and_distributed_paths_agree():
    texts = ["the cat sat on the mat", "the bat and the cat chat",
             "aaaa aaaa banana bandana"]
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(3)
    local = bpe_train(ds, 6).to_pandas()
    dist = bpe_train(ds, 6, local_vocab_limit=0).to_pandas()
    assert local.equals(dist)
