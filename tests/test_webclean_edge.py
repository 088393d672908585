"""Edge-corpus robustness: new operators on empty / single-doc / empty-text
inputs (the exchange emits schema-less empty blocks — the known hazard)."""

import pyarrow as pa

import ray.data

from dedup_ray.stages.packing import pack_sequences, token_counts
from dedup_ray.stages.ordering import shuffle_rank
from dedup_ray.stages.sketch import hll_estimate, hll_token_registers
from dedup_ray.stages.webclean import (
    explode_token_lines,
    line_dedup,
    reassemble_docs,
    repetition_quality,
)


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


EMPTY = _docs([])
SINGLE = _docs(["one tiny doc"])
BLANK = _docs([""])


def test_line_dedup_edges():
    assert line_dedup(explode_token_lines(EMPTY), num_partitions=2) \
        .count() == 0
    out = line_dedup(explode_token_lines(SINGLE), num_partitions=2) \
        .to_pandas()
    assert out.line.tolist() == ["one tiny doc"]
    # empty text still yields its (empty-string) line deterministically
    blank = line_dedup(explode_token_lines(BLANK), num_partitions=2) \
        .to_pandas()
    assert blank.line.tolist() == [""]


def test_reassemble_edges():
    assert reassemble_docs(explode_token_lines(EMPTY),
                           num_partitions=2).count() == 0
    out = reassemble_docs(explode_token_lines(SINGLE),
                          num_partitions=2).to_pandas()
    assert out.text.tolist() == ["one tiny doc"]


def test_quality_edges():
    assert repetition_quality(EMPTY).count() == 0
    out = repetition_quality(BLANK).to_pandas()
    # "" splits to one empty token: 1 word of length 0
    assert out.n_words.tolist() == [1]
    assert out.keep.tolist() == [0]


def test_packing_edges():
    assert pack_sequences(token_counts(EMPTY), budget=64,
                          num_partitions=2).count() == 0
    out = pack_sequences(token_counts(SINGLE), budget=64,
                         num_partitions=2).to_pandas()
    assert out.seq_id.tolist() == [0]
    assert out.seq_offset.tolist() == [0]


def test_shuffle_rank_edges():
    assert shuffle_rank(EMPTY, num_partitions=2).count() == 0
    out = shuffle_rank(SINGLE, num_partitions=2).to_pandas()
    assert out["rank"].tolist() == [0]


def test_sketch_edges():
    regs = hll_token_registers(EMPTY).to_pandas()
    assert len(regs) == 0
    assert hll_estimate(regs) == 0.0
    regs1 = hll_token_registers(SINGLE).to_pandas()
    assert len(regs1) == 3  # three distinct tokens -> three registers


def test_null_text_policy():
    """Null text == empty page across every text kernel (the crawler row
    with no extracted text must not crash or emit garbage)."""
    from dedup_ray.stages.packing import token_counts
    from dedup_ray.stages.sketch import hll_token_registers
    from dedup_ray.stages.webclean import _gram_hashes

    nulls = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["real words here", None], pa.string()),
    }))
    lines = line_dedup(explode_token_lines(nulls), num_partitions=2) \
        .to_pandas()
    assert set(lines[lines.doc_id == 1].line) == {""}
    q = repetition_quality(nulls).to_pandas().sort_values("doc_id")
    assert q.n_words.tolist() == [3, 1]  # null -> "" -> one empty token
    assert q.keep.tolist() == [0, 0]
    tc = token_counts(nulls).to_pandas().sort_values("doc_id")
    assert tc.n_tokens.tolist() == [3, 1]
    assert hll_token_registers(nulls).count() >= 3
    di, gh = _gram_hashes(pa.array(["a b", None]), 2)
    assert (di == 0).all()


def test_frequent_ngrams_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from collections import Counter

    from dedup_ray.stages.webclean import frequent_ngrams

    texts = ["click here to subscribe now", "click here to unsubscribe",
             "please click here to subscribe", None, "", "one two",
             "to subscribe click here to subscribe"]
    n = 3
    ref = Counter()
    for s in texts:
        toks = [t for t in (s or "").split(" ") if t]
        for i in range(len(toks) - n + 1):
            ref[" ".join(toks[i:i + n])] += 1
    want = sorted(((g, c) for g, c in ref.items() if c >= 2),
                  key=lambda gc: (-gc[1], gc[0]))[:10]
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(3)
    out = frequent_ngrams(ds, n=n, min_count=2, top_k=10).to_pandas()
    assert list(zip(out["gram"], out["n"])) == want
    assert ("click here to", 4) in want  # cross-doc counts accumulate


def test_fuzzy_decontaminate_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.webclean import (
        benchmark_gram_index,
        fuzzy_decontaminate,
    )

    bench_texts = ["the quick brown fox jumps over the lazy dog",
                   "an entirely different benchmark sentence here"]
    train_texts = ["the quick brown fox jumps over a sleepy dog today",
                   "nothing in common with anything at all",
                   "an entirely different benchmark sentence here too",
                   None]
    W = 3

    def grams(s):
        toks = (s or "").split(" ")
        return {" ".join(toks[i:i + W]) for i in range(len(toks) - W + 1)}

    want = []
    for ti, ts in enumerate(train_texts):
        tg = grams(ts)
        for bi, bs in enumerate(bench_texts):
            bg = grams(bs)
            inter = len(tg & bg)
            if tg and inter / len(tg) >= 0.2:
                want.append((ti, 100 + bi, inter,
                             round(inter / len(tg), 6),
                             round(inter / (len(tg) + len(bg) - inter), 6)))

    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(bench_texts, pa.string())}))
    train = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(train_texts)), pa.int64()),
        "text": pa.array(train_texts, pa.string())})).repartition(2)
    idx = benchmark_gram_index(bench, width=W)
    out = fuzzy_decontaminate(train, idx, width=W, min_containment=0.2) \
        .to_pandas().sort_values(["doc_id", "bench_id"])
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == sorted(want)
    assert any(r[0] == 0 for r in got) and any(r[0] == 2 for r in got)
    assert not any(r[0] == 1 for r in got)


def test_frequent_ngrams_cms_equals_exact():
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.webclean import frequent_ngrams, frequent_ngrams_cms

    texts = (["click here to subscribe now"] * 4
             + ["one off sentence with no repeats at all",
                "click here to unsubscribe today please",
                None, ""])
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(3)
    exact = frequent_ngrams(ds, n=3, min_count=2, top_k=20).to_pandas()
    cms = frequent_ngrams_cms(ds, n=3, min_count=2, top_k=20).to_pandas()
    assert exact.equals(cms)  # CMS prefilter is output-equal by design
