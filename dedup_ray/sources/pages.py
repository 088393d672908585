"""Synthetic Common-Crawl-style ``pages`` corpora (fixture F1 in FIXTURES.md).

North-rule input shape (BASELINE.json ``input_hint``)::

    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: large_string, lang: string)

Two generators:

- :func:`planted_pages` — small driver-side corpus with *planted* duplicate
  structure (exact dups, near dups, substring containment, boilerplate
  hot-key, cross-language negatives) and a ``pages_truth(url, cluster_id)``
  table.  Drives the recall>=0.99 tests.
- :func:`pages_from_documents` — Ray Data pipeline that turns the driver's
  ``documents.parquet`` into a pages table (optionally amplified by an
  integer factor with deterministic mutations) for smoke/bench runs.

The HTML wrapper is the byte-exact inverse of
:mod:`dedup_ray.stages.extract`: ``extract(wrap_html(text)) == text``.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

from dedup_ray.util.hashing import stable64

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

_VOCAB = (
    "the quick brown fox jumps over lazy dog stream data shuffle partition "
    "block batch arrow ray cluster node worker actor object store spill "
    "hash join group sort merge scan filter map reduce window token shingle "
    "signature band bucket edge graph component cloud index vector page web "
    "crawl corpus text html body title link anchor paragraph section"
).split()

BOILERPLATE = (
    "this website uses cookies to ensure you get the best experience "
    "on our website accept decline privacy policy terms of service"
)


def wrap_html(text: str, title: str = "") -> bytes:
    """Wrap extracted text into minimal deterministic HTML.

    Paragraph structure: each ``\\n``-separated line of ``text`` becomes one
    ``<p>`` element.  Entities are escaped so extraction is byte-exact.
    """
    paras = "".join(f"<p>{_html.escape(p, quote=False)}</p>" for p in text.split("\n"))
    doc = (
        f"<html><head><title>{_html.escape(title, quote=False)}</title>"
        f"<style>body{{margin:0}}</style></head>"
        f"<body><script>var x=1;</script>{paras}</body></html>"
    )
    return doc.encode("utf-8")


def _rng(seed: int, tag: str) -> np.random.Generator:
    return np.random.default_rng(stable64(tag, seed=seed))


def _base_text(rng: np.random.Generator, n_tokens: int) -> str:
    return " ".join(rng.choice(_VOCAB, size=n_tokens))


def mutate_text(text: str, edit_frac: float, rng: np.random.Generator) -> str:
    """Deterministic near-duplicate: replace/delete/insert ~edit_frac of tokens."""
    toks = text.split(" ")
    n_edit = max(1, int(len(toks) * edit_frac))
    pos = rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
    out = list(toks)
    for p in sorted(pos, reverse=True):
        op = rng.integers(0, 3)
        if op == 0:
            out[p] = str(rng.choice(_VOCAB))
        elif op == 1 and len(out) > 1:
            del out[p]
        else:
            out.insert(p, str(rng.choice(_VOCAB)))
    return " ".join(out)


def planted_pages(
    n_base: int = 200, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Small corpus with planted duplicate clusters + truth table.

    Per base doc ``i`` (cluster ``i``):
      - ``i % 5 == 0``: one exact duplicate (identical text, different url);
      - ``i % 5 == 1``: two near duplicates (1–5% token edits);
      - ``i % 5 == 2``: a substring-containment page (text embedded in a
        longer page) — truth puts it in the same cluster (suffix-array path);
      - ``i % 7 == 0``: the boilerplate cookie banner is appended as a second
        paragraph (hot-band pressure; must NOT merge distinct docs);
      - ``i % 11 == 0``: a cross-language "translated" negative — distinct
        token vocabulary, own cluster.
    """
    urls, texts, langs, clusters = [], [], [], []

    def add(url: str, text: str, lang: str, cid: int) -> None:
        urls.append(url)
        texts.append(text)
        langs.append(lang)
        clusters.append(cid)

    next_extra = n_base  # cluster ids for singleton negatives
    for i in range(n_base):
        rng = _rng(seed, f"base/{i}")
        text = _base_text(rng, int(rng.integers(40, 120)))
        if i % 7 == 0:
            text = text + "\n" + BOILERPLATE
        add(f"https://site{i % 13}.example/p/{i}", text, "en", i)
        if i % 5 == 0:
            add(f"https://mirror.example/p/{i}", text, "en", i)
        elif i % 5 == 1:
            for j in range(2):
                m = mutate_text(text, 0.01 + 0.02 * j, _rng(seed, f"near/{i}/{j}"))
                add(f"https://near{j}.example/p/{i}", m, "en", i)
        elif i % 5 == 2:
            pad_rng = _rng(seed, f"pad/{i}")
            longer = (
                _base_text(pad_rng, 30) + " " + text + " " + _base_text(pad_rng, 30)
            )
            add(f"https://longer.example/p/{i}", longer, "en", i)
        if i % 11 == 0:
            zh_rng = _rng(seed, f"zh/{i}")
            zh = " ".join(f"w{int(z)}" for z in zh_rng.integers(0, 500, size=60))
            add(f"https://zh.example/p/{i}", zh, "zh", next_extra)
            next_extra += 1

    ts = pa.array(
        [EPOCH_US + 1_000_000 * k for k in range(len(urls))], pa.timestamp("us")
    )
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(
                [wrap_html(t, title=u) for t, u in zip(texts, urls)], pa.binary()
            ),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "cluster_id": pa.array(clusters, pa.int64()),
        }
    )
    return pages, truth


def pages_from_documents(
    sf_dir: str, amplify: int = 1, seed: int = 42, text_repeat: int = 1
):
    """documents.parquet → pages Dataset (optionally amplified with dups).

    With ``amplify=f``, each document yields ``f`` pages in three classes
    mirroring web-crawl duplicate structure: copy 0 is the original,
    ``k%3==1`` are exact duplicates (mirrors), ``k%3==2`` are true
    near-duplicates (1-4% token edits — syndication/edits), and ``k%3==0``
    (k>0) are UNIQUE pages (fresh deterministic text) — so the corpus mixes
    clear dups with genuinely distinct documents instead of a mutation
    ladder of borderline cases.  ``text_repeat=r`` tiles each document's
    text r times (distinct paragraphs), scaling page size toward realistic
    web-page length without changing the duplicate-pair structure.  Runs as
    a distributed ``map_batches``; only (doc_id, text, lang) leave the
    driver.
    """
    import pyarrow.parquet as pq
    import ray.data

    path = f"{sf_dir}/documents.parquet"
    # The source table is tiny (the AMPLIFIED corpus is the bench payload),
    # so slice it into ~64-doc blocks on the driver instead of paying
    # read_parquet's per-block streaming overhead: block count here sets
    # the task granularity of the fused generate→extract→sign chain.
    src = pq.read_table(path, columns=["doc_id", "text", "lang"])
    n_rows = src.num_rows
    step = 64
    ds = ray.data.from_arrow(
        [src.slice(i, step) for i in range(0, n_rows, step)]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        src_texts = batch["text"].to_pylist()
        src_langs = batch["lang"].to_pylist()
        urls, texts, langs, ts = [], [], [], []
        for doc_id, text, lang in zip(doc_ids, src_texts, src_langs):
            text = text or ""
            if text_repeat > 1:
                # tile with a distinct marker token per copy so the tiled
                # page is not trivially self-similar
                text = "\n".join(
                    f"part{r} {text}" for r in range(text_repeat)
                )
            for k in range(amplify):
                if k == 0 or k % 3 == 1:
                    t = text  # original / exact duplicate
                elif k % 3 == 2:
                    t = mutate_text(
                        text,
                        0.01 + 0.01 * (k % 4),
                        _rng(seed, f"amp/{doc_id}/{k}"),
                    )
                else:  # k%3==0, k>0: unique page — tokens drawn from a
                    # ~10^9 space so distinct pages share no shingles even
                    # at large amplification (a small vocab would make
                    # "unique" pages random near-dups of each other)
                    rng = _rng(seed, f"uniq/{doc_id}/{k}")
                    n_tok = max(20, len(text.split(" ")))
                    t = " ".join(
                        f"u{v}" for v in rng.integers(0, 1_000_000_000, size=n_tok)
                    )
                urls.append(f"https://doc{doc_id}.example/v/{k}")
                texts.append(t)
                langs.append(lang)
                ts.append(EPOCH_US + 1_000_000 * (doc_id * amplify + k))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(
                    [wrap_html(t, title=u) for t, u in zip(texts, urls)], pa.binary()
                ),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    # Small batch size on purpose: this map fuses with the downstream
    # extract+sign actor-pool chain, so its batch size sets the TASK
    # granularity of the whole text pass.  64 source docs × amplify pages
    # per call keeps enough tasks in flight to fill the pool (and the block
    # count it produces sets the width of every downstream sort-reduce).
    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=64)


def amplified_truth(sf_dir: str, amplify: int):
    """Ground-truth clusters implied by :func:`pages_from_documents` urls.

    Copy classes per base doc ``d``: ``k == 0`` (original) and
    ``k % 3 ∈ {1, 2}`` (exact mirror / near-dup) belong to cluster
    ``…/v/0``; ``k % 3 == 0, k > 0`` (unique pages) are singletons.
    Returns Dataset(url, cluster_id) — drives the bench's recall report.
    """
    import pyarrow.parquet as pq
    import ray.data

    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ds = ray.data.from_arrow(
        [src.slice(i, 256) for i in range(0, src.num_rows, 256)]
    )

    def truth(batch: pa.Table) -> pa.Table:
        urls, cids = [], []
        for doc_id in batch["doc_id"].to_pylist():
            root = f"https://doc{doc_id}.example/v/0"
            for k in range(amplify):
                url = f"https://doc{doc_id}.example/v/{k}"
                urls.append(url)
                cids.append(root if (k == 0 or k % 3 in (1, 2)) else url)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "cluster_id": pa.array(cids, pa.string()),
            }
        )

    return ds.map_batches(truth, batch_format="pyarrow", batch_size=256)


def pages_tiered(sf_dir: str, min_tokens: int = 40):
    """documents → pages with TIER-SEPARABLE planted duplicates.

    Per qualifying document (≥ ``min_tokens`` whitespace tokens, so the
    near-dup's shingle Jaccard ≥ (n-k+1)/(n-k+2) ≈ 0.97 is far above the
    verify threshold and LSH miss probability is ~0): three pages —

    - ``v/0`` the original,
    - ``v/1`` a byte-exact mirror (→ the EXACT tier must union it),
    - ``v/2`` the text with ONE marker token appended (→ never byte-equal,
      so only a NEAR tier can union it).

    Unlike :func:`pages_from_documents`' ``mutate_text`` (whose random
    replacement can coincidentally reproduce the original, shifting a pair
    from the near tier to the exact tier), the appended token makes the
    tier attribution of every planted union a deterministic function of
    the document count — which is what lets ``dedup_tier_report``'s SQL
    oracle derive per-tier union counts from ``count(documents)``.
    """
    import pyarrow.parquet as pq
    import ray.data

    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    ds = ray.data.from_arrow(
        [src.slice(i, 64) for i in range(0, src.num_rows, 64)]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        urls, texts, langs, ts = [], [], [], []
        for doc_id, text, lang in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            text = text or ""
            if len(text.split(" ")) < min_tokens:
                continue
            for k, t in enumerate((text, text, text + f" ndup{doc_id}")):
                urls.append(f"https://doc{doc_id}.example/v/{k}")
                texts.append(t)
                langs.append(lang)
                ts.append(EPOCH_US + 1_000_000 * (doc_id * 3 + k))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(
                    [wrap_html(t, title=u) for t, u in zip(texts, urls)],
                    pa.binary(),
                ),
                "text": pa.array(texts, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=64)
