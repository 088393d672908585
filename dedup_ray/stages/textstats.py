"""Text-analysis operators for training-data pipelines.

- tokenization/explode with the reference's null sentinel (``wordlist.py``
  M4) and global IDF (``IDF.py`` A1 — corpus-frequency, not doc-frequency);
- quality scoring (length / punctuation / stopword ratios);
- language ID (character-class + stopword n-gram heuristic, deterministic);
- document fingerprinting (winnowing: min rolling hash per window).

All stages are batch transforms over Arrow; floats are rounded to 6 decimals
at the emit point so results hash identically against the DuckDB oracles.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dedup_ray.util.dsutil import as_arrow
from dedup_ray.util.hashing import stable64

# small, fixed stopword sets per language (markers for the lang-id heuristic)
STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pas"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "de", "no"},
    "zh": set(),  # handled by the CJK character-class rule
}


def tokenize_explode(ds, id_col: str = "doc_id", text_col: str = "text"):
    """M4: one row per single-space-separated token; empty docs emit their
    own id as a sentinel token (``wordlist.py:24-27`` — never intersects)."""

    def f(batch: pa.Table) -> pa.Table:
        ids_out, toks = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            parts = [w for w in (t or "").split(" ") if w != ""]
            if not parts:
                parts = [str(i)]
            ids_out.extend([i] * len(parts))
            toks.extend(parts)
        return pa.table(
            {id_col: pa.array(ids_out), "token": pa.array(toks, pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def idf_table(token_ds, token_col: str = "token"):
    """A1: IDF(t) = total_token_rows / count(t) (corpus frequency, as
    ``IDF.py:15-17`` computes it).  Distributed: groupby count + count()."""
    total = token_ds.count()
    counts = token_ds.groupby(token_col).count()

    def f(batch: pa.Table) -> pa.Table:
        idf = pc.divide(float(total), pc.cast(batch["count()"], pa.float64()))
        return pa.table(
            {
                token_col: batch[token_col],
                "idf": pc.round(idf, ndigits=6),
            }
        )

    return counts.map_batches(f, batch_format="pyarrow")


_PUNCT_RE = re.compile(r"[^\w\s]", re.U)
_WORD_RE = re.compile(r"\w+", re.U)


def quality_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc quality features: n_chars, n_tokens, avg token len,
    stopword ratio (en), punct ratio.  Rounded to 6dp."""
    en_stop = STOPWORDS["en"]

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        toks = texts.map(lambda t: t.split())
        n_tokens = toks.map(len)
        n_chars = texts.map(len)
        avg_len = [
            round(sum(len(w) for w in ws) / len(ws), 6) if ws else 0.0 for ws in toks
        ]
        stop_ratio = [
            round(sum(1 for w in ws if w.lower() in en_stop) / len(ws), 6)
            if ws
            else 0.0
            for ws in toks
        ]
        punct_ratio = [
            round(len(_PUNCT_RE.findall(t)) / len(t), 6) if len(t) else 0.0
            for t in texts
        ]
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_chars": n_chars.astype("int64"),
                "n_tokens": n_tokens.astype("int64"),
                "avg_token_len": avg_len,
                "stopword_ratio": stop_ratio,
                "punct_ratio": punct_ratio,
            }
        )

    return as_arrow(ds.map_batches(f, batch_format="pandas"))


class LangId:
    """Actor-pool language-ID: stopword-hit + CJK character heuristic.

    Deterministic; state (compiled regex, marker sets) built once per actor
    (ST2 template).  Ties and no-signal default to 'en'.
    """

    def __init__(self) -> None:
        self.word = _WORD_RE
        self.cjk = re.compile(r"[一-鿿]")
        self.markers = {k: v for k, v in STOPWORDS.items() if v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch.column("text").to_pylist():
            t = t or ""
            if self.cjk.search(t):
                preds.append("zh")
                continue
            words = [w.lower() for w in self.word.findall(t)]
            best, best_n = "en", 0
            for lang in sorted(self.markers):
                n = sum(1 for w in words if w in self.markers[lang])
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


def lang_id(ds, concurrency: int = 2, batch_size: int = 1024):
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def fingerprint_docs(ds, id_col: str = "doc_id", text_col: str = "text",
                     window: int = 8, seed: int = 42):
    """Winnowing fingerprint: min of rolling token-window hashes (int64).

    The keyed analog of the reference's per-doc feature columns; robust to
    small edits (the min usually survives).
    """
    from dedup_ray.stages.shingle import shingle_hash_batch

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        values, offsets = shingle_hash_batch(texts, ids, window, seed)
        fps = np.minimum.reduceat(values, offsets[:-1]) if len(values) else (
            np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "fingerprint": pa.array(fps.view(np.int64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
