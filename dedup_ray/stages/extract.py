"""HTML → text extraction (the north-rule per-row invariant stage).

The reference's ingest explodes nested JSON into long-form tables
(``data_transfer.R:26-45``, SURVEY.md M1); the web-payload analog is a
streaming ``map_batches`` over the zero-copy Arrow ``html: binary`` column
producing the ``text`` column.  The extractor is pinned and deterministic
(stdlib ``html.parser``, no version-floating third-party lib) because the
per-row invariant is *byte-identical text per url* — it is the exact inverse
of :func:`dedup_ray.sources.pages.wrap_html`, and the pytest fixture checks
equality against the oracle ``text`` column.

Parsing is inherently per-document; the stage stays Arrow-native at the
batch boundary (binary in, large_string out) and is embarrassingly parallel.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

_SKIP_TAGS = frozenset({"script", "style", "head", "title", "noscript"})
_BLOCK_TAGS = frozenset(
    {"p", "div", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6", "section",
     "article", "blockquote", "pre"}
)


class _TextExtractor(HTMLParser):
    """Collects block-level text; blocks join with '\\n'."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self._skip = 0
        self._open_block = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
            self._open_block = True
        elif tag == "br":
            self._buf.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            # a closed block always contributes a (possibly empty) line
            self.blocks.append("".join(self._buf))
            self._buf = []
            self._open_block = False

    def handle_data(self, data):
        if self._skip == 0:
            self._buf.append(data)

    def _flush(self) -> None:
        if self._buf:
            chunk = "".join(self._buf)
            if chunk.strip():
                self.blocks.append(chunk)
            self._buf = []

    def text(self) -> str:
        self._flush()
        return "\n".join(self.blocks)


def extract_text_bytes(html: bytes) -> str:
    """Extract visible text from one HTML document (deterministic)."""
    p = _TextExtractor()
    p.feed(html.decode("utf-8", "replace"))
    p.close()
    return p.text()


class HtmlExtract:
    """Actor-pool stage: pages(html) → +text column.

    Use as ``ds.map_batches(HtmlExtract, batch_format="pyarrow",
    concurrency=N, batch_size=B)``.  Stateless in practice, but kept as a
    callable class so heavier extractors (models, tag dictionaries) slot in
    with once-per-actor setup (SURVEY.md ST2 template).
    """

    def __init__(self, out_col: str = "text", html_col: str = "html") -> None:
        self.out_col = out_col
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        texts = pa.array([extract_text_bytes(h) for h in htmls], pa.large_string())
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, texts)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless per-batch extraction (task pool; no actor startup cost)."""
    return HtmlExtract()(batch)


def extract_pages(ds, concurrency: int | None = None, batch_size: int = 512):
    """pages Dataset (with html) → Dataset with freshly extracted ``text``."""
    return ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size
    )


def tag_sequence(ds, html_col: str = "html_str", out_col: str = "tagseq"):
    """Template fingerprint input: the page's OPENING-tag sequence.

    Boilerplate/template detection clusters pages by markup STRUCTURE, not
    content (pages rendered by one CMS template share a tag skeleton even
    when every word differs) — the structural analog of the text-side
    near-dup tiers.  Matches the oracle's
    ``regexp_extract_all(html, '<([a-z0-9]+)', 1)`` exactly: each ``<``
    followed by a lowercase-alnum run emits that run; closing tags,
    comments and doctypes emit nothing.  Vectorized: ONE split on ``<``,
    one RE2 ``extract_regex`` over the flat fragments, then a per-batch
    pandas groupby-join to reassemble each page's ``>``-separated
    sequence.  Zero shuffles.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        htmls = t[html_col]
        if isinstance(htmls, pa.ChunkedArray):
            htmls = htmls.combine_chunks()
        htmls = pc.coalesce(htmls, pa.scalar("", htmls.type))
        parts = pc.split_pattern(htmls, "<")
        flat = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        offs = parts.offsets.to_numpy(zero_copy_only=False)
        pos = np.arange(len(par)) - offs[par]
        tag = pc.struct_field(
            pc.extract_regex(flat, r"^(?P<t>[a-z0-9]+)"), "t")
        ok = (pos > 0) & pc.is_valid(tag).to_numpy(zero_copy_only=False)
        joined = (
            pd.Series(tag.filter(pa.array(ok)).to_numpy(
                zero_copy_only=False), index=par[ok], dtype=object)
            .groupby(level=0).agg(">".join)
        )
        out = np.full(t.num_rows, "", dtype=object)
        out[joined.index.to_numpy()] = joined.to_numpy()
        res = t.drop_columns([c for c in (out_col,) if c in t.column_names])
        return res.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")
