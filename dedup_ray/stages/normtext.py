"""Unicode text normalization for web corpora.

Web-crawled text arrives with mixed Unicode composition (é as one
codepoint or e+combining accent), stray C0 control bytes from bad
decodes, CRLF/CR line endings, exotic horizontal whitespace (NBSP, CJK
space, thin spaces) and run-on blank lines.  Every downstream exact /
near-dup signature treats these as distinct bytes, so two renderings of
the same page dedup only if normalization runs first.

The spec is data, not code: ``NORM_RULES`` is an ordered RE2 rule list
applied after NFC canonicalization, and the DuckDB oracle is GENERATED
from the same list at import time (:func:`norm_sql_expr`) — the same
kernel-vs-oracle sharing the URL canonicalizer uses, so the two cannot
drift.

NFC itself runs through Python ``unicodedata`` (a C loop,
Unicode-table-matched to DuckDB's ``nfc_normalize`` in this image —
verified codepoint-for-codepoint; this build's
``pyarrow.compute.utf8_normalize`` only DEcomposes regardless of the
requested form and cannot be used).  A vectorized bytes==chars screen
skips pure-ASCII rows, and ``str.isascii()`` (also C) skips ASCII rows
inside a mixed batch — web corpora are ASCII-dominant, so the per-row
path touches a small minority.

Null policy: null text == empty page (house rule, policy-tested).
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# Ordered (pattern, replacement) RE2 rules, applied after NFC.  ORDER
# MATTERS: whitespace runs collapse to one space (3) before the
# around-newline trim (4), which therefore only needs to eat one space
# per side; blank-line squeeze (5) runs after CR canonicalization (2).
NORM_RULES: tuple[tuple[str, str], ...] = (
    # C0 controls except \t \n \r, plus DEL — bad-decode debris
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),
    # CRLF / lone CR → LF
    (r"\r\n?", "\n"),
    # horizontal whitespace runs (incl. NBSP, ogham, en/em/thin spaces,
    # narrow NBSP, math space, CJK space) → one ASCII space
    (r"[ \t\x{00a0}\x{1680}\x{2000}-\x{200a}\x{202f}\x{205f}\x{3000}]+",
     " "),
    # spaces hugging a newline (post-collapse: at most one per side)
    (r" ?\n ?", "\n"),
    # 2+ blank lines → one blank line
    (r"\n{3,}", "\n\n"),
)


def nfc_array(arr) -> pa.Array:
    """NFC-normalize a string array; nulls become empty strings.

    Pure-ASCII batches return after two vectorized length kernels; mixed
    batches pay one C-level pass with ``isascii`` short-circuits.
    """
    s = pc.fill_null(arr, "")
    needs = pc.any(
        pc.not_equal(pc.binary_length(s), pc.utf8_length(s))
    ).as_py()
    if not needs:
        return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    return pa.array(
        [
            v if v.isascii() else unicodedata.normalize("NFC", v)
            for v in s.to_pylist()
        ],
        type=pa.large_string()
        if pa.types.is_large_string(s.type)
        else pa.string(),
    )


def normalize_column(arr) -> pa.Array:
    """NFC + the ``NORM_RULES`` chain over one string array."""
    s = nfc_array(arr)
    for pat, repl in NORM_RULES:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return s


def normalize_text(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) → (id, text) with NFC + rule-chain normalization.

    One streaming map, no shuffle; run it BEFORE signing so byte-level
    rendering differences cannot defeat exact/near dedup.
    """

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: t[id_col], text_col: normalize_column(t[text_col])}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _sql_str(s: str) -> str:
    """Escape-literal form of a replacement string for DuckDB (e'...')."""
    return (
        "e'"
        + s.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")
        + "'"
    )


def norm_sql_expr(col: str) -> str:
    """DuckDB expression equivalent to :func:`normalize_column`, generated
    from the SAME rule list (patterns are RE2 on both engines; plain
    '...' literals keep backslashes verbatim)."""
    expr = f"nfc_normalize(coalesce({col}, ''))"
    for pat, repl in NORM_RULES:
        expr = f"regexp_replace({expr}, '{pat}', {_sql_str(repl)}, 'g')"
    return expr


def fold_text(ds, text_col: str = "text", id_col: str = "doc_id",
              out_col: str = "folded"):
    """Case/accent folding for dedup normalization: strip combining
    accents (NFD → drop Mn marks — verified char-for-char against
    DuckDB's ``strip_accents`` on the Latin range; both leave ß æ ø đ ł œ
    untouched), then Unicode lowercase.  ASCII batches skip the NFD pass
    (zero-copy check, the ``normalize_text`` trick); mixed batches fold
    per doc via ``unicodedata``.

    Rendering variants of one page ("Café" vs "Cafe", headline case
    changes) collapse to one digest under exact dedup — the doctrine of
    ``venue_author_preprocess.R:18-39`` (reference normalizes BEFORE
    comparing) applied to accents and case.
    """
    import unicodedata

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.coalesce(texts, pa.scalar("", texts.type))
        nbytes = pc.sum(pc.binary_length(texts)).as_py() or 0
        nchars = pc.sum(pc.utf8_length(texts)).as_py() or 0
        if nbytes != nchars:  # non-ASCII present: strip accents per doc
            stripped = [
                "".join(c for c in unicodedata.normalize("NFD", s)
                        if not unicodedata.combining(c))
                for s in texts.to_pylist()
            ]
            texts = pa.array(stripped, pa.string())
        return pa.table({
            id_col: t[id_col],
            out_col: pc.utf8_lower(texts),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# Named HTML entities: the head of the web-text distribution, ordered so
# specific entities decode BEFORE ``&amp;`` — a double-encoded
# ``&amp;lt;`` must decode ONE level (to the literal ``&lt;``), which
# falls out of running the ``&amp;`` rule last.  Literal (not regex)
# pairs: the kernel chains ``pc.replace_substring`` and the oracle
# chains ``replace()`` over the SAME list, so they cannot drift.
# Numeric character references (&#NN; / &#xHH;) are out of scope here —
# decoding them requires computed codepoints no SQL replace can express;
# the import-gated ``html.unescape`` path below covers them when full
# fidelity matters more than oracle checkability.
ENTITY_RULES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&ndash;", "–"),
    ("&mdash;", "—"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&hellip;", "…"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&eacute;", "é"),
    ("&amp;", "&"),  # LAST — see ordering note above
)


def decode_entities_column(arr) -> pa.Array:
    """Chain the ``ENTITY_RULES`` literal replaces over one string array."""
    out = pc.coalesce(arr, pa.scalar("", pa.string()))
    for lit, repl in ENTITY_RULES:
        out = pc.replace_substring(out, pattern=lit, replacement=repl)
    return out


def decode_entities(ds, id_col: str = "doc_id", text_col: str = "text",
                    full: bool = False):
    """HTML entity decoding for extracted text (C4/CCNet cleaning step —
    extractor output routinely leaks ``&amp;``-encoded characters, which
    then corrupt shingles and dedup keys).  ``full=True`` swaps in
    stdlib ``html.unescape`` (all named + numeric references; per-row C
    loop with a vectorized has-``&`` prescreen) — the production
    fidelity path; the default rule chain is the oracle-checkable spec.
    """

    def f(t: pa.Table) -> pa.Table:
        if full:
            import html

            col = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
            has = pc.match_substring(col, "&")
            vals = col.to_pylist()
            dec = [
                html.unescape(v) if m else v
                for v, m in zip(vals, has.to_pylist())
            ]
            out = pa.array(dec, pa.string())
        else:
            out = decode_entities_column(t[text_col])
        return pa.table({id_col: t[id_col], text_col: out})

    return ds.map_batches(f, batch_format="pyarrow")


def entity_sql_expr(col: str) -> str:
    """DuckDB expression equivalent to :func:`decode_entities_column`,
    generated from the SAME rule list."""
    expr = f"coalesce({col}, '')"
    for lit, repl in ENTITY_RULES:
        expr = f"replace({expr}, {_sql_str(lit)}, {_sql_str(repl)})"
    return expr
