"""String normalizers M2/M3 — exact regex chain of the reference.

``venue_author_preprocess.R:18-39`` applies, in order (order is
semantics-bearing: year/ordinal deletion happens BEFORE punctuation becomes
spaces):

1. delete ``[0-9]{4}|'|[0-9]+th|[0-9]+nd|[0-9]+st|[0-9]+rd|\\.``
2. map ``,|/|'|\"|-|:|\\(|\\)`` → single space
3. collapse runs of >=2 blanks (space/tab) → one space
4. strip leading blanks
5. (author fields only) lowercase the name

Implemented as a vectorized ``pyarrow.compute.replace_substring_regex``
chain (RE2; the same patterns are valid in DuckDB's regexp_replace for the
oracle)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PATTERN_DELETE = "[0-9]{4}|'|[0-9]+th|[0-9]+nd|[0-9]+st|[0-9]+rd|\\."
PATTERN_PUNCT = ",|/|'|\"|-|:|\\(|\\)"
PATTERN_BLANKS = "[ \t]{2,}"
PATTERN_LEADING = "^[ \t]+"


def normalize_array(arr, lowercase: bool = False):
    out = pc.replace_substring_regex(arr, pattern=PATTERN_DELETE, replacement="")
    out = pc.replace_substring_regex(out, pattern=PATTERN_PUNCT, replacement=" ")
    out = pc.replace_substring_regex(out, pattern=PATTERN_BLANKS, replacement=" ")
    out = pc.replace_substring_regex(out, pattern=PATTERN_LEADING, replacement="")
    if lowercase:
        out = pc.utf8_lower(out)
    return out


def normalize_columns(ds, cols: list[str], lowercase_cols: list[str] | None = None):
    """M2/M3 as a stateless batch transform (same column names out)."""
    lc = set(lowercase_cols or [])

    def f(batch: pa.Table) -> pa.Table:
        for c in cols:
            idx = batch.column_names.index(c)
            batch = batch.set_column(
                idx, c, normalize_array(batch[c], lowercase=c in lc)
            )
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def oracle_sql_expr(col: str, lowercase: bool = False) -> str:
    """The same chain as a DuckDB expression (for oracle_sql parity)."""
    e = f"regexp_replace({col}, '[0-9]{{4}}|''|[0-9]+th|[0-9]+nd|[0-9]+st|[0-9]+rd|\\.', '', 'g')"
    e = f"regexp_replace({e}, ',|/|''|\"|-|:|\\(|\\)', ' ', 'g')"
    e = f"regexp_replace({e}, '[ \t]{{2,}}', ' ', 'g')"
    e = f"regexp_replace({e}, '^[ \t]+', '', 'g')"
    if lowercase:
        e = f"lower({e})"
    return e
