"""Phonetic blocking keys (American Soundex, Russell & Odell; the coding
described in Knuth TAOCP vol. 3 §5 and the US census spec).

Phonetic keys are the classic record-linkage BLOCKING function for name
fields (the reference blocks on the ambiguous author name itself,
``Makefile:6-25``; Soundex is the standard fuzzier variant): names that
sound alike get equal 4-char keys, so candidate pairs are generated
within key groups instead of all-pairs.

Convention pinned here (shared constant-for-constant with the generated
SQL twin, :func:`soundex_sql`):

- letter → digit: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6
- A E I O U Y are separators (reset adjacency), H W are transparent
  (adjacent same codes across h/w collapse), non-alpha resets like a
  vowel
- the first letter is kept verbatim (uppercased) and its code seeds the
  duplicate-suppression state; the key is letter + 3 digits, zero
  padded; coding reads at most ``SOUNDEX_WIDTH`` characters.

The kernel is vectorized ACROSS rows — the automaton loops over the
(bounded) character positions with numpy state arrays, never over rows.
"""

from __future__ import annotations

import numpy as np

SOUNDEX_WIDTH = 12  # positions read; 3 digits almost always fill sooner

_GROUPS = ["bfpv", "cgjkqsxz", "dt", "l", "mn", "r"]
_VOWELS = "aeiouy"
_TRANSPARENT = "hw"

# char byte -> code: 1..6 digit, 0 vowel separator, 7 transparent,
# -1 non-alpha (resets like a vowel)
_CODE = np.full(256, -1, dtype=np.int8)
for _d, _g in enumerate(_GROUPS, start=1):
    for _c in _g:
        _CODE[ord(_c)] = _d
        _CODE[ord(_c.upper())] = _d
for _c in _VOWELS:
    _CODE[ord(_c)] = 0
    _CODE[ord(_c.upper())] = 0
for _c in _TRANSPARENT:
    _CODE[ord(_c)] = 7
    _CODE[ord(_c.upper())] = 7


def soundex_array(names) -> np.ndarray:
    """Vectorized Soundex over an iterable of strings → array of 4-char
    keys ('' for empty/non-alpha-initial input)."""
    names = list(names)
    n = len(names)
    buf = np.zeros((n, SOUNDEX_WIDTH), dtype=np.uint8)
    for r, s in enumerate(names):  # ingest only; the automaton is columnar
        b = (s or "").encode("ascii", "replace")[:SOUNDEX_WIDTH]
        buf[r, :len(b)] = np.frombuffer(b, dtype=np.uint8)

    codes = _CODE[buf]  # (n, W)
    first = buf[:, 0]
    alpha_first = ((first >= 65) & (first <= 90)) | \
        ((first >= 97) & (first <= 122))
    first_up = np.where((first >= 97) & (first <= 122), first - 32, first)

    digits = np.zeros((n, 3), dtype=np.int8)
    n_dig = np.zeros(n, dtype=np.int64)
    last = np.where(codes[:, 0] > 0, codes[:, 0], 0).astype(np.int8)
    last = np.where(codes[:, 0] == 7, 0, last)  # h/w first: nothing to seed
    for k in range(1, SOUNDEX_WIDTH):
        c = codes[:, k]
        emit = (c >= 1) & (c <= 6) & (c != last) & (n_dig < 3) & alpha_first
        for slot in range(3):
            here = emit & (n_dig == slot)
            digits[here, slot] = c[here]
        n_dig[emit] += 1
        # state update: digit -> becomes last; vowel/non-alpha -> reset;
        # h/w -> transparent (keep)
        last = np.where((c >= 1) & (c <= 6), c,
                        np.where(c == 7, last, 0)).astype(np.int8)
    out = np.empty(n, dtype=object)
    dig_chr = digits + ord("0")
    for r in range(n):  # assembly of tiny fixed-width keys
        if not alpha_first[r]:
            out[r] = ""
        else:
            out[r] = chr(first_up[r]) + bytes(dig_chr[r]).decode("ascii")
    return out


def soundex_sql(col: str) -> str:
    """DuckDB expression computing the identical key: the same automaton
    unrolled over the ``SOUNDEX_WIDTH`` character positions, generated
    from the same code table (a LATERAL chain carrying the
    (digits, last_code) state per position)."""
    def code_expr(ch: str) -> str:
        cases = []
        for d, g in enumerate(_GROUPS, start=1):
            lets = ", ".join(f"'{c}'" for c in g)
            cases.append(f"WHEN {ch} IN ({lets}) THEN {d}")
        vow = ", ".join(f"'{c}'" for c in _VOWELS)
        hw = ", ".join(f"'{c}'" for c in _TRANSPARENT)
        return ("CASE " + " ".join(cases)
                + f" WHEN {ch} IN ({vow}) THEN 0"
                + f" WHEN {ch} IN ({hw}) THEN 7 ELSE -1 END")

    # normalized lowercase name, position chain as nested CTE-less exprs
    # built with one struct-carrying subquery per position via lateral
    # column reuse in a SELECT chain.
    steps = [f"SELECT {col} AS nm, lower({col}) AS lo, '' AS d, "
             f"(CASE WHEN {code_expr('substr(lower(' + col + '), 1, 1)')}"
             f" IN (7, -1, 0) THEN "
             f"(CASE WHEN {code_expr('substr(lower(' + col + '), 1, 1)')}"
             f" = 7 THEN 0 ELSE 0 END) ELSE "
             f"{code_expr('substr(lower(' + col + '), 1, 1)')} END) AS lc"]
    for k in range(2, SOUNDEX_WIDTH + 1):
        ck = code_expr(f"substr(lo, {k}, 1)")
        steps.append(
            f"SELECT nm, lo, "
            f"CASE WHEN length(d) < 3 AND ({ck}) BETWEEN 1 AND 6 "
            f"AND ({ck}) <> lc THEN d || ({ck})::VARCHAR ELSE d END AS d, "
            f"CASE WHEN ({ck}) BETWEEN 1 AND 6 THEN ({ck}) "
            f"WHEN ({ck}) = 7 THEN lc ELSE 0 END AS lc")
    q = steps[0] + " FROM __soundex_src"
    for s in steps[1:]:
        q = f"{s} FROM ({q})"
    return (f"SELECT nm, CASE WHEN regexp_matches(substr(lo, 1, 1), "
            f"'^[a-z]$') THEN upper(substr(lo, 1, 1)) || d || "
            f"repeat('0', 3 - length(d)) ELSE '' END AS soundex FROM ({q})")
