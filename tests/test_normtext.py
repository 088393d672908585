"""Unicode normalization: kernel-vs-oracle parity, idempotence, and the
dedup motivation (two renderings of one page digest-equal afterwards)."""

import duckdb
import pyarrow as pa

import ray.data as rd

from dedup_ray.stages.normtext import (
    norm_sql_expr,
    normalize_column,
    normalize_text,
)

NASTY = [
    "cafe\u0301 society",         # decomposed e+accent -> composed
    "caf\u00e9 society",           # already composed (same page!)
    "a\x00b\x08c\x1fd",            # C0 controls stripped
    "line1\r\nline2\rline3",       # CRLF + lone CR -> LF
    "x\u00a0\u2003 y\u3000z",      # NBSP/em-space/CJK space runs -> ' '
    "  lead \n trail  \n\n\n\n end",  # newline trim + blank-line squeeze
    "plain ascii, untouched.",
    "",
    None,
    "\ufb01n de si\u00e8cle\t\ttabs",  # ligature kept by NFC (not NFKC)
    "\ud55c\uad6d\uc5b4 \ud14d\uc2a4\ud2b8   test",
]


def _oracle(vals):
    t = pa.table({"s": pa.array(vals, pa.string())})
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT {norm_sql_expr('s')} FROM t"
        ).fetchall()
    ]


def test_kernel_matches_generated_oracle():
    got = normalize_column(pa.array(NASTY, pa.string())).to_pylist()
    assert got == _oracle(NASTY)


def test_idempotent():
    once = normalize_column(pa.array(NASTY, pa.string()))
    twice = normalize_column(once)
    assert once.to_pylist() == twice.to_pylist()


def test_decomposed_and_composed_unify():
    out = normalize_column(pa.array(NASTY[:2], pa.string())).to_pylist()
    assert out[0] == out[1] == "café society"


def test_two_renderings_become_identical():
    # same page: decomposed accents + CRLF + NBSP vs composed + LF + space
    a = "café au lait\nsecond line"
    b = "café au lait\r\nsecond line"
    out = normalize_column(pa.array([a, b])).to_pylist()
    assert out[0] == out[1]


def test_ascii_fast_path_is_identity_for_clean_text():
    clean = ["already clean text", "one\ntwo", "tabs become spaces?"]
    got = normalize_column(pa.array(clean)).to_pylist()
    assert got == clean


def test_dataset_stage(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(NASTY)), pa.int64()),
                "text": pa.array(NASTY, pa.large_string()),
            }
        )
    )
    out = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert list(out["text"]) == _oracle(NASTY)


def test_fold_text_accents_and_case():
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.normtext import fold_text

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["Café NAÏVE Señor", "plain ASCII Text",
                          None, "ß stays æ ø"], pa.string()),
    })).repartition(2)
    out = fold_text(ds).to_pandas().sort_values("doc_id")
    assert out["folded"].tolist() == [
        "cafe naive senor", "plain ascii text", "", "ß stays æ ø"]


def test_decode_entities_rule_chain_and_double_encoding():
    from dedup_ray.stages.normtext import decode_entities

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a &amp; b",
            "&lt;div&gt; &quot;x&quot; &#39;y&#39;",
            "&amp;lt;literal&amp;gt;",   # double-encoded: ONE level only
            None,                        # null text == empty page
        ]),
    })
    out = (decode_entities(rd.from_arrow(docs))
           .to_pandas().set_index("doc_id")["text"])
    assert out[1] == "a & b"
    assert out[2] == '<div> "x" \'y\''
    assert out[3] == "&lt;literal&gt;"
    assert out[4] == ""


def test_decode_entities_full_matches_html_unescape():
    import html

    from dedup_ray.stages.normtext import decode_entities

    texts = ["&amp;", "&#x41;&#66;", "caf&eacute; &ndash; ok", "plain", ""]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = (decode_entities(rd.from_arrow(docs), full=True)
           .to_pandas().sort_values("doc_id")["text"].tolist())
    assert out == [html.unescape(t) for t in texts]
