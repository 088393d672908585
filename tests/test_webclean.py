"""Web-corpus cleaning kernels: line dedup, PII redaction, repetition
screen, decontamination — brute-force / oracle parity on crafted inputs."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from dedup_ray.stages.webclean import (
    LINE_WIDTH,
    PII_RULES,
    _gram_hashes,
    benchmark_gram_set,
    decontaminate,
    explode_token_lines,
    line_dedup,
    pii_oracle_exprs,
    redact_pii_arrays,
    repetition_quality,
)

W = LINE_WIDTH


def _mkdocs(texts):
    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
    )


# --------------------------------------------------------------------------
# line dedup
# --------------------------------------------------------------------------

def _words(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_explode_token_lines_windows():
    texts = [_words("a", W * 2 + 3), _words("b", 1), _words("c", W)]
    rows = explode_token_lines(_mkdocs(texts)).to_pandas()
    per_doc = rows.groupby("doc_id")["line_no"].count().to_dict()
    assert per_doc == {0: 3, 1: 1, 2: 1}
    first = rows[(rows.doc_id == 0) & (rows.line_no == 0)]["line"].iloc[0]
    assert first == " ".join(f"a{i}" for i in range(W))
    tail = rows[(rows.doc_id == 0) & (rows.line_no == 2)]["line"].iloc[0]
    assert tail == " ".join(f"a{i}" for i in range(W * 2, W * 2 + 3))


def test_line_dedup_keeps_first_occurrence():
    boiler = _words("x", W)  # one full shared line
    texts = [
        boiler + " " + _words("a", W),  # doc 0: boiler at line 0
        boiler + " " + _words("b", W),  # doc 1: duplicate boiler dropped
        _words("c", W) + " " + boiler,  # doc 2: duplicate boiler dropped
    ]
    kept = line_dedup(explode_token_lines(_mkdocs(texts)),
                      num_partitions=4).to_pandas()
    occ = kept[kept.line == boiler]
    assert len(occ) == 1
    assert (occ.doc_id.iloc[0], occ.line_no.iloc[0]) == (0, 0)
    # non-duplicate lines all survive: a, b, c + the one kept boiler
    assert len(kept) == 4


def test_line_dedup_matches_sql_oracle():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(9)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 40)))
             for _ in range(60)]
    kept = line_dedup(explode_token_lines(_mkdocs(texts)),
                      num_partitions=4).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") v(doc_id, text)"
    )
    sql = con.execute(f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, i, toks[i] AS token
                FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
        lines AS (SELECT doc_id, (i - 1) // {W} AS line_no,
                         string_agg(token, ' ' ORDER BY i) AS line
                  FROM tok GROUP BY doc_id, (i - 1) // {W}),
        ranked AS (SELECT doc_id, line_no, line, row_number() OVER (
                       PARTITION BY line ORDER BY doc_id, line_no) AS rn
                   FROM lines)
        SELECT doc_id, line_no, line FROM ranked WHERE rn = 1
        ORDER BY doc_id, line_no
    """).df()
    got = kept.sort_values(["doc_id", "line_no"]).reset_index(drop=True)
    assert got.to_dict("records") == sql.to_dict("records")


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

PII_PROBES = [
    "mail me at john.doe+x@Sub.Example.COM today",
    "call +1-415-555-0199 or (415) 555-0123 now",
    "plain 415-555-0199 inline",
    "server at 192.168.1.254 and 10.0.0.1",
    "mixed a@b.io then 1.2.3.4 then +12-345-678-9012",
    "none of it here",
    "not-an-ip 1.2.3 and half-phone 12-345",
]


def test_redact_pii_semantics():
    clean, counts = redact_pii_arrays(pa.array(PII_PROBES))
    got = clean.to_pylist()
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "plain <PHONE> inline"
    assert got[3] == "server at <IP> and <IP>"
    assert got[5] == "none of it here"
    assert got[6] == "not-an-ip 1.2.3 and half-phone 12-345"
    assert counts["n_email"].to_pylist() == [1, 0, 0, 0, 1, 0, 0]
    assert counts["n_phone"].to_pylist() == [0, 2, 1, 0, 1, 0, 0]
    assert counts["n_ip"].to_pylist() == [0, 0, 0, 2, 1, 0, 0]


def test_pii_oracle_expression_parity():
    clean, counts = redact_pii_arrays(pa.array(PII_PROBES))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{s}')" for s in PII_PROBES)
        + ") v(txt)"
    )
    clean_expr, count_exprs = pii_oracle_exprs("txt")
    cols = ", ".join([f"{clean_expr} AS clean"]
                     + [f"{e} AS {n}" for n, e in count_exprs.items()])
    df = con.execute(f"SELECT {cols} FROM t").df()
    assert df["clean"].tolist() == clean.to_pylist()
    for name, _, _ in PII_RULES:
        assert df[f"n_{name}"].tolist() == counts[f"n_{name}"].to_pylist()


# --------------------------------------------------------------------------
# repetition / quality screen
# --------------------------------------------------------------------------

def test_repetition_quality_metrics():
    texts = [
        "aa bb cc dd ee ff",          # clean: 6 words, no repeats
        "x x x x x x x x",            # degenerate repetition
        "one two",                    # too short
        " ".join(["ab cd"] * 5),      # dup 2-grams across repeats
    ]
    out = repetition_quality(_mkdocs(texts)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.n_words.tolist() == [6, 8, 2, 10]
    assert out.mean_word_len.tolist() == [2.0, 1.0, 3.0, 2.0]
    # doc1: 7 2-gram occurrences, 1 distinct -> 6/7 duplicated
    assert out.dup_2gram_frac[1] == pytest.approx(6 / 7, abs=1e-6)
    assert out.top_token_frac[1] == 1.0
    # doc3: tokens ab*5 cd*5 -> top 0.5; 2grams: 9 occ, 2 distinct
    assert out.dup_2gram_frac[3] == pytest.approx(7 / 9, abs=1e-6)
    assert out.keep.tolist() == [1, 0, 0, 0]


def test_repetition_quality_empty_and_single():
    out = repetition_quality(_mkdocs(["solo", "a b a b"])).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.n_words.tolist() == [1, 4]
    assert out.dup_2gram_frac[0] == 0.0
    assert out.dup_2gram_frac[1] == pytest.approx(1 / 3, abs=1e-6)


# --------------------------------------------------------------------------
# decontamination
# --------------------------------------------------------------------------

def test_decontaminate_planted_overlap():
    secret = _words("s", 8)  # exactly one 8-gram
    bench = _mkdocs([secret + " " + _words("pad", 4)])
    train_texts = [
        _words("t", 20),                      # clean
        _words("u", 5) + " " + secret,        # contains the benchmark gram
        _words("s", 7),                       # 7-token prefix only: clean
    ]
    train = _mkdocs(train_texts)
    ref = benchmark_gram_set(bench)
    out = decontaminate(train, ref).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.contaminated.tolist() == [0, 1, 0]
    assert out.n_contam[1] == 1


def test_gram_hashes_respect_doc_boundaries():
    texts = [_words("a", 4) + " " + _words("b", 4)]
    # 8 tokens -> 1 gram within the doc
    doc_idx, gh = _gram_hashes(pa.array(texts), 8)
    assert len(gh) == 1
    # two 4-token docs -> no 8-gram spans the boundary
    doc_idx2, gh2 = _gram_hashes(pa.array([_words("a", 4), _words("b", 4)]), 8)
    assert len(gh2) == 0


# --------------------------------------------------------------------------
# curation pipeline composition
# --------------------------------------------------------------------------

def test_curate_pipeline_composition():
    from dedup_ray.pipelines.curate import curate_pipeline

    boiler = _words("x", W)
    texts = [
        boiler + " " + _words("a", W),        # keeps boiler (first)
        boiler + " mail b@c.de " + _words("b", W - 2),  # boiler deduped, PII out
        "spam spam spam spam spam spam",      # fails quality screen
        boiler,                               # ALL lines duplicate -> vanishes
    ]
    out = curate_pipeline(_mkdocs(texts), num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == [0, 1]
    assert out.text[0] == texts[0]
    assert out.text[1].startswith("mail <EMAIL>")
    assert boiler not in out.text[1]


def test_reassemble_roundtrip_without_dedup():
    from dedup_ray.stages.webclean import (
        explode_token_lines,
        reassemble_docs,
    )

    rng = np.random.default_rng(11)
    texts = [" ".join(rng.choice([f"w{i}" for i in range(50)],
                                 rng.integers(1, 60)))
             for _ in range(40)]
    lines = explode_token_lines(_mkdocs(texts))
    out = reassemble_docs(lines, num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.text.tolist() == texts


def test_curate_pipeline_checkpoint_resume(tmp_path):
    from dedup_ray.pipelines.curate import curate_pipeline

    texts = [_words("a", W * 2), _words("b", W) + " " + _words("a", W)]
    ck = str(tmp_path / "ck")
    out1, ctx1 = curate_pipeline(_mkdocs(texts), num_partitions=2,
                                 checkpoint_dir=ck)
    df1 = out1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert ctx1.hits == []
    out2, ctx2 = curate_pipeline(_mkdocs(texts), num_partitions=2,
                                 checkpoint_dir=ck)
    df2 = out2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(ctx2.hits) == {"kept_lines", "curated"}
    assert df1.to_dict("records") == df2.to_dict("records")
    # changing the pipeline shape invalidates the stale checkpoint
    out3, ctx3 = curate_pipeline(_mkdocs(texts), num_partitions=2,
                                 checkpoint_dir=ck, with_pii=False)
    assert ctx3.hits == []


def test_token_logfreq_score_orders_quality():
    """Docs made of corpus-common tokens outscore garbled rare-token docs;
    empty docs score exactly 0 (sentinel token, count 1)."""
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.textstats import token_logfreq_score

    common = "the cat sat on the mat " * 20
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [common.strip(), "qzx vbnk jjwq pllx", ""],
        }
    )
    out = (
        token_logfreq_score(rd.from_pandas(docs), num_partitions=3)
        .to_pandas().set_index("doc_id")["logfreq_score"]
    )
    assert out[0] > out[1] > 0 or (out[0] > out[1] and out[1] >= 0)
    assert out[0] > out[1]
    assert out[2] == 0.0


def test_compression_ratio_screen():
    """Random bytes fail low, repeated templates fail high, prose passes,
    empty docs are kept with ratio 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedup_ray.stages.webclean import compression_ratio

    rng = np.random.default_rng(3)
    noise = "".join(chr(rng.integers(33, 127)) for _ in range(2000))
    spam = "click here to win a prize now " * 200
    vocab = [f"word{i}" for i in range(300)] + ["the", "a", "of", "to"] * 30
    prose = " ".join(rng.choice(vocab, size=600))
    short = "The cat sat on the mat and looked around."
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3, 4], "text": [noise, spam, prose, "", short]}
    )
    out = (
        compression_ratio(rd.from_pandas(df))
        .to_pandas().set_index("doc_id")
    )
    assert not out.loc[0, "keep"]          # incompressible noise
    assert out.loc[0, "compression_ratio"] < 1.5
    assert not out.loc[1, "keep"]          # hyper-compressible template
    assert out.loc[1, "compression_ratio"] > 8.0
    assert out.loc[2, "keep"]              # varied prose in band
    assert out.loc[3, "keep"] and out.loc[3, "compression_ratio"] == 0.0
    # short legitimate text is kept: zlib stream overhead makes the ratio
    # meaningless under min_bytes (this one measures ~0.9)
    assert out.loc[4, "keep"]


# --------------------------------------------------------------------------
# per-host boilerplate removal
# --------------------------------------------------------------------------

def _mkhostdocs(rows):
    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
    )


def test_host_boilerplate_removed_per_host_only():
    from dedup_ray.stages.webclean import host_boilerplate_removal

    nav = _words("nav", W)  # full aligned boilerplate line
    rows = [
        # host A: nav line shared by 3 docs -> boilerplate, scrubbed
        (0, "a.com", nav + " " + _words("p", W)),
        (1, "a.com", nav + " " + _words("q", W)),
        (2, "a.com", nav + " " + _words("r", W)),
        # host B: the SAME nav line in only 2 docs -> kept (per-host rule)
        (3, "b.com", nav + " " + _words("s", W)),
        (4, "b.com", nav + " " + _words("t", W)),
    ]
    out = host_boilerplate_removal(_mkhostdocs(rows), min_docs=3,
                                   num_partitions=4).to_pandas()
    out = out.set_index("doc_id")["text"].to_dict()
    assert out[0] == _words("p", W)
    assert out[1] == _words("q", W)
    assert out[2] == _words("r", W)
    assert out[3] == nav + " " + _words("s", W)
    assert out[4] == nav + " " + _words("t", W)


def test_host_boilerplate_all_furniture_doc_vanishes():
    from dedup_ray.stages.webclean import host_boilerplate_removal

    nav = _words("nav", W)
    rows = [(i, "a.com", nav) for i in range(3)]
    rows.append((9, "a.com", nav + " " + _words("z", 3)))
    out = host_boilerplate_removal(_mkhostdocs(rows), min_docs=3,
                                   num_partitions=4).to_pandas()
    # docs 0-2 were pure furniture and vanish; doc 9 keeps its content tail
    assert set(out.doc_id) == {9}
    assert out.text.iloc[0] == _words("z", 3)


def test_host_boilerplate_distinct_doc_count_not_occurrences():
    from dedup_ray.stages.webclean import host_boilerplate_removal

    nav = _words("nav", W)
    # one doc repeating the line 3 times is ONE distinct doc -> kept
    rows = [(0, "a.com", " ".join([nav, nav, nav])),
            (1, "a.com", _words("y", W))]
    out = host_boilerplate_removal(_mkhostdocs(rows), min_docs=3,
                                   num_partitions=4).to_pandas()
    out = out.set_index("doc_id")["text"].to_dict()
    assert out[0] == " ".join([nav, nav, nav])
    assert out[1] == _words("y", W)


# --------------------------------------------------------------------------
# intra-document line dedup
# --------------------------------------------------------------------------

def test_intradoc_dedup_drops_repeats_within_doc_only():
    from dedup_ray.stages.webclean import intradoc_line_dedup

    nav = _words("nav", W)
    texts = [
        " ".join([nav, nav, _words("a", W), nav]),  # repeats collapse to 1
        nav + " " + _words("b", W),                 # other doc unaffected
        _words("c", 3),                             # short doc round-trips
    ]
    out = intradoc_line_dedup(_mkdocs(texts)).to_pandas()
    got = out.set_index("doc_id")["text"].to_dict()
    assert got[0] == nav + " " + _words("a", W)
    assert got[1] == nav + " " + _words("b", W)
    assert got[2] == _words("c", 3)


def test_intradoc_dedup_preserves_line_order_and_empty():
    from dedup_ray.stages.webclean import intradoc_line_dedup

    a, b, c = _words("a", W), _words("b", W), _words("c", W)
    texts = [" ".join([c, a, b, a, c]), ""]
    out = intradoc_line_dedup(_mkdocs(texts)).to_pandas()
    got = out.set_index("doc_id")["text"].to_dict()
    assert got[0] == " ".join([c, a, b])  # first occurrences, original order
    assert got[1] == ""                   # empty doc survives as one "" line


def test_token_entropy_values():
    import math

    from dedup_ray.stages.textstats import token_entropy

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a a a a",          # one distinct token -> H = 0
            "a b c d",          # uniform over 4 -> H = ln 4
            "a a b b b c",      # mixed: ln6 - (2ln2 + 3ln3)/6
            "",                 # empty -> sentinel singleton -> 0
        ]),
    })
    out = (
        token_entropy(ray.data.from_arrow(docs).repartition(3))
        .to_pandas().set_index("doc_id")["token_entropy"]
    )
    assert out[1] == 0.0
    assert out[2] == round(math.log(4), 6)
    want3 = math.log(6) - (2 * math.log(2) + 3 * math.log(3)) / 6
    assert out[3] == round(want3, 6)
    assert out[4] == 0.0


def test_pmi_bigrams_brute_force():
    import math
    from collections import Counter

    from dedup_ray.stages.textstats import pmi_bigrams

    texts = [
        "new york is a big city",
        "new york new york",
        "a big apple in new york",
        "the city is big",
        "",
    ]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = pmi_bigrams(ray.data.from_arrow(docs).repartition(3),
                      min_count=2, top_k=10, num_partitions=3).to_pandas()

    uni, big = Counter(), Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    want = sorted(
        (
            (round(math.log((c * n1 * n1) / (float(n2) * uni[a] * uni[b])),
                   6), a, b, c)
            for (a, b), c in big.items() if c >= 2
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:10]
    got = list(zip(out["pmi"], out["w1"], out["w2"], out["c"]))
    assert [(p, a, b, c) for p, a, b, c in got] == want


# --------------------------------------------------------------------------
# badword blocklist screen
# --------------------------------------------------------------------------

def test_badword_fraction_semantics():
    from dedup_ray.stages.webclean import badword_fraction

    ds = _mkdocs([
        "good clean text here",          # 0 hits / 4
        "BAD bad ok ok",                 # 2 hits / 4 (case-folded)
        "",                              # empty: 0 tokens, not blocked
        None,                            # null text == empty page
        "bad",                           # 1/1 -> blocked
    ])
    out = (badword_fraction(ds, ["bad", "evil"], threshold=0.25)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [4, 4, 0, 0, 1]
    assert out["n_flagged"].tolist() == [0, 2, 0, 0, 1]
    assert out["blocked"].tolist() == [False, True, False, False, True]
    assert out.loc[1, "bad_frac"] == 0.5


def test_badword_threshold_zero_is_drop_on_any_hit():
    from dedup_ray.stages.webclean import badword_fraction

    ds = _mkdocs(["one bad word among many many many tokens", "all fine"])
    out = (badword_fraction(ds, ["bad"], threshold=0.0)
           .to_pandas().sort_values("doc_id"))
    assert out["blocked"].tolist() == [True, False]


def test_path_template_census_trap_detection(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.urlnorm import (path_template_array,
                                          path_template_census)

    # template law probes
    tpl = path_template_array(pa.array([
        "http://a.com/item/8283/view?sid=deadbeef01",
        "https://b.com:8080/cal/2024/05/12",
        "http://c.com/about",
    ])).to_pylist()
    assert tpl == ["/item/(n)/view?sid=(hex)", "/cal/(n)/(n)/(n)", "/about"]

    urls = (
        [f"http://trap.example/cal/{y}/{m}" for y in range(3)
         for m in range(4)]            # 12 pages, ONE template
        + ["http://ok.example/about", "http://ok.example/contact"]
    )
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    got = path_template_census(ds, min_pages=2).to_pandas()
    assert len(got) == 1  # the singletons on ok.example fall under min_pages
    r = got.iloc[0]
    assert (r["host"], r["template"], r["n_pages"]) == (
        "trap.example", "/cal/(n)/(n)", 12)


def test_script_profile_hand_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.textstats import script_profile

    texts = ["hello", "привет", "hi при", "漢字", "", None, "γεια σας",
             "مرحبا"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = script_profile(ds).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "dominant"] == "latin" and got.loc[0, "latin"] == 5
    assert got.loc[1, "dominant"] == "cyrillic"
    # tie 2 latin vs 3 cyrillic chars -> cyrillic wins on count
    assert got.loc[2, "cyrillic"] == 3 and got.loc[2, "dominant"] == "cyrillic"
    assert got.loc[3, "dominant"] == "cjk" and got.loc[3, "n_chars"] == 2
    assert got.loc[4, "dominant"] == "none"
    assert got.loc[5, "dominant"] == "none" and got.loc[5, "n_chars"] == 0
    assert got.loc[6, "dominant"] == "greek"
    assert got.loc[7, "dominant"] == "arabic"
    # equal counts tie -> first-listed script wins
    tie = script_profile(rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["abпр"], pa.string()),
    }))).to_pandas()
    assert tie["dominant"].iloc[0] == "latin"


def test_stitch_candidates_planted_pagination(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.webclean import stitch_candidates

    base = " ".join(f"w{i}" for i in range(20))
    tail8 = " ".join(f"w{i}" for i in range(12, 20))
    texts = {
        1: base,                                  # page 1
        2: tail8 + " and the story continues here",   # page 2: stitches 1->2
        3: "completely different tokens " * 3,
        4: "short doc",                           # < 8 tokens: no grams
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    }))
    got = stitch_candidates(ds, k=8, num_partitions=3).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == {(1, 2)}
    assert got["gram"].iloc[0] == tail8


def test_interval_overlap_join_reference(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.ops.relational import interval_overlap_join

    rng = np.random.default_rng(31)
    n = 60
    s = rng.integers(0, 10_000, n)
    e = s + rng.integers(1, 4_000, n)   # intervals often span tiles
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "s": pa.array(s, pa.int64()),
        "e": pa.array(e, pa.int64()),
    }))
    got = interval_overlap_join(ds, "id", "s", "e", tile_us=1000,
                                num_partitions=4).to_pandas()
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            if s[i] < e[j] and s[j] < e[i]:
                want[(i, j)] = min(e[i], e[j]) - max(s[i], s[j])
    assert dict(zip(zip(got["id1"], got["id2"]),
                    got["overlap_us"])) == want
    # no pair duplicated across tiles
    assert not got.duplicated(subset=["id1", "id2"]).any()


def test_luhn_valid_array_known_vectors():
    import pyarrow as pa

    from dedup_ray.stages.webclean import luhn_valid_array

    out = luhn_valid_array(pa.array([
        "4539578763621486",  # valid VISA test number
        "4539578763621487",  # last digit perturbed
        "4111111111111111",  # classic valid test PAN
        "1234567812345678",
    ])).to_pylist()
    assert out == [1, 0, 1, 0]


def test_luhn_empty_and_width_generic():
    import pyarrow as pa

    from dedup_ray.stages.webclean import luhn_valid_array

    assert luhn_valid_array(pa.array([], pa.string())).to_pylist() == []
    # 8-digit width: 00000000 has checksum 0 -> valid
    assert luhn_valid_array(pa.array(["00000000", "00000001"])) \
        .to_pylist() == [1, 0]
