"""URL canonicalization: Arrow kernel vs DuckDB oracle expression parity."""

import duckdb
import pyarrow as pa

from dedup_ray.stages.urlnorm import (
    extract_host_array,
    normalize_url_array,
    oracle_sql_expr,
)

MESSY = [
    "HTTPS://Site3.Example.COM:443/p/7/?utm_source=f&utm_campaign=c&id=7&fbclid=x#s2",
    "http://HOST.example:80/",
    "http://host.example:8080/a?x=1&utm_medium=m",
    "https://h.e/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4&q=2",
    "https://h.e/p?utm_a=1",
    "ftp://Mixed.Case/Path",
    "no-scheme-string",
    "https://h.e/?gclid=g",
    "HTTP://a.b:80",
    "https://h.e/p/?id=1&",
]


def test_normalize_semantics():
    got = normalize_url_array(pa.array(MESSY)).to_pylist()
    assert got[0] == "https://site3.example.com/p/7/?id=7"
    assert got[1] == "http://host.example"
    assert got[2] == "http://host.example:8080/a?x=1"  # non-default port kept
    assert got[3] == "https://h.e/p?q=2"  # 4 tracking params stripped
    assert got[6] == "no-scheme-string"  # passthrough
    assert got[7] == "https://h.e"


def test_host_extraction():
    hosts = extract_host_array(pa.array(MESSY)).to_pylist()
    assert hosts[0] == "site3.example.com"
    assert hosts[1] == "host.example"
    assert hosts[6] is None


def test_oracle_expression_parity():
    """The generated DuckDB expression matches the Arrow kernel on every
    messy probe — the guarantee the catalog oracle rides on."""
    got = normalize_url_array(pa.array(MESSY)).to_pylist()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{u}')" for u in MESSY)
        + ") v(u)"
    )
    sql = [r[0] for r in con.execute(
        f"SELECT {oracle_sql_expr('u')} FROM t").fetchall()]
    assert got == sql


def test_blocklist_filter_subdomain_semantics():
    import pyarrow as pa
    import ray.data

    from dedup_ray.stages.urlnorm import blocklist_filter

    t = pa.table({"host": pa.array(
        ["site3.example.com", "a.site3.example.com", "site4.example.com",
         "notsite3.example.com", "x.example.net", "example.net", None])})
    out = blocklist_filter(ray.data.from_arrow(t), "host",
                           ["site3.example.com", "example.net"]).to_pandas()
    # endswith '.d' must not match 'notsite3...' (no dot boundary
    # bypass); a null host matches no domain and is kept
    assert sorted(out["host"], key=str) == [None, "notsite3.example.com",
                                            "site4.example.com"]


def test_extract_links_positions_and_malformed():
    import ray.data

    from dedup_ray.stages.urlnorm import extract_links

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            'pre <a href="http://a.com/x">one</a> mid '
            '<a href="https://b.com/y">two</a> post',
            "no links here at all",
            'truncated <a href="http://c.com/z',   # no closing quote
            None,                                   # null page: no rows
        ]),
    })
    out = extract_links(ray.data.from_arrow(t)).to_pandas()
    got = sorted(zip(out.doc_id, out.href))
    assert got == [(0, "http://a.com/x"), (0, "https://b.com/y")]


def test_extract_links_matches_regex_oracle():
    import ray.data

    from dedup_ray.stages.urlnorm import extract_links

    texts = [
        'x href="u1" y href="u2" z',
        'href="" empty value',
        'nested quote href="a"b" tail',   # regex takes shortest: 'a'
        "plain",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = extract_links(ray.data.from_arrow(t)).to_pandas()
    got = sorted(zip(out.doc_id, out.href))
    con = duckdb.connect()
    con.register("t", t)
    sql = sorted(con.execute(
        "SELECT doc_id, UNNEST(regexp_extract_all(text, 'href=\"([^\"]*)\"',"
        " 1)) FROM t"
    ).fetchall())
    assert got == sql


def test_extract_anchors_matches_regex_oracle():
    import ray.data

    from dedup_ray.stages.urlnorm import extract_anchors

    texts = [
        'pre <a href="http://a.com/x">one</a> mid '
        '<a href="https://b.com/y">two words</a> post',
        'attr between <a href="http://c.com" class="z">skipped</a>',
        'markup inside <a href="http://d.com">bad <b>x</b></a>',
        'truncated href="http://e.com',
        'empty anchor href="http://f.com"></a> tail',
        'quote in url href="a"b">t</a>',
        'decoy href="abchref="u">t</a>',
        'unclosed anchor href="http://g.com">never ends',
        None,
        "plain",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = extract_anchors(ray.data.from_arrow(t)).to_pandas()
    got = sorted(zip(out.doc_id, out.href, out.anchor))
    con = duckdb.connect()
    con.register("t", t)
    sql = sorted(con.execute(
        "SELECT doc_id,"
        " UNNEST(regexp_extract_all(text,"
        "   'href=\"([^\"]*)\">([^<]*)</a>', 1)),"
        " UNNEST(regexp_extract_all(text,"
        "   'href=\"([^\"]*)\">([^<]*)</a>', 2)) FROM t"
    ).fetchall())
    assert got == sql
    assert (0, "http://a.com/x", "one") in got
    assert not any(h == "http://d.com" for _, h, _a in got)


def test_tag_sequence_matches_regex_oracle():
    import ray.data

    from dedup_ray.stages.extract import tag_sequence

    htmls = [
        "<html><head><title>t</title></head><body><p>a</p><p>b</p>"
        "</body></html>",
        '<!DOCTYPE html><div class="x"><br/><img src="y"></div>',
        "no tags at all",
        None,
        '<A HREF="up">upper skipped</A><em>e</em>',
        "<h1>x</h1><!-- comment --><h2>y</h2>",
    ]
    t = pa.table({"doc_id": pa.array(range(len(htmls)), pa.int64()),
                  "html_str": pa.array(htmls)})
    out = tag_sequence(ray.data.from_arrow(t)).to_pandas().sort_values(
        "doc_id")
    con = duckdb.connect()
    con.register("t", t)
    sql = con.execute(
        "SELECT doc_id, COALESCE(array_to_string(regexp_extract_all("
        "COALESCE(html_str, ''), '<([a-z0-9]+)', 1), '>'), '') AS tagseq"
        " FROM t ORDER BY doc_id"
    ).df()
    assert list(out.tagseq) == list(sql.tagseq)
    assert list(out.tagseq)[0] == "html>head>title>body>p>p"
