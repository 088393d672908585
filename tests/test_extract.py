"""Byte-identical HTML→text extraction (the north-rule per-row invariant)."""

import ray.data as rd

from dedup_ray.sources.pages import planted_pages, wrap_html
from dedup_ray.stages.extract import extract_pages, extract_text_bytes


def test_roundtrip_planted_corpus():
    pages, _ = planted_pages(n_base=60, seed=7)
    for h, t in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text_bytes(h) == t


def test_entities_and_multiline():
    text = "a < b & c > d\nsecond  line\n\nfourth"
    assert extract_text_bytes(wrap_html(text, title="t")) == text


def test_skips_script_style_head():
    html = (
        b"<html><head><title>T</title><style>p{}</style></head>"
        b"<body><script>ignore()</script><p>keep</p><noscript>no</noscript></body></html>"
    )
    assert extract_text_bytes(html) == "keep"


def test_extract_stage_distributed():
    pages, _ = planted_pages(n_base=30, seed=3)
    ds = rd.from_arrow(pages)
    out = extract_pages(ds, concurrency=2, batch_size=16)
    got = {r["url"]: r["text"] for r in out.select_columns(["url", "text"]).take_all()}
    want = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    assert got == want
