"""WARC source (ISO 28500): framing round trip, gzip member split, HTTP
unwrap, type filter, hostile-input hardening, Dataset read path."""

import zlib

import pyarrow as pa
import pytest

import ray.data as rd

from dedup_ray.sources.warc import (
    build_warc,
    gunzip_members,
    iter_warc_records,
    parse_warc,
    read_warc,
)

RECS = [
    {"type": "response", "uri": "http://a.com/1", "payload": b"hello world"},
    {"type": "request", "uri": "http://a.com/1", "payload": b"GET /1"},
    {"type": "response", "uri": "http://b.com/2",
     "payload": "unicode éß中".encode()},
    {"type": "metadata", "uri": "http://b.com/2", "payload": b"{}"},
]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = build_warc(RECS, gzip_members=gz)
        t = parse_warc(data)  # responses only
        assert t.num_rows == 2
        assert t["url"].to_pylist() == ["http://a.com/1", "http://b.com/2"]
        assert t["payload"].to_pylist() == [
            b"hello world", "unicode éß中".encode()]
        assert t["http_status"].to_pylist() == [200, 200]


def test_all_types_and_non_http_block_passthrough():
    data = build_warc(RECS)
    t = parse_warc(data, types=())
    assert t.num_rows == 4
    by_type = dict(zip(t["warc_type"].to_pylist(), t["payload"].to_pylist()))
    assert by_type["metadata"] == b"{}"       # no HTTP unwrap
    assert by_type["request"] == b"GET /1"


def test_record_iteration_headers():
    data = build_warc(RECS[:1])
    (headers, block), = list(iter_warc_records(data))
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "http://a.com/1"
    assert int(headers["content-length"]) == len(block)
    assert block.startswith(b"HTTP/1.1 200 OK")


def test_hostile_inputs_raise_cleanly():
    good = build_warc(RECS[:2])
    with pytest.raises(ValueError):
        parse_warc(b"GARBAGE" + good)          # bad marker
    with pytest.raises(ValueError):
        parse_warc(good[: len(good) // 2])     # truncated block or header
    # truncated trailing gzip member
    gz = build_warc(RECS[:2], gzip_members=True)
    with pytest.raises(ValueError):
        gunzip_members(gz[:-7])
    # header present but Content-Length missing
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n"
    with pytest.raises(ValueError):
        parse_warc(bad)


def test_empty_payload_and_empty_file():
    t = parse_warc(build_warc([
        {"type": "response", "uri": "u", "payload": b""}]))
    assert t["payload"].to_pylist() == [b""]
    t0 = parse_warc(b"")
    assert t0.num_rows == 0 and t0.schema.names == [
        "warc_type", "url", "warc_date", "payload", "http_status"]


def test_read_warc_dataset(tmp_path):
    for i in range(3):
        recs = [{"type": "response", "uri": f"http://f{i}.com/{j}",
                 "payload": f"doc {i}-{j}".encode()} for j in range(4)]
        (tmp_path / f"part{i}.warc.gz").write_bytes(
            build_warc(recs, gzip_members=True))
    ds = read_warc([str(tmp_path / f"part{i}.warc.gz") for i in range(3)])
    df = ds.to_pandas()
    assert len(df) == 12
    assert set(df["url"]) == {
        f"http://f{i}.com/{j}" for i in range(3) for j in range(4)}
    assert (df["http_status"] == 200).all()
