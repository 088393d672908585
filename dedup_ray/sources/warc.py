"""WARC source: parse ISO 28500 (WARC/1.0) web-archive containers — the
format Common Crawl ships — into the engine's pages schema.

Written from the published spec (ISO 28500:2017 / IIPC warc-specification):
a WARC file is a sequence of records, each

    WARC/1.0 CRLF
    <named-field ":" value CRLF>*
    CRLF
    <Content-Length octets of block>
    CRLF CRLF

``.warc.gz`` files concatenate ONE gzip member per record (the spec's
record-at-time compression recommendation), so a reader can split members
without decompressing the whole file; stdlib zlib walks members via
``unused_data``.  Response records carry an HTTP message in the block
(``Content-Type: application/http``); the page body is the part after the
HTTP header terminator.

Scale shape: ``read_warc`` is ``ray.data.read_binary_files`` (one row per
WARC file — Common Crawl's natural ~1 GB partitioning) followed by a
``map_batches`` parser task per file.  Per-RECORD Python is bounded header
scanning; payload extraction is buffer slicing.  The synthesizer
(``build_warc``) exists for fixtures and oracle queries — no network in
this engine's world, same policy as the codec fixtures.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

WARC_VERSION = b"WARC/1.0"

PAGES_SCHEMA = pa.schema(
    [
        ("warc_type", pa.string()),
        ("url", pa.string()),
        ("warc_date", pa.string()),
        ("payload", pa.binary()),
        ("http_status", pa.int64()),
    ]
)


def gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (record-at-time .warc.gz)."""
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:  # truncated trailing member
            raise ValueError("truncated gzip member in warc.gz")
        data = d.unused_data
    return b"".join(out)


def _parse_http(block: bytes) -> tuple[int, bytes]:
    """HTTP response message → (status, body). Malformed → (0, block)."""
    end = block.find(b"\r\n\r\n")
    if end < 0 or not block.startswith(b"HTTP/"):
        return 0, block
    status_line = block[: block.find(b"\r\n")].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        return 0, block
    return status, block[end + 4 :]


def iter_warc_records(data: bytes):
    """Yield ``(headers: dict[str,str], block: bytes)`` per record.

    Header names are lower-cased (the spec says field names are
    case-insensitive).  Raises ValueError on framing damage — a corrupt
    record must not silently swallow the rest of the file.
    """
    pos, n = 0, len(data)
    while pos < n:
        while data[pos : pos + 2] == b"\r\n":  # inter-record padding
            pos += 2
        if pos >= n:
            return
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC record marker at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("record missing valid Content-Length") from None
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("record block truncated")
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def parse_warc(data: bytes, types: tuple[str, ...] = ("response",)) -> pa.Table:
    """One WARC (or .warc.gz) byte string → Arrow table of records.

    ``types`` filters on WARC-Type (Common Crawl files interleave
    request/response/metadata; dedup wants responses).  HTTP payloads are
    unwrapped to the body; non-HTTP blocks pass through whole.
    """
    if data[:2] == b"\x1f\x8b":
        data = gunzip_members(data)
    cols: dict[str, list] = {k: [] for k in PAGES_SCHEMA.names}
    for headers, block in iter_warc_records(data):
        wtype = headers.get("warc-type", "")
        if types and wtype not in types:
            continue
        ctype = headers.get("content-type", "")
        if ctype.startswith("application/http"):
            status, body = _parse_http(block)
        else:
            status, body = 0, block
        cols["warc_type"].append(wtype)
        cols["url"].append(headers.get("warc-target-uri", ""))
        cols["warc_date"].append(headers.get("warc-date", ""))
        cols["payload"].append(body)
        cols["http_status"].append(status)
    return pa.table(
        {n: pa.array(cols[n], PAGES_SCHEMA.field(n).type)
         for n in PAGES_SCHEMA.names}
    )


def parse_warc_batch(batch: pa.Table, types: tuple[str, ...] = ("response",),
                     bytes_col: str = "bytes") -> pa.Table:
    """``map_batches`` adapter over ``read_binary_files`` rows."""
    tables = [
        parse_warc(blob.as_py(), types=types) for blob in batch[bytes_col]
    ]
    if not tables:
        return PAGES_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def read_warc(paths, types: tuple[str, ...] = ("response",)):
    """WARC file paths → Dataset(pages).  One read task per file (Common
    Crawl's ~1 GB per-file split is the parallelism unit), parse fused
    into the read stage."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(
        lambda b: parse_warc_batch(b, types=types), batch_format="pyarrow"
    )


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Synthesize a WARC byte string (fixtures / oracle queries).

    Each record dict: ``{"type", "uri", "date", "payload": bytes}``;
    response records are wrapped in a minimal HTTP/1.1 200 message.
    """
    out = []
    for i, r in enumerate(records):
        payload = r["payload"]
        if r.get("type", "response") == "response":
            block = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + payload
            )
            ctype = "application/http; msgtype=response"
        else:
            block, ctype = payload, "application/octet-stream"
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {r.get('type', 'response')}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Target-URI: {r.get('uri', '')}\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        rec = hdr + block + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)
