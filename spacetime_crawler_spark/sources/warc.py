"""WARC source: read Common-Crawl-style WARC files into the engine's
canonical pages schema (url, warc_ts, html, text, lang).

Real Common-Crawl segments ship as WARC files (ISO 28500): a sequence of
records, each `WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<payload>\\r\\n\\r\\n`,
usually stored as CONCATENATED per-record gzip members so a reader can
split members without decompressing the whole file.  This reader supports
both that layout and plain uncompressed WARC.

Scale shape: `spark.read.format("binaryFile")` yields one row per WARC
file — exactly how production pipelines shard Common Crawl (one ~1 GB
WARC per task; parallelism = number of files, thousands per segment).
Record splitting + header parsing run as an Arrow-batched mapInPandas
(pure stdlib — no external warc library in this sandbox, and none
needed: the framing is a dozen lines), emitting only `response` records.
`text`/`lang` are left NULL — extraction is the engine's job (F9), and
the crawl loop only consumes (url, warc_ts, html).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# the canonical pages schema (sources/synth.py writes the same shape)
PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a stream of CONCATENATED gzip members (the Common-Crawl
    WARC layout: one member per record) — stdlib gzip stops after the
    first member, so walk members with zlib and its unused_data tail."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        yield d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt tail — stop rather than loop forever
            return
        pos += consumed


def _split_records(data: bytes) -> Iterator[bytes]:
    """Raw WARC bytes → one bytes blob per record (uncompressed input)."""
    for chunk in data.split(b"WARC/1.0\r\n"):
        if chunk.strip():
            yield b"WARC/1.0\r\n" + chunk


def _records(file_bytes: bytes) -> Iterator[bytes]:
    if file_bytes[:2] == b"\x1f\x8b":
        for member in _gzip_members(file_bytes):
            yield from _split_records(member)
    else:
        yield from _split_records(file_bytes)


def _parse_response(rec: bytes):
    """One WARC record → (url, warc_ts, html) for `response` records, else
    None.  The payload of a response record is an HTTP message; the html
    body starts after ITS header block."""
    head, sep, payload = rec.partition(b"\r\n\r\n")
    if not sep:
        return None
    headers: dict[str, str] = {}
    for line in head.decode("utf-8", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        if _:
            headers[k.strip().lower()] = v.strip()
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri")
    ts_raw = headers.get("warc-date")
    if not url or not ts_raw:
        return None
    try:
        n = int(headers.get("content-length", len(payload)))
    except ValueError:
        n = len(payload)
    payload = payload[:n]
    ts = datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc
    )
    if payload.startswith(b"HTTP/"):
        _, hsep, body = payload.partition(b"\r\n\r\n")
        html = body if hsep else payload
    else:
        html = payload
    return url, ts, html


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) at `path` (glob ok; plain or per-record-gzip) → pages
    DataFrame in the canonical schema, one parse task per file."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in _records(bytes(blob)):
                    parsed = _parse_response(rec)
                    if parsed is not None:
                        url, ts, html = parsed
                        rows.append((url, ts, html, None, None))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )

    return raw.mapInPandas(gen, schema=PAGES_SCHEMA_DDL)
