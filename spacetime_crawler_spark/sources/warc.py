"""WARC source: read Common-Crawl-style WARC files into the engine's
canonical pages schema (url, warc_ts, html, text, lang).

Real Common-Crawl segments ship as WARC files (ISO 28500): a sequence of
records, each `WARC/1.x\\r\\n<headers>\\r\\n\\r\\n<payload>\\r\\n\\r\\n`,
usually stored as concatenated per-record gzip members.  This reader
supports both that layout and plain uncompressed WARC.

Framing is CONTENT-LENGTH-DELIMITED, as the spec requires — never a
substring split: a page whose html happens to contain the bytes
"WARC/1.0\\r\\n" (such pages exist in real Common Crawl) must not
mis-frame the stream.  On a malformed record the reader resyncs to the
next version marker and keeps going; one bad record skips itself, not
the file, and a corrupt/truncated gzip tail yields the records
decompressed so far.

Scale shape: `spark.read.format("binaryFile")` yields one row per WARC
file — exactly how production pipelines shard Common Crawl (one ~1 GB
WARC per task; parallelism = number of files, thousands per segment).
Record splitting + header parsing run as an Arrow-batched mapInPandas
(pure stdlib — no external warc library needed: the framing is a page of
code), emitting only `response` records, one output batch per input
file so peak memory is bounded by one decompressed file, not one Arrow
batch of files.  `text`/`lang` are left NULL — extraction is the
engine's job (F9), and the crawl loop only consumes (url, warc_ts,
html).
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# the canonical pages schema — ONE definition, shared with the synthetic
# generator so the two sources can never drift
from spacetime_crawler_spark.sources.synth import PAGES_SCHEMA_DDL

_MARKER = b"WARC/1."

# binaryFile materializes each WARC as ONE row, and Spark's binary column
# (Arrow offsets, too) caps at 2 GiB — an oversize file today surfaces as
# an opaque Arrow/OOM failure deep in a task.  Guard at a configurable
# bound BELOW that ceiling and fail with the file named.  Memory envelope
# per task: compressed size + decompressed size; Common-Crawl-style text
# WARCs decompress ~4-5×, so the 1.25 GiB default implies a ~6-7 GiB peak
# per concurrently-parsing task — size executor memory (or lower the
# bound) accordingly.  Real CC segments are ~1 GiB compressed and pass.
WARC_MAX_COMPRESSED_BYTES = 1_342_177_280  # 1.25 GiB


def _check_file_sizes(raw: DataFrame, max_bytes: int) -> None:
    """Metadata-only pre-check (the `content` column is pruned from this
    scan): list any over-bound files and raise a clear error naming them,
    instead of letting the content scan die in Arrow."""
    from pyspark.sql import functions as F

    offenders = (
        raw.select("path", "length")
        .filter(F.col("length") > max_bytes)
        .limit(5)
        .collect()
    )
    if offenders:
        names = ", ".join(f"{r.path} ({r.length} B)" for r in offenders)
        raise ValueError(
            f"WARC file(s) exceed max_compressed_bytes={max_bytes}: {names}"
            " — split the file (e.g. with standard WARC segmenting) or"
            " raise the bound; note the per-task memory envelope is"
            " compressed + decompressed size (see sources/warc.py)."
        )


def _decompress(data: bytes) -> bytes:
    """gzip bytes → raw WARC bytes.  stdlib gzip.decompress already
    handles CONCATENATED members in linear time (a hand-rolled per-member
    zlib walk measured superlinear — it recopies the remainder per
    member).  A corrupt or truncated tail falls back to a member-by-member
    salvage that keeps everything decompressed before the damage."""
    try:
        return gzip.decompress(data)
    except (OSError, EOFError, zlib.error):
        out, pos = [], 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            try:
                out.append(d.decompress(data[pos:]))
            except zlib.error:
                break
            consumed = len(data) - pos - len(d.unused_data)
            if consumed <= 0:
                break
            pos += consumed
        return b"".join(out)


def _split_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Raw WARC bytes → (headers, payload) per record, framed by each
    record's own Content-Length.  Malformed records resync to the next
    version marker instead of failing the file."""
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(_MARKER, pos):
            nxt = data.find(_MARKER, pos)
            if nxt < 0:
                return
            pos = nxt
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            pos = head_end + 4  # malformed: resync from after this header
            continue
        payload_start = head_end + 4
        yield headers, data[payload_start:payload_start + length]
        pos = payload_start + length
        while data.startswith(b"\r\n", pos):  # record-separator CRLFs
            pos += 2


def _records(file_bytes: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    if file_bytes[:2] == b"\x1f\x8b":
        yield from _split_records(_decompress(file_bytes))
    else:
        yield from _split_records(file_bytes)


def _parse_ts(raw: str) -> datetime | None:
    try:  # WARC/1.0 seconds and WARC/1.1 fractional seconds both parse
        dt = datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        # A tolerated tz-naive WARC-Date means UTC per the spec's intent;
        # astimezone() would read it as MACHINE-LOCAL time and make warc_ts
        # differ across machines — replace(), never astimezone(), here.
        return dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def _parse_response(headers: dict[str, str], payload: bytes):
    """(headers, payload) → (url, warc_ts, html) for `response` records,
    else None.  The payload of a response record is an HTTP message; the
    html body starts after ITS header block."""
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri")
    ts = _parse_ts(headers.get("warc-date", ""))
    if not url or ts is None:
        return None
    if payload.startswith(b"HTTP/"):
        _, hsep, body = payload.partition(b"\r\n\r\n")
        html = body if hsep else payload
    else:
        html = payload
    return url, ts, html


def read_warc_pages(
    spark: SparkSession,
    path: str,
    extract_text: bool = False,
    charset_sniff: bool = False,
    max_compressed_bytes: int = WARC_MAX_COMPRESSED_BYTES,
) -> DataFrame:
    """WARC file(s) at `path` (glob ok; plain or per-record-gzip) → pages
    DataFrame in the canonical schema, one parse task per file.  Files
    over `max_compressed_bytes` fail fast with a clear error (see
    _check_file_sizes for the memory envelope).

    extract_text=True is the ingest-time enrichment path: `text` is filled
    by the pinned F9 extractor (operators/udfs.text_extract_udf — byte-
    identical to what the crawl loop computes) and `lang` by the reliable-
    only langid annotator (operators/textstats.annotate_lang), so the
    per-language budget / stratified-sample operators can run directly
    over ingested Common-Crawl pages without a crawl pass.  Both additions
    are map-only (Arrow UDF + column expressions) — the scan stays one
    task per WARC file with no shuffle.  Default False: the crawl engine
    does its own (fused) extraction, and ingest-for-crawl should not pay
    the parse twice.

    charset_sniff=True (needs extract_text=True) runs the pinned WHATWG-
    style charset detection first (operators/cleaning.annotate_charset):
    the extractor then parses the charset-correct decode instead of F9's
    UTF-8-replace view — legacy-encoded Common-Crawl pages keep their
    accents instead of turning into U+FFFD runs — and the output gains a
    `charset` column.  Still map-only: the sniff+decode share one Arrow
    crossing, the parse another."""
    if charset_sniff and not extract_text:
        raise ValueError("charset_sniff=True requires extract_text=True")
    listed = spark.read.format("binaryFile").load(path)
    _check_file_sizes(listed, max_compressed_bytes)
    raw = listed.select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = []
                for headers, payload in _records(bytes(blob)):
                    parsed = _parse_response(headers, payload)
                    if parsed is not None:
                        url, ts, html = parsed
                        rows.append((url, ts, html, None, None))
                # one output batch per FILE: bounds peak memory at one
                # decompressed WARC and keeps each Arrow binary column
                # far from the 2 GB offset ceiling
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["url", "warc_ts", "html", "text", "lang"],
                    )

    pages = raw.mapInPandas(gen, schema=PAGES_SCHEMA_DDL)
    if not extract_text:
        return pages
    from pyspark.sql import functions as F

    from spacetime_crawler_spark.operators.textstats import annotate_lang
    from spacetime_crawler_spark.operators.udfs import text_extract_udf

    if charset_sniff:
        from spacetime_crawler_spark.operators.cleaning import annotate_charset

        pages = annotate_charset(pages)  # adds charset, text_decoded
        pages = pages.withColumn(
            "text", text_extract_udf(F.col("text_decoded"))
        ).drop("text_decoded")
    else:
        pages = pages.withColumn("text", text_extract_udf(F.col("html")))
    return annotate_lang(pages, text_col="text", lang_col="lang")


# --- WARC sink ------------------------------------------------------------------

def _serialize_record(
    url: str, ts: datetime, html: bytes, gzip_records: bool
) -> bytes:
    """One ISO-28500 `response` record, framed exactly as _split_records /
    _parse_response read it back (Content-Length delimiting, HTTP message
    payload, record-separator CRLFCRLF).  WARC-Record-ID is DERIVED from
    (url, ts) — re-exporting the same pages yields byte-identical files,
    the same determinism contract as the rest of the engine."""
    import hashlib

    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    rid = hashlib.sha256(url.encode() + ts.isoformat().encode()).hexdigest()
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode() + b"\r\n"
        b"WARC-Record-ID: <urn:sha256:" + rid.encode() + b">\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
    )
    rec = head + body + b"\r\n\r\n"
    return gzip.compress(rec, mtime=0) if gzip_records else rec


def write_warc_pages(
    pages: DataFrame,
    out_dir: str,
    n_files: int | None = None,
    gzip_records: bool = True,
) -> DataFrame:
    """Export a pages DataFrame as Common-Crawl-layout WARC files — the
    inverse of read_warc_pages, round-trip-tested record for record.

    Spark has no binary-file writer, so each task serializes its partition
    to ONE `part-NNNNN.warc[.gz]` (per-record gzip members, mtime pinned
    to 0 for byte determinism) and writes it to `out_dir` itself —
    tmp-file + os.replace, so a speculative or retried task overwrites
    atomically with identical bytes instead of corrupting.  `out_dir`
    must be a filesystem every executor can reach (local mode, NFS; on a
    real cluster point it at a fuse/object mount).

    Returns the manifest (file, n_records, n_bytes) — an ACTION on the
    manifest performs the export; n_files controls shard count (default:
    the input's partitioning).  Memory is bounded at one serialized file
    per task — size shards accordingly (Common Crawl targets ~1 GiB)."""
    import os

    if n_files is not None:
        pages = pages.repartition(n_files)
    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.gz" if gzip_records else "warc"

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks: list[bytes] = []
        n = 0
        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                chunks.append(
                    _serialize_record(
                        url, ts.to_pydatetime(), bytes(html), gzip_records
                    )
                )
                n += 1
        if not n:
            return
        data = b"".join(chunks)
        final = os.path.join(out_dir, f"part-{pid:05d}.{ext}")
        tmp = final + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, final)
        yield pd.DataFrame(
            {"file": [final], "n_records": [n], "n_bytes": [len(data)]}
        )

    return pages.select("url", "warc_ts", "html").mapInPandas(
        dump, schema="file string, n_records long, n_bytes long"
    )
