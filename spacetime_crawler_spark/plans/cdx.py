"""CDX-style capture index over crawl output — the Common-Crawl/Internet-
Archive lookup layout (SURT key + 14-digit timestamp), Spark-first.

A CDX index answers "which captures exist for this URL / host / domain?"
without scanning page bodies.  The key is the SURT (Sort-friendly URI
Reordering Transform) of the URL: the host's dot-segments reversed and
comma-joined, then ')' + path (+ '?' + query).  Reversing the host is the
whole point — every URL of example.com, including all subdomains, shares
the prefix `com,example`, so host- and domain-scoped queries become PREFIX
scans over one sorted key instead of joins.

Pinned spec (this engine's SURT dialect, asserted against a pure-Python
reimplementation in tests/test_cdx.py):
  - host: lowercased, dot-split, reversed, comma-joined.  No www-stripping
    (url_norm is already canonical; stripping here would alias distinct
    hosts).  Ports never appear (canonicalize_url drops default ports and
    the synthetic worlds carry none).
  - path: as-is from url_norm ('' stays '' — url_norm is defragmented and
    case-preserved past the authority, so no further folding).
  - query: appended as '?query' when present, else nothing.
  - ts: 14-digit yyyyMMddHHmmss on a pinned virtual clock —
    CDX_EPOCH + round·round_seconds + floor(due_s) — because this crawler's
    politeness schedule, not a wall clock, is the authoritative capture
    time.  Deterministic across machines (session timezone is pinned UTC
    in session.get_spark).

Scale shape: cdx_records is a map-only projection of fetch_log (no page
bodies touched); write_cdx_index adds exactly one range exchange keyed by
(surt, ts) plus a partition-local sort, producing globally-ordered parquet
shards whose per-file/row-group min-max stats ARE the secondary index —
the same two-level layout as Common Crawl's ZipNum cluster.idx, with
parquet stats standing in for the idx lines.  cdx_lookup compiles every
match type to a StringStartsWith/EqualTo predicate that reaches the scan
(PushedFilters, plan-asserted), so a domain query over a 100 TB crawl
reads only the shards whose surt range intersects the prefix.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CDX_EPOCH_S = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())
CDX_ROUND_SECONDS = 86_400  # one virtual day per crawl round
CDX_SHARDS = 16


def surt_expr(url_col: str | Column) -> Column:
    """SURT key of a canonical URL column, per the module spec."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.parse_url(url, F.lit("QUERY"))
    return F.concat(
        F.array_join(F.reverse(F.split(host, "[.]")), ","),
        F.lit(")"),
        path,
        F.coalesce(F.concat(F.lit("?"), query), F.lit("")),
    )


def cdx_records(
    fetch_log: DataFrame, round_seconds: int = CDX_ROUND_SECONDS
) -> DataFrame:
    """One CDX record per successful capture: (surt, ts, url_norm, status,
    digest, length).  Map-only — safe to chain straight onto the fetch_log
    scan."""
    virtual_s = (
        F.lit(CDX_EPOCH_S)
        + F.col("round").cast("long") * round_seconds
        + F.floor(F.col("due_s")).cast("long")
    )
    return fetch_log.filter(F.col("status") == 200).select(
        surt_expr("url_norm").alias("surt"),
        F.date_format(F.timestamp_seconds(virtual_s), "yyyyMMddHHmmss").alias(
            "ts"
        ),
        "url_norm",
        "status",
        F.col("text_sha256").alias("digest"),
        F.col("content_len").alias("length"),
    )


def write_cdx_index(
    records: DataFrame, path: str, n_shards: int = CDX_SHARDS
) -> None:
    """Globally (surt, ts)-ordered parquet shards.  repartitionByRange
    samples the key distribution (one extra light job — the price of
    balanced shards under skewed hosts), then each shard sorts locally:
    total order across shard boundaries, min-max stats per file."""
    (
        records.repartitionByRange(n_shards, "surt", "ts")
        .sortWithinPartitions("surt", "ts")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def cdx_lookup(
    spark: SparkSession, path: str, url: str, match_type: str = "exact"
) -> DataFrame:
    """Captures for a URL at CDX-server match semantics:
      exact  — this URL only
      prefix — this URL and everything under its path prefix
      host   — every path on exactly this host
      domain — this registrable host and all its subdomains (the SURT
               payoff: one startswith over the sorted key)
    The probe's own SURT is computed on a literal through the SAME
    surt_expr — lookup can never drift from indexing."""
    probe = (
        spark.range(1)
        .select(surt_expr(F.lit(url)).alias("s"))
        .head()[0]
    )
    cdx = read_cdx(spark, path)
    if match_type == "exact":
        cond = F.col("surt") == probe
    elif match_type == "prefix":
        cond = F.col("surt").startswith(probe)
    elif match_type == "host":
        host_key = probe.split(")", 1)[0]
        cond = F.col("surt").startswith(host_key + ")")
    elif match_type == "domain":
        host_key = probe.split(")", 1)[0]
        # 'com,example' must match itself and 'com,example,www' but NOT
        # 'com,examples' — the separator disambiguates
        cond = F.col("surt").startswith(host_key + ")") | F.col(
            "surt"
        ).startswith(host_key + ",")
    else:
        raise ValueError(f"unknown match_type {match_type!r}")
    return cdx.filter(cond).orderBy("surt", "ts")
