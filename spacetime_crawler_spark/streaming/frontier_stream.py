"""Structured-Streaming variants of the frontier operators (SURVEY.md §2
group S — stretch beyond the BSP primary design).

Two real, offline-testable streaming pieces:

1. ``streaming_urlseen_dedup`` — F3 as a continuous operator: a stream of
   candidate URLs, deduplicated exactly with per-bucket state via
   ``applyInPandasWithState`` (GroupState holds the seen hash set per
   pmod(url_hash, P) bucket; first-writer-wins, same admission rule as the
   batch engine and the reference's frontier.add_url).

2. ``streaming_fetch_metrics`` — F12 as a continuous rollup: a file stream
   over committed fetch_log rounds, watermarked tumbling-window counts per
   host (the live crawl dashboard shape).

At the 10^10 tier the state store sharding follows the same pmod(url_hash,
P) bucketing as the batch `seen` table, so the streaming and batch dedup
paths share layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CANDIDATE_SCHEMA = T.StructType([
    T.StructField("url_norm", T.StringType()),
    T.StructField("url_hash", T.LongType()),
    T.StructField("bucket", T.IntegerType()),
])

_DEDUP_OUT_SCHEMA = "url_norm string, url_hash bigint, bucket int"
# State holds the FULL url_norm keys, not just the 64-bit hash: an xxhash64
# collision must never drop a distinct URL — the batch path anti-joins on
# (url_hash, url_norm) and the streaming path must agree at any scale.  The
# bucket key already routes by pmod(url_hash, P), so per-bucket state stays
# 1/P of the seen set.
_DEDUP_STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        fresh_mask = []
        for u in pdf["url_norm"]:
            if u in seen:
                fresh_mask.append(False)
            else:
                seen.add(u)
                fresh_mask.append(True)
        out = pdf[fresh_mask]
        if len(out):
            yield out[["url_norm", "url_hash", "bucket"]]
    state.update((list(seen),))


def streaming_urlseen_dedup(candidates: DataFrame) -> DataFrame:
    """candidates (streaming) → first-seen rows only, exact, stateful.

    Input must carry (url_norm, url_hash, bucket = pmod(url_hash, P)); the
    state store shards by bucket."""
    return candidates.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def candidate_stream_from_dir(spark: SparkSession, path: str, n_parts: int = 32) -> DataFrame:
    """File-source candidate stream: parquet files of (url_norm) appearing
    under `path` become a continuous frontier feed."""
    raw = (
        spark.readStream.schema("url_norm string")
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )
    return raw.select(
        "url_norm",
        F.xxhash64("url_norm").alias("url_hash"),
    ).withColumn("bucket", F.pmod("url_hash", F.lit(n_parts)).cast("int"))


FETCH_LOG_STREAM_SCHEMA = (
    "round int, part_id int, host string, url_norm string, url_hash bigint,"
    " depth int, fetch_seq int, due_s double, status int, text_sha256 string,"
    " content_len long"
)


def streaming_fetch_metrics(spark: SparkSession, fetch_log_dir: str) -> DataFrame:
    """Watermarked tumbling-window per-host fetch counts over a fetch_log
    file stream.  Event time is reconstructed from the virtual schedule
    (round start + due_s) — the crawl's own clock."""
    stream = (
        spark.readStream.schema(FETCH_LOG_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(fetch_log_dir)
    )
    with_ts = stream.withColumn(
        "event_ts",
        F.timestamp_seconds(F.col("round") * 3600 + F.col("due_s")),
    )
    return (
        with_ts.withWatermark("event_ts", "1 hour")
        .groupBy(F.window("event_ts", "10 minutes").alias("w"), "host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("n_ok"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_fetches",
            "n_ok",
        )
    )
