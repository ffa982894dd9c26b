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
            yield out  # every input column passes through, input order
    state.update((list(seen),))


def streaming_urlseen_dedup(candidates: DataFrame) -> DataFrame:
    """candidates (streaming) → first-seen rows only, exact, stateful.

    Input must carry (url_norm, url_hash, bucket = pmod(url_hash, P)); the
    state store shards by bucket.  All OTHER input columns (host, depth,
    crawl_delay, …) pass through untouched, so the operator composes
    directly with downstream stages — notably
    streaming_politeness_schedule in the chained frontier topology."""
    return candidates.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=candidates.schema,
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


# --- F7 as a continuous operator: per-host politeness scheduler ---------------

SCHED_IN_SCHEMA = (
    "host string, url_norm string, url_hash bigint, depth int,"
    " crawl_delay double"
)
SCHED_OUT_SCHEMA = (
    "host string, url_norm string, url_hash bigint, depth int,"
    " crawl_delay double, sched_round int, fetch_seq int, due_s double"
)
# state = the host's backlog (allowed-but-over-quota URLs, the streaming
# analogue of the batch engine's leftover frontier) + the invocation counter
# and the host's pinned crawl_delay
_SCHED_STATE_SCHEMA = (
    "rounds int, crawl_delay double, backlog_url array<string>,"
    " backlog_hash array<bigint>, backlog_depth array<int>"
)
_SCHED_COLS = [
    "host", "url_norm", "url_hash", "depth", "crawl_delay",
    "sched_round", "fetch_seq", "due_s",
]


def _make_sched_fn(round_budget_s: float, use_timeout: bool):
    """Per-host scheduler kernel, quota discipline identical to the batch
    operators/politeness.py::schedule_round: each invocation ("round")
    merges new candidates into the backlog (min discovery depth per url —
    the F11 rule), emits the top quota = floor(budget / crawl_delay) in
    (depth, url_norm) priority order with fetch_seq 1..q and the virtual
    due time, and keeps the rest as backlog state.

    Equivalence contract (differentially tested in tests/test_streaming.py):
    the emission equals the batch scheduler + leftover carry round-for-round
    PROVIDED each host is invoked each round — i.e. it receives input rows
    in every trigger (the test's setup), or use_timeout=True arms the
    politeness timer so a backlogged host drains without input.  In
    NoTimeout mode a host with a backlog but no new input is not invoked
    until its next input row — and sched_round is a PER-HOST invocation
    counter, which then lags the global trigger index for that host.
    In use_timeout (production) mode drained hosts keep NO state row
    (evicted — state store stays O(backlogged hosts)); on resurfacing,
    sched_round restarts at 1 and crawl_delay is re-learned.  NoTimeout
    mode keeps drained state so sched_round stays a lifetime counter
    (the batch-equivalence contract)."""
    import math

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        host = key[0]
        if state.exists:
            rounds, delay, b_url, b_hash, b_depth = state.get
            pending = {
                u: (int(d), int(h))
                for u, h, d in zip(b_url, b_hash, b_depth)
            }
        else:
            rounds, delay, pending = 0, None, {}
        for pdf in pdfs:
            if delay is None and len(pdf):
                delay = float(pdf["crawl_delay"].iloc[0])
            for u, h, d in zip(
                pdf["url_norm"], pdf["url_hash"], pdf["depth"]
            ):
                d, h = int(d), int(h)
                if u not in pending or d < pending[u][0]:
                    pending[u] = (d, h)
        rounds += 1
        out = []
        # quota discipline ≡ batch schedule_round: floor(budget / delay),
        # with delay <= 0 treated as quota 0 (the batch SQL path NULLs the
        # division and drops the host; crashing here would be a
        # crash-vs-drop divergence in the equivalence contract)
        quota = 0
        if delay is not None and delay > 0:
            quota = int(math.floor(round_budget_s / delay))
        if quota >= 1 and pending:
            # priority order — identical to the batch window/pandas sort
            ordered = sorted(
                pending.items(), key=lambda kv: (kv[1][0], kv[0])
            )
            for seq, (u, (d, h)) in enumerate(ordered[:quota], start=1):
                out.append(
                    (host, u, h, d, delay, rounds, seq, delay * seq)
                )
                del pending[u]
        if not pending and use_timeout:
            # DRAINED host in production (timeout) mode: keep NO state row
            # (remove any existing one) — the state store stays
            # O(backlogged hosts), not O(all-hosts-ever).  crawl_delay is
            # re-learned from the next input row and the per-host
            # sched_round counter restarts if the host later resurfaces
            # (sched_round counts invocations of a live backlog episode).
            # In NoTimeout (deterministic/differential) mode state is KEPT
            # so sched_round stays a lifetime invocation counter — the
            # round-for-round batch-equivalence contract depends on it.
            if state.exists:
                state.remove()
        else:
            urls = list(pending)
            state.update((
                rounds, delay,
                urls,
                [pending[u][1] for u in urls],
                [pending[u][0] for u in urls],
            ))
        if use_timeout and quota >= 1 and pending:
            # production mode: a BACKLOGGED host drains on its own politeness
            # timer even when no new candidates arrive for it.  Re-armed only
            # while a backlog exists AND the host can actually emit
            # (quota >= 1) — otherwise every host ever seen (or a quota-0
            # host that can never drain) would be re-invoked every
            # crawl_delay forever: state-store churn proportional to
            # all-hosts-ever, not active hosts.  A drained or unschedulable
            # host next wakes when new input arrives for it.
            state.setTimeoutDuration(int(delay * 1000))
        if out:
            yield pd.DataFrame(out, columns=_SCHED_COLS)

    return fn


def streaming_politeness_schedule(
    gated: DataFrame, round_budget_s: float, use_timeout: bool = False
) -> DataFrame:
    """gated candidate stream (SCHED_IN_SCHEMA rows, robots-gated upstream)
    → continuous per-host fetch schedule.  State shards by host — the same
    partitioning the batch scheduler's applyInPandas uses, and per-host
    state is bounded by the backlog size (at 10^10 scale the backlog IS the
    frontier, so production deployments cap per-host backlog upstream via
    the F4 top-k operator).  use_timeout=True arms a ProcessingTimeTimeout
    of crawl_delay per host so backlogs drain without new input (the live
    deployment mode; deterministic tests drive rounds by input instead)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return gated.groupBy("host").applyInPandasWithState(
        _make_sched_fn(round_budget_s, use_timeout),
        outputStructType=SCHED_OUT_SCHEMA,
        stateStructType=_SCHED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


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


# --- the fetch stage: closing the streaming crawl loop ------------------------


def streaming_fetch_stage(
    spark: SparkSession,
    pages: DataFrame,
    schedule_stream: DataFrame,
    fetch_log_dir: str,
    checkpoint_dir: str,
    broadcast_selected: bool = True,
):
    """dedup → schedule → **fetch → log**: the stage that closes the
    streaming crawl loop.  Each micro-batch of scheduled rows (the
    streaming_politeness_schedule output) is joined against the STATIC
    pages table through the batch engine's own fetch_join_round (html
    never in a shuffle key; broadcast or shuffled-hash exactly like a
    batch round) and enriched through the SAME pinned extract_fetched
    shape, then written to `{fetch_log_dir}/b{batch_id}` with
    round = sched_round.  foreachBatch is the correct topology here — a
    stream-static join with an arbitrary-stateful upstream and a
    fan-out UDF belongs in a micro-batch callback.  foreachBatch is
    AT-LEAST-ONCE (a crash between the sink write and the offset commit
    replays the batch on restart), so the sink must be IDEMPOTENT: each
    batch overwrites its own batch-id-keyed subdirectory, and a replay
    rewrites identical content instead of appending duplicate fetch_log
    rows.  Consumers read the log with the `b*` glob.  Returns the
    started StreamingQuery; callers awaitTermination.

    Differential contract (tests/test_streaming.py): this three-stage
    chain over one trigger of candidates equals ONE BATCH ROUND of the
    engine — same admission, same schedule, same fetch statuses, same
    text sha256 per url."""
    from spacetime_crawler_spark.plans.crawl import (
        extract_fetched,
        fetch_join_round,
        prepare_page_keys,
    )

    page_keys = prepare_page_keys(spark, pages)

    def _sink(batch_df, batch_id):
        # cache before the emptiness probe: batch_df's lineage includes the
        # stateful schedule stage, and an uncached take(1) + write would
        # execute that whole upstream twice per batch
        batch_df.persist()
        try:
            if not batch_df.take(1):
                return
            selected = batch_df.withColumn("h2", F.hash("url_norm"))
            fetched = fetch_join_round(
                spark, pages, page_keys, selected,
                broadcast_selected=broadcast_selected,
                extra_meta=("sched_round",),
            )
            log = extract_fetched(fetched, extra_cols=("sched_round",)).select(
                F.col("sched_round").alias("round"),
                F.spark_partition_id().alias("part_id"),
                "host", "url_norm", "url_hash", "depth", "fetch_seq", "due_s",
                "status", "text_sha256", "content_len",
            )
            log.write.mode("overwrite").parquet(
                f"{fetch_log_dir.rstrip('/')}/b{int(batch_id):05d}"
            )
        finally:
            batch_df.unpersist()

    return (
        schedule_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
