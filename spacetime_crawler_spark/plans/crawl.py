"""The distributed URL-frontier crawl loop (SURVEY.md §3.2) — one BSP round
per driver iteration, all state in committed tables.

Dataflow per round (SURVEY §3.2):

    frontier ──F6 gate (robots bcast join)── F7 schedule ── selected
    selected ──F5 fetch-join pages_latest (hash-keyed) ── fetched (persist)
    fetched ──F9 text UDF──► fetch_log sink
    fetched ──F8 link UDF ── explode ── F1 native filter
            ──F3 dedup (bloom bcast prefilter → exact anti-join vs seen)
            ──F11 merge leftover ──► frontier′, seen′, bloom′ sinks

Scale levers baked in (SURVEY §4): F1 stays native (pushable); the fetch
join is keyed on xxhash64(url_norm) (narrow shuffle key, AQE skew-join
handles hot hosts); robots/bloom sidecars are broadcasts; the per-host
scheduler is two-phase-ranked then applyInPandas on quota-bounded groups;
`seen` and candidates are both repartitioned by pmod(url_hash, P) so the
anti-join co-partitions (with Iceberg bucket(P) this shuffle disappears
entirely).  Lineage never spans rounds — every round re-reads committed
state, the Spark analogue of the reference's save-file sync.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spacetime_crawler_spark.operators import bloom
from spacetime_crawler_spark.operators.politeness import (
    build_robots_rules,
    leftover_after_schedule,
    robots_gate,
    schedule_round,
)
from spacetime_crawler_spark.operators.udfs import (
    canonicalize_udf,
    page_extract_udf,
)
from spacetime_crawler_spark.functions.urlnorm import BLACKLIST_RLIKE
from spacetime_crawler_spark.sources.io_tables import ParquetManifestIO

FRONTIER_COLS = ("url_norm", "url_hash", "h2", "host", "depth")


@dataclass
class CrawlConfig:
    state_dir: str
    rounds: int = 4
    round_budget_s: float = 30.0
    n_parts: int = 32
    use_bloom: bool = True
    allowed_host_suffixes: tuple[str, ...] = ()
    # fixed bloom geometry per partition bucket (incremental maintenance):
    # 2^21 bits / 7 hashes ≈ 1% FPR up to ~200k keys per bucket; size for
    # the target seen-set capacity — FPR degradation past capacity only
    # costs extra anti-join traffic, never correctness
    bloom_bits_per_part: int = 1 << 21
    bloom_hashes: int = 7


@dataclass
class RoundMetrics:
    round: int
    urls_selected: int = 0
    urls_fetched_ok: int = 0
    urls_404: int = 0
    candidates: int = 0
    bloom_skipped: int = 0
    urls_new: int = 0
    wall_s: float = 0.0


@dataclass
class CrawlRun:
    io: ParquetManifestIO
    metrics: list[RoundMetrics] = field(default_factory=list)
    rounds_run: int = 0


def _with_keys(df: DataFrame, url_col: str = "url_norm") -> DataFrame:
    """Attach the two JVM hashes every downstream stage keys on:
    url_hash = xxhash64 (64-bit working key), h2 = murmur3_x86_32
    (BASELINE.json north_star's murmur3; bloom double-hash second arm)."""
    return df.withColumn("url_hash", F.xxhash64(url_col)).withColumn(
        "h2", F.hash(url_col)
    )


def _is_valid_expr(url_col: str, allowed_suffixes: tuple[str, ...]) -> F.Column:
    """F1 as NATIVE column expressions (no UDF → Catalyst can push/fold it):
    scheme whitelist + extension-blacklist rlike + optional host suffix."""
    scheme_ok = F.parse_url(F.col(url_col), F.lit("PROTOCOL")).isin("http", "https")
    path = F.lower(F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("")))
    ext_ok = ~path.rlike(BLACKLIST_RLIKE)
    host = F.lower(F.coalesce(F.parse_url(F.col(url_col), F.lit("HOST")), F.lit("")))
    cond = scheme_ok & ext_ok & (host != "")
    if allowed_suffixes:
        suffix_ok = F.lit(False)
        for s in allowed_suffixes:
            suffix_ok = suffix_ok | (host == s) | host.endswith("." + s)
        cond = cond & suffix_ok
    return cond


def prepare_page_keys(spark: SparkSession, pages: DataFrame) -> DataFrame:
    """One-time NARROW pages index: (url, warc_ts, url_norm, url_hash) — the
    canonicalized key of every capture, WITHOUT the html payload.

    Deliberately no as-of window here: windowing the full table would
    shuffle the fat html column through disk (measured ~175 s for a 2M-page
    world — the single worst stage in the v1 engine and a plan that cannot
    scale: local shuffles serialize on one disk, cluster shuffles move TBs
    of html).  As-of resolution happens per round over only the selected
    urls (fetch_join_round), so html NEVER enters a shuffle anywhere in the
    engine."""
    return pages.select(
        "url", "warc_ts", canonicalize_udf("url").alias("url_norm")
    ).withColumn("url_hash", F.xxhash64("url_norm"))


def prepare_pages(spark: SparkSession, pages: DataFrame) -> DataFrame:
    """Materialized latest-capture view WITH html — used by offline report
    analytics at test scale (crawl_reports); the crawl loop itself uses the
    shuffle-free prepare_page_keys + fetch_join_round path instead."""
    canon = pages.withColumn("url_norm", canonicalize_udf("url"))
    latest = (
        canon.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("url_norm").orderBy(F.desc("warc_ts"), F.asc("url"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return _with_keys(latest.select("url_norm", "warc_ts", "html"))


def fetch_join_round(
    spark: SparkSession,
    pages: DataFrame,
    page_keys: DataFrame,
    selected: DataFrame,
) -> DataFrame:
    """F5 without ever shuffling html:

    1. broadcast `selected` (quota-bounded) against the narrow key index →
       all captures of the selected urls;
    2. as-of window over that SMALL set → one winning (url, warc_ts) per
       url_norm (latest capture; noise-variant stored urls resolve here);
    3. broadcast the winners into a streaming scan of raw `pages` — html
       rows flow straight from the scan into the extraction UDF, no
       exchange;
    4. selected rows with no winner are 404s (left join against winners'
       metadata, not against html).

    Scale note: on a 10^10 frontier the winner set can exceed broadcast
    size — there the Iceberg layout (bucket(256, url)) makes step 3 a
    co-partitioned bucket join with partition pruning instead; the fallback
    here is correct at any size, just broadcast-bound (~tens of MB per
    round)."""
    meta_cols = ["host", "url_norm", "url_hash", "h2", "depth",
                 "fetch_seq", "due_s", "crawl_delay"]
    sel_meta = selected.select(*meta_cols)
    captures = page_keys.join(
        F.broadcast(sel_meta), ["url_hash", "url_norm"], "inner"
    )
    winners = (
        captures.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("url_norm").orderBy(F.desc("warc_ts"), F.asc("url"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # status-200 branch: html streams from the scan, schedule metadata rides
    # the broadcast — zero html exchanges
    fetched_ok = (
        pages.select("url", "warc_ts", "html")
        .join(F.broadcast(winners), ["url", "warc_ts"], "inner")
        .select(*meta_cols, "html")
        .withColumn("status", F.lit(200))
    )
    # 404 branch: selected urls with no capture at all
    missing = (
        selected.join(
            F.broadcast(winners.select("url_norm", "url_hash")),
            ["url_hash", "url_norm"],
            "left_anti",
        )
        .select(*meta_cols)
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("status", F.lit(404))
    )
    return fetched_ok.unionByName(missing)


def init_frontier(spark: SparkSession, seeds: list[str],
                  cfg: CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """Seeds → (frontier, seen) at round 0 (admission-at-discovery, like the
    reference's add_url)."""
    seed_df = spark.createDataFrame([(s,) for s in seeds], "url string")
    canon = (
        seed_df.withColumn("url_norm", canonicalize_udf("url"))
        .filter(_is_valid_expr("url_norm", cfg.allowed_host_suffixes))
        .select("url_norm")
        .distinct()
    )
    frontier = _with_keys(canon).withColumn(
        "host", F.lower(F.parse_url("url_norm", F.lit("HOST")))
    ).withColumn("depth", F.lit(0))
    seen = frontier.select("url_norm", "url_hash", "h2").withColumn(
        "round_seen", F.lit(0)
    )
    return frontier.select(*FRONTIER_COLS), seen


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list[str],
    cfg: CrawlConfig,
    resume: bool = False,
) -> CrawlRun:
    io = ParquetManifestIO(cfg.state_dir)
    run = CrawlRun(io=io)

    page_keys = prepare_page_keys(spark, pages).persist()  # narrow, no html
    robots_rules = build_robots_rules(pages).persist()
    robots_rules.count()  # materialize the small side once

    start_round = 0
    if resume:
        last = io.last_committed_round("frontier")
        if last is not None:
            start_round = last
    if start_round == 0:
        frontier, seen = init_frontier(spark, seeds, cfg)
        io.write("frontier", 0, frontier)
        # `seen` is stored as per-round DELTAS (round=N holds only the URLs
        # first seen in round N): writes are O(new), never O(total) — the
        # snapshot-rewrite alternative re-writes the whole 10^10-key set
        # every round.  Readers union committed deltas; Iceberg backend
        # compacts them natively.
        io.write("seen", 0, seen.repartition(cfg.n_parts, "url_hash"))
        io.commit(0, {"frontier": frontier.count(), "seen": seen.count()})

    def seen_up_to(rnd_inclusive: int) -> DataFrame:
        dfs = [io.read(spark, "seen", r) for r in range(0, rnd_inclusive + 1)]
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out

    # incremental bloom sidecar: fixed geometry, OR'd per round
    sidecar: dict[int, tuple[int, int, bytes]] = {}
    if cfg.use_bloom:
        sidecar = bloom.build_delta_sidecar(
            seen_up_to(start_round), cfg.n_parts,
            cfg.bloom_bits_per_part, cfg.bloom_hashes,
        )

    for rnd in range(start_round + 1, cfg.rounds + 1):
        t0 = time.monotonic()
        m = RoundMetrics(round=rnd)
        round_persists: list[DataFrame] = []
        frontier = io.read(spark, "frontier", rnd - 1)
        seen = seen_up_to(rnd - 1)
        if frontier.isEmpty():
            break

        # F6 + F7 — gate and schedule
        gated = robots_gate(frontier, robots_rules).persist()
        selected = schedule_round(gated, cfg.round_budget_s).persist()
        leftover = leftover_after_schedule(gated, selected)

        # F5 — shuffle-free fetch: broadcast the quota-bounded selected set
        # through the narrow key index; html streams scan → UDF
        fetched = fetch_join_round(spark, pages, page_keys, selected)

        # F8+F9 fused — ONE parse per page produces text AND links; persisted
        # WITHOUT the html payload so both downstream consumers (lineage sink,
        # candidate pipeline) reuse the single Python pass.
        enriched = fetched.withColumn(
            "page", page_extract_udf("html", "url_norm")
        ).select(
            "host", "url_norm", "url_hash", "depth", "fetch_seq", "due_s",
            "status",
            F.when(F.col("status") == 200, F.sha2(F.col("page.text"), 256))
            .alias("text_sha256"),
            F.when(F.col("status") == 200, F.length("html"))
            .otherwise(F.lit(0))
            .alias("content_len"),
            F.when(F.col("status") == 200, F.col("page.links"))
            .otherwise(F.array().cast("array<string>"))
            .alias("links"),
        ).persist()

        fetch_log = enriched.select(
            F.lit(rnd).alias("round"),
            F.spark_partition_id().alias("part_id"),
            "host",
            "url_norm",
            "url_hash",
            "depth",
            "fetch_seq",
            "due_s",
            "status",
            "text_sha256",
            "content_len",
        )
        io.write("fetch_log", rnd, fetch_log)
        # one read-back aggregate supplies both counts (no lineage recompute,
        # one Spark job instead of two)
        stats = io.read_uncommitted(spark, "fetch_log", rnd).agg(
            F.count("*").alias("n"),
            F.sum((F.col("status") == 200).cast("long")).alias("ok"),
        ).collect()[0]
        m.urls_selected = stats.n
        m.urls_fetched_ok = stats.ok or 0
        m.urls_404 = m.urls_selected - m.urls_fetched_ok

        # F1 — native validity filter over the already-extracted links
        links = (
            enriched.filter("status = 200")
            .select("depth", F.explode("links").alias("link"))
            .filter(_is_valid_expr("link", cfg.allowed_host_suffixes))
        )
        # within-batch collapse: one row per url, min discovery depth
        candidates = _with_keys(
            links.groupBy(F.col("link").alias("url_norm")).agg(
                (F.min("depth") + 1).alias("depth")
            )
        )

        # F3 — bloom prefilter (definite-negatives skip the exact anti-join),
        # then exact left_anti vs seen, both sides partitioned by url_hash.
        if cfg.use_bloom:
            maybe_seen_udf = bloom.make_maybe_seen_udf(spark, sidecar, cfg.n_parts)
            flagged = candidates.withColumn(
                "maybe_seen", maybe_seen_udf("url_hash", "h2")
            ).persist()
            round_persists.append(flagged)
            cstats = flagged.agg(
                F.count("*").alias("n"),
                F.sum(F.col("maybe_seen").cast("long")).alias("maybes"),
            ).collect()[0]
            m.candidates = cstats.n
            m.bloom_skipped = m.candidates - (cstats.maybes or 0)
            definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            to_check = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
            checked_new = to_check.repartition(cfg.n_parts, "url_hash").join(
                seen.repartition(cfg.n_parts, "url_hash"),
                ["url_hash", "url_norm"],
                "left_anti",
            )
            new_urls = definitely_new.unionByName(checked_new)
        else:
            m.candidates = candidates.count()
            new_urls = candidates.repartition(cfg.n_parts, "url_hash").join(
                seen.repartition(cfg.n_parts, "url_hash"),
                ["url_hash", "url_norm"],
                "left_anti",
            )

        new_frontier_rows = new_urls.withColumn(
            "host", F.lower(F.parse_url("url_norm", F.lit("HOST")))
        ).select(*FRONTIER_COLS).persist()
        m.urls_new = new_frontier_rows.count()

        # F11 — merge: leftover ∪ newly discovered (min depth per url)
        next_frontier = (
            leftover.select(*FRONTIER_COLS)
            .unionByName(new_frontier_rows)
            .groupBy("url_norm", "url_hash", "h2", "host")
            .agg(F.min("depth").alias("depth"))
            .select(*FRONTIER_COLS)
        )
        seen_delta = new_frontier_rows.select(
            "url_norm", "url_hash", "h2"
        ).withColumn("round_seen", F.lit(rnd))

        io.write("frontier", rnd, next_frontier)
        io.write("seen", rnd, seen_delta.repartition(cfg.n_parts, "url_hash"))
        if cfg.use_bloom:
            sidecar = bloom.merge_sidecars(
                sidecar,
                bloom.build_delta_sidecar(
                    io.read_uncommitted(spark, "seen", rnd), cfg.n_parts,
                    cfg.bloom_bits_per_part, cfg.bloom_hashes,
                ),
            )
        # count from the files just written — never recompute round lineage
        n_frontier = io.read_uncommitted(spark, "frontier", rnd).count()
        m.wall_s = time.monotonic() - t0
        io.commit(rnd, {
            "frontier": n_frontier,
            "seen": m.urls_new,  # delta count; snapshot is full
            "fetch_log": m.urls_selected,
        })
        run.metrics.append(m)
        run.rounds_run = rnd

        for df in (gated, selected, enriched, new_frontier_rows, *round_persists):
            df.unpersist()
        if n_frontier == 0:
            break

    # F12 — one metrics snapshot for the whole run (off the per-round
    # critical path; per-round lineage lives in fetch_log already)
    if run.metrics:
        metrics_df = spark.createDataFrame(
            [(m.round, m.urls_selected, m.urls_fetched_ok, m.urls_404,
              m.candidates, m.bloom_skipped, m.urls_new, m.wall_s)
             for m in run.metrics],
            "round int, urls_selected long, urls_fetched_ok long, urls_404 long,"
            " candidates long, bloom_skipped long, urls_new long, wall_s double",
        )
        io.write("metrics", run.rounds_run, metrics_df)
        io.commit(run.rounds_run, {"metrics": len(run.metrics)})

    page_keys.unpersist()
    robots_rules.unpersist()
    return run


# --- result readers (shared by tests / bench / analytics) ----------------------

def read_fetch_log(spark: SparkSession, io: ParquetManifestIO,
                   up_to_round: int) -> DataFrame:
    dfs = []
    for rnd in range(1, up_to_round + 1):
        if io.last_committed_round("fetch_log") is not None:
            try:
                dfs.append(io.read(spark, "fetch_log", rnd))
            except FileNotFoundError:
                break
    if not dfs:
        raise FileNotFoundError("no committed fetch_log rounds")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def read_seen(spark: SparkSession, io: ParquetManifestIO) -> DataFrame:
    """Union of all committed per-round seen deltas (= the full seen set)."""
    last = io.last_committed_round("seen")
    if last is None:
        raise FileNotFoundError("no committed seen rounds")
    out = io.read(spark, "seen", 0)
    for rnd in range(1, last + 1):
        out = out.unionByName(io.read(spark, "seen", rnd))
    return out
