"""The reference's four course-report analytics (SURVEY.md §2 group A)
computed over the ENGINE's own crawl outputs (fetch_log ⋈ pages), mirroring
what the reference computed over its crawl logs.  The differential test
checks these against tests/reference_impl.report_analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spacetime_crawler_spark.functions.tokenize import STOPWORDS, TOKEN_SPLIT_REGEX

_TOKENS = f"filter(split(lower(text), '{TOKEN_SPLIT_REGEX}'), x -> x != '')"


def _fetched_pages(fetch_log: DataFrame, pages_latest: DataFrame) -> DataFrame:
    """Distinct successfully-fetched urls joined back to their text.
    pages_latest is the prepare_pages() output (url_norm, url_hash, html);
    text is recomputed through the F9 UDF — byte-identical to the stored
    column by the engine's core invariant."""
    from spacetime_crawler_spark.operators.udfs import text_extract_udf

    ok = (
        fetch_log.filter(F.col("status") == 200)
        .select("url_norm", "url_hash", "host")
        .distinct()
    )
    return ok.join(
        pages_latest.select(
            "url_norm", "url_hash", text_extract_udf("html").alias("text")
        ),
        ["url_hash", "url_norm"],
    )


def unique_pages(fetch_log: DataFrame) -> DataFrame:
    """A1 — distinct defragmented URLs successfully crawled."""
    return fetch_log.filter(F.col("status") == 200).agg(
        F.countDistinct("url_norm").alias("unique_pages")
    )


def subdomain_histogram(fetch_log: DataFrame) -> DataFrame:
    """A2 — per-host page counts, alphabetical."""
    return (
        fetch_log.filter(F.col("status") == 200)
        .select("host", "url_norm")
        .distinct()
        .groupBy("host")
        .agg(F.count("*").alias("n"))
        .orderBy("host")
    )


def language_histogram(
    fetch_log: DataFrame, pages_latest: DataFrame
) -> DataFrame:
    """Per-language page counts over the crawled set — the rollup the
    per-language budget / stratified-sample operators key on.  Prefers the
    fetch_log's own `lang` column when the crawl ran with
    CrawlConfig.annotate_lang; otherwise recomputes text through the F9
    UDF (byte-identical by the engine invariant) and annotates here.
    NULL lang (unreliable call) groups as 'und' so the histogram always
    partitions the fetched set.  Shuffle carries one row per language."""
    from spacetime_crawler_spark.operators.textstats import annotate_lang

    if "lang" in fetch_log.columns:
        tagged = (
            fetch_log.filter(F.col("status") == 200)
            .select("url_norm", "lang")
            .distinct()
        )
    else:
        tagged = annotate_lang(
            _fetched_pages(fetch_log, pages_latest), text_col="text"
        ).select("url_norm", "lang")
    return (
        tagged.groupBy(F.coalesce(F.col("lang"), F.lit("und")).alias("lang"))
        .agg(F.count("*").alias("n_pages"))
        .orderBy("lang")
    )


def longest_page(fetch_log: DataFrame, pages_latest: DataFrame) -> DataFrame:
    """A3 — url with the most words (ties → lexicographically first url)."""
    counted = _fetched_pages(fetch_log, pages_latest).select(
        "url_norm", F.expr(f"size({_TOKENS})").alias("n_words")
    )
    w = Window.orderBy(F.desc("n_words"), F.asc("url_norm"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("url_norm", "n_words")
    )


def host_link_edges(fetch_log: DataFrame, pages_latest: DataFrame) -> DataFrame:
    """Host-level link graph of the crawled set: (src_host, dst_host,
    n_links) over distinct fetched pages, restricted to hosts that were
    themselves crawled (closed graph).  Links are recomputed from the html
    through the same fused F8 extractor the engine used — one Python pass,
    then native explode/parse/aggregate."""
    from spacetime_crawler_spark.operators.udfs import page_extract_udf

    ok = (
        fetch_log.filter(F.col("status") == 200)
        .select("url_norm", "url_hash", "host")
        .distinct()
    )
    crawled_hosts = ok.select(F.col("host").alias("dst_host")).distinct()
    with_links = ok.join(
        pages_latest.select("url_norm", "url_hash", "html"), ["url_hash", "url_norm"]
    ).select(
        F.col("host").alias("src_host"),
        F.explode(page_extract_udf("html", "url_norm").links).alias("link"),
    )
    return (
        with_links.select(
            "src_host",
            F.lower(F.parse_url("link", F.lit("HOST"))).alias("dst_host"),
        )
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != F.col("src_host")))
        .join(F.broadcast(crawled_hosts), "dst_host", "left_semi")
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Generic PageRank: nodes(node), edges(src, dst) → (node, rank).
    Iterative-algorithm representative of the engine: fixed iteration count
    (deterministic), each step a keyed join + aggregate, per-step
    localCheckpoint so the plan stays O(1) deep, dangling mass redistributed
    uniformly (the standard correction — rank mass is conserved, asserted in
    tests against a pure-Python oracle).

    r6 (guide §5 'the driver should do almost no data work' + §1.2 job
    count): the per-iteration dangling-mass scalar is no longer a blocking
    driver collect — the 1-row dangling aggregate rides the iteration's
    one materializing job as a broadcast-joined scalar, halving the
    sequential per-iteration job count (2 → 1; same-session A/B on
    graph_pagerank at sf0.1: 5.57 → 5.08 s min-of-3, bit-identical
    ranks — the win is bounded here by the 25-node graph's fixed
    stage latency, and grows with the per-job cost of a real cluster's
    driver round-trips)."""
    edges = edges.select("src", "dst").persist()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    nodes = nodes.select("node").distinct().localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iters):
        dangling_df = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left")
            .filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.col("rank").alias("src_rank"),
                "src",
            )
            .join(out_deg, "src")
            .groupBy("node")
            .agg(F.sum(F.col("src_rank") / F.col("out_deg")).alias("contrib"))
        )
        # same FP evaluation order as the former driver-side
        # `base = (1-d)/n + d*dangling/n` followed by `base + d*contrib`
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .join(F.broadcast(dangling_df))
            .select(
                "node",
                (
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping) * F.col("dangling") / F.lit(float(n))
                    )
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        ranks.unpersist()  # superseded checkpoint — don't pin O(iters×|V|)
        ranks = new_ranks
    edges.unpersist()
    nodes.unpersist()
    return ranks.select("node", F.round("rank", 8).alias("rank")).orderBy(
        F.desc("rank"), F.asc("node")
    )


def host_pagerank(
    fetch_log: DataFrame,
    pages_latest: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the crawled host graph — the score a frontier
    prioritizer feeds back into scheduling (crawl what well-linked hosts
    point at first).  Thin wrapper over the generic pagerank()."""
    edges = host_link_edges(fetch_log, pages_latest).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    nodes = (
        fetch_log.filter(F.col("status") == 200)
        .select(F.col("host").alias("node"))
        .distinct()
    )
    return pagerank(nodes, edges, iters, damping).select(
        F.col("node").alias("host"), "rank"
    )


def common_words(fetch_log: DataFrame, pages_latest: DataFrame, k: int = 50) -> DataFrame:
    """A4 — top-k words over fetched text, stopwords excluded."""
    return (
        _fetched_pages(fetch_log, pages_latest)
        .select(F.explode(F.expr(_TOKENS)).alias("word"))
        .filter(~F.col("word").isin(*STOPWORDS))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(k)
    )


def anchor_text_agg(
    fetch_log: DataFrame, pages_latest: DataFrame, min_inbound: int = 1
) -> DataFrame:
    """Inbound anchor-text aggregation — the link-context ranking signal a
    web-scale corpus builds per TARGET url: how many crawled pages link to
    it, from how many distinct hosts, and the dominant anchor string.

    Deterministic top-anchor rule: highest inbound count wins, ties broken
    by lexicographically-smallest anchor (empty-string anchors — image
    links etc. — count toward n_inbound but never win the label unless
    they are all there is).

    Scale shape: the anchor UDF runs fused into the pages scan (one Arrow
    crossing, same batch discipline as the F8/F9 path); the explode emits
    narrow (target, src_host, anchor) rows — html never leaves the scan
    stage.  Aggregation is two partial+final hash-agg chains on short
    string keys (per-(target,anchor) counts rolled up by a struct-min
    instead of a window — no per-group sort), plus one distinct-host agg;
    the final single-key joins meet on the same target partitioning."""
    from spacetime_crawler_spark.operators.udfs import anchor_extract_udf

    ok = fetch_log.filter(F.col("status") == 200).select(
        "url_norm", "url_hash", "host"
    ).distinct()
    src = ok.join(
        pages_latest.select(
            "url_norm",
            "url_hash",
            anchor_extract_udf("html", "url_norm").alias("anchors"),
        ),
        ["url_hash", "url_norm"],
    )
    pairs = src.select(
        F.col("host").alias("src_host"),
        F.explode("anchors").alias("an"),
    ).select(
        F.col("an.url").alias("target"),
        "src_host",
        F.col("an.anchor").alias("anchor"),
    )
    per_anchor = pairs.groupBy("target", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    # min of (-n, anchor) = highest count, ties to the smallest anchor
    best = per_anchor.groupBy("target").agg(
        F.sum("n").cast("long").alias("n_inbound"),
        F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("anchor").alias("a")))
        .getField("a")
        .alias("top_anchor"),
    )
    hosts = pairs.groupBy("target").agg(
        F.countDistinct("src_host").cast("long").alias("n_src_hosts")
    )
    return best.join(hosts, "target").filter(
        F.col("n_inbound") >= F.lit(min_inbound)
    ).select("target", "n_inbound", "n_src_hosts", "top_anchor")
