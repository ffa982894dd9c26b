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
