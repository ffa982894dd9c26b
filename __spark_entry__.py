"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spacetime_crawler_spark``; this module is a thin
adapter over plans/registry.py so the registry stays the single source of
truth (tests/test_driver_contract.py runs the same comparison the driver
does).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: A4 common-words report
    (the reference's headline analytics) over `documents`."""
    from spacetime_crawler_spark.plans.analytics import a4_common_words

    return a4_common_words(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data pipeline operators). Each callable takes (spark, sf_dir)
    and returns a DataFrame with oracle-matching column names."""
    from spacetime_crawler_spark.plans.registry import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per SQL-expressible query key; keys absent
    here (sketch/ANN/UDF ops) get the driver's rows-only check."""
    from spacetime_crawler_spark.plans.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
