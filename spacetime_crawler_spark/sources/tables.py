"""Driver-testdata sources with EXPLICIT schemas (never inferred — SURVEY §1.2).

Tables per TESTDATA.md: region nation customer supplier part orders lineitem
events documents embeddings, one parquet file each under an sf directory.
Explicit schemas double as a scan-time contract: Catalyst prunes columns and
pushes predicates into the parquet reader against these exact types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return (
        spark.read.schema(TESTDATA_SCHEMAS[name])
        .parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    )


SPREAD_MIN_BYTES = 2 << 20  # see spread() — measured crossover at sf0.1/sf1.0


def spread(
    df: DataFrame, target: int | None = None, min_bytes: int = SPREAD_MIN_BYTES
) -> DataFrame:
    """Round-robin repartition to the session's parallelism — ONLY when the
    source layout caps scan parallelism below it (guide §2.5 'input skew /
    unsplittable file').  The driver testdata writes each table as ONE
    parquet row group, so a scan is 1 task no matter how many byte-range
    splits Spark makes (a task emits only row groups whose midpoint falls
    in its range): every tokenize/HOF-heavy stage fused with such a scan
    runs single-threaded on a 32-core master.  The narrow repartition
    (~MBs, one upstream task) unlocks the other 31 cores; on a properly
    laid-out multi-file/multi-row-group table the condition is false and
    this is a no-op, so no extra exchange ever appears at scale.

    min_bytes gates the exchange by estimated input size: below it the
    serial work saved is smaller than the extra stage + exchange cost
    (measured at sf0.1: ~0.25 s overhead vs ~0.1 s of serial tokenize —
    a4/bigrams/span_stats each ~2× slower spread than not; at sf1.0 the
    same queries are 1.4–3× faster spread).  Callers whose per-byte work
    is extreme (L·k hyperplane dot products, per-row Python) pass
    min_bytes=0 — for those even sub-MB inputs win (sim_ann_multiprobe
    at sf0.1: 1.03 s → 0.68 s)."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if min_bytes:
        try:
            size = int(
                str(
                    df._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            )
        except Exception:
            size = min_bytes  # unknown size: err toward parallelism
        if size < min_bytes:
            return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
