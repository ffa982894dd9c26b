"""Local replica of the driver's queries()-vs-oracle_sql() comparison:
row count + column names + order-insensitive value comparison on the same
parquet tables, DuckDB as the oracle.  Used by tests/test_driver_contract.py
so correctness regressions surface in `pytest` before the driver runs.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from spacetime_crawler_spark.sources.tables import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # floats are pre-rounded by the queries; format canonically
        return f"{v:.6f}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    spark_pdf = spark_df.toPandas()
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)}"
            f" oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        extra_s = [r for r in s_rows if r not in o_rows][:3]
        extra_o = [r for r in o_rows if r not in s_rows][:3]
        problems.append(
            f"values differ; spark-only(≤3)={extra_s} oracle-only(≤3)={extra_o}"
        )
    return problems
