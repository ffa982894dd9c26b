"""Focused tests for the round-6 optimization internals (the rule: an
optimization that changes an operator's internals gets a pinned test).

Covered here:
- robots partition pruning: write_pages_parquet's `is_robots` partition
  column is pruned by build_robots_rules (PartitionFilters in-plan) and
  produces EXACTLY the rules of the unpruned in-memory path;
- finalize coalesce: the eagerly-checkpointed dedup results are a single
  partition (the block-churn fix) and identical to the lazy pairs plan.

The performance claims themselves live in OPTIMIZATION_r06.md; these
tests pin the correctness-relevant internals so a refactor cannot
silently lose the pruning or diverge the finalized results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler_spark.operators import dedup
from spacetime_crawler_spark.operators.politeness import build_robots_rules
from spacetime_crawler_spark.sources import synth

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_robots_build_is_partition_pruned_and_identical(spark, tmp_path):
    out = str(tmp_path / "world")
    synth.write_pages_parquet(spark, "tiny", out)
    disk = spark.read.parquet(out)
    assert "is_robots" in disk.columns  # the r6 layout

    pruned = build_robots_rules(disk)
    plan = _executed_plan(pruned)
    assert "PartitionFilters" in plan and "is_robots" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "robots build must prune on the is_robots partition"

    mem = synth.generate_pages_df(spark, "tiny")
    assert "is_robots" not in mem.columns  # unpruned fallback branch
    key = lambda df: sorted(
        (r.host, r.crawl_delay, str(r.rules)) for r in df.collect()
    )
    assert key(pruned) == key(build_robots_rules(mem))


def test_finalized_dedup_results_are_single_partition_and_lazy_equal(spark):
    finalized = dedup.dedup_ngram_jaccard(spark, SF_DIR)
    # the coalesce(1) before the eager localCheckpoint — one block, not
    # shuffle_partitions mostly-empty ones
    assert finalized.rdd.getNumPartitions() == 1
    lazy = dedup.ngram_jaccard_pairs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            F.col("doc_id") < dedup._DEDUP_DOC_LIMIT
        ),
        cleanup=[],
    )
    key = lambda df: sorted((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())
    assert key(finalized) == key(lazy)


def test_finalized_minhash_single_partition(spark):
    assert dedup.dedup_minhash_lsh(spark, SF_DIR).rdd.getNumPartitions() == 1
