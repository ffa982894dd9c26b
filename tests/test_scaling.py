"""Scaling smoke (SURVEY.md §5.6, BASELINE.md B7–B9): the same crawl at two
parallelism levels must produce byte-identical outputs; throughput and
efficiency are reported for BENCH/BASELINE.md.  Marked bench — run with
``pytest --run-bench``; bench.py runs the full-size version."""

from __future__ import annotations

import time

import pytest

from spacetime_crawler_spark.plans import crawl as crawl_mod
from spacetime_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from spacetime_crawler_spark.session import get_spark
from spacetime_crawler_spark.sources import synth

PAGES = 5_000
ROUNDS = 3
BUDGET = 30.0


def _crawl_at(master: str, pages_dir: str, seeds, state_dir: str):
    spark = get_spark(master=master, app_name=f"scaling-{master}")
    pages = spark.read.parquet(pages_dir)
    cfg = CrawlConfig(state_dir=state_dir, rounds=ROUNDS, round_budget_s=BUDGET)
    t0 = time.monotonic()
    run = run_crawl(spark, pages, seeds, cfg)
    wall = time.monotonic() - t0
    seen = sorted(
        (r.url_norm, r.round_seen)
        for r in crawl_mod.read_seen(spark, run.io).collect()
    )
    log = sorted(
        (r.round, r.host, r.fetch_seq, r.url_norm, r.status, r.text_sha256)
        for r in crawl_mod.read_fetch_log(spark, run.io, run.rounds_run).collect()
    )
    work = sum(m.urls_selected + m.candidates for m in run.metrics)
    spark.stop()
    return wall, work, (seen, log)


@pytest.mark.bench
def test_two_parallelism_levels_identical_and_scaling(tmp_path_factory):
    p = synth.world("small", n_pages=PAGES)
    seeds = synth.seed_urls(p)
    pages_dir = str(tmp_path_factory.mktemp("pages"))

    spark = get_spark(master="local[8]", app_name="scaling-gen")
    synth.write_pages_parquet(spark, p, pages_dir)
    spark.stop()

    w8, work8, state8 = _crawl_at(
        "local[8]", pages_dir, seeds, str(tmp_path_factory.mktemp("s8"))
    )
    w32, work32, state32 = _crawl_at(
        "local[32]", pages_dir, seeds, str(tmp_path_factory.mktemp("s32"))
    )
    assert state8 == state32, "outputs must be identical across parallelism"
    assert work8 == work32
    eff = (w8 / w32) / 4
    print(
        f"\nscaling: local[8]={w8:.1f}s local[32]={w32:.1f}s "
        f"work={work8} eff={eff:.3f} urls/s8={work8 / w8:.0f} urls/s32={work32 / w32:.0f}"
    )
    # identical-output gate is the hard assertion; efficiency is recorded in
    # BENCH/BASELINE.md (job overhead dominates at this tiny test size)
    assert w32 > 0 and w8 > 0
