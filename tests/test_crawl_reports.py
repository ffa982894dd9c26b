"""Differential check of the four report analytics (A1–A4) computed by the
engine over its crawl outputs vs the single-node oracle's report."""

from __future__ import annotations

import pytest

from spacetime_crawler_spark.plans import crawl as crawl_mod
from spacetime_crawler_spark.plans import crawl_reports
from spacetime_crawler_spark.plans.crawl import CrawlConfig, prepare_pages, run_crawl
from spacetime_crawler_spark.sources import synth
from tests import reference_impl

ROUNDS = 3
BUDGET = 10.0


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    p = synth.world("tiny", n_pages=500)
    rows = synth.driver_side_pages(p)
    seeds = synth.seed_urls(p)
    oracle = reference_impl.crawl(rows, seeds, rounds=ROUNDS, round_budget_s=BUDGET)
    report = reference_impl.report_analytics(oracle, rows)

    pages = synth.generate_pages_df(spark, p).persist()
    cfg = CrawlConfig(
        state_dir=str(tmp_path_factory.mktemp("rep")), rounds=ROUNDS,
        round_budget_s=BUDGET,
    )
    run = run_crawl(spark, pages, seeds, cfg)
    fetch_log = crawl_mod.read_fetch_log(spark, run.io, run.rounds_run).persist()
    pages_latest = prepare_pages(spark, pages).persist()
    return report, fetch_log, pages_latest


def test_a1_unique_pages(setup):
    report, fetch_log, _ = setup
    got = crawl_reports.unique_pages(fetch_log).collect()[0].unique_pages
    assert got == report["unique_pages"]


def test_a2_subdomains(setup):
    report, fetch_log, _ = setup
    got = {r.host: r.n for r in crawl_reports.subdomain_histogram(fetch_log).collect()}
    assert got == report["subdomains"]


def test_a3_longest_page(setup):
    report, fetch_log, pages_latest = setup
    row = crawl_reports.longest_page(fetch_log, pages_latest).collect()[0]
    assert (row.url_norm, row.n_words) == report["longest_page"]


def test_a4_common_words(setup):
    report, fetch_log, pages_latest = setup
    got = [
        (r.word, r.n)
        for r in crawl_reports.common_words(fetch_log, pages_latest).collect()
    ]
    assert got == report["common_words"]
