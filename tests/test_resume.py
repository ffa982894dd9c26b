"""Checkpoint/resume + determinism (SURVEY.md §5.4): a run interrupted after
round 2 and resumed must be byte-identical to an uninterrupted run; two runs
with the same seed must be identical."""

from __future__ import annotations

import pytest

from spacetime_crawler_spark.plans import crawl as crawl_mod
from spacetime_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from spacetime_crawler_spark.sources import synth

ROUNDS = 4
BUDGET = 8.0


@pytest.fixture(scope="module")
def tiny(spark):
    p = synth.world("tiny", n_pages=600)
    return p, synth.generate_pages_df(spark, p).persist(), synth.seed_urls(p)


def _final_state(spark, io, rounds_run):
    seen = sorted(
        (r.url_norm, r.round_seen)
        for r in crawl_mod.read_seen(spark, io).collect()
    )
    log = sorted(
        (r.round, r.host, r.fetch_seq, r.url_norm, r.status, r.text_sha256)
        for r in crawl_mod.read_fetch_log(spark, io, rounds_run).collect()
    )
    return seen, log


def _run(spark, tiny, tmp, rounds, resume=False, state_dir=None):
    p, pages, seeds = tiny
    state_dir = state_dir or str(tmp)
    cfg = CrawlConfig(state_dir=state_dir, rounds=rounds, round_budget_s=BUDGET)
    run = run_crawl(spark, pages, seeds, cfg, resume=resume)
    return run, state_dir


def test_resume_equals_uninterrupted(spark, tiny, tmp_path_factory):
    # full run
    run_full, _ = _run(spark, tiny, tmp_path_factory.mktemp("full"), ROUNDS)
    full = _final_state(spark, run_full.io, run_full.rounds_run)

    # interrupted after round 2, then resumed to ROUNDS
    run_a, state_dir = _run(spark, tiny, tmp_path_factory.mktemp("part"), 2)
    assert run_a.rounds_run == 2
    run_b, _ = _run(spark, tiny, None, ROUNDS, resume=True, state_dir=state_dir)
    resumed = _final_state(spark, run_b.io, run_b.rounds_run)

    assert resumed == full


def test_same_seed_runs_identical(spark, tiny, tmp_path_factory):
    run1, _ = _run(spark, tiny, tmp_path_factory.mktemp("r1"), 3)
    run2, _ = _run(spark, tiny, tmp_path_factory.mktemp("r2"), 3)
    assert _final_state(spark, run1.io, 3) == _final_state(spark, run2.io, 3)


def test_uncommitted_round_is_invisible(spark, tiny, tmp_path_factory):
    """Writing data without the manifest must be invisible to readers — the
    crash-mid-write contract of the commit protocol."""
    from spacetime_crawler_spark.sources.io_tables import ParquetManifestIO

    run1, state_dir = _run(spark, tiny, tmp_path_factory.mktemp("c"), 2)
    io = ParquetManifestIO(state_dir)
    last = io.last_committed_round("frontier")
    # simulate a crash: write round last+1 data but never commit
    df = io.read(spark, "frontier", last)
    io.write("frontier", last + 1, df)
    assert io.last_committed_round("frontier") == last
    with pytest.raises(FileNotFoundError):
        io.read(spark, "frontier", last + 1)
