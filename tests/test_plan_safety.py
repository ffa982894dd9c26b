"""Driver-side safety CI guard: every DataFrame.collect() the crawl engine
executes must come from a PINNED call site with a scale-independent row
bound.  The invariant ("no driver-side materialization over an unbounded
state table") was previously upheld by review only; this test makes any
future collect — or growth of an existing one past its bound — a deliberate,
test-visible change."""

from __future__ import annotations

import os
import traceback

import pytest

try:  # PySpark 4: instances are the classic concrete class, not the facade
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:  # pragma: no cover - PySpark 3.x
    from pyspark.sql import DataFrame

from spacetime_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from spacetime_crawler_spark.sources import synth

N_PARTS = 8

# (file, function) -> max rows a single collect may return.  Bounds are in
# engine parameters, never data size: 1-row stats/limit(1) probes, and the
# bloom sidecar's ≤ n_parts rows.  Adding a site here requires arguing its
# bound in review — that is the point.
ALLOWED_COLLECT_SITES = {
    ("crawl.py", "run_crawl"): 1,                 # flagged-cache stats agg
    ("crawl.py", "_bloom_state_matches"): 1,      # limit(1) geometry probe
    ("bloom.py", "collect_sidecar"): N_PARTS,     # one row per part_id
    ("io_tables.py", "_commit_map"): 64,          # ledger: O(rounds·tables)
}


def test_crawl_driver_collects_are_pinned_and_bounded(spark, tmp_path):
    p = synth.world("tiny", n_pages=400)
    pages = synth.generate_pages_df(spark, p).persist()
    seeds = synth.seed_urls(p)

    calls: list[tuple[tuple[str, str] | None, int]] = []
    orig_collect = DataFrame.collect

    def recording(self):
        rows = orig_collect(self)
        site = None
        for fr in reversed(traceback.extract_stack()):
            if "spacetime_crawler_spark" in fr.filename.replace("\\", "/"):
                site = (os.path.basename(fr.filename), fr.name)
                break
        calls.append((site, len(rows)))
        return rows

    def forbidden(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError(
            "toPandas/toLocalIterator must never run inside the crawl engine"
        )

    DataFrame.collect = recording
    orig_topandas = DataFrame.toPandas
    orig_iter = DataFrame.toLocalIterator
    DataFrame.toPandas = forbidden
    DataFrame.toLocalIterator = forbidden
    try:
        cfg = CrawlConfig(
            state_dir=str(tmp_path / "st"), rounds=3, round_budget_s=8.0,
            n_parts=N_PARTS,
        )
        run = run_crawl(spark, pages, seeds, cfg)
        assert run.rounds_run >= 1
        # the resume path exercises the bloom-geometry limit(1) probe
        cfg2 = CrawlConfig(
            state_dir=str(tmp_path / "st"), rounds=4, round_budget_s=8.0,
            n_parts=N_PARTS,
        )
        run_crawl(spark, pages, seeds, cfg2, resume=True)
    finally:
        DataFrame.collect = orig_collect
        DataFrame.toPandas = orig_topandas
        DataFrame.toLocalIterator = orig_iter
    pages.unpersist()

    engine_calls = [(s, n) for s, n in calls if s is not None]
    assert engine_calls, "expected the engine to collect bounded stats"
    seen_sites = set()
    for site, n in engine_calls:
        assert site in ALLOWED_COLLECT_SITES, (
            f"unpinned driver-side collect at {site} — if this collect is "
            "bounded, add it to ALLOWED_COLLECT_SITES with its bound"
        )
        assert n <= ALLOWED_COLLECT_SITES[site], (site, n)
        seen_sites.add(site)
    # the guard must actually exercise the hot sites it exists to pin
    assert ("crawl.py", "run_crawl") in seen_sites
    assert ("bloom.py", "collect_sidecar") in seen_sites
