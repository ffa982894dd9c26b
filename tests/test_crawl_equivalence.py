"""Differential test (SURVEY.md §5.3): the Spark engine vs the single-node
reference oracle on the tiny synthetic world — identical URL-seen set,
identical (round, host, fetch_seq, url) crawl ordering, byte-identical
extracted text per url (sha256), same report analytics inputs."""

from __future__ import annotations

import hashlib

import pytest

from spacetime_crawler_spark.plans import crawl as crawl_mod
from spacetime_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from spacetime_crawler_spark.sources import synth
from tests import reference_impl

ROUNDS = 4
BUDGET = 10.0  # small budget → quotas bind → politeness path is exercised


@pytest.fixture(scope="module")
def tiny_world():
    p = synth.world("tiny", n_pages=800)
    synth.sanity_check_world(p, sample=60)
    return p


@pytest.fixture(scope="module")
def oracle_result(tiny_world):
    rows = synth.driver_side_pages(tiny_world)
    seeds = synth.seed_urls(tiny_world)
    return reference_impl.crawl(rows, seeds, rounds=ROUNDS, round_budget_s=BUDGET)


@pytest.fixture(scope="module")
def engine_result(spark, tiny_world, tmp_path_factory):
    state_dir = str(tmp_path_factory.mktemp("crawl_state"))
    pages = synth.generate_pages_df(spark, tiny_world)
    seeds = synth.seed_urls(tiny_world)
    cfg = CrawlConfig(state_dir=state_dir, rounds=ROUNDS, round_budget_s=BUDGET)
    run = run_crawl(spark, pages, seeds, cfg)
    fetch_log = crawl_mod.read_fetch_log(spark, run.io, run.rounds_run).collect()
    seen = crawl_mod.read_seen(spark, run.io).collect()
    return run, fetch_log, seen


def test_crawl_made_progress(oracle_result, engine_result):
    _, fetch_log, seen = engine_result
    assert len(fetch_log) > 50
    assert len(seen) > len(fetch_log) // 2
    assert len(oracle_result.fetch_log) > 50


def test_seen_set_identical(oracle_result, engine_result):
    _, _, seen = engine_result
    engine_seen = {r.url_norm: r.round_seen for r in seen}
    assert set(engine_seen) == set(oracle_result.seen)
    # first-seen round must match too (admission-at-discovery semantics)
    mismatched = {
        u: (engine_seen[u], oracle_result.seen[u])
        for u in engine_seen
        if engine_seen[u] != oracle_result.seen[u]
    }
    assert not mismatched, dict(list(mismatched.items())[:5])


def test_crawl_ordering_identical(oracle_result, engine_result):
    _, fetch_log, _ = engine_result
    engine_order = sorted(
        (r.round, r.host, r.fetch_seq, r.url_norm) for r in fetch_log
    )
    assert engine_order == oracle_result.ordering_key()


def test_text_byte_identical(oracle_result, engine_result, tiny_world):
    """Engine F9 output (sha256 in fetch_log) ≡ oracle extract_text ≡ the
    generator's pages.text — the BASELINE.json byte-identity invariant."""
    _, fetch_log, _ = engine_result
    oracle_sha = {
        r.url_norm: r.text_sha256 for r in oracle_result.fetch_log if r.status == 200
    }
    engine_sha = {r.url_norm: r.text_sha256 for r in fetch_log if r.status == 200}
    assert engine_sha == oracle_sha
    # and both equal sha256(pages.text) for a sample
    pages = reference_impl.PagesWorld(synth.driver_side_pages(tiny_world))
    for url in list(engine_sha)[:25]:
        stored = pages.fetch(url)["text"]
        assert engine_sha[url] == hashlib.sha256(stored.encode()).hexdigest()


def test_statuses_and_depth_match(oracle_result, engine_result):
    _, fetch_log, _ = engine_result
    engine = {r.url_norm: (r.status, r.depth) for r in fetch_log}
    oracle = {r.url_norm: (r.status, r.depth) for r in oracle_result.fetch_log}
    assert engine == oracle


def test_candidates_metric_matches_oracle(tiny_world, oracle_result, engine_result):
    """RoundMetrics.candidates (per-round distinct valid links after the
    min-depth collapse, BEFORE the seen check) must match a recount from
    the oracle's fetch log — this metric feeds bench throughput, and a
    round-3 regression showed interior-branch observed metrics can silently
    undercount it (crawl.py's Observation-placement note)."""
    from spacetime_crawler_spark.functions.textextract import extract_links
    from spacetime_crawler_spark.functions.urlnorm import is_valid

    run, _, _ = engine_result
    rows = {r["url"]: r for r in synth.driver_side_pages(tiny_world)}
    by_canon = {}
    for r in rows.values():
        from spacetime_crawler_spark.functions.urlnorm import canonicalize_url
        by_canon.setdefault(canonicalize_url(r["url"]), []).append(r)
    per_round: dict[int, set] = {}
    for rec in oracle_result.fetch_log:
        if rec.status != 200:
            continue
        # latest capture wins; ties break to the lexicographically-first url
        # (same as the engine's desc(warc_ts), asc(url) window)
        caps = sorted(by_canon[rec.url_norm], key=lambda r: r["url"])
        caps = sorted(caps, key=lambda r: r["warc_ts"], reverse=True)
        links = [
            u for u in extract_links(caps[0]["html"], rec.url_norm) if is_valid(u)
        ]
        per_round.setdefault(rec.round, set()).update(links)
    want = [len(per_round.get(m.round, set())) for m in run.metrics]
    got = [m.candidates for m in run.metrics]
    assert got == want, (got, want)
