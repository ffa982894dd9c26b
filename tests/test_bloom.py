"""Bloom sidecar properties (SURVEY.md §5.2): ZERO false negatives (the
correctness-critical property — positives fall through to the exact
anti-join), plausible FPR, and engine-level dedup equivalence with and
without the bloom path."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spacetime_crawler_spark.operators.bloom import _build_bitmap, _positions


def _test_membership(h1, h2, nbits, k, bits_bytes):
    bits = np.frombuffer(bits_bytes, dtype=np.uint8)
    pos = _positions(np.asarray(h1), np.asarray(h2), k, nbits)
    return ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**63), 2**63 - 1),
            st.integers(-(2**31), 2**31 - 1),
        ),
        min_size=1,
        max_size=500,
        unique=True,
    )
)
def test_no_false_negatives(keys):
    h1 = np.array([k[0] for k in keys], dtype=np.int64)
    h2 = np.array([k[1] for k in keys], dtype=np.int64)
    nbits, k, bits = _build_bitmap(h1, h2, fpr=0.01)
    assert _test_membership(h1, h2, nbits, k, bits).all()


def test_fpr_in_range():
    rng = np.random.RandomState(7)
    n = 20_000
    h1 = rng.randint(-(2**63), 2**63 - 1, size=n, dtype=np.int64)
    h2 = rng.randint(-(2**31), 2**31 - 1, size=n, dtype=np.int64)
    nbits, k, bits = _build_bitmap(h1[: n // 2], h2[: n // 2], fpr=0.01)
    hits = _test_membership(h1[n // 2 :], h2[n // 2 :], nbits, k, bits)
    fpr = hits.mean()
    assert fpr < 0.03, fpr


def test_engine_dedup_same_with_and_without_bloom(spark, tmp_path_factory):
    """use_bloom is purely an optimization: final seen/fetch_log identical."""
    from spacetime_crawler_spark.plans import crawl as crawl_mod
    from spacetime_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from spacetime_crawler_spark.sources import synth

    p = synth.world("tiny", n_pages=400)
    pages = synth.generate_pages_df(spark, p).persist()
    seeds = synth.seed_urls(p)

    states = []
    for use_bloom in (True, False):
        d = str(tmp_path_factory.mktemp(f"bloom_{use_bloom}"))
        cfg = CrawlConfig(state_dir=d, rounds=3, round_budget_s=8.0,
                          use_bloom=use_bloom)
        run = run_crawl(spark, pages, seeds, cfg)
        seen = sorted(
            (r.url_norm, r.round_seen)
            for r in crawl_mod.read_seen(spark, run.io).collect()
        )
        log = sorted(
            (r.round, r.host, r.fetch_seq, r.url_norm)
            for r in crawl_mod.read_fetch_log(spark, run.io, run.rounds_run).collect()
        )
        states.append((seen, log))
        bloom_skips = sum(m.bloom_skipped for m in run.metrics)
        if use_bloom:
            assert bloom_skips > 0  # the prefilter actually fired
    assert states[0] == states[1]
