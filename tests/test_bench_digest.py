"""bench.py's identical-output gate: the Spark-side state digest must be
exactly as discriminating as the old full-collect tuple comparison —
order-insensitive, value-sensitive, cardinality-sensitive — while never
moving more than three scalars to the driver."""

from __future__ import annotations

from bench import state_digest

COLS = ["url_norm", "round_seen"]
SCHEMA = "url_norm string, round_seen int"


def test_digest_is_order_insensitive(spark):
    rows = [("a", 1), ("b", 2), ("c", 3)]
    d1 = state_digest(spark.createDataFrame(rows, SCHEMA), COLS)
    d2 = state_digest(spark.createDataFrame(list(reversed(rows)), SCHEMA), COLS)
    assert d1 == d2


def test_digest_detects_value_change(spark):
    base = [("a", 1), ("b", 2), ("c", 3)]
    d1 = state_digest(spark.createDataFrame(base, SCHEMA), COLS)
    d2 = state_digest(
        spark.createDataFrame([("a", 1), ("b", 2), ("c", 4)], SCHEMA), COLS
    )
    d3 = state_digest(
        spark.createDataFrame([("a", 1), ("b", 2), ("d", 3)], SCHEMA), COLS
    )
    assert d1 != d2 and d1 != d3


def test_digest_detects_duplicates_and_cardinality(spark):
    """XOR alone cancels duplicated pairs — the count and sum accumulators
    must catch what xor cannot."""
    base = [("a", 1), ("b", 2)]
    dup = [("a", 1), ("a", 1), ("b", 2)]
    d1 = state_digest(spark.createDataFrame(base, SCHEMA), COLS)
    d2 = state_digest(spark.createDataFrame(dup, SCHEMA), COLS)
    assert d1 != d2
    # empty table digests deterministically and unequal to non-empty
    empty = state_digest(
        spark.createDataFrame([], SCHEMA), COLS
    )
    assert empty[0] == 0 and empty != d1


def test_digest_equals_tuple_equality_on_crawl_state(spark, tmp_path):
    """On a real (small) crawl: two identical runs digest-equal; a run with
    different state digests differently — digest equality ≡ the old sorted
    tuple-collect equality on the same tables."""
    from spacetime_crawler_spark.plans import crawl as crawl_mod
    from spacetime_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from spacetime_crawler_spark.sources import synth

    p = synth.world("tiny", n_pages=300)
    pages = synth.generate_pages_df(spark, p).persist()
    seeds = synth.seed_urls(p)

    def run(name, rounds):
        cfg = CrawlConfig(
            state_dir=str(tmp_path / name), rounds=rounds, round_budget_s=6.0
        )
        r = run_crawl(spark, pages, seeds, cfg)
        seen = crawl_mod.read_seen(spark, r.io)
        log = crawl_mod.read_fetch_log(spark, r.io, r.rounds_run)
        tuples = (
            sorted((x.url_norm, x.round_seen) for x in seen.collect()),
            sorted(
                (x.round, x.host, x.fetch_seq, x.url_norm, x.text_sha256)
                for x in log.collect()
            ),
        )
        digests = (
            state_digest(seen, ["url_norm", "round_seen"]),
            state_digest(
                log, ["round", "host", "fetch_seq", "url_norm", "text_sha256"]
            ),
        )
        return tuples, digests

    t1, d1 = run("r1", rounds=2)
    t2, d2 = run("r2", rounds=2)
    t3, d3 = run("r3", rounds=1)  # genuinely different state
    assert t1 == t2 and d1 == d2
    assert t1 != t3 and d1 != d3
    pages.unpersist()


def test_world_cache_eviction_is_lock_guarded(tmp_path, monkeypatch):
    """ensure_world's cache discipline (round-3 advice): stale worlds in
    cache_root are evicted only when no live reader holds their lock, the
    current world is never swept, and eviction never reaches outside
    cache_root."""
    import fcntl
    import os

    import bench

    root = tmp_path / "cache"
    root.mkdir()

    def mkworld(name):
        d = root / name
        d.mkdir()
        (d / "_SUCCESS").touch()
        return d

    keep = mkworld("scs_bench_world_100_aaaa")
    stale_free = mkworld("scs_bench_world_100_bbbb")
    stale_held = mkworld("scs_bench_world_200_cccc")
    outside = tmp_path / "scs_bench_world_300_dddd"  # NOT in cache_root
    outside.mkdir()

    # a concurrent reader holds a shared lock on stale_held
    held_f = open(str(stale_held) + ".lock", "a")
    fcntl.flock(held_f, fcntl.LOCK_SH)

    bench._evict_stale_worlds(str(root), keep.name)

    assert keep.exists()                      # current world untouched
    assert not stale_free.exists()            # unguarded stale → evicted
    assert stale_held.exists()                # live reader → skipped
    assert outside.exists()                   # sweep scoped to cache_root
    held_f.close()

    # once the reader releases, the same sweep reclaims it
    bench._evict_stale_worlds(str(root), keep.name)
    assert not stale_held.exists()

    # reader-lock acquisition is shared: two holders coexist
    bench._hold_reader_lock(str(keep) + ".lock")
    bench._hold_reader_lock(str(keep) + ".lock")
    assert len(bench._READER_LOCKS) >= 2
    for f in bench._READER_LOCKS:
        f.close()
    bench._READER_LOCKS.clear()
