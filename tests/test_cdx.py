"""CDX index: SURT key vs a pure-Python reimplementation, record
determinism over a real crawl, shard ordering, and lookup semantics with
pushdown plan assertions."""

from __future__ import annotations

from urllib.parse import urlsplit

import pytest

from pyspark.sql import functions as F

from spacetime_crawler_spark.plans import cdx
from spacetime_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from spacetime_crawler_spark.plans import crawl as crawl_mod
from spacetime_crawler_spark.sources import synth

ROUNDS = 2
BUDGET = 8.0


def py_surt(url: str) -> str:
    """Independent SURT per the module spec (stdlib urlsplit, not
    parse_url) — the cross-implementation oracle."""
    u = urlsplit(url)
    host = ",".join(reversed(u.hostname.lower().split(".")))
    q = f"?{u.query}" if u.query else ""
    return f"{host}){u.path}{q}"


SURT_CASES = [
    "http://host0001.example.com/page/7",
    "https://a.b.example.com/x/y?k=1&j=2",
    "http://example.com/",
    "http://sub.examples.com/p",
    "https://deep.multi.part.host.org/a",
]


def test_surt_expr_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in SURT_CASES], ["url"])
    got = {r.url: r.s for r in df.select("url", cdx.surt_expr("url").alias("s")).collect()}
    for u in SURT_CASES:
        assert got[u] == py_surt(u), u


@pytest.fixture(scope="module")
def crawl_cdx(spark, tmp_path_factory):
    p = synth.world("tiny", n_pages=400)
    pages = synth.generate_pages_df(spark, p).persist()
    cfg = CrawlConfig(
        state_dir=str(tmp_path_factory.mktemp("cdx_st")), rounds=ROUNDS,
        round_budget_s=BUDGET,
    )
    run = run_crawl(spark, pages, synth.seed_urls(p), cfg)
    fetch_log = crawl_mod.read_fetch_log(spark, run.io, run.rounds_run).persist()
    path = str(tmp_path_factory.mktemp("cdx_idx") / "cdx")
    cdx.write_cdx_index(cdx.cdx_records(fetch_log), path, n_shards=4)
    rows = cdx.read_cdx(spark, path).collect()
    pages.unpersist()
    return fetch_log, path, rows


def test_cdx_records_complete_and_deterministic(spark, crawl_cdx):
    fetch_log, _path, rows = crawl_cdx
    ok = fetch_log.filter(F.col("status") == 200)
    assert len(rows) == ok.count()
    # surt round-trips the python spec over real crawl urls
    sample = {r.url_norm: r.surt for r in rows[:50]}
    for url, s in sample.items():
        assert s == py_surt(url), url
    # 14-digit virtual-clock ts, later rounds strictly later days
    by_url = {r.url_norm: r for r in rows}
    for r in fetch_log.select("url_norm", "round", "text_sha256").collect():
        rec = by_url.get(r.url_norm)
        if rec is None:
            continue
        assert len(rec.ts) == 14 and rec.ts.isdigit()
        assert rec.ts.startswith(("2024", "2025"))
        assert rec.digest == r.text_sha256
    # rebuilding yields the identical record set
    again = {
        (r.surt, r.ts, r.url_norm, r.digest)
        for r in cdx.cdx_records(fetch_log).collect()
    }
    assert again == {(r.surt, r.ts, r.url_norm, r.digest) for r in rows}


def test_cdx_shards_are_globally_ordered(spark, crawl_cdx):
    _fetch_log, path, _rows = crawl_cdx
    per_file = (
        cdx.read_cdx(spark, path)
        .select("surt", "ts", F.input_file_name().alias("f"))
        .collect()
    )
    files: dict[str, list[tuple[str, str]]] = {}
    for r in per_file:
        files.setdefault(r.f, []).append((r.surt, r.ts))
    # within-file sorted…
    for keys in files.values():
        assert keys == sorted(keys)
    # …and file key-ranges disjoint → the whole index is one total order
    spans = sorted((min(k), max(k)) for k in files.values() if k)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_cdx_lookup_semantics_and_pushdown(spark, crawl_cdx):
    _fetch_log, path, rows = crawl_cdx
    all_surts = [r.surt for r in rows]
    target = rows[len(rows) // 2]
    host = target.url_norm.split("/")[2]

    exact = cdx.cdx_lookup(spark, path, target.url_norm, "exact").collect()
    assert [r.surt for r in exact] == [s for s in sorted(all_surts) if s == target.surt]

    got_host = cdx.cdx_lookup(spark, path, f"http://{host}/", "host").collect()
    want_host = sorted(s for s in all_surts if s.split(")", 1)[0] == py_surt(f"http://{host}/").split(")", 1)[0])
    assert sorted(r.surt for r in got_host) == want_host
    assert len(got_host) > 0

    # domain match over the registrable domain catches every subdomain…
    got_dom = cdx.cdx_lookup(spark, path, "http://example.com/", "domain")
    assert got_dom.count() == len(all_surts)
    # …while a lexically-adjacent host is NOT swallowed (separator guard)
    assert cdx.cdx_lookup(spark, path, "http://example.co/", "domain").count() == 0

    # the prefix predicate reaches the parquet scan
    plan = got_dom._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "StartsWith" in plan, plan


def test_cdx_lookup_rejects_unknown_match_type(spark, crawl_cdx):
    _fetch_log, path, _rows = crawl_cdx
    with pytest.raises(ValueError):
        cdx.cdx_lookup(spark, path, "http://example.com/", "regex")
