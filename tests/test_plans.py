"""Physical-plan assertions (SURVEY.md §4): predicate pushdown, column
pruning, broadcast joins, and partial aggregation must actually appear in
the plans — 100 TB behavior is decided here, not at the API surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from spacetime_crawler_spark.plans import analytics

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_f1_filter_pushed_to_scan(spark):
    plan = _plan(analytics.f1_urlfilter_is_valid(spark, SF))
    assert "PushedFilters" in plan
    # the isin(lang) predicate is parquet-pushable
    assert "lang" in plan.split("PushedFilters")[1][:400]


def test_a1_column_pruned_scan(spark):
    plan = _plan(analytics.a1_unique_pages(spark, SF))
    # scanning documents for COUNT(DISTINCT source): only `source` is read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "source" in read_schema
    for col in ("text", "lang", "n_chars", "doc_id"):
        assert col not in read_schema, read_schema


def test_a6_broadcasts_customer(spark):
    plan = _plan(analytics.a6_host_link_graph(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_a4_partial_and_final_aggregate(spark):
    plan = _plan(analytics.a4_common_words(spark, SF))
    # Spark splits groupBy-count into partial + final HashAggregate
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan  # orderBy().limit(50) → top-k


def test_f3_anti_join_shape(spark):
    plan = _plan(analytics.f3_urlseen_dedup(spark, SF))
    assert "LeftAnti" in plan


def test_whole_stage_codegen_everywhere_jvm(spark):
    """Native-expression queries must stay inside whole-stage codegen (no
    Python evaluation nodes)."""
    for fn in (analytics.a2_subdomain_histogram, analytics.g_json_extract,
               analytics.g_window_running):
        plan = _plan(fn(spark, SF))
        # vectorized parquet reader engaged, and NO Python eval nodes — the
        # whole query runs JVM-side (AQE hides codegen ids pre-execution)
        assert "Batched: true" in plan, plan[:800]
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_crawl_fetch_join_broadcasts_and_never_shuffles_html(spark):
    """The fetch path must broadcast the selected/winner sides and keep the
    fat html column OUT of every exchange; the robots gate must broadcast
    the rules side."""
    from spacetime_crawler_spark.operators.politeness import (
        build_robots_rules,
        robots_gate,
    )
    from spacetime_crawler_spark.plans.crawl import (
        _with_keys,
        fetch_join_round,
        prepare_page_keys,
    )
    from spacetime_crawler_spark.sources import synth

    pages = synth.generate_pages_df(spark, synth.world("tiny", n_pages=200))
    keys = prepare_page_keys(spark, pages)
    selected = (
        _with_keys(pages.select(F.col("url").alias("url_norm")).limit(50))
        .withColumn("host", F.lower(F.parse_url("url_norm", F.lit("HOST"))))
        .withColumn("depth", F.lit(0))
        .withColumn("fetch_seq", F.lit(1))
        .withColumn("due_s", F.lit(0.5))
        .withColumn("crawl_delay", F.lit(0.5))
    )
    plan = _plan(fetch_join_round(spark, pages, keys, selected))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # html may appear in scans/projections but never inside a shuffle key
    import re

    for m in re.finditer(r"Arguments: hashpartitioning\(([^)]*)\)", plan):
        assert "html" not in m.group(1), m.group(0)
    gated = robots_gate(selected.drop("fetch_seq", "due_s", "crawl_delay"),
                        build_robots_rules(pages))
    assert "BroadcastExchange" in _plan(gated)

    # adaptive fallback (selected set past broadcast size): shuffled hash
    # joins on narrow keys — no broadcast of the selected/winner sides, and
    # html still never appears in any hashpartitioning clause
    import re

    shuffle_plan = _plan(
        fetch_join_round(spark, pages, keys, selected, broadcast_selected=False)
    )
    assert "ShuffledHashJoin" in shuffle_plan, shuffle_plan[:2000]
    assert "BroadcastHashJoin" not in shuffle_plan
    parts = re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", shuffle_plan)
    assert parts, "expected shuffle exchanges in the fallback plan"
    for clause in parts:
        assert "html" not in clause, clause


def test_graph_pagerank_matches_pure_python(spark):
    """The testdata PageRank (nation trade graph) must equal a pure-Python
    PageRank over the SAME edge set and conserve rank mass — the driver row
    for graph_pagerank is rows-only, so this pins its values."""
    from spacetime_crawler_spark.plans import analytics
    from spacetime_crawler_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r.node: r.rank for r in analytics.graph_pagerank(spark, sf).collect()}

    # rebuild the edge list independently with plain SQL-ish collects
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, sf, "customer").collect()}
    supp = {r.s_suppkey: r.s_nationkey
            for r in load_table(spark, sf, "supplier").collect()}
    nname = {r.n_nationkey: r.n_name
             for r in load_table(spark, sf, "nation").collect()}
    ocust = {r.o_orderkey: r.o_custkey
             for r in load_table(spark, sf, "orders").collect()}
    edges = set()
    for r in load_table(spark, sf, "lineitem").select(
            "l_orderkey", "l_suppkey").collect():
        s = nname[cust[ocust[r.l_orderkey]]]
        t = nname[supp[r.l_suppkey]]
        if s != t:
            edges.add((s, t))
    nodes = sorted(nname.values())
    n, d = len(nodes), 0.85
    out: dict = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    rank = {h: 1.0 / n for h in nodes}
    for _ in range(10):
        dangling = sum(rank[h] for h in nodes if h not in out)
        contrib = {h: 0.0 for h in nodes}
        for s, ts in out.items():
            share = rank[s] / len(ts)
            for t in ts:
                contrib[t] += share
        base = (1 - d) / n + d * dangling / n
        rank = {h: base + d * contrib[h] for h in nodes}

    assert set(got) == set(nodes)
    assert abs(sum(got.values()) - 1.0) < 1e-6  # mass conserved
    for h in nodes:
        assert abs(got[h] - rank[h]) < 1e-6, (h, got[h], rank[h])
    assert edges and len(set(got.values())) > 1
