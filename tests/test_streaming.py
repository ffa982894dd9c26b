"""Structured-Streaming operators: exact stateful dedup and watermarked
windowed metrics — run offline with file sources + availableNow triggers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spacetime_crawler_spark.streaming import frontier_stream as fs


def _run_to_memory(stream_df, spark, name: str, mode: str = "append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_dedup_exact(spark, tmp_path):
    src = str(tmp_path / "cands")
    os.makedirs(src)
    urls_a = [(f"http://h{i % 7}.com/p/{i}",) for i in range(200)]
    urls_b = [(f"http://h{i % 7}.com/p/{i}",) for i in range(100, 300)]  # 100 dups
    spark.createDataFrame(urls_a, "url_norm string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(urls_b, "url_norm string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = fs.candidate_stream_from_dir(spark, src, n_parts=8)
    out = _run_to_memory(
        fs.streaming_urlseen_dedup(stream), spark, "dedup_out"
    ).collect()
    got = [r.url_norm for r in out]
    assert len(got) == len(set(got)) == 300  # exact dedup, no losses


def test_streaming_dedup_survives_hash_collision():
    """Two DISTINCT urls with the SAME url_hash must both be emitted — state
    keys on url_norm, so a 64-bit hash collision can never drop a URL (the
    batch anti-join on (url_hash, url_norm) has the same guarantee)."""
    import pandas as pd

    class FakeState:
        exists = False

        def update(self, v):
            self.exists, self.get = True, v

    pdf = pd.DataFrame({
        "url_norm": ["http://a.com/x", "http://b.com/y", "http://a.com/x"],
        "url_hash": [42, 42, 42],  # forced collision + one true dup
        "bucket": [0, 0, 0],
    })
    out = pd.concat(list(fs._dedup_fn((0,), iter([pdf]), FakeState())))
    assert sorted(out["url_norm"]) == ["http://a.com/x", "http://b.com/y"]


def test_streaming_dedup_state_survives_batches(spark, tmp_path):
    """Same URL in two separate micro-batch files → emitted once (GroupState
    persistence across triggers)."""
    src = str(tmp_path / "cands2")
    chk = str(tmp_path / "chk2")
    os.makedirs(src)
    spark.createDataFrame([("http://a.com/1",)], "url_norm string").coalesce(
        1
    ).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "out2")

    def run_once():
        # file sink (memory sink cannot recover from a checkpoint)
        q = (
            fs.streaming_urlseen_dedup(
                fs.candidate_stream_from_dir(spark, src, n_parts=4)
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # second run, SAME checkpoint: a duplicate + one new url
    spark.createDataFrame(
        [("http://a.com/1",), ("http://a.com/2",)], "url_norm string"
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    out = sorted(r.url_norm for r in spark.read.parquet(out_dir).collect())
    assert out == ["http://a.com/1", "http://a.com/2"]


def test_streaming_fetch_metrics_window(spark, tmp_path):
    src = str(tmp_path / "flog")
    os.makedirs(src)
    rows = [
        (1, 0, "h1.com", f"http://h1.com/{i}", i, 0, i + 1, float(i), 200, "x", 10)
        for i in range(5)
    ] + [
        (2, 0, "h2.com", f"http://h2.com/{i}", i, 1, i + 1, float(i), 404, None, 0)
        for i in range(3)
    ]
    spark.createDataFrame(rows, fs.FETCH_LOG_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # complete mode: append would hold rows until the watermark closes the
    # last window, which an availableNow run never reaches
    out = _run_to_memory(
        fs.streaming_fetch_metrics(spark, src), spark, "metrics_out", mode="complete"
    ).collect()
    by_host = {r.host: (r.n_fetches, r.n_ok) for r in out}
    assert by_host == {"h1.com": (5, 5), "h2.com": (3, 0)}


def test_streaming_politeness_matches_batch_scheduler(spark, tmp_path):
    """The continuous scheduler must emit, round for round, EXACTLY what the
    batch schedule_round + leftover carry emits over the same per-round
    candidate arrivals: same urls, same fetch_seq order, same virtual due
    times, same quota discipline (incl. a host whose quota is 0)."""
    import time

    from spacetime_crawler_spark.operators.politeness import (
        leftover_after_schedule,
        schedule_round,
    )

    BUDGET = 4.0
    DELAYS = {"h1.com": 1.0, "h2.com": 2.0, "h3.com": 5.0}  # quotas 4/2/0
    ROUNDS = 3

    def new_rows(rnd):
        rows = []
        for i in range(6):
            rows.append(("h1.com", f"http://h1.com/r{rnd}/p{i}", 1.0))
        for i in range(3):
            rows.append(("h2.com", f"http://h2.com/r{rnd}/p{i}", 2.0))
        rows.append(("h3.com", f"http://h3.com/r{rnd}/p0", 5.0))
        return [
            (h, u, rnd % 2, d) for (h, u, d), rnd in
            ((r, rnd) for r in rows)
        ]

    def as_df(rows):
        return spark.createDataFrame(
            rows, "host string, url_norm string, depth int, crawl_delay double"
        ).withColumn("url_hash", F.xxhash64("url_norm")).withColumn(
            "h2", F.hash("url_norm")
        )

    # --- batch reference: schedule_round + leftover carry, min-depth merge
    delays_df = spark.createDataFrame(
        list(DELAYS.items()), "host string, crawl_delay double"
    )
    batch_by_round = {}
    frontier = as_df(new_rows(1))
    for rnd in range(1, ROUNDS + 1):
        selected = schedule_round(frontier, BUDGET).persist()
        batch_by_round[rnd] = sorted(
            (r.host, r.url_norm, r.fetch_seq, r.due_s)
            for r in selected.collect()
        )
        leftover = leftover_after_schedule(frontier, selected)
        if rnd < ROUNDS:
            nxt = as_df(new_rows(rnd + 1)).select(
                "url_norm", "url_hash", "h2", "host", "depth"
            )
            frontier = (
                leftover.unionByName(nxt)
                .groupBy("url_norm", "url_hash", "h2", "host")
                .agg(F.min("depth").alias("depth"))
                .join(delays_df, "host")
            )

    # --- streaming: one file per round, one micro-batch per file
    src = str(tmp_path / "sched_src")
    os.makedirs(src)
    for rnd in range(1, ROUNDS + 1):
        as_df(new_rows(rnd)).select(
            "host", "url_norm", "url_hash", "depth", "crawl_delay"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # distinct mtimes → deterministic trigger order

    stream = (
        spark.readStream.schema(fs.SCHED_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = _run_to_memory(
        fs.streaming_politeness_schedule(stream, BUDGET), spark, "sched_out"
    ).collect()
    stream_by_round = {}
    for r in out:
        stream_by_round.setdefault(r.sched_round, []).append(
            (r.host, r.url_norm, r.fetch_seq, r.due_s)
        )
    assert set(stream_by_round) == set(batch_by_round)
    for rnd in batch_by_round:
        assert sorted(stream_by_round[rnd]) == batch_by_round[rnd], rnd
    # quota-0 host must never be scheduled by either path
    assert not any(h == "h3.com" for h, *_ in
                   [t for ts in stream_by_round.values() for t in ts])


def test_sched_kernel_zero_delay_drops_host_and_never_rearms():
    """crawl_delay <= 0 (or quota 0) must match the batch path — host
    silently dropped, no ZeroDivisionError — and must NOT re-arm the
    politeness timer: an unschedulable host can never emit, so a re-armed
    timer would re-invoke it every crawl_delay forever (state-store churn
    with zero progress)."""
    import pandas as pd

    from spacetime_crawler_spark.streaming import frontier_stream as fs

    class FakeState:
        exists = False

        def __init__(self):
            self.timeouts = []
            self.stored = None

        def update(self, v):
            self.stored = v

        def setTimeoutDuration(self, ms):
            self.timeouts.append(ms)

    def batch_of(delay):
        return iter([pd.DataFrame({
            "host": ["h.com"] * 2,
            "url_norm": ["http://h.com/a", "http://h.com/b"],
            "url_hash": [1, 2],
            "depth": [0, 1],
            "crawl_delay": [delay, delay],
        })])

    for delay in (0.0, -1.0):
        st = FakeState()
        fn = fs._make_sched_fn(4.0, use_timeout=True)
        out = list(fn(("h.com",), batch_of(delay), st))
        assert out == []          # dropped, like the batch NULL-quota path
        assert st.timeouts == []  # quota-0 host must not churn the timer
        assert len(st.stored[2]) == 2  # backlog retained in state

    # quota 0 from a POSITIVE delay (delay > budget) — same contract
    st = FakeState()
    fn = fs._make_sched_fn(4.0, use_timeout=True)
    out = list(fn(("h.com",), batch_of(9.0), st))
    assert out == [] and st.timeouts == []

    # sanity: a schedulable host DOES emit and re-arms while backlogged
    st = FakeState()
    fn = fs._make_sched_fn(4.0, use_timeout=True)
    out = list(fn(("h.com",), batch_of(4.0), st))
    assert len(out) == 1 and len(out[0]) == 1  # quota 1 → one emission
    assert st.timeouts == [4000]               # backlog of 1 → re-armed


def test_streaming_chain_dedup_then_schedule(spark, tmp_path):
    """The chained frontier topology: candidate stream →
    streaming_urlseen_dedup → streaming_politeness_schedule, joined through
    a durable intermediate directory (the Kafka-topic shape of a production
    deployment — Spark cannot run two arbitrary-stateful operators in one
    query).  The chain must equal the batch pipeline — first-seen
    admission, then schedule_round + leftover carry — round for round:
    duplicates re-announced in later rounds must never reach the
    scheduler, and the surviving rows must schedule with identical
    (host, url, fetch_seq, due_s)."""
    import time

    from spacetime_crawler_spark.operators.politeness import (
        leftover_after_schedule,
        schedule_round,
    )

    BUDGET = 4.0
    DELAYS = {"h1.com": 1.0, "h2.com": 2.0}  # quotas 4 and 2
    ROUNDS = 3
    COLS = (
        "url_norm string, url_hash bigint, bucket int, host string,"
        " depth int, crawl_delay double"
    )

    def new_rows(rnd):
        rows = []
        for i in range(5):  # 5 fresh > quota 4 → backlog carry on h1
            rows.append(("h1.com", f"http://h1.com/r{rnd}/p{i}", rnd % 3, 1.0))
        for i in range(3):  # 3 fresh > quota 2 → carry on h2
            rows.append(("h2.com", f"http://h2.com/r{rnd}/p{i}", 1, 2.0))
        if rnd > 1:  # re-announcements the dedup stage must swallow
            rows.append(("h1.com", "http://h1.com/r1/p0", 0, 1.0))
            rows.append(("h2.com", "http://h2.com/r1/p0", 0, 2.0))
        return rows

    def as_df(rows):
        return (
            spark.createDataFrame(
                rows, "host string, url_norm string, depth int,"
                      " crawl_delay double"
            )
            .withColumn("url_hash", F.xxhash64("url_norm"))
            .withColumn("bucket", F.pmod("url_hash", F.lit(8)).cast("int"))
            .select("url_norm", "url_hash", "bucket", "host", "depth",
                    "crawl_delay")
        )

    # --- batch reference: python-set first-seen admission (the dedup
    # contract), then the batch scheduler with leftover carry
    delays_df = spark.createDataFrame(
        list(DELAYS.items()), "host string, crawl_delay double"
    )
    seen: set[str] = set()
    batch_by_round = {}
    leftover = None
    for rnd in range(1, ROUNDS + 1):
        fresh = [r for r in new_rows(rnd) if r[1] not in seen]
        seen.update(r[1] for r in fresh)
        nxt = as_df(fresh).withColumn("h2", F.hash("url_norm")).select(
            "url_norm", "url_hash", "h2", "host", "depth"
        )
        pool = nxt if leftover is None else leftover.unionByName(nxt)
        frontier = (
            pool.groupBy("url_norm", "url_hash", "h2", "host")
            .agg(F.min("depth").alias("depth"))
            .join(delays_df, "host")
        )
        selected = schedule_round(frontier, BUDGET).persist()
        batch_by_round[rnd] = sorted(
            (r.host, r.url_norm, r.fetch_seq, r.due_s)
            for r in selected.collect()
        )
        leftover = leftover_after_schedule(frontier, selected)

    # --- streaming chain
    src = str(tmp_path / "chain_src")
    inter = str(tmp_path / "chain_inter")
    ckpt1 = str(tmp_path / "chain_ckpt1")
    os.makedirs(src)
    os.makedirs(inter)
    for rnd in range(1, ROUNDS + 1):
        as_df(new_rows(rnd)).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # distinct mtimes → deterministic trigger order

    stage1 = fs.streaming_urlseen_dedup(
        spark.readStream.schema(COLS).option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(df, _bid):
        if df.count():
            df.coalesce(1).write.mode("append").parquet(inter)
            time.sleep(1.05)  # stage-2 trigger order again

    q1 = (
        stage1.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt1)
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)

    stage2 = fs.streaming_politeness_schedule(
        spark.readStream.schema(COLS).option("maxFilesPerTrigger", 1)
        .parquet(inter)
        .select("host", "url_norm", "url_hash", "depth", "crawl_delay"),
        BUDGET,
    )
    out = _run_to_memory(stage2, spark, "chain_out").collect()
    stream_by_round = {}
    for r in out:
        stream_by_round.setdefault(r.sched_round, []).append(
            (r.host, r.url_norm, r.fetch_seq, r.due_s)
        )
    assert set(stream_by_round) == set(batch_by_round)
    for rnd in batch_by_round:
        assert sorted(stream_by_round[rnd]) == batch_by_round[rnd], rnd
    # the re-announced duplicates were admitted exactly once: they were
    # scheduled in round 1 and never re-emitted later
    all_sched = [t for ts in stream_by_round.values() for t in ts]
    assert len([t for t in all_sched
                if t[1] == "http://h1.com/r1/p0"]) == 1


def test_sched_kernel_evicts_drained_host_state():
    """A host whose backlog fully drains must leave NO state row behind —
    the state store is O(backlogged hosts), not O(all-hosts-ever).  A host
    that drains on its very first invocation never creates state at all."""
    import pandas as pd

    from spacetime_crawler_spark.streaming import frontier_stream as fs

    class FakeState:
        def __init__(self, existing=None):
            self.exists = existing is not None
            self._val = existing
            self.stored = None
            self.removed = False

        @property
        def get(self):
            return self._val

        def update(self, v):
            self.stored = v

        def remove(self):
            self.removed = True

        def setTimeoutDuration(self, ms):
            pass

    def batch(urls, delay=1.0):
        return iter([pd.DataFrame({
            "host": ["h.com"] * len(urls),
            "url_norm": urls,
            "url_hash": list(range(len(urls))),
            "depth": [0] * len(urls),
            "crawl_delay": [delay] * len(urls),
        })])

    fn = fs._make_sched_fn(4.0, use_timeout=True)

    # first invocation, quota 4 ≥ 2 urls → drains; no state ever written
    st = FakeState()
    out = list(fn(("h.com",), batch(["http://h.com/a", "http://h.com/b"]), st))
    assert len(out) == 1 and len(out[0]) == 2
    assert st.stored is None and st.removed is False

    # existing backlog of 1, no new input beyond it → drains → removed
    st = FakeState(existing=(3, 1.0, ["http://h.com/z"], [9], [0]))
    out = list(fn(("h.com",), iter([]), st))
    assert len(out) == 1 and len(out[0]) == 1
    assert st.removed is True and st.stored is None

    # still-backlogged host keeps state (5 urls > quota 4)
    st = FakeState()
    urls = [f"http://h.com/p{i}" for i in range(5)]
    list(fn(("h.com",), batch(urls), st))
    assert st.stored is not None and len(st.stored[2]) == 1

    # NoTimeout (differential) mode: drained state is KEPT, so sched_round
    # stays a lifetime invocation counter — the batch-equivalence contract
    fn_nt = fs._make_sched_fn(4.0, use_timeout=False)
    st = FakeState(existing=(3, 1.0, ["http://h.com/z"], [9], [0]))
    out = list(fn_nt(("h.com",), iter([]), st))
    assert len(out) == 1 and out[0]["sched_round"].iloc[0] == 4
    assert st.removed is False and st.stored is not None
    assert st.stored[0] == 4 and st.stored[2] == []


def test_streaming_dedup_on_rocksdb_state_store(spark, tmp_path):
    """The stateful operators must run unchanged on the PRODUCTION state
    backend: RocksDB (disk-backed, bounded executor memory — what a
    10^10-URL frontier actually deploys on), not just the default
    HDFS-backed in-memory store.  Same exactness contract as
    test_streaming_dedup_exact."""
    src = str(tmp_path / "cands_rocks")
    os.makedirs(src)
    urls_a = [(f"http://h{i % 5}.com/p/{i}",) for i in range(150)]
    urls_b = [(f"http://h{i % 5}.com/p/{i}",) for i in range(75, 225)]  # 75 dups
    for batch in (urls_a, urls_b):
        spark.createDataFrame(batch, "url_norm string").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = fs.candidate_stream_from_dir(spark, src, n_parts=8)
        out = _run_to_memory(
            fs.streaming_urlseen_dedup(stream), spark, "rocks_out"
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got = [r.url_norm for r in out]
    assert len(got) == len(set(got)) == 225  # exact dedup on RocksDB state


def test_streaming_full_round_equals_batch_round(spark, tmp_path):
    """The CLOSED loop — candidate stream → urlseen dedup → politeness
    schedule → fetch stage (stream-static join vs the pages table) →
    fetch_log sink — must equal one batch round built from the same
    primitives: python-set admission, schedule_round, fetch_join_round,
    extract_fetched.  Compares the full fetch record including status
    (a planted never-captured URL exercises the 404 branch) and the
    byte-identity sha of the extracted text."""
    import time

    from spacetime_crawler_spark.operators.politeness import schedule_round
    from spacetime_crawler_spark.plans.crawl import (
        extract_fetched,
        fetch_join_round,
        prepare_page_keys,
    )
    from spacetime_crawler_spark.sources import synth

    BUDGET = 6.0
    p = synth.world("tiny", n_pages=120)
    pages = synth.generate_pages_df(spark, p).persist()

    # candidates: canonicalized urls of real captures across several hosts
    # (+ dupes the dedup stage must drop + one miss for the 404 branch)
    from spacetime_crawler_spark.operators.udfs import canonicalize_udf

    base = (
        pages.select("url").distinct().limit(40)
        .withColumn("url_norm", canonicalize_udf("url"))
        .select("url_norm").distinct()
        .withColumn("host", F.lower(F.parse_url("url_norm", F.lit("HOST"))))
        .collect()
    )
    cand = [(r.host, r.url_norm) for r in base]
    cand.append(("missing.example.com", "http://missing.example.com/nope"))
    cand += cand[:5]  # re-announcements
    delays = {h: (1.0 if i % 2 == 0 else 2.0)
              for i, h in enumerate(sorted({h for h, _ in cand}))}

    def as_df(rows):
        return (
            spark.createDataFrame(rows, "host string, url_norm string")
            .withColumn("depth", F.lit(0))
            .withColumn(
                "crawl_delay",
                F.expr(
                    "CASE " + " ".join(
                        f"WHEN host = '{h}' THEN CAST({d} AS DOUBLE)"
                        for h, d in delays.items()
                    ) + " END"
                ),
            )
            .withColumn("url_hash", F.xxhash64("url_norm"))
            .withColumn("bucket", F.pmod("url_hash", F.lit(8)).cast("int"))
            .select("url_norm", "url_hash", "bucket", "host", "depth",
                    "crawl_delay")
        )

    cand_df = as_df(cand)

    # --- batch reference round
    page_keys = prepare_page_keys(spark, pages)
    fresh = cand_df.dropDuplicates(["url_norm"])
    frontier = fresh.withColumn("h2", F.hash("url_norm")).select(
        "url_norm", "url_hash", "h2", "host", "depth", "crawl_delay"
    )
    selected = schedule_round(frontier, BUDGET).persist()
    ref = extract_fetched(
        fetch_join_round(spark, pages, page_keys, selected)
    ).collect()
    ref_rows = sorted(
        (r.host, r.url_norm, r.fetch_seq, r.due_s, r.status, r.text_sha256,
         r.content_len)
        for r in ref
    )
    assert any(r[4] == 404 for r in ref_rows)  # the planted miss

    # --- streaming chain (one trigger per stage → sched_round == 1)
    src = str(tmp_path / "src")
    inter = str(tmp_path / "inter")
    log_dir = str(tmp_path / "log")
    os.makedirs(src)
    os.makedirs(inter)
    cand_df.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.2)

    COLS = (
        "url_norm string, url_hash bigint, bucket int, host string,"
        " depth int, crawl_delay double"
    )
    stage1 = fs.streaming_urlseen_dedup(
        spark.readStream.schema(COLS).parquet(src)
    )

    def sink(df, _bid):
        if df.count():
            df.coalesce(1).write.mode("append").parquet(inter)

    q1 = (
        stage1.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)

    stage2 = fs.streaming_politeness_schedule(
        spark.readStream.schema(COLS).parquet(inter)
        .select("host", "url_norm", "url_hash", "depth", "crawl_delay"),
        BUDGET,
    )
    q2 = fs.streaming_fetch_stage(
        spark, pages, stage2, log_dir, str(tmp_path / "ck2")
    )
    q2.awaitTermination(180)

    # the sink writes one idempotent subdirectory per micro-batch
    got = spark.read.parquet(log_dir.rstrip("/") + "/b*").collect()
    got_rows = sorted(
        (r.host, r.url_norm, r.fetch_seq, r.due_s, r.status, r.text_sha256,
         r.content_len)
        for r in got
    )
    assert all(r.round == 1 for r in got)
    assert got_rows == ref_rows

    # replay idempotence: foreachBatch is at-least-once, so reprocessing
    # the same batches (fresh checkpoint, same input) must OVERWRITE the
    # batch-keyed subdirectories, not append duplicates
    stage2b = fs.streaming_politeness_schedule(
        spark.readStream.schema(COLS).parquet(inter)
        .select("host", "url_norm", "url_hash", "depth", "crawl_delay"),
        BUDGET,
    )
    q3 = fs.streaming_fetch_stage(
        spark, pages, stage2b, log_dir, str(tmp_path / "ck3")
    )
    q3.awaitTermination(180)
    replayed = sorted(
        (r.host, r.url_norm, r.fetch_seq, r.due_s, r.status, r.text_sha256,
         r.content_len)
        for r in spark.read.parquet(log_dir.rstrip("/") + "/b*").collect()
    )
    assert replayed == ref_rows
    pages.unpersist()
    selected.unpersist()
