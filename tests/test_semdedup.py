"""SemDeDup: differential vs a full-fidelity pure-python re-implementation
of the pinned spec (seeding, spherical k-means with decimal-exact centroid
sums, greedy within-cluster prune), planted-duplicate semantics, and the
engine-wide partition-invariance contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spacetime_crawler_spark.operators import semdedup as sd


# --- pure-python oracle (independent reimplementation of the spec) -----------

def _norm_seq(vec):
    s = 0.0
    for v in vec:
        s += float(v) * float(v)
    return s ** 0.5


def _normalize(vec):
    n = _norm_seq(vec)
    if n == 0.0:
        return [0.0] * len(vec)
    return [float(v) / n for v in vec]


def _dot_seq(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def oracle_semdedup(rows, k, n_iter, tau):
    """rows: [(id, [float components as collected from Spark])].  Returns
    {id: (cluster, centroid_sim, keep, kept_by)} per the pinned spec."""
    xn = {i: _normalize(v) for i, v in rows}
    ids = sorted(xn)
    seeds = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    C = [list(xn[i]) for i in seeds]
    k = len(C)
    d = len(C[0])

    def assign_all():
        out = {}
        for i in ids:
            dots = [_dot_seq(xn[i], c) for c in C]
            best = 0  # strict > keeps the FIRST max — np.argmax's tie rule
            for c in range(1, k):
                if dots[c] > dots[best]:
                    best = c
            out[i] = (best, dots[best])
        return out

    for _ in range(n_iter):
        a = assign_all()
        # scaled-integer exact sums — the same quantization the engine's
        # cast(col * 1e18 as bigint) performs (truncation toward zero)
        sums = [[0] * d for _ in range(k)]
        counts = [0] * k
        for i in ids:
            c = a[i][0]
            counts[c] += 1
            for j, v in enumerate(xn[i]):
                sums[c][j] += int(v * 1e18)
        for c in range(k):
            if counts[c] == 0:
                continue
            mean = [float(sums[c][j]) / 1e18 / counts[c] for j in range(d)]
            n = _norm_seq(mean)
            C[c] = [m / n for m in mean] if n > 0 else mean

    a = assign_all()
    result = {}
    by_cluster: dict[int, list[int]] = {}
    for i in ids:
        by_cluster.setdefault(a[i][0], []).append(i)
    for c, members in by_cluster.items():
        members = sorted(members, key=lambda i: (a[i][1], i))
        kept: list[int] = []
        for i in members:
            best_j, best_sim = None, None
            for kj in kept:
                s = _dot_seq(xn[i], xn[kj])
                if best_sim is None or s > best_sim:
                    best_j, best_sim = kj, s
            if best_sim is not None and best_sim >= tau:
                result[i] = (c, a[i][1], False, best_j)
            else:
                kept.append(i)
                result[i] = (c, a[i][1], True, None)
    return result


def _run_engine(df, **kw):
    out = sd.semdedup(df, **kw).collect()
    return {
        r["vec_id"]: (r["cluster"], r["centroid_sim"], r["keep"], r["kept_by"])
        for r in out
    }


# --- differential over the driver testdata -----------------------------------

def test_semdedup_matches_pure_oracle(spark, sf_dir):
    from spacetime_crawler_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = [(r["vec_id"], list(r["embedding"])) for r in
            emb.select("vec_id", "embedding").collect()]
    expected = oracle_semdedup(rows, k=sd.K_CLUSTERS, n_iter=sd.N_ITER,
                               tau=sd.TAU_DEMO)
    got = _run_engine(emb, k=sd.K_CLUSTERS, n_iter=sd.N_ITER, tau=sd.TAU_DEMO)
    assert got == expected  # bit-identical: clusters, sims, keeps, kept_by


def test_semdedup_partition_invariance(spark, sf_dir):
    from spacetime_crawler_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = _run_engine(emb.repartition(1), tau=sd.TAU_DEMO)
    b = _run_engine(emb.repartition(13), tau=sd.TAU_DEMO)
    assert a == b


# --- planted duplicates: the semantics the synth corpus can't exercise -------

def _planted(spark):
    """Three exact-duplicate pairs + orthogonal singletons, d=4."""
    base = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.001, 0.0]),   # near-dup of 2
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
        (6, [2.0, 0.0, 0.0, 0.0]),     # scaled copy of 0 (cos == 1)
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in base],
        "vec_id bigint, embedding array<float>",
    )


def test_semdedup_planted_duplicates(spark):
    df = _planted(spark)
    got = _run_engine(df, k=4, n_iter=5, tau=0.99)
    # keep-set invariant: no two kept members of one cluster within tau
    kept = {i for i, (_, _, keep, _) in got.items() if keep}
    dropped = {i: kb for i, (_, _, keep, kb) in got.items() if not keep}
    assert len(dropped) >= 2  # at least {0,1,6} and {2,3} collapse
    for i, kb in dropped.items():
        assert kb in kept
        assert got[i][0] == got[kb][0]  # kept_by is in the same cluster
    # scaled copy: 0, 1 and 6 end up as one survivor
    trio = [i for i in (0, 1, 6)]
    assert sum(1 for i in trio if i in kept) == 1
    # differential: the pinned-spec oracle agrees on the same input
    rows = [(r["vec_id"], list(r["embedding"])) for r in df.collect()]
    assert got == oracle_semdedup(rows, k=4, n_iter=5, tau=0.99)


def test_semdedup_keep_set_pairwise_below_tau(spark, sf_dir):
    """Within every cluster, all KEPT members are pairwise below tau, and
    every dropped member really is within tau of its kept_by."""
    from spacetime_crawler_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r["vec_id"]: _normalize(list(r["embedding"]))
            for r in emb.collect()}
    got = _run_engine(emb, tau=sd.TAU_DEMO)
    by_cluster: dict[int, list[int]] = {}
    for i, (c, _, keep, kb) in got.items():
        if keep:
            by_cluster.setdefault(c, []).append(i)
        else:
            assert _dot_seq(rows[i], rows[kb]) >= sd.TAU_DEMO
    for members in by_cluster.values():
        for a_ in members:
            for b_ in members:
                if a_ < b_:
                    assert _dot_seq(rows[a_], rows[b_]) < sd.TAU_DEMO
    # non-vacuity at the demo tau over the sf corpus
    assert any(not keep for (_, _, keep, _) in got.values())


def test_kmeans_fewer_rows_than_k(spark):
    df = _planted(spark).filter(F.col("vec_id") < 3)
    C = sd.kmeans_fit(df, k=8, n_iter=3)
    assert C.shape[0] == 3  # k shrank to the row count
    got = _run_engine(df, k=8, n_iter=3, tau=0.99)
    assert set(got) == {0, 1, 2}


def test_semdedup_reuses_external_centroids(spark):
    """Passing fitted centroids skips the fit (dedup a fresh shard against
    an existing clustering)."""
    df = _planted(spark)
    C = sd.kmeans_fit(df, k=4, n_iter=5)
    got = _run_engine(df, k=4, n_iter=5, tau=0.99, centroids=C)
    assert got == _run_engine(df, k=4, n_iter=5, tau=0.99)


def test_semdedup_demo_shape(spark, sf_dir):
    out = sd.semdedup_demo(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "cluster", "centroid_sim", "keep", "kept_by"]
    n = out.count()
    from spacetime_crawler_spark.sources.tables import load_table
    assert n == load_table(spark, sf_dir, "embeddings").count()


def test_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no vectors"):
        sd.kmeans_fit(empty, k=4, n_iter=2)
    # with externally fitted centroids an empty shard dedups to empty output
    fitted = sd.kmeans_fit(_planted(spark), k=4, n_iter=2)
    assert sd.semdedup(empty, centroids=fitted, tau=0.9).count() == 0


def test_pipeline_semantic_prune(spark):
    """Composite: flagged semantic dups are dropped, vectorless docs pass
    through untouched, and the surviving set equals docs minus semdedup's
    keep=false verdicts."""
    from spacetime_crawler_spark.operators.pipeline import (
        pipeline_semantic_prune,
    )

    vectors = _planted(spark)  # vec_ids 0..6
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(9)],  # 7 and 8 have no vector
        "doc_id bigint, text string",
    )
    out = pipeline_semantic_prune(docs, vectors, k=4, n_iter=5, tau=0.99)
    kept_ids = {r["doc_id"] for r in out.collect()}
    verdicts = _run_engine(vectors, k=4, n_iter=5, tau=0.99)
    expected = {i for i in range(7) if verdicts[i][2]} | {7, 8}
    assert kept_ids == expected
    assert {7, 8} <= kept_ids  # vectorless docs always survive
    assert out.columns == ["doc_id", "text"]  # verdict column dropped
    # contract: the verdict side is broadcast — the docs/text side must
    # never shuffle for this join (applyInPandas output has no stats, so
    # without the hint this silently degrades to a sort-merge join)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semdedup_cluster_stats(spark):
    """Report ≡ a python recount over the same verdicts."""
    verdicts = sd.semdedup(_planted(spark), k=4, n_iter=5, tau=0.99)
    rows = verdicts.collect()
    got = {r["cluster"]: (r["n_members"], r["n_dropped"], r["dup_rate"])
           for r in sd.semdedup_cluster_stats(verdicts).collect()}
    want: dict[int, list[int]] = {}
    for r in rows:
        m = want.setdefault(r["cluster"], [0, 0])
        m[0] += 1
        m[1] += 0 if r["keep"] else 1
    assert got == {
        c: (m, d, round(d / m, 4)) for c, (m, d) in want.items()
    }
    assert sum(m for m, _, _ in got.values()) == 7  # every vector counted
