"""Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
cluster document embeddings with spherical k-means, then prune
near-duplicates WITHIN each cluster by pairwise cosine — clustering bounds
the quadratic comparison to O((n/k)^2) per cluster instead of O(n^2)
corpus-wide, which is the whole reason the method scales to 100 TB corpora.

Spark-first shape, and the determinism contract the rest of this engine
keeps (bit-identical output on any cluster size / partitioning):

- Assignment is a per-row Arrow-batched pandas UDF over a closure-captured
  k x d float64 centroid matrix (k*d is a few KiB — the "broadcast small
  side" of k-means).  Per-row math never depends on partitioning.
- Centroid recomputation is the one shuffle per iteration and it is EXACT:
  posexplode(normalized vec) -> partial+final hash agg of
  SUM(CAST(component * 1e18 AS BIGINT) AS DECIMAL(38,0)) keyed on
  (cluster, dim).  Components are quantized to scaled integers (double
  multiply + truncation toward zero — both bit-identical between the JVM
  and python, unlike the double->decimal cast, which goes through Java's
  shortest-string BigDecimal.valueOf and can disagree with an exact-binary
  quantize at the last digit), and integer addition is associative, so the
  centroids — and therefore every downstream assignment — are bit-identical
  regardless of how rows are partitioned, unlike a double sum.  Map-side
  partial aggregation reduces each task's shuffle contribution to <= k*d
  narrow rows; the driver collects exactly k*d rows per iteration (bounded
  by construction, the same discipline as the pagerank kernel's one scalar
  collect per step).
- Capacity: DECIMAL(38,0) holds ~10^20 of these |scaled| <= 1e18
  components, so the exact sum cannot overflow below ~10^20 vectors per
  cluster; the ~1e-16 relative quantization is far below k-means' own
  tolerance and exists only to make the sum order-free.
- The within-cluster prune is groupBy(cluster).applyInPandas — one
  quadratic numpy block per cluster, never a corpus-wide join.  Cluster
  population is O(n/k); pick k proportional to n (SemDeDup used k = 11k
  clusters at 100M docs) so each block fits one task.  Only (vec_id,
  cluster, centroid_sim, embedding) enter the group — documents/text never
  shuffle.

Pinned prune spec (the pure-python oracle in tests/test_semdedup.py
re-implements exactly this): within a cluster, order members by
(centroid_sim ASC, vec_id ASC) — SemDeDup's "keep the LOW-centroid-
similarity member" preference — then greedily keep a member iff its cosine
to every already-kept member is < tau; a dropped member records kept_by =
the kept member with the highest cosine (ties -> the earliest-kept, i.e.
lowest (centroid_sim, vec_id)).

Float discipline: every dot product here accumulates SEQUENTIALLY over the
dimension axis (a d-step loop of elementwise IEEE ops).  BLAS gemm/gemv
pick blocking by matrix shape, so `X @ C.T` can round differently at
different Arrow batch sizes — which would silently break partition
invariance.  Elementwise ops have no shape-dependent reassociation; the
same loop in pure python is bit-identical, which is what lets the oracle
match exactly.

Synthetic-testdata caveat (same situation as the Gopher rules): the synth
embeddings are near-orthogonal (max pairwise cosine ~0.51 at sf0.01), so
any semantically meaningful tau (~0.9) drops nothing there.  Non-vacuous
semantics are pinned by planted-duplicate fixtures; the sf0.01 corpus run
pins determinism, cluster shape, and the keep-set invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spacetime_crawler_spark.sources.tables import load_table

K_CLUSTERS = 8
N_ITER = 10
TAU_DEMO = 0.18  # non-vacuous over the near-orthogonal synth embeddings
TAU_SEMANTIC = 0.9  # what a real embedding space would use

# Sequential left-to-right squared-norm fold — the SAME evaluation order as
# the pure-python oracle, so normalized components agree bit-for-bit.
_NORM = (
    "sqrt(aggregate({v}, cast(0.0 as double),"
    " (s, x) -> s + cast(x as double) * cast(x as double)))"
)


def _normalized(df: DataFrame, vec_col: str) -> DataFrame:
    """Add `xn`: the L2-normalized vector as array<double> (zero vectors
    stay zero).  Unit-norm first makes k-means spherical: argmin L2 ==
    argmax dot == argmax cosine.  The norm is materialized as its own
    column first — inlined into the transform lambda it would re-run the
    whole d-element fold once PER ELEMENT (d^2 per row)."""
    with_norm = df.withColumn("_nrm", F.expr(_NORM.format(v=vec_col)))
    return with_norm.withColumn(
        "xn",
        F.expr(
            f"CASE WHEN _nrm = 0.0 THEN transform({vec_col}, x -> 0.0d)"
            f" ELSE transform({vec_col}, x -> cast(x as double) / _nrm) END"
        ),
    ).drop("_nrm")


def _seq_dots(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """All-pairs dots with a sequential d-step accumulation (see module
    docstring's float discipline) — never BLAS gemm, whose rounding varies
    with the batch dimension."""
    out = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for j in range(X.shape[1]):
        out += X[:, j : j + 1] * C[:, j]
    return out


def _assign_udf(centroids: np.ndarray):
    """pandas UDF: xn -> (cluster, centroid_sim) against a closure-captured
    float64 centroid matrix.  np.argmax resolves ties to the lowest cluster
    id, which is the pinned tie rule."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf("struct<cluster: int, centroid_sim: double>")
    def assign(xn: pd.Series) -> pd.DataFrame:
        if len(xn) == 0:
            return pd.DataFrame({"cluster": pd.Series(dtype="int32"),
                                 "centroid_sim": pd.Series(dtype="float64")})
        X = np.vstack(xn.to_numpy())  # float64: xn is array<double>
        dots = _seq_dots(X, C)
        best = np.argmax(dots, axis=1)
        return pd.DataFrame(
            {
                "cluster": best.astype("int32"),
                "centroid_sim": dots[np.arange(len(best)), best],
            }
        )

    return assign


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = K_CLUSTERS,
    n_iter: int = N_ITER,
) -> np.ndarray:
    """Fit spherical k-means; returns the k x d unit-norm centroid matrix.

    Seeds are the k rows with the smallest (md5(id), id) — deterministic,
    uniformly spread over ids, no RNG (the engine-wide portable-determinism
    trick).  Fixed n_iter (no convergence test) keeps the job count static.
    Empty clusters retain their previous centroid.
    """
    xn = _normalized(df.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("_id"), "xn"
    )
    xn.persist()
    try:
        seed_rows = (
            xn.withColumn("_h", F.md5(F.col("_id").cast("string")))
            .orderBy("_h", "_id")
            .limit(k)
            .select("xn")
            .collect()
        )  # bounded: exactly k rows
        if not seed_rows:
            raise ValueError(
                "kmeans_fit: no vectors to cluster (empty input); pass "
                "fitted centroids= to semdedup() for possibly-empty shards"
            )
        C = np.vstack([np.asarray(r["xn"], dtype=np.float64) for r in seed_rows])
        k = C.shape[0]  # fewer rows than requested clusters -> shrink k
        d = C.shape[1]
        for _ in range(n_iter):
            assigned = xn.withColumn("a", _assign_udf(C)(F.col("xn")))
            sums = (
                assigned.select(
                    F.col("a.cluster").alias("c"), F.posexplode("xn")
                )
                .groupBy("c", "pos")
                .agg(
                    F.sum(
                        F.expr("cast(col * 1e18 as bigint)").cast(
                            T.DecimalType(38, 0)
                        )
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )  # bounded: <= k*d rows by construction
            newC = C.copy()
            counts = np.zeros(k, dtype=np.int64)
            acc = np.zeros((k, d), dtype=np.float64)
            for r in sums:
                acc[r["c"], r["pos"]] = float(int(r["s"])) / 1e18 / r["n"]
                counts[r["c"]] = r["n"]
            for c in range(k):
                if counts[c] == 0:
                    continue  # empty cluster keeps its previous centroid
                s = 0.0  # sequential fold: same order as oracle / _NORM
                for v in acc[c]:
                    s += float(v) * float(v)
                nrm = s ** 0.5
                newC[c] = acc[c] / nrm if nrm > 0 else acc[c]
            C = newC
    finally:
        xn.unpersist()
    return C


_PRUNE_SCHEMA = (
    "vec_id bigint, cluster int, centroid_sim double,"
    " keep boolean, kept_by bigint"
)


def _prune_cluster_fn(tau: float):
    """applyInPandas body: greedy within-cluster prune per the pinned spec
    (module docstring); tau is closure-captured."""

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["centroid_sim", "vec_id"], ascending=[True, True]
        ).reset_index(drop=True)
        X = np.vstack(pdf["xn"].to_numpy())
        kept_idx: list[int] = []
        keep = np.ones(len(pdf), dtype=bool)
        kept_by = pd.array([pd.NA] * len(pdf), dtype="Int64")
        for i in range(len(pdf)):
            if kept_idx:
                sims = _seq_dots(X[kept_idx], X[i : i + 1])[:, 0]
                j = int(np.argmax(sims))  # ties -> earliest-kept
                if sims[j] >= tau:
                    keep[i] = False
                    kept_by[i] = int(pdf["vec_id"].iloc[kept_idx[j]])
                    continue
            kept_idx.append(i)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].astype("int64"),
                "cluster": pdf["cluster"].astype("int32"),
                "centroid_sim": pdf["centroid_sim"],
                "keep": keep,
                "kept_by": kept_by,
            }
        )

    return prune


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = K_CLUSTERS,
    n_iter: int = N_ITER,
    tau: float = TAU_SEMANTIC,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup over `df`: one row per input vector with its cluster,
    cosine to the cluster centroid, the keep/drop decision, and (for
    drops) which kept vector shadowed it.  Pass `centroids` to reuse a
    fitted model (e.g. dedup a fresh shard against last month's clustering
    without re-fitting)."""
    if centroids is None:
        centroids = kmeans_fit(df, vec_col, id_col, k=k, n_iter=n_iter)
    xn = _normalized(df.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("vec_id"), "xn"
    )
    assigned = xn.withColumn("a", _assign_udf(centroids)(F.col("xn"))).select(
        "vec_id",
        F.col("a.cluster").alias("cluster"),
        F.col("a.centroid_sim").alias("centroid_sim"),
        "xn",
    )
    return assigned.groupBy("cluster").applyInPandas(
        _prune_cluster_fn(float(tau)), schema=_PRUNE_SCHEMA
    )


def semdedup_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-shaped entry over the embeddings table (rows-only semantics:
    k-means + greedy pruning is iterative/order-dependent, not ANSI-SQL-
    expressible; tests/test_semdedup.py pins it against a pure-python
    re-implementation of the full spec)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = semdedup(emb, k=K_CLUSTERS, n_iter=N_ITER, tau=TAU_DEMO)
    return out.select(
        "vec_id",
        "cluster",
        F.round("centroid_sim", 4).alias("centroid_sim"),
        "keep",
        "kept_by",
    ).orderBy("vec_id")


def semdedup_cluster_stats(verdicts: DataFrame) -> DataFrame:
    """Per-cluster diversity report over semdedup() output: member count,
    drop count, duplicate rate, and mean cosine-to-centroid — the summary
    a SemDeDup audit publishes (which clusters are boilerplate-heavy, how
    much the corpus shrinks, how tight each cluster is).  One partial+
    final hash agg over the narrow verdict relation; k rows out."""
    return (
        verdicts.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_dropped"),
            F.round(F.avg("centroid_sim"), 4).alias("mean_centroid_sim"),
        )
        .withColumn(
            "dup_rate", F.round(F.col("n_dropped") / F.col("n_members"), 4)
        )
        .orderBy("cluster")
    )
