"""In-engine multinomial Naive Bayes text classifier — the model-based
filter stage of modern webtext pipelines (CCNet trains fasttext langid;
FineWeb-Edu/DCLM train quality classifiers on heuristic labels and filter
with them).  NB is the one classical classifier whose training IS a pure
aggregation, which makes it the Spark-native choice: no gradient loop, no
partitioning-dependent float accumulation, bit-identical everywhere.

Shape (deliberately parallel to operators/lm_quality.py):
- TRAIN = two partial+final hash aggs over exploded tokens (per-(token,
  class) counts and per-class totals/doc counts).  The shuffle carries one
  row per distinct (token, class), never text.  The model is the top_v
  tokens by total count — a bounded driver collect of <= top_v * k rows +
  one k-row stats collect.
- LOG-PROBS (Laplace-smoothed) are computed ONCE driver-side in python
  and shipped to both engines as int(logp * 1e12): ln() ULPs differ
  JVM/libm/numpy, integers don't.  Scoring then stays EXACT end to end —
  per-class DECIMAL(38,0) sums of quantized log-probs — so the per-doc
  score vectors (and therefore argmax predictions) are bit-identical on
  any partitioning and against the DuckDB oracle with NO rounding anywhere.
- SCORE = map-only explode (token array materialized below the Generate,
  lowered text below the token lambda) + one broadcast join of the
  <= top_v-row model + a k-column partial+final agg keyed on the doc id.
- Unseen tokens hit the Laplace unknown bucket (alpha mass over V+1);
  documents with no tokens fall back to the class priors (pinned).
- Prediction = argmax over (prior_q + sum_q), ties -> the FIRST max,
  i.e. the lexicographically smallest class (classes are sorted).

The tokenizer is the BPE module's whitespace rule (one pinned word-split
for the whole engine: [ \\t\\n\\r\\f]+ on lowered text — Java's \\s and
RE2's \\s disagree about \\x0B).

Synthetic-testdata caveat (same as Gopher/SemDeDup): every synth language
shares one 31-token vocabulary, so the lang demo is prior-dominated there;
class-separating semantics are pinned by the crafted fixture in
tests/test_nb_classifier.py, and the demo run pins mechanics + exactness.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spacetime_crawler_spark.operators.bpe import WORD_SPLIT_RE
from spacetime_crawler_spark.sources.tables import load_table

TOP_V = 100_000
ALPHA = 1.0  # Laplace smoothing mass
QSCALE = 1_000_000_000_000
MAX_CLASSES = 100  # labels are broadcast k ways; keep k honest


def _token_arrays(
    docs: DataFrame, text_col: str, *keep: str
) -> DataFrame:
    """(*keep, toks): non-empty whitespace tokens of the lowered text.
    Reuses lm_quality._lowered — the ONE materialize-below-the-lambda
    recipe (per-element re-evaluation trap)."""
    from spacetime_crawler_spark.operators.lm_quality import _lowered

    lowered = _lowered(docs, text_col, *keep)
    split = F.split(F.col("_t"), WORD_SPLIT_RE)
    return lowered.select(
        *keep, F.filter(split, lambda w: w != F.lit("")).alias("toks")
    )


@dataclass(frozen=True)
class NBModel:
    classes: tuple[str, ...]  # sorted; index order is the tie order
    priors_q: tuple[int, ...]  # int(ln(n_docs_c / n_docs) * 1e12)
    tokens: tuple[tuple[str, tuple[int, ...]], ...]  # token -> per-class q
    unk_q: tuple[int, ...]  # per-class unseen-token log-prob
    vocab: int  # tokens kept in the model (<= top_v)

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(t, list(q)) for t, q in self.tokens],
            schema="token string, qlogps array<bigint>",
        )


def train_nb(
    spark: SparkSession,
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    top_v: int = TOP_V,
    alpha: float = ALPHA,
) -> NBModel:
    """Fit from exact counts.  Driver materialization is bounded by
    construction: k rows of class stats, top_v token rows, then
    <= top_v * k joined count rows."""
    if alpha <= 0:
        raise ValueError("train_nb: alpha must be > 0 (Laplace smoothing)")
    labeled = docs.filter(F.col(label_col).isNotNull()).withColumn(
        "_y", F.col(label_col).cast("string")
    )
    # enforce the class bound BEFORE any per-class collect, so a mistaken
    # high-cardinality label column (a doc id, a URL) fails fast instead
    # of materializing millions of class rows on the driver
    k_probe = labeled.select("_y").distinct().limit(MAX_CLASSES + 1).count()
    if k_probe == 0:
        raise ValueError("train_nb: no labeled documents")
    if k_probe > MAX_CLASSES:
        raise ValueError(
            f"train_nb: more than MAX_CLASSES ({MAX_CLASSES}) distinct"
            f" labels — NB scoring broadcasts k columns per token"
        )
    toks = _token_arrays(labeled, text_col, "_y")
    # explode_outer + isNotNull (not plain explode): the inferred
    # size(toks) > 0 filter would be pushed below the _t projection with
    # the token lambda inlined — the lm_quality train-path trap
    pairs = toks.select("_y", F.explode_outer("toks").alias("token"))
    counts = (
        pairs.filter(F.col("token").isNotNull())
        .groupBy("token", "_y")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counts.persist()
    try:
        # per-class token totals derive from the cached counts (a k-row
        # agg) — never a second corpus-wide tokenize+explode pass
        n_tok = {
            r["_y"]: int(r["s"])
            for r in counts.groupBy("_y").agg(F.sum("c").alias("s")).collect()
        }
        n_docs = {
            r["_y"]: int(r["n"])
            for r in labeled.groupBy("_y")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # classes come from doc counts: a class whose docs are all empty
        # text has no counts rows but still exists (prior-only)
        stats = {c: (n_tok.get(c, 0), n_docs[c]) for c in n_docs}
        classes = tuple(sorted(stats))
        top = (
            counts.groupBy("token")
            .agg(F.sum("c").alias("tot"))
            .orderBy(F.desc("tot"), F.asc("token"))
            .limit(top_v)
        )
        rows = counts.join(F.broadcast(top.select("token")), "token").collect()
    finally:
        counts.unpersist()
    by_token: dict[str, dict[str, int]] = {}
    for r in rows:
        by_token.setdefault(r["token"], {})[r["_y"]] = int(r["c"])
    vocab = len(by_token)
    total_docs = sum(n for _, n in stats.values())
    denom = {c: stats[c][0] + alpha * (vocab + 1) for c in classes}
    token_rows = []
    for tok in sorted(by_token):
        qs = tuple(
            int(math.log((by_token[tok].get(c, 0) + alpha) / denom[c]) * QSCALE)
            for c in classes
        )
        token_rows.append((tok, qs))
    return NBModel(
        classes=classes,
        priors_q=tuple(
            int(math.log(stats[c][1] / total_docs) * QSCALE) for c in classes
        ),
        tokens=tuple(token_rows),
        unk_q=tuple(
            int(math.log(alpha / denom[c]) * QSCALE) for c in classes
        ),
        vocab=vocab,
    )


def nb_predict(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, scores ARRAY<BIGINT>[k], pred).  `scores` are the
    exact integer posteriors (prior_q + sum of per-token q) — no floats,
    no rounding, hash-comparable across engines; pred = classes[first
    argmax].  Token-less docs carry prior-only scores (pinned)."""
    spark = docs.sparkSession
    k = len(model.classes)
    e = _token_arrays(docs, text_col, id_col).select(
        id_col, F.explode_outer("toks").alias("token")
    )
    j = e.join(F.broadcast(model.to_df(spark)), "token", "left")
    dec = T.DecimalType(38, 0)
    sums = [
        F.sum(
            F.when(
                F.col("token").isNotNull(),
                F.coalesce(
                    F.element_at("qlogps", i + 1), F.lit(model.unk_q[i])
                ),
            ).cast(dec)
        ).alias(f"_s{i}")
        for i in range(k)
    ]
    agg = j.groupBy(id_col).agg(F.count("token").alias("n_tokens"), *sums)
    # scores stay DECIMAL(38,0): a 300k-token document's sum already
    # overflows int64 at |q| ~ 3.5e13 per token; decimal keeps exactness
    # at any document length and compares exactly in both engines
    scores = F.array(
        *[
            F.coalesce(F.col(f"_s{i}"), F.lit(0).cast(dec))
            + F.lit(model.priors_q[i]).cast(dec)
            for i in range(k)
        ]
    )
    classes_arr = F.array(*[F.lit(c) for c in model.classes])
    return (
        agg.withColumn("scores", scores)
        .withColumn(
            "pred",
            F.element_at(
                classes_arr,
                F.array_position(
                    F.col("scores"), F.array_max("scores")
                ).cast("int"),
            ),
        )
        .select(id_col, "n_tokens", "scores", "pred")
    )


def nb_langid_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on the md5 seed stratum's lang labels, predict for every
    document — the supervised counterpart of the heuristic trigram langid
    (over real text this is fasttext-langid's shape; over the synth
    corpus the shared vocabulary makes it prior-dominated, documented
    above)."""
    from spacetime_crawler_spark.operators.lm_quality import seed_stratum

    docs = load_table(spark, sf_dir, "documents")
    model = train_nb(spark, seed_stratum(docs), label_col="lang")
    return nb_predict(docs, model).orderBy("doc_id")
