"""Naive Bayes classifier: DuckDB end-to-end exactness (counts, integer
score vectors, predictions), hand-computed semantics on a crafted
class-separable fixture (the synth corpus has no token signal), empty-doc
prior fallback, plan shape, and partition invariance."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spacetime_crawler_spark.operators import nb_classifier as nb
from tests.oracle_harness import compare, duck_connection


def scores_sql(model: nb.NBModel) -> str:
    k = len(model.classes)
    sums = ", ".join(
        f"SUM(CASE WHEN token IS NOT NULL THEN"
        f" coalesce(qlogps[{i + 1}], {model.unk_q[i]}) END) AS s{i}"
        for i in range(k)
    )
    # CAST to BIGINT: DuckDB's hugeint sums reach pandas as floats, while
    # Spark's decimal cells arrive as Decimal — bigint prints identically
    # on both sides (exact: test corpora stay far from the int64 edge)
    score_list = ", ".join(
        f"CAST(coalesce(s{i}, 0) + {model.priors_q[i]} AS BIGINT)"
        for i in range(k)
    )
    classes = ", ".join(f"'{c}'" for c in model.classes)
    return rf"""
WITH d AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(t, '[ \t\n\r\f]+'), x -> x <> '') AS tks
  FROM d
),
g AS (
  SELECT doc_id,
         unnest(CASE WHEN len(tks) > 0 THEN tks
                ELSE [CAST(NULL AS VARCHAR)] END) AS token
  FROM tk
),
j AS (SELECT doc_id, token, qlogps FROM g LEFT JOIN nb_model USING (token)),
s AS (SELECT doc_id, COUNT(token) AS n_tokens, {sums} FROM j GROUP BY doc_id),
v AS (SELECT doc_id, n_tokens, [{score_list}] AS scores FROM s)
SELECT doc_id, n_tokens, scores,
       ([{classes}])[list_position(scores, list_aggregate(scores, 'max'))]
         AS pred
FROM v
"""


def _register_model(con, model: nb.NBModel) -> None:
    con.register(
        "nb_model",
        pd.DataFrame(
            [(t, list(q)) for t, q in model.tokens],
            columns=["token", "qlogps"],
        ),
    )


@pytest.fixture(scope="module")
def model(spark, sf_dir):
    from spacetime_crawler_spark.operators.lm_quality import seed_stratum
    from spacetime_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return nb.train_nb(spark, seed_stratum(docs), label_col="lang")


def test_predictions_match_duckdb_exactly(spark, sf_dir, model):
    from spacetime_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = nb.nb_predict(docs, model)
    con = duck_connection(sf_dir)
    _register_model(con, model)
    assert compare(out, con.sql(scores_sql(model)).df()) == []


def _fixture(spark):
    train = spark.createDataFrame(
        [
            (0, "buy cheap pills now buy pills", "spam"),
            (1, "cheap pills cheap offer", "spam"),
            (2, "meeting agenda notes review", "ham"),
            (3, "notes for the review meeting", "ham"),
            (4, "agenda review", "ham"),
        ],
        "doc_id bigint, text string, label string",
    )
    test = spark.createDataFrame(
        [
            (10, "cheap pills unknownword"),
            (11, "meeting notes agenda"),
            (12, ""),               # token-less: prior fallback
            (13, "zzz qqq www"),    # all unknown: priors + k*unk
        ],
        "doc_id bigint, text string",
    )
    return train, test


def test_fixture_semantics_hand_computed(spark):
    train, test = _fixture(spark)
    model = nb.train_nb(spark, train, label_col="label")
    assert model.classes == ("ham", "spam")
    # by hand: spam tokens 6+4=10, ham 4+5+2=11; distinct vocab
    # {buy cheap pills now offer meeting agenda notes review for the} = 11
    assert model.vocab == 11
    denom_ham = 11 + 1.0 * (11 + 1)
    by_tok = dict(model.tokens)
    assert by_tok["meeting"][0] == int(math.log((2 + 1) / denom_ham) * nb.QSCALE)
    assert model.priors_q == (
        int(math.log(3 / 5) * nb.QSCALE),
        int(math.log(2 / 5) * nb.QSCALE),
    )

    got = {r["doc_id"]: r for r in nb.nb_predict(test, model).collect()}
    assert got[10]["pred"] == "spam"
    assert got[11]["pred"] == "ham"
    # token-less doc: scores are exactly the priors; ham prior is larger
    assert got[12]["n_tokens"] == 0
    assert [int(s) for s in got[12]["scores"]] == list(model.priors_q)
    assert got[12]["pred"] == "ham"
    # all-unknown doc: symmetric unk mass -> decided by prior + denom
    assert got[13]["n_tokens"] == 3
    assert [int(s) for s in got[13]["scores"]] == [
        model.priors_q[i] + 3 * model.unk_q[i] for i in range(2)
    ]


def test_fixture_matches_duckdb(spark):
    train, test = _fixture(spark)
    model = nb.train_nb(spark, train, label_col="label")
    import duckdb

    con = duckdb.connect()  # no testdata views needed: both tables local
    con.register("documents", test.toPandas())
    _register_model(con, model)
    assert compare(nb.nb_predict(test, model), con.sql(scores_sql(model)).df()) == []


def test_plan_no_python_and_broadcast(spark, sf_dir, model):
    from spacetime_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        nb.nb_predict(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_partition_invariance(spark, sf_dir, model):
    from spacetime_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    def run(df):
        return sorted(
            (r["doc_id"], r["n_tokens"], tuple(r["scores"]), r["pred"])
            for r in nb.nb_predict(df, model).collect()
        )

    assert run(docs.repartition(1)) == run(docs.repartition(13))


def test_guards(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string, label string")
    with pytest.raises(ValueError, match="no labeled"):
        nb.train_nb(spark, empty, label_col="label")
