"""ANN recall vs brute force; multimodal plumbing determinism; langid."""

from __future__ import annotations

from spacetime_crawler_spark.operators import multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.01"


def test_ann_buckets_balanced(spark):
    rows = similarity.sim_ann_buckets(spark, SF_DIR).collect()
    n_vecs = len({r.vec_id for r in rows})
    assert len(rows) == n_vecs * similarity.LSH_TABLES
    per_table = {}
    for r in rows:
        per_table.setdefault(r.table, {}).setdefault(r.bucket, 0)
        per_table[r.table][r.bucket] += 1
    assert len(per_table) == similarity.LSH_TABLES
    for buckets in per_table.values():
        # 3 sign bits → up to 8 buckets; random vectors spread across most
        assert len(buckets) >= 4
        assert max(buckets.values()) < n_vecs * 0.5


def test_ann_lsh_recall(spark):
    exact = [r.vec_id for r in similarity.sim_topk_bruteforce(spark, SF_DIR).collect()]
    approx = [r.vec_id for r in similarity.sim_ann_lsh(spark, SF_DIR).collect()]
    # Hamming≤1 multi-probe over 12 bits: expect to recover most of top-5;
    # require ≥ 2/5 as the floor (ANN is approximate by construction) and
    # that everything returned is genuinely high-cosine (subset check is not
    # required: ANN may return items just below the exact top-5).
    overlap = len(set(exact) & set(approx))
    assert overlap >= 2, (exact, approx)


def test_langid_marker_snippets(spark, sf_dir):
    # handcrafted snippets through the same scoring expressions via a temp view
    import pyspark.sql.functions as F

    pdf = [
        (1, "the cat and the dog is in that house with food"),
        (2, "el perro de la casa que los gatos una vez por aqui con"),
        (3, "der hund und die katze das ist nicht mit ein haus"),
        (4, "xyzzy qwerty asdf"),
    ]
    df = spark.createDataFrame(pdf, ["doc_id", "text"])
    df.createOrReplaceTempView("_langid_probe")
    from spacetime_crawler_spark.functions.tokenize import TOKEN_SPLIT_REGEX
    from spacetime_crawler_spark.operators.textstats import LANG_MARKERS

    toks = f"filter(split(lower(text), '{TOKEN_SPLIT_REGEX}'), x -> x != '')"
    cols = [
        F.expr(
            f"size(filter(array_distinct({toks}),"
            f" t -> t IN ({', '.join(repr(m) for m in markers)})))"
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = {r.doc_id: r for r in df.select("doc_id", *cols).collect()}
    assert scored[1].score_en > max(scored[1].score_es, scored[1].score_de)
    assert scored[2].score_es > max(scored[2].score_en, scored[2].score_de)
    assert scored[3].score_de > max(scored[3].score_en, scored[3].score_es)
    assert max(scored[4].score_en, scored[4].score_es, scored[4].score_de) == 0


def test_multimodal_fake_features_deterministic(spark):
    a = {r.doc_id: tuple(r.features) for r in
         multimodal.multimodal_fake_features_array(spark, SF_DIR).limit(50).collect()}
    b = {r.doc_id: tuple(r.features) for r in
         multimodal.multimodal_fake_features_array(spark, SF_DIR).limit(50).collect()}
    assert a == b
    for feats in a.values():
        assert len(feats) == multimodal.FEATURE_DIM
        assert all(0.0 <= f < 1.0 for f in feats)


def test_multimodal_fake_features_driver_entry_is_scalar_and_consistent(spark):
    """The registry entry must expose only hashable scalar columns (the
    driver canonicalizer sorts cell values) and agree with the array variant."""
    exploded = multimodal.multimodal_fake_features(spark, SF_DIR)
    for f in exploded.schema.fields:
        assert not f.dataType.typeName().startswith(("array", "map", "struct"))
    got = {(r.doc_id, r.dim): r.value
           for r in exploded.filter("doc_id < 20").collect()}
    want = {(r.doc_id, i): v
            for r in multimodal.multimodal_fake_features_array(spark, SF_DIR)
                               .filter("doc_id < 20").collect()
            for i, v in enumerate(r.features)}
    assert got == want


def test_multimodal_binary_meta_is_native(spark):
    """Metadata op must stay JVM-side: no Arrow/Python eval nodes in plan."""
    plan = multimodal.multimodal_binary_meta(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEval" not in plan and "MapInPandas" not in plan and "BatchEval" not in plan


def test_multimodal_decode_is_explicit_stub():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal._decode_image(b"\xff\xd8\xff")


def test_bpe_token_count_matches_pure_python(spark, sf_dir):
    import duckdb

    from spacetime_crawler_spark.operators.textstats import (
        bpe_pretokenize,
        text_bpe_token_count,
    )

    rows = {
        r.doc_id: (r.ws_tokens, r.bpe_tokens)
        for r in text_bpe_token_count(spark, sf_dir).collect()
    }
    texts = dict(
        duckdb.sql(
            f"select doc_id, text from '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    for did, text in texts.items():
        assert rows[did] == (
            len([t for t in text.split() if t]),
            len(bpe_pretokenize(text)),
        )
    # pinned micro-goldens for the pre-tokenizer shape
    assert bpe_pretokenize("I'll don't 123 abc-def!") == [
        "I", "'ll", " don", "'t", " 123", " abc", "-", "def", "!",
    ]


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from spacetime_crawler_spark.plans.analytics import (
        a1_approx_unique_pages,
        a1_unique_pages,
    )

    exact = a1_unique_pages(spark, sf_dir).collect()[0].unique_pages
    approx = a1_approx_unique_pages(spark, sf_dir).collect()[0].approx_unique_pages
    assert abs(approx - exact) <= max(1, 0.05 * exact), (approx, exact)
