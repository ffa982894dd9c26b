"""BPE training/encoding: exact DuckDB word-frequency parity, the classic
hand-computable merge sequence, encoder goldens and invariants, and the
token-stats differential vs a pure recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spacetime_crawler_spark.operators import bpe
from tests.oracle_harness import compare, duck_connection

SENNRICH = (
    " ".join(["low"] * 5)
    + " " + " ".join(["lower"] * 2)
    + " " + " ".join(["newest"] * 6)
    + " " + " ".join(["widest"] * 3)
)


def test_word_freq_matches_duckdb_exactly(spark, sf_dir):
    from spacetime_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    con = duck_connection(sf_dir)
    assert compare(bpe.word_freq(docs), con.sql(bpe.WORD_FREQ_SQL).df()) == []


def test_classic_merge_sequence(spark):
    docs = spark.createDataFrame([(0, SENNRICH)], "doc_id bigint, text string")
    model = bpe.train_bpe(spark, docs, n_merges=5)
    # the published toy example: es, est, est</w>, lo, low
    assert model.merges == (
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    )
    assert model.n_words_total == 16
    assert model.coverage == 1.0
    assert model.vocab_words == 4


def test_encode_goldens_and_invariants(spark):
    docs = spark.createDataFrame([(0, SENNRICH)], "doc_id bigint, text string")
    model = bpe.train_bpe(spark, docs, n_merges=5)
    ranks = model.ranks
    assert bpe.bpe_encode("lowest", ranks) == ["low", "est</w>"]
    assert bpe.bpe_encode("low", ranks) == ["low", "</w>"]
    assert bpe.bpe_encode("newest", ranks) == ["n", "e", "w", "est</w>"]
    # unseen characters stay as base symbols
    assert bpe.bpe_encode("löw", ranks) == ["l", "ö", "w", "</w>"]
    # invariant: token concatenation reconstructs word + end marker
    for w in ["low", "lower", "newest", "widest", "zzz", ""]:
        assert "".join(bpe.bpe_encode(w, ranks)) == w + bpe.END


def test_merges_exhaust_gracefully(spark):
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id bigint, text string")
    model = bpe.train_bpe(spark, docs, n_merges=50)
    # only (a,b) then (ab,</w>) are learnable; the loop stops, no padding
    assert model.merges == (("a", "b"), ("ab", "</w>"))


def test_top_w_cap_and_coverage(spark):
    docs = spark.createDataFrame(
        [(0, "aa aa aa bb bb cc")], "doc_id bigint, text string"
    )
    model = bpe.train_bpe(spark, docs, n_merges=3, top_w=2)
    assert model.n_words_total == 6
    assert model.n_words_kept == 5  # cc's single occurrence dropped
    assert model.coverage == pytest.approx(5 / 6)
    assert model.vocab_words == 3


def test_token_stats_matches_pure(spark, sf_dir):
    from spacetime_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = bpe.train_bpe(spark, docs, n_merges=50, top_w=1000)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe.bpe_token_stats(docs, model).collect()
    }
    ranks = model.ranks
    import re

    for r in docs.select("doc_id", "text").collect():
        words = [
            w for w in re.split(bpe.WORD_SPLIT_RE, (r["text"] or "").lower())
            if w != ""
        ]
        n_tokens = sum(len(bpe.bpe_encode(w, ranks)) for w in words)
        assert got[r["doc_id"]] == (len(words), n_tokens)


def test_token_stats_partition_invariance(spark, sf_dir):
    from spacetime_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = bpe.train_bpe(spark, docs, n_merges=20, top_w=500)
    a = sorted(map(tuple, bpe.bpe_token_stats(docs.repartition(1), model).collect()))
    b = sorted(map(tuple, bpe.bpe_token_stats(docs.repartition(13), model).collect()))
    assert a == b
