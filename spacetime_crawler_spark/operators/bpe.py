"""Corpus-scale BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the missing piece between the corpus operators and a
training run: given the cleaned corpus, learn the merge table that a
tokenizer ships with, then measure per-document token counts under it.

Spark-first shape — the same split real tokenizer trainers use (HF
`tokenizers` trains from a word-frequency table, not the raw stream):

- The CORPUS-SIZED work is one partial+final hash agg: whitespace-split
  words -> groupBy(word).count.  The shuffle carries one row per DISTINCT
  word (Zipf: millions, not trillions) and never any text beyond the word
  itself.
- The merge LOOP runs driver-side over the top_w most frequent words — a
  bounded-by-construction collect (top_w rows by (count DESC, word ASC)).
  BPE's merge decisions depend only on aggregate pair counts, and the
  frequency-capped table preserves them almost exactly (the dropped tail
  is counted and reported as `coverage`, never silently ignored).  The
  loop keeps pair counts incrementally via a pair -> words inverted index,
  so training is O(merges * affected-words), not a full recount per merge.
- ENCODING under a trained model is map-only: one Arrow-batched pandas UDF
  with the closure-captured rank table (bounded: n_merges entries) and a
  per-batch word memo — Zipf again: a batch of documents contains few
  distinct words relative to tokens.

Pinned spec:
- A word is a maximal run of non-whitespace in lower(coalesce(text,'')),
  split on [ \\t\\n\\r\\f]+ (an explicit class: Java's \\s and RE2's \\s
  disagree about \\x0B, and the word-count oracle runs on DuckDB).
- A word's initial symbol sequence is its characters plus a trailing
  '</w>' end-of-word symbol.
- Each step merges the pair with the highest total count, ties broken by
  pair lexicographic order — fully deterministic, no insertion-order
  dependence.
- Encoding applies merges greedily by rank (lowest-rank pair present is
  merged at all its occurrences, left-to-right, until none applies) —
  the GPT-2-style encoder.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORD_SPLIT_RE = r"[ \t\n\r\f]+"
END = "</w>"
TOP_W = 100_000
N_MERGES = 200


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c): the one corpus-sized aggregation (exact-int, DuckDB-
    oracle-comparable).  The split array is materialized below the explode."""
    words = docs.select(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                WORD_SPLIT_RE).alias("ws")
    )
    return (
        words.select(F.explode("ws").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


WORD_FREQ_SQL = r"""
WITH w AS (
  SELECT unnest(string_split_regex(lower(coalesce(text, '')), '[ \t\n\r\f]+')) AS word
  FROM documents
)
SELECT word, COUNT(*) AS c FROM w WHERE word != '' GROUP BY word
"""


@dataclass(frozen=True)
class BPEModel:
    merges: tuple[tuple[str, str], ...]  # in learned order (= rank)
    n_words_total: int  # word occurrences in the corpus
    n_words_kept: int   # occurrences covered by the top_w table
    vocab_words: int    # distinct words seen

    @property
    def coverage(self) -> float:
        return self.n_words_kept / self.n_words_total if self.n_words_total else 0.0

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _merge_pair(seq: list[str], pair: tuple[str, str]) -> list[str]:
    """Replace every non-overlapping occurrence of `pair`, left to right —
    the ONE merge-application rule, shared by training and encoding so the
    two can never diverge on how a merge applies."""
    merged = pair[0] + pair[1]
    out: list[str] = []
    j = 0
    while j < len(seq):
        if j + 1 < len(seq) and seq[j] == pair[0] and seq[j + 1] == pair[1]:
            out.append(merged)
            j += 2
        else:
            out.append(seq[j])
            j += 1
    return out


def _learn_merges(
    freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The driver-side loop: incremental pair counts over symbolized words.
    All bookkeeping is in-place — exhausted pairs are deleted as their
    counts reach zero and a rewritten word is discarded from the inverted
    index on decrement — so per-merge cost is the argmax scan plus the
    affected words, never a full-dict rebuild."""
    words: list[list[str]] = [list(w) + [END] for w, _ in freqs]
    counts: list[int] = [c for _, c in freqs]
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word(i: int, sign: int) -> None:
        seq, c = words[i], counts[i]
        for p in zip(seq, seq[1:]):
            if sign > 0:
                pair_count[p] = pair_count.get(p, 0) + c
                pair_words.setdefault(p, set()).add(i)
            else:
                nc = pair_count[p] - c
                if nc <= 0:
                    del pair_count[p]
                    pair_words.pop(p, None)
                else:
                    pair_count[p] = nc
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(i)  # re-added below if the pair survives

    for i in range(len(words)):
        add_word(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best, best_c = None, 0
        for p, c in pair_count.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None:
            break
        merges.append(best)
        for i in sorted(pair_words.get(best, ())):
            add_word(i, -1)
            words[i] = _merge_pair(words[i], best)
            add_word(i, +1)
        # every occurrence of `best` was rewritten away, so its count hit
        # zero and add_word already deleted both entries; belt-and-braces
        pair_count.pop(best, None)
        pair_words.pop(best, None)
    return merges


def train_bpe(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES,
    top_w: int = TOP_W,
) -> BPEModel:
    wf = word_freq(docs, text_col)
    wf.persist()
    try:
        stats = wf.agg(
            F.sum("c").alias("occ"), F.count(F.lit(1)).alias("vocab")
        ).collect()[0]  # bounded: 1 row
        top = (
            wf.orderBy(F.desc("c"), F.asc("word")).limit(top_w).collect()
        )  # bounded: top_w rows
    finally:
        wf.unpersist()
    freqs = [(r["word"], int(r["c"])) for r in top]
    merges = _learn_merges(freqs, n_merges)
    kept = sum(c for _, c in freqs)
    return BPEModel(
        merges=tuple(merges),
        n_words_total=int(stats["occ"] or 0),
        n_words_kept=kept,
        vocab_words=int(stats["vocab"]),
    )


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order encode of one word (pinned spec above)."""
    seq = list(word) + [END]
    while len(seq) > 1:
        best_rank, best_pair = None, None
        for p in zip(seq, seq[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        seq = _merge_pair(seq, best_pair)
    return seq


def bpe_token_stats(
    docs: DataFrame,
    model: BPEModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_tokens) under the trained merges — the measurement a
    data pipeline actually needs (token budgets, packing, compression
    ratios are all in tokens-under-YOUR-tokenizer, not whitespace words).
    Map-only; the word split happens JVM-side so the Arrow crossing
    carries word arrays, not raw text parsing work."""
    ranks = model.ranks

    @F.pandas_udf("long")
    def n_tokens(ws: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def count(words) -> int:
            total = 0
            for w in words:
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(bpe_encode(w, ranks))
                    memo[w] = n
                total += n
            return total

        return ws.map(count)

    split = F.split(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), WORD_SPLIT_RE
    )
    return docs.select(
        F.col(id_col),
        F.size(F.filter(split, lambda w: w != F.lit(""))).cast("long").alias(
            "n_words"
        ),
        n_tokens(split).alias("n_tokens"),
    )
