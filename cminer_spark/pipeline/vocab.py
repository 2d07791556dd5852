"""Vocabulary statistics: word counts and BPE merge-pair counts.

The first step of training a BPE/WordPiece tokenizer over a corpus is
exactly two distributed aggregations: the word-frequency table, and
the adjacent-symbol-pair counts that pick the first merge (Sennrich et
al. 2016, §3.2). At 100 TB both are classic map-side-combinable
groupBys — the pair table is bounded by |alphabet|² regardless of
corpus size, so the "train a tokenizer on the whole corpus" loop is
(pair counts → pick merge → re-segment) with only the tiny pair table
ever leaving the executors.

This module ships the corpus-side statistics (the expensive,
distributed part); the merge LOOP itself is driver-side trivial once
word counts are materialized (the standard trainer runs on the word
table, not the corpus — word_counts() IS the 100-TB reduction).

Tokenization is the corpus convention shared with the other text
operators and their DuckDB oracles: ``lower(text)`` split on ``' +'``,
empty tokens dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["word_counts", "bpe_pair_counts"]


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """``(word, n)`` frequency table — one explode + one combinable
    groupBy; the output is the vocabulary-sized reduction every
    tokenizer trainer iterates on."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        docs.select(F.explode(F.split(txt, " +")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Adjacent character-pair counts over the corpus, weighted by word
    frequency — the statistic that selects BPE merge #1.

    Occurrences overlap (``"aaa"`` contributes ``"aa"`` twice), and a
    word occurring ``n`` times contributes each of its pairs ``n``
    times. Returns the ``top_k`` pairs as ``(pair, n, pair_rank)``
    with deterministic ties (count desc, pair asc).

    Scale shape: the corpus reduces to the word table first (combinable
    groupBy), pairs explode off DISTINCT words only — O(vocabulary ·
    avg word length), independent of corpus row count — and the global
    top-k is an ``orderBy().limit(k)`` (TakeOrdered) with the rank
    window applied to the k-row result only, so no single-partition
    sort ever sees the full pair table.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    words = word_counts(docs, text_col=text_col, lowercase=lowercase)
    pairs = (
        words.where(F.length("word") >= 2)
        .select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("n"))
    )
    # global top-k via orderBy+limit (plans as TakeOrdered: per-
    # partition top-k + driver merge, no single-partition sort of the
    # pair table — ranking.bm25_topk pattern); the rank window then
    # runs over the already-limited k rows only
    return (
        pairs.orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_k)
        .select(
            "pair",
            "n",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("pair").asc()))
            .alias("pair_rank"),
        )
    )
