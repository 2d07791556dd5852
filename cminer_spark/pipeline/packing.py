"""Sequence packing — assemble documents into fixed token-budget
training bins, deterministically and shuffle-minimally.

The training-data op after dedup/curation: the dataloader wants
near-``max_tokens`` sequences, so documents are packed into bins. The
scalable deterministic strategy here is *hash-salted concat-and-start
packing* (the distributed analog of "shuffle, concatenate, chunk,
respect document boundaries"):

1. each doc gets a uniform ``pack_group`` in ``[0, groups)`` from the
   engine-portable md5 hash (:func:`~cminer_spark.pipeline.curation.
   split_hash` — same function as the train/val splitter, different
   seed context), which both *shuffles the corpus order* (hash order
   ≈ random order, decorrelating source/topic runs) and *bounds the
   window parallelism* (each group is one window partition, so
   ``groups`` sizes the sort: at 10^12 docs, 2^16 groups keep each
   in-partition sort ~10^7 rows);
2. within a group, docs are ordered by their hash (ties by id) and
   concatenated; a doc belongs to the bin its first token lands in:
   ``bin_idx = floor(cum_tokens_before / max_tokens)``.

Properties (tested):

* every doc is assigned exactly one bin; membership is stable under
  re-runs and re-partitioning (pure function of ids + token counts);
* bins fill to ``max_tokens`` except for the boundary overflow of
  their LAST doc — a bin's token sum is < ``max_tokens`` + the size
  of its final doc (exact-fit packing is bin-packing-hard and
  inherently sequential; start-bin assignment is the standard
  scalable relaxation, and its waste is bounded and measurable via
  :func:`pack_stats`);
* oversize docs (> ``max_tokens``) occupy their own bin span and
  never displace a small doc's assignment.

One shuffle total (the window exchange on ``pack_group``); token
counting is the :mod:`~cminer_spark.pipeline.textstats` whitespace
convention unless a precomputed ``tokens_col`` is given.

Gate: ``seq_pack`` (exact DuckDB oracle — same md5 order, same
windows). Reference repo has no packing surface; this is part of the
beyond-reference LLM-pipeline coverage (SURVEY §2.10-adjacent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cminer_spark.pipeline.curation import split_hash

__all__ = ["pack_sequences", "pack_stats"]


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    groups: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Assign every document to a training bin.

    Returns ``(doc_id, n_tokens, pack_group, bin_idx, bin_id)`` where
    ``bin_id = pack_group + groups * bin_idx`` is globally unique.
    ``groups`` bounds window-partition size (and hence executor sort
    memory): size it so corpus_tokens / groups fits a task comfortably.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    n_tokens = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(F.split(F.col(text_col), " +"))
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.alias("n_tokens"),
        F.floor(split_hash(id_col, seed) * groups).cast("int").alias(
            "pack_group"
        ),
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{int(seed)}")))
        .alias("_ord"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("_ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = base.select(
        "doc_id",
        "n_tokens",
        "pack_group",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            / F.lit(int(max_tokens))
        )
        .cast("long")
        .alias("bin_idx"),
    )
    return packed.withColumn(
        "bin_id", F.col("pack_group") + F.lit(int(groups)) * F.col("bin_idx")
    )


def pack_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-bin utilization report for :func:`pack_sequences` output:
    ``(bin_id, n_docs, bin_tokens, overflow)`` — ``overflow`` is the
    boundary excess of the bin's last doc (0 for exactly-full or
    under-full bins)."""
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.greatest(
            F.lit(0).cast("long"),
            (F.sum("n_tokens") - F.lit(int(max_tokens))).cast("long"),
        ).alias("overflow"),
    )
