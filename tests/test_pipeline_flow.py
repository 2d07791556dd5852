"""End-to-end training-data pipeline composition: the operators chain
on the real documents table the way a corpus build would use them —
normalize → line dedup → quality filter → corpus-fit score →
decontaminate → split → chunk → pack. Asserts each stage's contract
holds THROUGH the composition (not just in isolation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cminer_spark.pipeline import (
    chunk_documents,
    decontaminate,
    deterministic_split,
    gopher_quality_filters,
    line_dedup,
    normalize_text,
    unigram_logprob,
)
from cminer_spark.pipeline.packing import pack_sequences, pack_stats


def test_full_corpus_flow(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    # 1. canonicalize, then split at ' the ' to get multi-line docs
    #    (same construction as the line-dedup gate)
    norm = normalize_text(docs).select(
        "doc_id",
        F.replace(
            F.col("text_norm"), F.lit(" the "), F.lit("\n")
        ).alias("text"),
        "source",
    )

    # 2. line-level dedup: doc count preserved, lines only shrink
    deduped = line_dedup(norm)
    assert deduped.count() == n0
    assert deduped.where(F.col("n_lines_kept") > F.col("n_lines")).count() == 0
    cleaned = deduped.select(
        "doc_id",
        F.replace(F.col("text_clean"), F.lit("\n"), F.lit(" ")).alias("text"),
    ).where(F.length("text") > 0)

    # 3. quality rules on the cleaned text
    flagged = gopher_quality_filters(cleaned, min_words=5, min_stopwords=0)
    kept = flagged.where(F.col("pass_filter")).select("doc_id")
    assert kept.count() > 0
    survivors = cleaned.join(kept, "doc_id")

    # 4. corpus-fit score exists for every survivor
    scored = unigram_logprob(survivors)
    assert scored.count() == survivors.count()
    assert scored.where(F.col("logprob_per_token") >= 0).count() == 0

    # 5. decontaminate against a fake eval set built from 3 docs
    eval_docs = survivors.limit(3)
    clean = decontaminate(survivors, eval_docs, n=8)
    assert clean.count() <= survivors.count()

    # 6. deterministic split covers everything exactly once
    split = deterministic_split(
        clean, {"train": 0.9, "val": 0.1}, seed=3
    )
    assert split.count() == clean.count()
    assert split.where(~F.col("split").isin("train", "val")).count() == 0

    # 7. chunk the train split, then pack chunks into 64-token bins
    train = split.where(F.col("split") == "train")
    chunks = chunk_documents(train, chunk_tokens=32, stride=32)
    assert chunks.where(F.col("n_tokens") > 32).count() == 0
    chunk_docs = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
        F.col("n_tokens"),
    )
    packed = pack_sequences(
        chunk_docs, max_tokens=64, tokens_col="n_tokens", groups=7
    )
    assert packed.count() == chunk_docs.count()  # every chunk binned
    stats = pack_stats(packed, max_tokens=64)
    # bounded boundary overflow: any overflowing bin exceeds by less
    # than one chunk (32 tokens)
    assert stats.where(F.col("overflow") >= 32).count() == 0
