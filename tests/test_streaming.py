"""Structured Streaming edge extraction: stateful pairing across
micro-batches must equal the batch kernel's output."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cminer_spark.operators import extract_edges
from cminer_spark.streaming import stream_edges, stream_tool_invocation_counts
from cminer_spark.synth import synth_transcripts


def _run_stream(spark, src_dir, build, out_name):
    schema = synth_transcripts(spark, 1).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src_dir)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_name)


def test_stream_edges_match_batch(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=80, seed=5)
    src = str(tmp_path / "turns")
    # write multiple files; conversations split across files exercise
    # cross-micro-batch state
    t.repartition(4).write.parquet(src)

    got = _run_stream(spark, src, stream_edges, "edges_stream_out")
    want = extract_edges(spark.read.parquet(src))
    g = {(r.src_key, r.dst_key, r.type) for r in got.collect()}
    w = {(r.src_key, r.dst_key, r.type) for r in want.collect()}
    assert g == w


def test_stream_windowed_tool_counts(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=60, seed=6)
    src = str(tmp_path / "turns2")
    t.write.parquet(src)
    got = _run_stream(
        spark,
        src,
        lambda s: stream_tool_invocation_counts(s, window="1 hour"),
        "tool_counts_out",
    )
    batch = (
        spark.read.parquet(src)
        .where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "tool")
        .agg(F.count(F.lit(1)).alias("n_invocations"))
    )
    # all windows close under availableNow, so totals must agree
    assert got.agg(F.sum("n_invocations")).collect()[0][0] == batch.agg(
        F.sum("n_invocations")
    ).collect()[0][0]
    assert got.count() == batch.count()
