"""Structured Streaming edge extraction: stateful pairing across
micro-batches must equal the batch kernel's output."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cminer_spark.operators import extract_edges
from cminer_spark.streaming import stream_edges, stream_tool_invocation_counts
from cminer_spark.synth import synth_transcripts


def _run_stream(spark, src_dir, build, out_name, output_mode="append"):
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
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_name)


def _write_in_turn_order(t, src, ranges):
    """Write sequential single-file appends split by turn_idx so the
    file source replays each conversation's turns in order across
    micro-batches (stateful pairing assumes in-order delivery)."""
    import time

    for lo, hi in ranges:
        (
            t.where((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.2)  # distinct modification times → stable file order


def test_stream_edges_match_batch(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=80, seed=5)
    src = str(tmp_path / "turns")
    # conversations straddle the appends, exercising cross-micro-batch
    # state; appends arrive in turn order (see _write_in_turn_order)
    _write_in_turn_order(t, src, [(0, 3), (3, 7), (7, 10**9)])

    got = _run_stream(spark, src, stream_edges, "edges_stream_out")
    want = extract_edges(spark.read.parquet(src))
    g = {(r.src_key, r.dst_key, r.type) for r in got.collect()}
    w = {(r.src_key, r.dst_key, r.type) for r in want.collect()}
    assert g == w


def test_stream_windowed_tool_counts(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=60, seed=6)
    src = str(tmp_path / "turns2")
    t.write.parquet(src)
    # append mode would only emit windows the watermark has passed
    # (under availableNow the watermark advances between micro-batches,
    # so the final windows never close) — complete mode shows every
    # window, which must equal the batch aggregation exactly.
    got = _run_stream(
        spark,
        src,
        lambda s: stream_tool_invocation_counts(s, window="1 hour"),
        "tool_counts_out",
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(src)
        .where(F.col("tool").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "tool")
        .agg(F.count(F.lit(1)).alias("n_invocations"))
    )
    assert got.agg(F.sum("n_invocations")).collect()[0][0] == batch.agg(
        F.sum("n_invocations")
    ).collect()[0][0]
    assert got.count() == batch.count()


def test_stream_edges_gappy_and_redelivered(spark, tmp_path):
    """Non-dense turn_idx must pair with the previous EXISTING turn
    (batch parity), and re-delivered rows must not re-emit edges."""
    batch1 = [
        # conversation c1 with gaps: 0, 2 — and c2 starting at 7
        ("c1", 0, "user", "hi", None),
        ("c1", 2, "assistant", "yo", "search"),
        ("c2", 7, "user", "start", None),
    ]
    batch2 = [
        ("c1", 2, "assistant", "yo", "search"),  # duplicate delivery
        ("c1", 5, "user", "bye", None),
        ("c2", 9, "assistant", "mid", "calc"),
    ]
    import datetime
    import time

    t0 = datetime.datetime(2026, 1, 1)

    def _df(rows):
        return spark.createDataFrame(
            [
                (c, i, r, x, tl, t0 + datetime.timedelta(minutes=i))
                for c, i, r, x, tl in rows
            ],
            schema="conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp",
        )

    src = str(tmp_path / "turns_gappy")
    _df(batch1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.2)
    _df(batch2).coalesce(1).write.mode("append").parquet(src)

    got = _run_stream(spark, src, stream_edges, "edges_gappy_out")
    g = {(r.src_key, r.dst_key, r.type) for r in got.collect()}
    assert g == {
        ("c1#2", "c1#0", "replies_to"),
        ("c1#2", "tool:search", "invokes"),
        ("c1#5", "c1#2", "replies_to"),
        ("c2#9", "c2#7", "replies_to"),
        ("c2#9", "tool:calc", "invokes"),
    }
    # exactly-once despite the duplicate row: no repeated edge rows
    assert got.count() == len(g)


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Drained streaming dedup must keep exactly one row per distinct
    text hash, and for cross-micro-batch duplicates the FIRST batch's
    copy (state suppresses the later arrival)."""
    import time

    from cminer_spark.streaming import stream_exact_dedup

    src = str(tmp_path / "docs")
    rows1 = [(1, "alpha beta"), (2, "gamma"), (3, "alpha beta")]
    rows2 = [(10, "alpha beta"), (11, "delta"), (12, "gamma")]
    schema = "doc_id long, text string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.2)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream_out").collect()

    hashes = [r.text_hash for r in got]
    assert len(hashes) == len(set(hashes)) == 3  # alpha beta / gamma / delta
    kept = {r.text: r.doc_id for r in got}
    # cross-batch duplicates suppressed: batch-1 copies win
    assert kept["alpha beta"] in (1, 3)  # within-batch winner is either copy
    assert kept["gamma"] == 2
    assert kept["delta"] == 11
    # batch twin agrees on the distinct hash set
    from cminer_spark.pipeline import exact_duplicates

    batch = exact_duplicates(spark.read.parquet(src))
    assert {r.text_hash for r in batch.collect()} == set(hashes)


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Per-key in-order delivery across micro-batches: the streamed
    (user, event, session_idx) labeling equals the batch operator's."""
    from cminer_spark.operators.temporal import sessionize
    from cminer_spark.streaming import stream_sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events")
    # split by global ts quartiles: per-user order preserved
    import time

    qs = (
        ev.select(F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .approxQuantile("us", [0.25, 0.5, 0.75], 0.0)
    )
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.unix_micros(F.col("ts").cast("timestamp")) > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.unix_micros(F.col("ts").cast("timestamp")) <= bounds[i + 1])
        part.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.2)

    schema = ev.schema

    def build(stream):
        return stream_sessionize(stream, gap_seconds=1800)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("sess_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_id): r.session_idx
        for r in spark.table("sess_stream_out").collect()
    }
    batch = sessionize(
        spark.read.parquet(src),
        key="user_id",
        ts="ts",
        gap_seconds=1800,
        tie_cols=("event_id",),
    )
    want = {
        (r.user_id, r.event_id): r.session_idx for r in batch.collect()
    }
    assert got == want
    assert max(got.values()) > 0  # multiple sessions actually occur
