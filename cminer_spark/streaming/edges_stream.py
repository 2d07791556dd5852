"""Structured Streaming edge extraction over a transcripts stream.

The reference has NO streaming constructs (SURVEY §2.9) — this module
is the noted extension: the same edge semantics as
:mod:`cminer_spark.operators.edges`, expressed incrementally.

* ``stream_edges`` — stateful consecutive-turn pairing with
  ``transformWithStateInPandas``-style state: per conversation we keep
  the latest (turn_idx, vertex key) so a turn arriving in a later
  micro-batch still pairs with its predecessor. Implemented with
  ``applyInPandasWithState`` (Arrow-batched, GroupState per conv_id).
* ``stream_tool_invocation_counts`` — watermarked sliding-window
  aggregation of tool-invocation edges (late data dropped after the
  watermark), the canonical windowed-agg shape.

Late/out-of-order turns: pairing assumes turns arrive in turn_idx
order per conversation (the generator and any log shipper preserve
this); a turn older than the stored state is emitted as an edge to
its (idx-1) key anyway — deterministic, idempotent output.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_EDGE_SCHEMA = "src_key string, dst_key string, type string, weight double"
_STATE_SCHEMA = "last_idx int"


def _pair_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: emit replies_to/invokes edges for one
    conversation's new turns; remember the max turn_idx seen."""
    (conv_id,) = key
    last_idx = state.get[0] if state.exists else -1
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        rows_src, rows_dst, rows_type = [], [], []
        for turn_idx, tool in zip(pdf["turn_idx"], pdf["tool"]):
            if turn_idx > 0:
                rows_src.append(f"{conv_id}#{turn_idx}")
                rows_dst.append(f"{conv_id}#{turn_idx - 1}")
                rows_type.append("replies_to")
            if isinstance(tool, str) and tool:
                rows_src.append(f"{conv_id}#{turn_idx}")
                rows_dst.append(f"tool:{tool}")
                rows_type.append("invokes")
            if turn_idx > last_idx:
                last_idx = int(turn_idx)
        if rows_src:
            yield pd.DataFrame(
                {
                    "src_key": rows_src,
                    "dst_key": rows_dst,
                    "type": rows_type,
                    "weight": 1.0,
                }
            )
    state.update((last_idx,))


def stream_edges(transcripts_stream: DataFrame) -> DataFrame:
    """Streaming transcripts → streaming edge frame (append mode).

    Input must be a streaming DataFrame with the transcripts schema.
    """
    return (
        transcripts_stream.select("conv_id", "turn_idx", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _pair_group,
            outputStructType=_EDGE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .select(
            F.xxhash64("src_key").alias("src"),
            F.xxhash64("dst_key").alias("dst"),
            "type",
            "weight",
            "src_key",
            "dst_key",
        )
    )


def stream_tool_invocation_counts(
    transcripts_stream: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed counts of tool invocations per tool —
    late turns beyond the watermark are dropped (Structured Streaming
    semantics); output is append-mode-compatible once windows close."""
    return (
        transcripts_stream.where(
            F.col("tool").isNotNull() & (F.col("tool") != "")
        )
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide or window).alias("w"),
            F.col("tool"),
        )
        .agg(F.count(F.lit(1)).alias("n_invocations"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tool",
            "n_invocations",
        )
    )
