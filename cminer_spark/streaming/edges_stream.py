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

Pairing semantics match the batch kernel
(:func:`cminer_spark.operators.edges.extract_edges`): a turn pairs
with the *previous existing* turn of its conversation (tracked in
state), not with the arithmetic ``turn_idx - 1`` — so gappy turn
indices produce identical edges in both paths. Rows at or below the
stored predecessor index (``turn_idx <= last_idx``) are suppressed,
making the output idempotent under at-least-once upstream delivery.
Delivery-order assumption: turns of a conversation must arrive in
turn_idx order *across* micro-batches (log shippers preserve this);
a genuinely out-of-order old turn is indistinguishable from a replay
and is dropped rather than mis-paired.
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
    conversation's new turns.

    State holds the conversation's latest processed turn_idx. Each new
    turn pairs with the *stored predecessor* (batch parity: previous
    existing row, not arithmetic idx-1); turns at or below the stored
    index are re-deliveries and are skipped (idempotence)."""
    (conv_id,) = key
    last_idx = state.get[0] if state.exists else -1
    for pdf in pdfs:
        # vectorized over the Arrow batch — no per-row Python:
        # sort + filter(> last_idx) + dedup ≡ the monotone row-wise
        # replay check; shift(fill=last_idx) pairs each turn with its
        # previous EXISTING turn (batch parity on gappy indices)
        pdf = (
            pdf.sort_values("turn_idx")
            .loc[lambda d: d["turn_idx"] > last_idx]
            .drop_duplicates(subset="turn_idx")
        )
        if not len(pdf):
            continue
        idx = pdf["turn_idx"].astype("int64")
        prev = idx.shift(1, fill_value=last_idx)
        src = conv_id + "#" + idx.astype(str)
        rmask = prev >= 0  # first turn ever has no predecessor
        tmask = pdf["tool"].notna() & (pdf["tool"] != "")
        replies = pd.DataFrame(
            {
                "src_key": src[rmask],
                "dst_key": conv_id + "#" + prev[rmask].astype(str),
                "type": "replies_to",
                "weight": 1.0,
            }
        )
        invokes = pd.DataFrame(
            {
                "src_key": src[tmask],
                "dst_key": "tool:" + pdf.loc[tmask, "tool"].astype(str),
                "type": "invokes",
                "weight": 1.0,
            }
        )
        last_idx = int(idx.iloc[-1])
        out = pd.concat([replies, invokes])
        if len(out):
            yield out
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
    """Watermarked windowed counts of tool invocations per tool.

    Late turns beyond the watermark are dropped (Structured Streaming
    semantics). Emission-mode note: in ``append`` mode a window is only
    emitted once the watermark passes its end — under an
    ``availableNow`` drain the watermark advances *between*
    micro-batches, so windows later than (max event time − watermark)
    never close and never appear. Run this aggregation with
    ``update``/``complete`` output mode (keyed sink upsert) when every
    in-flight window must be visible, reserving ``append`` for
    closed-window-only consumers."""
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
