"""Dialogue training-pair assembly over transcript tables.

The north-rule input is a multi-turn conversation table
``(conv_id, turn_idx, role, text, tool, ts)``; the canonical
training-data prep over it is (context, response) pair construction:
for every turn of a target role, concatenate the preceding ``history``
turns into a context string under STABLE turn ordering — the same
per-conversation ordering contract the edge-extraction invariant
guards (reference parity: CMiner orders graph rows deterministically
before keying; see /root/reference/src/CMiner.py solution ordering —
here the ordering is turn_idx within conv_id).

Scale design: ONE hash shuffle on ``conv_id`` feeds a bounded sliding
window (``rowsBetween(-history, -1)``) — per-row state is O(history),
never O(conversation), so a 10^6-turn pathological conversation costs
its sort but no quadratic blowup; the concat runs entirely in
whole-stage codegen (collect_list over the bounded frame → sort →
transform → array_join — no Python). With conv_id-bucketed transcript
storage (sources/bucketed.py) the shuffle disappears entirely, the
same way it does for edge extraction.

Formatting contract (shared with the SQL oracle): each history turn
renders as ``role + ': ' + coalesce(text, '')``, joined by ``\\n``;
empty history renders as ``''`` (not NULL), so turn-0 responses are
distinguishable from dropped rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["build_training_pairs"]


def build_training_pairs(
    transcripts: DataFrame,
    history: int = 3,
    target_role: str = "assistant",
) -> DataFrame:
    """Build (context, response) pairs from ``transcripts(conv_id,
    turn_idx, role, text, ...)``.

    Returns ``(conv_id, turn_idx, n_context_turns, context, response)``
    — one row per turn whose ``role == target_role``, with ``context``
    the previous ``history`` turns formatted ``role: text`` and joined
    by newlines (oldest first).
    """
    if history < 1:
        raise ValueError("history must be >= 1")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-history, -1)
    )
    line = F.concat(
        F.col("role"), F.lit(": "), F.coalesce(F.col("text"), F.lit(""))
    )
    ctx = F.collect_list(F.struct("turn_idx", line.alias("line"))).over(w)
    with_ctx = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.coalesce(F.col("text"), F.lit("")).alias("response"),
        ctx.alias("ctx"),
    )
    return with_ctx.where(F.col("role") == target_role).select(
        "conv_id",
        "turn_idx",
        F.size("ctx").cast("long").alias("n_context_turns"),
        F.array_join(
            F.transform(F.sort_array("ctx"), lambda s: s["line"]), "\n"
        ).alias("context"),
        "response",
    )
