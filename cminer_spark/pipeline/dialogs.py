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

__all__ = [
    "build_training_pairs",
    "conversation_stats",
    "filter_conversations",
    "tool_transitions",
]


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
    line = F.concat(
        F.col("role"), F.lit(": "), F.coalesce(F.col("text"), F.lit(""))
    )
    # Secondary order key: turn_idx SHOULD be unique per conv_id
    # (sources/validate.py checks it), but if a feed violates that,
    # ordering by (turn_idx, rendered line) keeps frame membership and
    # concatenation order deterministic and engine-portable — the SQL
    # oracle orders its window frame identically.
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx"), line)
        .rowsBetween(-history, -1)
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


def conversation_stats(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation structural stats: ``(conv_id, n_turns,
    n_user_turns, n_assistant_turns, n_tool_turns,
    n_alternation_breaks, user_chars, assistant_chars,
    assistant_char_ratio)`` — the inputs to dialog-level quality
    filtering (SFT corpora drop conversations that are too short,
    never alternate, or are all-assistant boilerplate).

    ``n_alternation_breaks`` counts turns whose role equals the
    previous turn's role (stable turn order). One window pass for the
    lag + ONE conv-keyed aggregate; both shuffle on the uniform
    conv_id key, the same partitioning extraction uses.
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    t = transcripts.select(
        F.col(conv_col).alias("conv_id"),
        F.col(role_col).alias("role"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("chars"),
        (F.lag(role_col).over(w) == F.col(role_col)).alias("brk"),
    )
    uch = F.sum(F.when(F.col("role") == "user", F.col("chars")).otherwise(0))
    ach = F.sum(
        F.when(F.col("role") == "assistant", F.col("chars")).otherwise(0)
    )
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user_turns"),
        F.sum((F.col("role") == "assistant").cast("long")).alias(
            "n_assistant_turns"
        ),
        F.sum((F.col("role") == "tool").cast("long")).alias("n_tool_turns"),
        F.sum(F.coalesce(F.col("brk"), F.lit(False)).cast("long")).alias(
            "n_alternation_breaks"
        ),
        uch.cast("long").alias("user_chars"),
        ach.cast("long").alias("assistant_chars"),
        F.round(
            F.when(uch > 0, ach.cast("double") / uch).otherwise(0.0), 6
        ).alias("assistant_char_ratio"),
    )


def filter_conversations(
    transcripts: DataFrame,
    min_turns: int = 2,
    max_turns: int = 512,
    max_alternation_breaks: int | None = None,
    min_assistant_turns: int = 1,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Dialog-level quality gate: :func:`conversation_stats` plus a
    ``keep`` flag and the FIRST failed rule in ``fail_reason``
    (``too_short`` → ``too_long`` → ``no_assistant`` →
    ``alternation``; null when kept) — the transcript analog of the
    Gopher document filters. Pure column predicates over the stats
    frame; no extra shuffle.
    """
    st = conversation_stats(transcripts, conv_col, turn_col, role_col, text_col)
    reason = (
        F.when(F.col("n_turns") < min_turns, F.lit("too_short"))
        .when(F.col("n_turns") > max_turns, F.lit("too_long"))
        .when(
            F.col("n_assistant_turns") < min_assistant_turns,
            F.lit("no_assistant"),
        )
    )
    if max_alternation_breaks is not None:
        reason = reason.when(
            F.col("n_alternation_breaks") > max_alternation_breaks,
            F.lit("alternation"),
        )
    return st.select(
        "*",
        reason.isNull().alias("keep"),
        reason.alias("fail_reason"),
    )


def tool_transitions(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """First-order tool-invocation Markov chain over agent
    transcripts: ``(prev_tool, tool, n, p)`` — how often ``tool``
    follows ``prev_tool`` within a conversation (stable turn order,
    non-tool turns skipped), with ``p`` the row-normalized transition
    probability. The agent-behavior analytics behind tool-routing /
    anomaly dashboards.

    Chain starts are emitted with ``prev_tool = '^'`` (so every
    invocation appears exactly once as a destination and the per-
    ``prev_tool`` probabilities sum to 1 over observed successors).

    One conv-keyed window pass (the extraction partitioning) + one
    low-cardinality (prev, cur) aggregate; the normalizing total rides
    a window over the tiny aggregate, not the event stream.
    """
    seq = (
        transcripts.where(F.col(tool_col).isNotNull())
        .select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).alias("turn_idx"),
            F.col(tool_col).alias("tool"),
        )
        .select(
            F.coalesce(
                F.lag("tool").over(
                    Window.partitionBy("conv_id").orderBy("turn_idx")
                ),
                F.lit("^"),
            ).alias("prev_tool"),
            "tool",
        )
    )
    counts = seq.groupBy("prev_tool", "tool").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = Window.partitionBy("prev_tool")
    return counts.select(
        "prev_tool",
        "tool",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )
