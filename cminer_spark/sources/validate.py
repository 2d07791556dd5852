"""Input-contract validation for the transcripts table.

The north-rule input (``conv_id, turn_idx, role, text, tool, ts``)
carries implicit invariants the edge-extraction kernel relies on:
non-null keys, per-conversation turn indexes that are unique and
dense from 0, timestamps that do not regress along the turn order,
and a closed role vocabulary. At 10^12 rows you cannot eyeball them —
this operator measures every violation class in ONE pass:

* a single hash shuffle on ``conv_id`` (one groupBy + one window over
  the same partitioning — Catalyst reuses the exchange);
* pure built-in expressions, whole-stage codegen, no Python;
* returns ONE summary row, so the driver cost is constant.

Use it as an ingest gate: a non-zero violation count means the
downstream per-turn pairing (and therefore every derived edge) is
suspect for those conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID_ROLES = ("user", "assistant", "system", "tool")

__all__ = ["VALID_ROLES", "validate_transcripts"]


def validate_transcripts(
    transcripts: DataFrame, roles: tuple[str, ...] = VALID_ROLES
) -> DataFrame:
    """One summary row:

    ``(n_rows, n_convs, n_null_conv_id, n_null_turn_idx, n_dup_turns,
    n_gap_convs, n_ts_regressions, n_bad_role)``

    * ``n_dup_turns`` — rows beyond the first per (conv_id, turn_idx);
    * ``n_gap_convs`` — conversations whose distinct turn indexes are
      not exactly 0..max (missing or negative indexes);
    * ``n_ts_regressions`` — rows whose ts is strictly below the
      previous turn's ts within the conversation (null-key rows are
      excluded from the per-conversation checks and reported via the
      null counters instead).
    """
    t = transcripts.select("conv_id", "turn_idx", "role", "ts")
    keyed = t.where(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )
    # secondary ts order makes the regression count deterministic even
    # when turn_idx itself is duplicated (one of the violations we
    # measure) — fully-tied rows compare equal either way
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    per_row = keyed.select(
        "conv_id",
        "turn_idx",
        (F.col("ts") < F.lag("ts").over(w)).alias("_regr"),
    )
    per_conv = per_row.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.count_distinct("turn_idx").alias("_nd"),
        F.max("turn_idx").alias("_mx"),
        F.min("turn_idx").alias("_mn"),
        F.sum(F.when(F.col("_regr"), 1).otherwise(0)).alias("_regrs"),
    )
    conv_stats = per_conv.agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.sum(F.col("_n") - F.col("_nd")).alias("n_dup_turns"),
        F.sum(
            F.when(
                (F.col("_mn") != 0) | (F.col("_nd") != F.col("_mx") + 1),
                1,
            ).otherwise(0)
        ).alias("n_gap_convs"),
        F.sum("_regrs").alias("n_ts_regressions"),
    )
    row_stats = t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("conv_id").isNull(), 1).otherwise(0)).alias(
            "n_null_conv_id"
        ),
        F.sum(F.when(F.col("turn_idx").isNull(), 1).otherwise(0)).alias(
            "n_null_turn_idx"
        ),
        F.sum(
            F.when(~F.col("role").isin(*roles) | F.col("role").isNull(), 1)
            .otherwise(0)
        ).alias("n_bad_role"),
    )
    # every sum() coalesces: aggregates over zero rows return null
    out = row_stats.crossJoin(conv_stats).select(
        "n_rows",
        "n_convs",
        F.coalesce("n_null_conv_id", F.lit(0)).alias("n_null_conv_id"),
        F.coalesce("n_null_turn_idx", F.lit(0)).alias("n_null_turn_idx"),
        F.coalesce("n_dup_turns", F.lit(0)).alias("n_dup_turns"),
        F.coalesce("n_gap_convs", F.lit(0)).alias("n_gap_convs"),
        F.coalesce("n_ts_regressions", F.lit(0)).alias("n_ts_regressions"),
        F.coalesce("n_bad_role", F.lit(0)).alias("n_bad_role"),
    )
    return out
