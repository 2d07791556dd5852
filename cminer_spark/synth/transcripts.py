"""Deterministic synthetic transcripts table.

Produces the authoritative engine input shape (BASELINE.json
``input_hint``): ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)``.

Determinism strategy: every value is a pure function of
``(seed, conv index, turn index)`` computed with JVM-side
``xxhash64`` — no wall clock, no Python RNG, no dependence on
partitioning. The same call always produces the identical table, at
any parallelism level, which is what makes the two-parallelism
scaling benchmark and resume-equals-fresh tests meaningful.

Skew profile (mirrors real transcript corpora and FIXTURES.md §7):

* conversation lengths are Pareto-ish (a few conversations get very
  many turns) — exercises per-conversation sort skew;
* a small set of "hub" tools covers ~half of all tool calls —
  exercises hot-vertex aggregation skew that the graph layer must
  handle with salting.

The analogue in the reference is the seeded random graph generator
``src/Graph/Graph.py:166-182,498-553`` (G8 in SURVEY §2.7); here the
generator is distributed and columnar instead of driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Vocabulary for deterministic text. Text content matters only through
# the per-turn text-equality invariant, so short pseudo-sentences are
# enough.
_WORDS = (
    "graph rank vertex edge shuffle salt spark turn tool agent plan "
    "join scan merge window filter label triangle component converge"
).split()

_ROLES = ["user", "assistant", "tool", "system"]

N_HUB_TOOLS = 3
N_TAIL_TOOLS = 40
HUB_TOOL_SHARE = 0.5  # fraction of tool turns hitting a hub tool


def _u01(*cols, seed: int) -> F.Column:
    """Deterministic uniform(0,1) from xxhash64 of the given columns."""
    h = F.xxhash64(*cols, F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def synth_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    min_turns: int = 2,
    mean_turns: int = 12,
    max_turns: int = 400,
    partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic transcripts DataFrame.

    Scale note: generation is ``spark.range`` + expressions, so it
    parallelizes linearly — at cluster scale the same code generates
    the 10^12-turn input by raising ``n_convs``; nothing is collected
    to the driver.
    """
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    convs = spark.range(0, n_convs, 1, parts).withColumnRenamed("id", "conv_seq")

    # Pareto-ish conversation length: len = min + scale*(u^(-1/alpha)-1)
    u_len = _u01(F.col("conv_seq"), seed=seed * 7 + 1)
    alpha = 1.6
    scale = float(mean_turns - min_turns) * (alpha - 1.0) / alpha
    n_turns = F.least(
        F.lit(max_turns),
        (
            F.lit(min_turns)
            + F.floor(scale * (F.pow(F.greatest(u_len, F.lit(1e-9)), -1.0 / alpha) - 1.0))
        ).cast("int"),
    )
    convs = convs.withColumn("n_turns", n_turns)

    t = convs.select(
        F.col("conv_seq"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h_role = F.pmod(F.xxhash64("conv_seq", "turn_idx", F.lit(seed * 7 + 2)), F.lit(100))
    # turn 0 is always the user; afterwards roles alternate-ish with a
    # tool-call probability that creates the hub skew downstream.
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .when(h_role < 35, F.lit("assistant"))
        .when(h_role < 60, F.lit("user"))
        .when(h_role < 90, F.lit("tool"))
        .otherwise(F.lit("system"))
    )

    h_tool = F.pmod(F.xxhash64("conv_seq", "turn_idx", F.lit(seed * 7 + 3)), F.lit(1_000_000))
    hub_cut = int(HUB_TOOL_SHARE * 1_000_000)
    tool = F.when(
        role == "tool",
        F.when(
            h_tool < hub_cut,
            F.concat(F.lit("hub_tool_"), F.pmod(h_tool, F.lit(N_HUB_TOOLS))),
        ).otherwise(
            F.concat(F.lit("tool_"), F.pmod(h_tool, F.lit(N_TAIL_TOOLS))),
        ),
    ).otherwise(F.lit(None).cast("string"))

    # Deterministic pseudo-sentence: 6 vocabulary words picked by hash.
    words = F.array(*[F.lit(w) for w in _WORDS])
    text = F.concat_ws(
        " ",
        *[
            F.element_at(
                words,
                (
                    F.pmod(
                        F.xxhash64("conv_seq", "turn_idx", F.lit(seed * 7 + 10 + i)),
                        F.lit(len(_WORDS)),
                    )
                    + 1
                ).cast("int"),
            )
            for i in range(6)
        ],
    )

    # ts: strictly monotone within a conversation (FIXTURES.md §1
    # contract, checked by sources/validate.py), derived from
    # (conv, turn) only and still closed-form (no window/shuffle):
    # offset(turn) = turn*60 + jitter(turn) with jitter < 60, so
    # consecutive turns differ by 60 ± 49 > 0. The previous
    # turn_idx * per-turn-gap form silently regressed (~26% of
    # consecutive pairs) because the multiplier varied per turn.
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    jitter_s = F.pmod(
        F.xxhash64("conv_seq", "turn_idx", F.lit(seed * 7 + 4)), F.lit(50)
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(base)
        + F.pmod(F.xxhash64("conv_seq", F.lit(seed * 7 + 5)), F.lit(86400 * 30))
        + F.col("turn_idx").cast("long") * 60
        + jitter_s
    )

    return t.select(
        F.concat(F.lit("conv-"), F.col("conv_seq")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
