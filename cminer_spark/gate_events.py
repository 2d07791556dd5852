"""Gate queries + DuckDB oracles for the temporal/event operators
(sessionize, as-of join, funnel).

All run on the ``events`` parquet table ``(event_id, ts, user_id,
event_type, value, props)``. Timestamps are emitted as epoch
microseconds (``unix_micros`` / ``epoch_us``) so both engines compare
exact int64s, never timezone-rendered strings; float payloads are
rounded to 6 places on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cminer_spark.operators.temporal import (
    _unix_micros,
    asof_join,
    funnel,
    retention_cohorts,
    sessionize,
)

SESSION_GAP_SECONDS = 1800
FUNNEL_STEPS = ("signup", "view", "purchase")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ----------------------------------------------------------------------
# spark-side queries
# ----------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sessionize(
        _events(spark, sf_dir),
        key="user_id",
        ts="ts",
        gap_seconds=SESSION_GAP_SECONDS,
        tie_cols=("event_id",),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(_unix_micros(F.col("ts"))).alias("start_us"),
        F.max(_unix_micros(F.col("ts"))).alias("end_us"),
    )


def q_asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        views.withColumnRenamed("event_id", "view_event_id"),
        key="user_id",
        ts="ts",
        right_cols=["view_event_id", "value"],
        right_tie=("view_event_id",),
    )
    return out.select(
        "event_id",
        "user_id",
        _unix_micros(F.col("ts")).alias("ts_us"),
        F.round("value", 6).alias("purchase_value"),
        F.col("asof_view_event_id").alias("view_event_id"),
        F.round("asof_value", 6).alias("view_value"),
        _unix_micros(F.col("asof_ts")).alias("view_ts_us"),
    )


def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.operators.graph import cooccurrence

    return cooccurrence(
        _events(spark, sf_dir), entity_col="user_id", item_col="event_type"
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(
        _events(spark, sf_dir),
        steps=list(FUNNEL_STEPS),
        key="user_id",
        ts="ts",
        type_col="event_type",
    )


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

def sessionize_oracle_sql(gap_seconds: int = SESSION_GAP_SECONDS) -> str:
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
WITH lagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
  FROM events
), flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM lagged
), sess AS (
  SELECT user_id, us,
         sum(is_new) OVER (
           PARTITION BY user_id ORDER BY us ASC, event_id ASC
           ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       min(us) AS start_us, max(us) AS end_us
FROM sess GROUP BY user_id, session_idx
"""


def asof_oracle_sql() -> str:
    return """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
), v AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'view'
), ranked AS (
  SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
         round(p.value, 6) AS purchase_value,
         v.event_id AS view_event_id,
         round(v.value, 6) AS view_value,
         epoch_us(v.ts) AS view_ts_us,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY v.ts DESC, v.event_id DESC) AS rn
  FROM p LEFT JOIN v
    ON v.user_id = p.user_id AND v.ts <= p.ts
)
SELECT event_id, user_id, ts_us, purchase_value,
       view_event_id, view_value, view_ts_us
FROM ranked WHERE rn = 1
"""


def funnel_oracle_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    parts = [
        f"""
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{steps[0]}' GROUP BY user_id
)"""
    ]
    for i, step in enumerate(steps[1:], start=1):
        parts.append(
            f""",
s{i} AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s{i-1} USING (user_id)
  WHERE e.event_type = '{step}' AND e.ts > s{i-1}.t
  GROUP BY e.user_id
)"""
        )
    selects = [
        f"SELECT '{step}' AS step, CAST({i} AS BIGINT) AS step_idx, "
        f"count(*) AS users FROM s{i}"
        for i, step in enumerate(steps)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


COOCCURRENCE_SQL = """
WITH m AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS item_a, b.event_type AS item_b,
       count(*) AS n_entities
FROM m a JOIN m b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


REACH_SOURCES = [0, 1, 2, 3, 4]
REACH_HOPS = 2


def _handoff_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamped user->user 'handoff' edges: u -> v when v fires the
    NEXT event of the same event_type after u (ts = v's event time,
    epoch micros). Deterministic, self-loop-free, and mirrored
    verbatim by the oracle's lag-window CTE."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            F.lag("user_id").over(w).alias("src"),
            F.col("user_id").alias("dst"),
            _unix_micros(F.col("ts")).alias("ts_us"),
        )
        .where(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    )


def q_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cminer_spark.operators.temporal import temporal_reachability

    return temporal_reachability(
        _handoff_edges(spark, sf_dir),
        sources=REACH_SOURCES,
        max_hops=REACH_HOPS,
    )


def queries():
    return {
        "sessionize_30m": q_sessionize,
        "asof_view_before_purchase": q_asof_view_before_purchase,
        "funnel_signup_view_purchase": q_funnel,
        "event_cooccurrence": q_cooccurrence,
        "temporal_reach_k2": q_temporal_reach,
        "retention_weekly": q_retention,
    }


def reach_oracle_sql(
    sources: list[int] = REACH_SOURCES, max_hops: int = REACH_HOPS
) -> str:
    """Unrolled earliest-arrival BFS over the handoff-edge CTE: per
    hop, candidates = frontier x edges with STRICTLY increasing ts,
    frontier = min arrival per (source, node); output = argmin
    (arrive_ts, hops) over all hops' candidates."""
    src = ", ".join(f"({int(s)})" for s in sources)
    parts = [
        f"""edges AS MATERIALIZED (
  SELECT src, dst, ts_us FROM (
    SELECT lag(user_id) OVER (
             PARTITION BY event_type ORDER BY ts ASC, event_id ASC
           ) AS src,
           user_id AS dst,
           epoch_us(ts) AS ts_us
    FROM events
  ) WHERE src IS NOT NULL AND src <> dst
),
f0 AS (SELECT s.source, s.source AS node, CAST(0 AS BIGINT) AS arrive_ts
       FROM (VALUES {src}) s(source))"""
    ]
    for h in range(1, max_hops + 1):
        parts.append(
            f"""cand{h} AS (
  SELECT f.source, e.dst AS node, min(e.ts_us) AS arrive_ts,
         CAST({h} AS BIGINT) AS hops
  FROM f{h - 1} f JOIN edges e
    ON e.src = f.node AND e.ts_us > f.arrive_ts
  GROUP BY f.source, e.dst
),
f{h} AS (SELECT source, node, arrive_ts FROM cand{h})"""
        )
    union = "\nUNION ALL\n".join(
        f"  SELECT * FROM cand{h}" for h in range(1, max_hops + 1)
    )
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT source, node, arrive_ts, hops FROM (
  SELECT source, node, arrive_ts, hops,
         row_number() OVER (PARTITION BY source, node
                            ORDER BY arrive_ts ASC, hops ASC) AS rn
  FROM ({union})
) WHERE rn = 1
"""


RETENTION_PERIOD_SECONDS = 7 * 86400


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohorts(
        _events(spark, sf_dir), period_seconds=RETENTION_PERIOD_SECONDS
    )


def retention_oracle_sql(period_seconds: int = RETENTION_PERIOD_SECONDS) -> str:
    """Mirror of operators.temporal.retention_cohorts: integer period
    index floor(epoch_us / period_us), cohort = min period per user."""
    per_us = period_seconds * 1_000_000
    return f"""
WITH act AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(epoch_us(ts) / {per_us}) AS BIGINT) AS per
  FROM events
),
coh AS (SELECT u, min(per) AS cohort FROM act GROUP BY u),
sizes AS (SELECT cohort, count(*) AS n_cohort FROM coh GROUP BY cohort),
grid AS (
  SELECT c.cohort, a.per - c.cohort AS period_offset, count(*) AS n_active
  FROM act a JOIN coh c USING (u) GROUP BY 1, 2
)
SELECT g.cohort, g.period_offset,
       CAST(s.n_cohort AS BIGINT) AS n_cohort,
       CAST(g.n_active AS BIGINT) AS n_active,
       round(g.n_active * 1.0 / s.n_cohort, 6) AS retention
FROM grid g JOIN sizes s USING (cohort)
"""


def oracles():
    return {
        "sessionize_30m": sessionize_oracle_sql(),
        "asof_view_before_purchase": asof_oracle_sql(),
        "funnel_signup_view_purchase": funnel_oracle_sql(),
        "event_cooccurrence": COOCCURRENCE_SQL,
        "temporal_reach_k2": reach_oracle_sql(),
        "retention_weekly": retention_oracle_sql(),
    }
