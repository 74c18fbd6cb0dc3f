"""Time-decayed per-user activity scoring over a raw event log — the
recency-weighted engagement feature behind churn models and user-level
curation weights (``plans.analytics.markov_transitions`` covers the
sequence-transition side of this family).

Integer-exact (power-of-two weekly decay, milli-units via integer
division), so the DuckDB twin matches bit-for-bit.

Scale shape: the decay anchor (max event day) is derived IN-PLAN as a
1-row broadcast aggregate (never an eager count — the ks_drift lesson),
folded onto the scan by a broadcast cross join; scoring is then one
map-side-combinable groupBy on user_id. Weekly half-life decay
``1000 div 2^age_weeks`` truncates to 0 past 10 weeks, so scores are
bounded and exact.

No counterpart in the reference (event-analytics extension surface,
alongside ``sessionize`` / ``seq_match`` / ``window_funnel``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_AGE_WEEKS = 20  # 1000 div 2^10 is already 0; 20 caps the shift safely


def decayed_activity(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user activity score with weekly power-of-two time decay
    anchored at the corpus max event day: each event contributes
    ``1000 div 2^(age_days div 7)`` milli-points (0 past 10 weeks).
    Returns ``(user_id, n_events, score_milli, last_day)`` by user."""
    days = events.select(
        F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("day")
    )
    anchor = days.agg(F.max("day").alias("anchor_day"))
    scored = (
        days.crossJoin(F.broadcast(anchor))
        .withColumn(
            "age_w",
            F.expr("datediff(anchor_day, day) div 7"),
        )
        .withColumn(
            "decay_milli",
            F.expr(
                f"1000 div shiftleft(1L, least(age_w, {MAX_AGE_WEEKS}))"
            ),
        )
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("decay_milli").alias("score_milli"),
            F.max("day").alias("last_day"),
        )
        .orderBy("user_id")
    )


def decayed_activity_oracle_sql(table: str = "events") -> str:
    return f"""
WITH days AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM {table}
),
anchor AS (SELECT max(day) AS anchor_day FROM days),
scored AS (
  SELECT user_id, day,
         1000 // (CAST(1 AS BIGINT) << least(
           date_diff('day', day, (SELECT anchor_day FROM anchor)) // 7,
           {MAX_AGE_WEEKS})) AS decay_milli
  FROM days
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(decay_milli) AS BIGINT) AS score_milli,
       max(day) AS last_day
FROM scored
GROUP BY user_id
ORDER BY user_id
"""
