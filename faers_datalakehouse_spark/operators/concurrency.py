"""Peak-concurrency sweep line — "how many sessions were open at once,
per day?", the capacity-planning / rate-limit-sizing query. Each event
opens a fixed-width interval [ts, ts + window); the operator computes
the EXACT maximum overlap per calendar day via the classic +1/-1
boundary sweep, distributed.

The engine piece is a GLOBAL running sum over time-ordered boundary
deltas without a global window: deltas are pre-aggregated per distinct
timestamp (one map-side-combinable groupBy), locally cumsum'd inside
calendar-day buckets, and stitched with an exclusive prefix over the
per-day summary frame (calendar-bounded — the ``abc_classes`` /
``gini_segment`` two-phase prefix idiom). Integer-exact end to end; no
floats anywhere.

Scale shape (100 TB): the only full-size shuffles are the delta
aggregation (keyed by timestamp) and the day-bucketed local window;
the cross-day carry runs over ≤ |days| rows. A naive formulation —
``sum(delta) OVER (ORDER BY t)`` — serializes the entire event stream
through one partition, exactly what the plan-invariant gate forbids.

No counterpart in the reference repo (analytics extension surface,
alongside ``interval_overlap`` / ``sessionize``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def peak_concurrency(
    events: DataFrame,
    ts_col: str = "ts",
    window_minutes: int = 30,
) -> DataFrame:
    """``(day, n_starts, peak_concurrency)`` per calendar day touched
    by any interval boundary, ordered by day.

    ``peak_concurrency`` is the maximum number of simultaneously open
    intervals observed at any boundary instant within the day (the
    running sum is evaluated at boundaries only, which is where the
    maximum of a step function lives).
    """
    # start (+1) and end (-1) boundary events in ONE pass over ``events``
    # (explode, r12): the starts/ends self-union scanned the source twice
    boundaries = events.select(
        F.explode(
            F.array(
                F.struct(F.col(ts_col).alias("t"), F.lit(1).alias("d")),
                F.struct(
                    (
                        F.col(ts_col)
                        + F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
                    ).alias("t"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("ev")
    ).select("ev.t", "ev.d")
    deltas = (
        boundaries
        .groupBy("t")
        .agg(
            F.sum("d").cast("long").alias("net"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_starts"),
        )
        .withColumn("day", F.to_date("t"))
    )
    w_local = (
        Window.partitionBy("day")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = deltas.withColumn("lcum", F.sum("net").over(w_local)).select(
        "day", "t", "lcum"
    )
    per_day = deltas.groupBy("day").agg(
        F.sum("net").cast("long").alias("dsum"),
        F.sum("n_starts").cast("long").alias("n_starts"),
    )
    w_prev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )  # per-day summary frame: calendar-bounded
    offsets = per_day.select(
        "day",
        "n_starts",
        F.coalesce(F.sum("dsum").over(w_prev), F.lit(0)).alias("off"),
    )
    return (
        local.join(offsets, "day")
        .groupBy("day", "n_starts")
        .agg(
            F.max(F.col("lcum") + F.col("off"))
            .cast("long")
            .alias("peak_concurrency")
        )
        .select("day", "n_starts", "peak_concurrency")
        .orderBy("day")
    )


def peak_concurrency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of concurrently open 30-minute event windows per
    day — the capacity envelope of the event stream."""
    from faers_datalakehouse_spark.sources.tables import read_events

    return peak_concurrency(read_events(spark, sf_dir))


PEAK_CONCURRENCY_SQL = """
WITH bounds AS (
  SELECT ts AS t, 1 AS d FROM events
  UNION ALL
  SELECT ts + INTERVAL 30 MINUTE AS t, -1 AS d FROM events
),
deltas AS (
  SELECT t,
         CAST(sum(d) AS BIGINT) AS net,
         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_starts
  FROM bounds GROUP BY t
),
running AS (
  SELECT CAST(t AS DATE) AS day, n_starts,
         sum(net) OVER (ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
)
SELECT day,
       CAST(sum(n_starts) AS BIGINT) AS n_starts,
       CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM running
GROUP BY day
ORDER BY day
"""
