"""Irregular-sample time-series aggregation: OHLC bars and
time-weighted averages (TWAP).

Event streams sample a signal at irregular times; two canonical
roll-ups make them analyzable:

- OHLC bars (open/high/low/close per key x bucket) — the candlestick
  reduction. Open/close need FIRST/LAST by event time with a total
  order; ``min_by/max_by`` tie-break arbitrarily, so both ends resolve
  through one row_number window per (key, bucket) ordered by
  ``(ts, event_id)`` — deterministic under same-timestamp events.
- TWAP — the piecewise-constant time integral divided by covered time:
  each sample holds its value until the next sample, so its weight is
  the gap to the successor (``lead``); the last sample of a bucket
  carries to the bucket end. sum(value x seconds) / sum(seconds) —
  exact int64 sums (cents x whole seconds), ONE IEEE division. This is
  the metric that makes irregular telemetry comparable: a plain AVG
  over-weights bursts.

Scale shape: both are one shuffle on (key, bucket) + windows whose
partitions are single buckets (bounded by per-bucket event counts,
never corpus-sized). All arithmetic is engine-exact.

No counterpart in the reference (time-series extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ohlc_bars(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Daily OHLC bars per key in exact cents:
    ``(key, day, open_c, high_c, low_c, close_c, n)``."""
    base = events.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.to_date(ts_col).alias("day"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("eid"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    w_asc = Window.partitionBy("key", "day").orderBy("t", "eid")
    w_desc = Window.partitionBy("key", "day").orderBy(
        F.desc("t"), F.desc("eid")
    )
    return (
        base.select(
            "key",
            "day",
            "cents",
            F.row_number().over(w_asc).alias("_rn_a"),
            F.row_number().over(w_desc).alias("_rn_d"),
        )
        .groupBy("key", "day")
        .agg(
            F.max(F.when(F.col("_rn_a") == 1, F.col("cents"))).alias(
                "open_c"
            ),
            F.max("cents").alias("high_c"),
            F.min("cents").alias("low_c"),
            F.max(F.when(F.col("_rn_d") == 1, F.col("cents"))).alias(
                "close_c"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("key", "day")
    )


def twap_daily(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Daily time-weighted average value per key: each sample holds
    until the next one (same key, same day); the day's last sample
    holds until midnight. Same-timestamp samples tie-break on the id —
    the earlier-id sample gets weight 0, matching the piecewise-
    constant reading exactly. Returns exact integral state plus the
    one-division TWAP (cents, IEEE double)."""
    base = events.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.to_date(ts_col).alias("day"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("eid"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("key", "day").orderBy("t", "eid")
    day_end = (F.col("day") + 1).cast("timestamp")
    next_t = F.coalesce(F.lead("t").over(w), day_end)
    dt = (
        F.unix_micros(next_t) - F.unix_micros(F.col("t"))
    ) / F.lit(1_000_000)
    # whole seconds: the testdata timestamps are second-aligned; floor
    # keeps the weight integral exact either way
    dt_s = F.floor(dt).cast("long")
    return (
        base.select("key", "day", "cents", dt_s.alias("dt_s"))
        .groupBy("key", "day")
        .agg(
            F.sum(F.col("cents") * F.col("dt_s")).alias("weighted_c"),
            F.sum("dt_s").alias("covered_s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "key",
            "day",
            "weighted_c",
            "covered_s",
            "n",
            (
                F.col("weighted_c").cast("double")
                / F.nullif(F.col("covered_s"), F.lit(0)).cast("double")
            ).alias("twap_c"),
        )
        .orderBy("key", "day")
    )


def ohlc_bars_query(spark, sf_dir: str) -> DataFrame:
    from ..sources.tables import read_events

    return ohlc_bars(read_events(spark, sf_dir))


def twap_daily_query(spark, sf_dir: str) -> DataFrame:
    from ..sources.tables import read_events

    return twap_daily(read_events(spark, sf_dir))


OHLC_BARS_SQL = """
WITH base AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS day, ts AS t,
         event_id AS eid,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT key, day, cents,
         row_number() OVER (PARTITION BY key, day ORDER BY t, eid)
           AS rn_a,
         row_number() OVER (PARTITION BY key, day ORDER BY t DESC, eid DESC)
           AS rn_d
  FROM base
)
SELECT key, day,
       CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_c,
       CAST(max(cents) AS BIGINT) AS high_c,
       CAST(min(cents) AS BIGINT) AS low_c,
       CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_c,
       CAST(count(*) AS BIGINT) AS n
FROM r GROUP BY key, day
ORDER BY key, day
"""


TWAP_DAILY_SQL = """
WITH base AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS day, ts AS t,
         event_id AS eid,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), g AS (
  SELECT key, day, cents,
         CAST(floor(date_diff('microsecond', t,
              coalesce(lead(t) OVER (PARTITION BY key, day
                                     ORDER BY t, eid),
                       CAST(day + INTERVAL 1 DAY AS TIMESTAMP)))
              / 1000000.0) AS BIGINT) AS dt_s
  FROM base
)
SELECT key, day,
       CAST(sum(cents * dt_s) AS BIGINT) AS weighted_c,
       CAST(sum(dt_s) AS BIGINT) AS covered_s,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents * dt_s) AS DOUBLE)
         / CAST(nullif(sum(dt_s), 0) AS DOUBLE) AS twap_c
FROM g GROUP BY key, day
ORDER BY key, day
"""
