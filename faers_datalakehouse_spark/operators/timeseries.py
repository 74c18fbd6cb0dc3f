"""Time-series regularization: date-spine gap fill + forward fill.

Event streams are irregular; downstream consumers (trend models, freshness
monitors, training-mixture schedulers) want a REGULAR daily grid per
series. The classic two-step:

1. **date spine**: one row per (series, day) over the series' observed
   range — built with ``sequence`` + ``explode`` (the same generator idiom
   as ``plans.date_dim``), then a LEFT join of the daily aggregates;
2. **fill**: counts/sums zero-fill (no events = zero activity);
   level-style metrics forward-fill with ``last(..., ignorenulls=True)``
   over the per-series date order (carry the last observation forward).

Scale: the spine is |series| x |days| rows — output-sized, not
event-sized; the daily aggregate is one shuffle with map-side partial
aggregation; the forward-fill window partitions by series (bounded by the
grid, never by raw events). All filled values are exact integers (cents),
so the DuckDB twin (``gap_fill_oracle_sql``) matches to the last bit.

No counterpart in the reference (engine extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regular daily grid per series:
    ``(series, day, n_events, value_c, ffill_value_c)`` where missing days
    carry ``n_events = 0``, ``value_c = 0`` and the forward-filled last
    observed daily total (NULL before the first observation — leading-edge
    fill is a modeling choice left to callers)."""
    cents = F.sum(
        F.round(F.col(value_col) * 100).cast("long")
    ).alias("value_c")
    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col),
        )
        .groupBy("series", "day")
        .agg(F.count(F.lit(1)).alias("n_events"), cents)
    )
    spine = (
        daily.groupBy("series")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "series",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    by_series = Window.partitionBy("series").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(daily, ["series", "day"], "left")
        .select(
            "series",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_c", F.lit(0)).alias("value_c"),
            F.last(F.col("value_c"), ignorenulls=True)
            .over(by_series)
            .alias("ffill_value_c"),
        )
        .orderBy("series", "day")
    )


def linear_interpolate_daily(
    events: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    mask_mod: int = 3,
) -> DataFrame:
    """Linear gap interpolation on the daily grid — the sensor-style
    repair ``gap_fill_daily`` deliberately does NOT do (zero/forward fill
    are level-preserving; trends want the line between the surrounding
    observations).

    ``mask_mod`` simulates outages deterministically: observations on
    days whose epoch-day number is divisible by ``mask_mod`` are treated
    as missing (the synthetic corpus is dense, so without a mask the
    interpolation path would never execute — the mask makes the operator
    self-exercising at any scale; pass ``None``/0 to disable).

    Interpolation is the integer weighted-average form
    ``(prev*(next_day-day) + next*(day-prev_day)) div (next_day-prev_day)``
    — both weights non-negative, so cross-engine integer-division
    semantics for negative operands never matter. Edges clamp to the
    nearest observation.

    Scale shape: one daily aggregate (map-side partial), a |series| x
    |days| spine (output-sized), and two keyed windows over the spine
    (rows-unbounded last/first with IGNORE NULLS) riding one (series)
    shuffle — the gap_fill_daily profile exactly.
    """
    milli = F.sum(
        F.round(F.col(value_col) * 1000).cast("long")
    ).alias("obs_raw")
    daily = (
        events.select(
            F.col(series_col).alias("series"),
            F.to_date(ts_col).alias("day"),
            F.col(value_col),
        )
        .groupBy("series", "day")
        .agg(milli)
    )
    epoch_day = F.datediff(F.col("day"), F.to_date(F.lit("1970-01-01")))
    if mask_mod:
        obs = F.when(epoch_day % mask_mod != 0, F.col("obs_raw"))
    else:
        obs = F.col("obs_raw")
    daily = daily.select("series", "day", obs.alias("obs_milli"))
    spine = (
        daily.groupBy("series")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "series",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    back = Window.partitionBy("series").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.partitionBy("series").orderBy("day").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("obs_milli").isNotNull(), F.col("day"))
    g = spine.join(daily, ["series", "day"], "left").select(
        "series",
        "day",
        "obs_milli",
        F.last("obs_milli", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("obs_milli", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    interp = (
        F.when(F.col("obs_milli").isNotNull(), F.col("obs_milli"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.expr(
                "(pv * datediff(nd, day) + nv * datediff(day, pd))"
                " div datediff(nd, pd)"
            )
        )
    )
    return g.select(
        "series", "day", "obs_milli", interp.alias("interp_milli")
    ).orderBy("series", "day")


def linear_interpolate_oracle_sql(mask_mod: int = 3) -> str:
    mask = (
        f"CASE WHEN date_diff('day', DATE '1970-01-01', day)"
        f" % {mask_mod} != 0 THEN obs_raw END"
        if mask_mod
        else "obs_raw"
    )
    return f"""
WITH raw AS (
  SELECT event_type AS series,
         CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS obs_raw
  FROM events
  GROUP BY 1, 2
),
daily AS (
  SELECT series, day, {mask} AS obs_milli FROM raw
),
spine AS (
  SELECT series, CAST(d AS DATE) AS day
  FROM (SELECT series, min(day) AS d0, max(day) AS d1 FROM daily
        GROUP BY series),
       unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(d)
),
g AS (
  SELECT s.series, s.day, d.obs_milli,
         last_value(d.obs_milli IGNORE NULLS)
           OVER (PARTITION BY s.series ORDER BY s.day
                 ROWS UNBOUNDED PRECEDING) AS pv,
         last_value(CASE WHEN d.obs_milli IS NOT NULL THEN s.day END
                    IGNORE NULLS)
           OVER (PARTITION BY s.series ORDER BY s.day
                 ROWS UNBOUNDED PRECEDING) AS pd,
         first_value(d.obs_milli IGNORE NULLS)
           OVER (PARTITION BY s.series ORDER BY s.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN d.obs_milli IS NOT NULL THEN s.day END
                     IGNORE NULLS)
           OVER (PARTITION BY s.series ORDER BY s.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM spine s LEFT JOIN daily d USING (series, day)
)
SELECT series, day, obs_milli,
       CAST(CASE
         WHEN obs_milli IS NOT NULL THEN obs_milli
         WHEN pv IS NULL THEN nv
         WHEN nv IS NULL THEN pv
         ELSE (pv * date_diff('day', day, nd)
               + nv * date_diff('day', pd, day))
              // date_diff('day', pd, nd)
       END AS BIGINT) AS interp_milli
FROM g
ORDER BY series, day
"""


def gap_fill_oracle_sql() -> str:
    """DuckDB twin of ``gap_fill_daily`` over the ``events`` table."""
    return """
WITH daily AS (
  SELECT event_type AS series,
         CAST(ts AS DATE) AS day,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
  FROM events
  GROUP BY 1, 2
),
spine AS (
  SELECT series, CAST(d AS DATE) AS day
  FROM (SELECT series, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY series),
       unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(d)
)
SELECT s.series,
       s.day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.value_c, 0) AS value_c,
       last_value(d.value_c IGNORE NULLS)
         OVER (PARTITION BY s.series ORDER BY s.day
               ROWS UNBOUNDED PRECEDING) AS ffill_value_c
FROM spine s LEFT JOIN daily d USING (series, day)
ORDER BY series, day
"""
