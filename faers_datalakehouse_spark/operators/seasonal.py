"""Classical additive seasonal decomposition of a daily series —
``observed = trend + seasonal + residual`` with a centered 7-day moving
average trend and day-of-week seasonal means (the moving-average
decomposition underlying STL; Kendall & Stuart's classical method).

The daily activity series decomposes into a smooth trend (centered MA,
defined only where a full 7-day window of CONSECUTIVE days exists), a
weekly seasonal profile (the mean detrended value per day-of-week), and
what's left. Standard pre-model diagnostic for activity/ingest series:
the seasonal row answers "is Monday always low?", the residual flags
genuine anomalies after seasonality is removed (sharper than raw-count
``anomaly_days``).

Integer-exact: the observed series is a count; trend is kept as
``trend_milli = sum7 * 1000 div 7`` (integer division), detrended and
seasonal values stay in exact milli units, day-of-week is an
epoch-datediff mod 7 (Monday = 0 — no engine-specific DOW origin).

Scale shape (100 TB): one map-side-combinable daily aggregate collapses
the event stream to |days| rows; every window after that (centered MA,
DOW means via groupBy) runs over the day-grain frame — bounded, the
plan-audit-sanctioned shape. No driver round-trip.

No counterpart in the reference repo (time-series extension surface,
alongside ``ewma_daily`` / ``holt_smooth`` / ``cusum_changepoint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.tables import read_events

_EPOCH_MONDAY = "1970-01-05"  # a Monday: datediff % 7 == 0 on Mondays


def seasonal_decompose_daily(daily: DataFrame) -> DataFrame:
    """Decompose a ``(day, cnt)`` frame into
    ``(day, dow, cnt, trend_milli, seasonal_milli, resid_milli)``.

    ``trend_milli`` is NULL on the 3-day edges and wherever the 7-row
    window is not 7 CONSECUTIVE calendar days; seasonal/residual are
    NULL wherever trend is.
    """
    w7 = (
        Window.orderBy("day").rowsBetween(-3, 3)
    )  # day-grain frame: |days| rows total, bounded by calendar length
    t = daily.select(
        "day",
        (
            F.datediff(F.col("day"), F.to_date(F.lit(_EPOCH_MONDAY)))
            % 7
        ).alias("dow"),
        "cnt",
        F.sum("cnt").over(w7).alias("_sum7"),
        F.count(F.lit(1)).over(w7).alias("_n7"),
        F.datediff(F.max("day").over(w7), F.min("day").over(w7)).alias(
            "_span7"
        ),
    )
    t = t.withColumn(
        "trend_milli",
        F.when(
            (F.col("_n7") == 7) & (F.col("_span7") == 6),
            F.expr("CAST(_sum7 * 1000 div 7 AS BIGINT)"),
        ),
    ).withColumn(
        "detr_milli", F.col("cnt") * 1000 - F.col("trend_milli")
    )
    seas = (
        t.where(F.col("detr_milli").isNotNull())
        .groupBy("dow")
        .agg(
            F.expr(
                "CAST(sum(detr_milli) div count(*) AS BIGINT)"
            ).alias("seasonal_milli")
        )
    )
    return (
        t.join(F.broadcast(seas), "dow", "left")
        .select(
            "day",
            "dow",
            "cnt",
            "trend_milli",
            F.when(
                F.col("trend_milli").isNotNull(),
                F.col("seasonal_milli"),
            ).alias("seasonal_milli"),
            F.when(
                F.col("trend_milli").isNotNull(),
                F.col("cnt") * 1000
                - F.col("trend_milli")
                - F.col("seasonal_milli"),
            ).alias("resid_milli"),
        )
        .orderBy("day")
    )


def seasonal_decompose_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekly decomposition of the daily event-count series."""
    events = read_events(spark, sf_dir)
    daily = events.groupBy(
        F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return seasonal_decompose_daily(daily)


SEASONAL_DECOMPOSE_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS cnt
  FROM events GROUP BY 1
),
t AS (
  SELECT day,
         date_diff('day', DATE '1970-01-05', day) % 7 AS dow,
         cnt,
         sum(cnt) OVER w7 AS _sum7,
         count(*) OVER w7 AS _n7,
         date_diff('day', min(day) OVER w7, max(day) OVER w7) AS _span7
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
tr AS (
  SELECT day, dow, cnt,
         CASE WHEN _n7 = 7 AND _span7 = 6
              THEN CAST(_sum7 * 1000 // 7 AS BIGINT) END AS trend_milli
  FROM t
),
d AS (
  SELECT *, cnt * 1000 - trend_milli AS detr_milli FROM tr
),
seas AS (
  SELECT dow,
         CAST(sum(detr_milli) // count(*) AS BIGINT) AS seasonal_milli
  FROM d WHERE detr_milli IS NOT NULL GROUP BY dow
)
SELECT d.day, d.dow, CAST(d.cnt AS BIGINT) AS cnt, d.trend_milli,
       CASE WHEN d.trend_milli IS NOT NULL
            THEN seas.seasonal_milli END AS seasonal_milli,
       CASE WHEN d.trend_milli IS NOT NULL
            THEN d.cnt * 1000 - d.trend_milli - seas.seasonal_milli
       END AS resid_milli
FROM d LEFT JOIN seas ON d.dow = seas.dow
ORDER BY d.day
"""
