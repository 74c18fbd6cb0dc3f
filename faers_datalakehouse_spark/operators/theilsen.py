"""Theil-Sen robust trend — the median-of-pairwise-slopes estimator
(Theil 1950, Sen 1968): the standard robust alternative to OLS for
"is this series drifting?" questions, with a 29% breakdown point (a
third of the days can be garbage before the slope moves). Complements
``group_ols_trend`` (least squares, outlier-sensitive) and
``holt_smooth`` / ``ewma_daily`` (levels, not rates).

Integer-exact: slopes are ``(c2 - c1) * 1000 div (d2 - d1)`` over exact
daily counts and day gaps; the estimate is the LOWER MEDIAN of the
pairwise-slope multiset — a positional pick from the sorted values,
deterministic under ties because the value at a fixed sorted position
does not depend on tie order.

Scale shape (100 TB): the event stream collapses to the day-grain frame
first (one map-side-combinable groupBy to |series| x |days| rows); the
pairwise self-join and the median window run entirely over that frame —
pairs are O(days^2) PER SERIES, bounded by the calendar (30 days = 435
pairs), never by data volume. The self-join is an equi-join on the
series key; the median window partitions by series.

No counterpart in the reference repo (time-series extension surface,
alongside ``group_ols_trend`` / ``seasonal_decompose``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.tables import read_events


def theil_sen_trend(
    daily: DataFrame,
    series_col: str = "series",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """``(series_col, n_points, n_pairs, slope_milli)`` per series —
    lower-median pairwise slope in exact milli units per x step. Series
    with a single point emit NULL slope."""
    a = daily.select(
        F.col(series_col).alias("_s"),
        F.col(x_col).alias("_x1"),
        F.col(y_col).alias("_y1"),
    )
    b = daily.select(
        F.col(series_col).alias("_s"),
        F.col(x_col).alias("_x2"),
        F.col(y_col).alias("_y2"),
    )
    pairs = a.join(b, "_s").where(F.col("_x1") < F.col("_x2"))
    slopes = pairs.select(
        "_s",
        F.expr(
            "CAST((_y2 - _y1) * 1000 div (_x2 - _x1) AS BIGINT)"
        ).alias("_slope"),
    )
    w_rank = Window.partitionBy("_s").orderBy("_slope")
    w_all = Window.partitionBy("_s")
    ranked = slopes.select(
        "_s",
        "_slope",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    )
    med = ranked.where(
        F.col("_rn") == F.expr("CAST((n_pairs + 1) div 2 AS INT)")
    )
    npts = daily.groupBy(F.col(series_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return (
        npts.join(
            med.select(
                "_s",
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.col("_slope").alias("slope_milli"),
            ),
            "_s",
            "left",
        )
        .select(
            F.col("_s").alias(series_col),
            "n_points",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            "slope_milli",
        )
        .orderBy(series_col)
    )


def theil_sen_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-count trend per event type (x = days since the
    series' first day, y = count)."""
    events = read_events(spark, sf_dir)
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = daily.select(
        "event_type",
        F.datediff(
            "day", F.to_date(F.lit("1970-01-01"))
        ).cast("long").alias("x"),
        F.col("cnt").cast("long").alias("y"),
    )
    return theil_sen_trend(daily, "event_type", "x", "y")


THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST((b.y - a.y) * 1000 // (b.x - a.x) AS BIGINT) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.x < b.x
),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
),
med AS (
  SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
         slope AS slope_milli
  FROM ranked WHERE rn = (n_pairs + 1) // 2
),
npts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
  FROM daily GROUP BY 1
)
SELECT npts.event_type, n_points,
       COALESCE(n_pairs, 0) AS n_pairs, slope_milli
FROM npts LEFT JOIN med ON npts.event_type = med.event_type
ORDER BY npts.event_type
"""


def hodges_lehmann_by_series(
    daily: DataFrame,
    series_col: str = "series",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """``(series_col, n_points, n_pairs, hl_milli)`` per series — the
    Hodges-Lehmann pseudomedian (Hodges & Lehmann 1963): the lower
    median of all Walsh averages ``(y_i + y_j)/2`` over pairs ``i <=
    j`` (self-pairs included, per the standard definition). The robust
    location companion to the Theil-Sen slope: ~2x the breakdown
    resistance of the mean with ~95% of its efficiency at the normal.

    Exact: pair SUMS stay integral (the /2 happens once, in milli);
    the median is a positional pick. Pairs are calendar-bounded per
    series (the theil_sen shape), so the self-join is safe at any
    corpus scale.
    """
    a = daily.select(
        F.col(series_col).alias("_s"),
        F.col(x_col).alias("_x1"),
        F.col(y_col).alias("_y1"),
    )
    b = daily.select(
        F.col(series_col).alias("_s"),
        F.col(x_col).alias("_x2"),
        F.col(y_col).alias("_y2"),
    )
    pairs = a.join(b, "_s").where(F.col("_x1") <= F.col("_x2"))
    sums = pairs.select(
        "_s", (F.col("_y1") + F.col("_y2")).alias("_psum")
    )
    w_rank = Window.partitionBy("_s").orderBy("_psum")
    w_all = Window.partitionBy("_s")
    ranked = sums.select(
        "_s",
        "_psum",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("n_pairs"),
    )
    med = ranked.where(
        F.col("_rn") == F.expr("CAST((n_pairs + 1) div 2 AS INT)")
    )
    npts = daily.groupBy(F.col(series_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return (
        npts.join(
            med.select(
                "_s",
                F.col("n_pairs").cast("long").alias("n_pairs"),
                F.expr("CAST(_psum * 500 AS BIGINT)").alias(
                    "hl_milli"
                ),
            ),
            "_s",
        )
        .select(
            F.col("_s").alias(series_col),
            "n_points",
            "n_pairs",
            "hl_milli",
        )
        .orderBy(series_col)
    )


def hodges_lehmann_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust typical daily volume per event type (pseudomedian of the
    daily count series)."""
    events = read_events(spark, sf_dir)
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = daily.select(
        "event_type",
        F.datediff("day", F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .alias("x"),
        F.col("cnt").cast("long").alias("y"),
    )
    return hodges_lehmann_by_series(daily, "event_type", "x", "y")


HODGES_LEHMANN_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.y + b.y AS psum
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.x <= b.x
),
ranked AS (
  SELECT event_type, psum,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY psum) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
),
med AS (
  SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
         CAST(psum * 500 AS BIGINT) AS hl_milli
  FROM ranked WHERE rn = (n_pairs + 1) // 2
),
npts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
  FROM daily GROUP BY 1
)
SELECT npts.event_type, n_points, n_pairs, hl_milli
FROM npts JOIN med ON npts.event_type = med.event_type
ORDER BY npts.event_type
"""
