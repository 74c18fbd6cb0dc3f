"""Extreme-value diagnostics over the daily series — a Gumbel fit of
monthly block maxima (the capacity question: "how big do the worst
days get, and how fast do the records grow?") and the record-day
census (how often does a series break its own record? iid series break
records at a ~1/t rate; trending series far more often — a drift
signal no mean-based monitor sees).

Gumbel method-of-moments on EXACT integer block maxima: per (series,
month) the block maximum of the daily count is an exact integer; the
moment sums S (BIGINT) and Q = sum m² (DECIMAL(38,0), overflow-audit
rule) feed

    beta = s * sqrt(6) / pi        mu = mean - gamma * beta

as one fixed IEEE tree (sqrt is correctly rounded; pi and the
Euler-Mascheroni gamma enter as double literals — identical constants
in both engines, unlike libm transcendental CALLS, which are banned).

Record days: a day is a record when its count strictly exceeds every
earlier day's. The running previous-maximum is one keyed window over
the DAY-GRAIN frame (calendar-bounded) — never the base table.

Scale shape (100 TB): daily rollup is the only full-size shuffle
(map-side combinable); everything downstream runs on day/month-grain
frames.

No counterpart in the reference repo (analytics extension surface,
alongside ``cusum_changepoint`` / ``anomaly_days`` / ``mad_outliers``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_GAMMA = "0.5772156649015329"
_PI = "3.141592653589793"


def gumbel_fit_by_series(
    daily: DataFrame, series_col: str, y_col: str
) -> DataFrame:
    """``(series_col, n_blocks, max_block, beta_milli, mu_milli)`` per
    series from monthly block maxima of ``y_col`` (requires a ``month``
    column; NULL fit when < 2 blocks or zero variance)."""
    blocks = daily.groupBy(series_col, "month").agg(
        F.max(y_col).cast("long").alias("m")
    )
    g = blocks.groupBy(series_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.max("m").cast("long").alias("max_block"),
        F.sum("m").cast("long").alias("s"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("m"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    # s² = (n*q - s*s) / (n*(n-1)); beta = sqrt(s²)*sqrt(6)/pi;
    # mu = s/n - gamma*beta — exact moments, one IEEE tree
    var_num = (
        "CAST(n_blocks AS DOUBLE) * CAST(q AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    )
    beta = (
        f"sqrt(({var_num}) / (CAST(n_blocks AS DOUBLE)"
        " * (n_blocks - 1.0))) * sqrt(6.0) / " + _PI
    )
    return (
        g.withColumn(
            "beta_milli",
            F.expr(
                f"CASE WHEN n_blocks >= 2 AND ({var_num}) > 0 THEN "
                f"CAST(floor(({beta}) * 1000.0) AS BIGINT) END"
            ),
        )
        .withColumn(
            "mu_milli",
            F.expr(
                f"CASE WHEN n_blocks >= 2 AND ({var_num}) > 0 THEN "
                "CAST(floor((CAST(s AS DOUBLE) / n_blocks"
                f" - {_GAMMA} * ({beta})) * 1000.0) AS BIGINT) END"
            ),
        )
        .select(series_col, "n_blocks", "max_block", "beta_milli", "mu_milli")
        .orderBy(series_col)
    )


def gumbel_fit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel location/scale of each event type's worst daily volume
    per month — the tail-sizing fit behind capacity planning."""
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    daily = events.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    daily = daily.withColumn("month", F.trunc("day", "month"))
    return gumbel_fit_by_series(daily, "event_type", "cnt")


GUMBEL_FIT_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
blocks AS (
  SELECT event_type, date_trunc('month', day) AS month,
         CAST(max(cnt) AS BIGINT) AS m
  FROM daily GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(max(m) AS BIGINT) AS max_block,
         CAST(sum(m) AS BIGINT) AS s,
         CAST(sum(CAST(m AS HUGEINT) * m) AS HUGEINT) AS q
  FROM blocks GROUP BY 1
)
SELECT event_type, n_blocks, max_block,
       CASE WHEN n_blocks >= 2 AND
         CAST(n_blocks AS DOUBLE) * CAST(q AS DOUBLE)
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) > 0
       THEN CAST(floor(sqrt((CAST(n_blocks AS DOUBLE) * CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n_blocks AS DOUBLE) * (n_blocks - 1.0)))
            * sqrt(6.0) / 3.141592653589793 * 1000.0) AS BIGINT) END
         AS beta_milli,
       CASE WHEN n_blocks >= 2 AND
         CAST(n_blocks AS DOUBLE) * CAST(q AS DOUBLE)
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) > 0
       THEN CAST(floor((CAST(s AS DOUBLE) / n_blocks
            - 0.5772156649015329
              * (sqrt((CAST(n_blocks AS DOUBLE) * CAST(q AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n_blocks AS DOUBLE) * (n_blocks - 1.0)))
                 * sqrt(6.0) / 3.141592653589793)) * 1000.0)
            AS BIGINT) END AS mu_milli
FROM g
ORDER BY event_type
"""


def record_days_by_series(
    daily: DataFrame, series_col: str, day_col: str, y_col: str
) -> DataFrame:
    """``(series_col, n_days, n_records, last_record_day)`` — strict
    records over the day-ordered series (the first day is a record)."""
    w_prev = (
        Window.partitionBy(series_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = daily.withColumn(
        "_is_rec",
        (
            F.col(y_col)
            > F.coalesce(F.max(y_col).over(w_prev), F.lit(-1))
        ).cast("long"),
    )
    return (
        rec.groupBy(series_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("_is_rec").cast("long").alias("n_records"),
            F.max(
                F.when(F.col("_is_rec") == 1, F.col(day_col))
            ).alias("last_record_day"),
        )
        .orderBy(series_col)
    )


def record_days_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often does each event type break its daily-volume record,
    and when did it last happen? (iid ~ log(n) records; trending far
    more — a drift probe.)"""
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return record_days_by_series(daily, "event_type", "day", "cnt")


RECORD_DAYS_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
rec AS (
  SELECT event_type, day, cnt,
         CASE WHEN cnt > COALESCE(max(cnt) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           THEN 1 ELSE 0 END AS is_rec
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(is_rec) AS BIGINT) AS n_records,
       max(CASE WHEN is_rec = 1 THEN day END) AS last_record_day
FROM rec
GROUP BY event_type
ORDER BY event_type
"""
