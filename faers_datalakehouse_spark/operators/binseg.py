"""Binary-segmentation changepoint — the single split of a daily
series that maximizes the between-segments sum of squares, reported
with its variance-explained ratio. The LOCATION-estimating complement
to ``cusum_changepoint`` (which scores the worst cumulative deviation)
and the first round of the classical binary-segmentation recursion.

For split s (left = first s days of n), with prefix sum ``L_s``, total
``S`` and total square ``Q``:

    T(s)  = L_s²/s + (S-L_s)²/(n-s)          (between-SS + S²/n)
    gain  = (T(s) - S²/n) / (Q - S²/n)       ∈ [0, 1]

Exactness discipline: ``L_s``/``S`` are exact BIGINTs off one prefix
window, ``Q`` is DECIMAL(38,0) (n·y² — the overflow-audit rule);
``T(s)`` is one IEEE expression per candidate row, so both engines
compute bit-identical doubles and the argmax (ties → smallest day) is
deterministic. The winning row's ``gain_milli`` is a single floor.
NULL gain when the series is constant (zero total SS); a 1-day series
emits (series, 1, NULL, NULL).

Scale shape (100 TB): everything runs on the day-grain frame
(calendar-bounded) after one map-side-combinable daily rollup — a
prefix window, a per-row expression, and a top-1 window per series.

No counterpart in the reference repo (time-series extension surface,
alongside ``cusum_changepoint`` / ``record_days``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def binseg_changepoint_by_series(
    daily: DataFrame, series_col: str, x_col: str, y_col: str
) -> DataFrame:
    """``(series_col, n_days, split_x, gain_milli)`` — the best single
    split: left segment ends at ``split_x`` (inclusive)."""
    base = daily.select(
        series_col,
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    )
    w_ord = Window.partitionBy(series_col).orderBy("_x")
    w_all = Window.partitionBy(series_col)
    pre = (
        base.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn(
            "_l",
            F.sum("_y").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .withColumn("_s", F.sum("_y").over(w_all))
        .withColumn(
            "_q",
            F.sum(F.expr("CAST(_y AS DECIMAL(38,0)) * _y")).over(w_all),
        )
    )
    cand = pre.where(F.col("_rn") < F.col("_n")).withColumn(
        "_t",
        F.expr(
            "CAST(_l AS DOUBLE) * CAST(_l AS DOUBLE)"
            " / CAST(_rn AS DOUBLE)"
            " + (CAST(_s AS DOUBLE) - CAST(_l AS DOUBLE))"
            " * (CAST(_s AS DOUBLE) - CAST(_l AS DOUBLE))"
            " / (CAST(_n AS DOUBLE) - CAST(_rn AS DOUBLE))"
        ),
    )
    w_best = Window.partitionBy(series_col).orderBy(
        F.col("_t").desc(), F.col("_x").asc()
    )
    best = (
        cand.withColumn("_pick", F.row_number().over(w_best))
        .where(F.col("_pick") == 1)
        .select(
            series_col,
            F.col("_n").cast("long").alias("n_days"),
            F.col("_x").cast("long").alias("split_x"),
            F.expr(
                "CASE WHEN CAST(_q AS DOUBLE)"
                " - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE)"
                "   / CAST(_n AS DOUBLE) > 0 THEN "
                "CAST(floor((_t"
                " - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE)"
                "   / CAST(_n AS DOUBLE)) * 1000.0"
                " / (CAST(_q AS DOUBLE)"
                " - CAST(_s AS DOUBLE) * CAST(_s AS DOUBLE)"
                "   / CAST(_n AS DOUBLE))) AS BIGINT) END"
            ).alias("gain_milli"),
        )
    )
    singles = (
        pre.where(F.col("_n") == 1)
        .select(
            series_col,
            F.lit(1).cast("long").alias("n_days"),
            F.lit(None).cast("long").alias("split_x"),
            F.lit(None).cast("long").alias("gain_milli"),
        )
    )
    return best.unionByName(singles).orderBy(series_col)


def binseg_changepoint_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per event type: where does ONE regime break best explain the
    daily-volume variance, and how much does it explain?"""
    from faers_datalakehouse_spark.operators.tstests import _daily

    return binseg_changepoint_by_series(
        _daily(spark, sf_dir), "event_type", "x", "y"
    )


BINSEG_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type, x, y,
         row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         sum(y) OVER (PARTITION BY event_type ORDER BY x
                      ROWS UNBOUNDED PRECEDING) AS l,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(y) OVER (PARTITION BY event_type) AS s,
         sum(CAST(y AS HUGEINT) * y)
           OVER (PARTITION BY event_type) AS q
  FROM daily
),
cand AS (
  SELECT *,
         CAST(l AS DOUBLE) * CAST(l AS DOUBLE) / CAST(rn AS DOUBLE)
         + (CAST(s AS DOUBLE) - CAST(l AS DOUBLE))
           * (CAST(s AS DOUBLE) - CAST(l AS DOUBLE))
           / (CAST(n AS DOUBLE) - CAST(rn AS DOUBLE)) AS t
  FROM pre WHERE rn < n
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY t DESC, x ASC) AS pick
  FROM cand
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(x AS BIGINT) AS split_x,
       CASE WHEN CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE) > 0 THEN
         CAST(floor((t - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) * 1000.0
           / (CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))) AS BIGINT) END AS gain_milli
FROM best WHERE pick = 1
UNION ALL
SELECT event_type, CAST(1 AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT)
FROM pre WHERE n = 1
ORDER BY event_type
"""
