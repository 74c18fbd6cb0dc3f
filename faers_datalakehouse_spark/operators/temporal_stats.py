"""Temporal stream diagnostics — burstiness (Fano factor) of the daily
arrival process and positional inter-arrival quantiles per stream.

- **Fano factor** ``F = Var(daily count) / Mean(daily count)`` (Fano
  1947): 1 for a Poisson process, > 1 = bursty/overdispersed (retry
  storms, batch replays), < 1 = regular/underdispersed (schedulers,
  rate caps). THE first-line health check on an event stream's arrival
  process.
- **Inter-arrival quantiles**: the p50/p90 of per-user gaps between
  consecutive events — what sessionization timeouts and freshness SLOs
  should be calibrated against (complements ``sessionize``'s fixed
  30-min gap with the measured gap distribution).

Integer-exact: the Fano factor is cross-multiplied — ``fano_milli =
1000 * n_days * varnum div (sum * (n_days - 1) * n_days)`` is kept as
exact BIGINT arithmetic on count sums; inter-arrival gaps are whole
seconds (both engines truncate the timestamp to seconds before
differencing — the ``timestampdiff``-vs-``date_diff`` boundary rule),
and quantiles are POSITIONAL picks from the per-group sorted multiset.

Scale shape (100 TB): Fano is two stacked map-side-combinable
aggregates (events -> day grain -> stream). Gaps derive from ONE window
partitioned by (user) — per-user state stays in its partition; the
per-stream quantile ranks use ``bucketed_global_rank`` (the two-phase
bucketed scan), so no per-stream global window forms even with only a
handful of streams (the classic few-groups skew trap).

No counterpart in the reference repo (time-series extension surface,
alongside ``anomaly_days`` / ``sessionize`` / ``seasonal_decompose``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.normalize import (
    bucketed_global_rank,
)
from faers_datalakehouse_spark.sources.tables import read_events


def fano_factor_daily(
    events: DataFrame,
    series_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """``(series_col, n_days, n_events, fano_milli)`` per stream —
    exact milli Fano factor of the daily count series (NULL when fewer
    than 2 observed days or zero events)."""
    daily = events.groupBy(
        series_col, F.to_date(ts_col).alias("_day")
    ).agg(F.count(F.lit(1)).alias("_c"))
    g = daily.groupBy(series_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_c").cast("long").alias("n_events"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_scc"),
    )
    # Var = (d*scc - s^2) / (d*(d-1)); F = Var/(s/d) =
    # (d*scc - s^2) / (s*(d-1)) — one exact integer ratio
    return g.select(
        series_col,
        "n_days",
        "n_events",
        F.expr(
            "CASE WHEN n_days >= 2 AND n_events > 0 THEN "
            "CAST(1000 * (n_days * _scc - n_events * n_events) div "
            "(n_events * (n_days - 1)) AS BIGINT) END"
        ).alias("fano_milli"),
    ).orderBy(series_col)


def interarrival_quantiles(
    events: DataFrame,
    series_col: str,
    actor_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """``(series_col, n_gaps, p50_gap_s, p90_gap_s)`` per stream —
    positional (lower) quantiles of per-actor consecutive gaps in whole
    seconds."""
    w_seq = Window.partitionBy(actor_col).orderBy(
        ts_col, tiebreak_col
    )
    sec = F.unix_timestamp(F.date_trunc("second", F.col(ts_col)))
    gaps = (
        events.withColumn("_prev", F.lag(sec).over(w_seq))
        .where(F.col("_prev").isNotNull())
        .select(
            series_col,
            (sec - F.col("_prev")).cast("long").alias("gap_s"),
            F.col(tiebreak_col).alias("_tb"),
        )
    )
    ranked = bucketed_global_rank(
        gaps, series_col, "gap_s", "_tb", bucket_size=4096
    )
    return (
        ranked.withColumn(
            "_p50", F.expr("CAST((n_group + 1) div 2 AS BIGINT)")
        )
        .withColumn(
            "_p90", F.expr("CAST((9 * n_group + 9) div 10 AS BIGINT)")
        )
        .where(
            (F.col("rnk") == F.col("_p50"))
            | (F.col("rnk") == F.col("_p90"))
        )
        .groupBy(series_col)
        .agg(
            F.max("n_group").cast("long").alias("n_gaps"),
            F.min("gap_s").alias("p50_gap_s"),
            F.max("gap_s").alias("p90_gap_s"),
        )
        .orderBy(series_col)
    )


def burstiness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count Fano factor per event type."""
    return fano_factor_daily(
        read_events(spark, sf_dir), "event_type"
    )


BURSTINESS_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS scc
  FROM daily GROUP BY 1
)
SELECT event_type, n_days, n_events,
       CASE WHEN n_days >= 2 AND n_events > 0 THEN
         CAST(1000 * (n_days * scc - n_events * n_events) //
              (n_events * (n_days - 1)) AS BIGINT) END AS fano_milli
FROM g
ORDER BY event_type
"""


def interarrival_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90 per-user inter-arrival gap per event type, in seconds."""
    return interarrival_quantiles(
        read_events(spark, sf_dir),
        "event_type",
        "user_id",
        "ts",
        "event_id",
    )


INTERARRIVAL_SQL = """
WITH sec AS (
  SELECT event_type, user_id, event_id,
         epoch(date_trunc('second', ts)) AS t_s
  FROM events
),
gaps AS (
  SELECT event_type,
         CAST(t_s - lag(t_s) OVER (PARTITION BY user_id
              ORDER BY t_s, event_id) AS BIGINT) AS gap_s
  FROM sec
),
g2 AS (SELECT * FROM gaps WHERE gap_s IS NOT NULL),
ranked AS (
  SELECT event_type, gap_s,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY gap_s) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n_group
  FROM g2
)
SELECT event_type,
       CAST(max(n_group) AS BIGINT) AS n_gaps,
       CAST(min(gap_s) AS BIGINT) AS p50_gap_s,
       CAST(max(gap_s) AS BIGINT) AS p90_gap_s
FROM ranked
WHERE rnk = (n_group + 1) // 2 OR rnk = (9 * n_group + 9) // 10
GROUP BY event_type
ORDER BY event_type
"""
