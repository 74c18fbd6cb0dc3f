"""Per-series maximum drawdown — the largest peak-to-trough fall of a
running-balance series, the standard risk/health metric for any
cumulative measure (account balance, quota burn-down, token budget,
error budget).

For each series the running balance is the cumulative sum of the value
stream in time order; drawdown at time t is ``max(balance[..t]) -
balance[t]`` and the statistic is its maximum over the series. Exact
integers throughout (cents), so the DuckDB twin matches bit-for-bit.

Scale shape (100 TB): two stacked windows, BOTH partitioned by the
series key (cumulative sum, then running max) — per-series state never
leaves its partition, no global window, no driver round-trip. The final
top-k is ``orderBy + limit`` → TakeOrderedAndProject (per-partition
heaps + one k-row merge), with the series key as a deterministic
tiebreak.

No counterpart in the reference repo (time-series extension surface,
alongside ``ohlc_bars`` / ``twap_daily`` / ``cusum_changepoint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.tables import read_events


def max_drawdown_by_series(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_c_col: str,
    top_k: int = 25,
) -> DataFrame:
    """``(series_col, n_events, final_balance_c, peak_balance_c,
    max_drawdown_c)`` for the ``top_k`` series by drawdown (ties broken
    by series key)."""
    w_cum = (
        Window.partitionBy(series_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bal = df.withColumn("_bal", F.sum(value_c_col).over(w_cum))
    dd = bal.withColumn(
        "_dd", F.max("_bal").over(w_cum) - F.col("_bal")
    )
    # the balance at the last row IS the series total — aggregate the
    # raw values rather than arg-max-ing the window output
    per_series = dd.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_c_col).alias("final_balance_c"),
        F.max("_bal").alias("peak_balance_c"),
        F.max("_dd").alias("max_drawdown_c"),
    )
    return per_series.orderBy(
        F.col("max_drawdown_c").desc(), series_col
    ).limit(top_k)


def max_drawdown_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 25 users by maximum drawdown of their cumulative event-value
    balance (value in exact cents, time order broken by event_id)."""
    events = read_events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    return max_drawdown_by_series(
        events, "user_id", "ts", "event_id", "v_cents"
    )


MAX_DRAWDOWN_SQL = """
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
),
bal AS (
  SELECT user_id, ts, event_id, v_cents,
         CAST(sum(v_cents) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _bal
  FROM base
),
dd AS (
  SELECT user_id, v_cents, _bal,
         CAST(max(_bal) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) - _bal AS BIGINT) AS _dd
  FROM bal
),
per_series AS (
  SELECT user_id,
         count(*) AS n_events,
         CAST(sum(v_cents) AS BIGINT) AS final_balance_c,
         CAST(max(_bal) AS BIGINT) AS peak_balance_c,
         CAST(max(_dd) AS BIGINT) AS max_drawdown_c
  FROM dd GROUP BY user_id
)
SELECT * FROM per_series
ORDER BY max_drawdown_c DESC, user_id
LIMIT 25
"""
