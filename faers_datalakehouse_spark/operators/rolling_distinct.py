"""Rolling-window DISTINCT counts via contribution fan-out.

"Distinct users in the trailing 7 days, per day" is the canonical
engagement metric (WAU) — and the one rolling aggregate that windowed
SQL cannot express at scale: ``COUNT(DISTINCT) OVER (RANGE ...)`` is
unsupported in Spark, and the naive per-day self-join re-scans the fact
W times. The scalable shape is *contribution fan-out*:

1. reduce the fact to distinct ``(user, day)`` pairs — one shuffle with
   map-side partial dedup; output is bounded by users x days, not rows;
2. explode each pair to the W trailing target days it contributes to
   (``sequence(day, day+W-1)``) — linear, x W, no join;
3. ``groupBy(target_day).agg(countDistinct(user))`` — Spark plans the
   standard two-phase distinct aggregate (partial dedup before the
   exchange), so no single task ever sees the whole corpus;
4. keep only target days that actually occur in the data (broadcast
   semi-join against the tiny observed-day spine), so trailing ghost
   days past max(day) don't appear.

Rolling EVENT totals ride along the same fan-out but start from the
per-day count frame (day-spine-sized), so that branch is nearly free.

At 100 TB this is one full shuffle (the distinct), one xW map-side
explode, and one aggregate whose input is |users x days x W| — each
stage partition-parallel with no windowed global ordering anywhere.
All outputs are exact int64 counts; no floats.

No counterpart in the reference (LLM/BI extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rolling_distinct_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per observed day: distinct users and total events in the trailing
    ``window_days`` window. Columns: day, rolling_users, rolling_events."""
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    days = F.sequence(
        F.col("d"), F.date_add(F.col("d"), window_days - 1)
    )
    acts = (
        df.select(
            F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
        )
        .distinct()
    )
    observed = acts.select("d").distinct()
    users = (
        acts.select("u", F.explode(days).alias("day"))
        .join(F.broadcast(observed), F.col("day") == F.col("d"), "semi")
        .groupBy("day")
        .agg(F.countDistinct("u").alias("rolling_users"))
    )
    per_day = df.select(F.to_date(ts_col).alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    events = (
        per_day.select("n", F.explode(days).alias("day"))
        .join(
            F.broadcast(observed.select(F.col("d").alias("od"))),
            F.col("day") == F.col("od"),
            "semi",
        )
        .groupBy("day")
        .agg(F.sum("n").alias("rolling_events"))
    )
    return users.join(events, "day").orderBy("day")


def rolling_distinct_oracle_sql(window_days: int = 7) -> str:
    w = int(window_days) - 1
    return f"""
WITH acts AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
), observed AS (SELECT DISTINCT d FROM acts),
per_day AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
)
SELECT o.d AS day,
       (SELECT count(DISTINCT a.u) FROM acts a
         WHERE a.d BETWEEN o.d - INTERVAL {w} DAY AND o.d)
         AS rolling_users,
       CAST((SELECT sum(p.n) FROM per_day p
         WHERE p.d BETWEEN o.d - INTERVAL {w} DAY AND o.d) AS BIGINT)
         AS rolling_events
FROM observed o
ORDER BY day
"""


def rolling_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: trailing-7-day distinct users + events over the
    events fact."""
    from ..sources.tables import read_events

    return rolling_distinct_users(read_events(spark, sf_dir))


def rolling_hll_registers(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    p: int = 8,
) -> DataFrame:
    """Trailing-window distinct-user SKETCHES: per-day HyperLogLog
    registers merged across the window by register max — the 100 TB
    production answer to rolling WAU. The exact fan-out
    (``rolling_distinct_users``) re-aggregates raw (user, day) pairs;
    here each day collapses ONCE to <= 2^p register rows, and any
    trailing window is a register-wise max over day-sketches — the
    mergeability that lets a year of daily sketches answer every
    window retroactively without touching raw data.

    Returns the merged register STATE ``(day, bucket, max_rank)`` —
    deterministic integers the DuckDB twin reproduces bit-for-bit (the
    repo's sketch convention: gate the state, bound the estimate in
    tests). Scale: one sketch-sized shuffle for the daily registers, a
    xW register fan-out (W * 2^p rows per day — KBs), one max-groupBy.
    """
    from .sketches import hll_sketch_grouped

    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    daily = hll_sketch_grouped(
        df.select(F.col(user_col), F.to_date(ts_col).alias("d")),
        ["d"],
        user_col,
        p=p,
    )
    observed = daily.select("d").distinct()
    targets = F.explode(
        F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
    ).alias("day")
    return (
        daily.select("bucket", "max_rank", targets)
        .join(
            F.broadcast(observed.select(F.col("d").alias("od"))),
            F.col("day") == F.col("od"),
            "semi",
        )
        .groupBy("day", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
        .orderBy("day", "bucket")
    )


def rolling_hll_query(spark, sf_dir: str) -> DataFrame:
    from ..sources.tables import read_events

    return rolling_hll_registers(read_events(spark, sf_dir))


def rolling_hll_oracle_sql(window_days: int = 7, p: int = 8) -> str:
    w = int(window_days) - 1
    m = 1 << p
    return f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS d,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % {m} AS bucket,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT
           AS wbits
  FROM events
), regs AS (
  SELECT d, bucket,
         max(CASE WHEN wbits = 0 THEN 33
                  ELSE 33 - length(bin(wbits)) END) AS max_rank
  FROM base GROUP BY 1, 2
), days AS (SELECT DISTINCT d FROM regs)
SELECT days.d AS day, r.bucket,
       CAST(max(r.max_rank) AS INT) AS max_rank
FROM days JOIN regs r
  ON r.d BETWEEN days.d - INTERVAL {w} DAY AND days.d
GROUP BY 1, 2
ORDER BY day, bucket
"""
