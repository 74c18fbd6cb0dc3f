"""Friedman's test on calendar blocks — do the 7 weekdays differ
once week-level volume shifts are blocked out? The repeated-measures
companion to ``kruskal_wallis`` (which would confound week effects
into the weekday comparison) and the significance test behind
``seasonal_decompose``'s day-of-week indices.

Blocks are ``x div 7`` weeks of epoch days (deterministic and
identical cross-engine on nonnegative days — no ISO-week year-boundary
ambiguity), treatments the 7 positions ``x % 7``. Only COMPLETE blocks
(all 7 days present) enter, per the classical design.

Exactness discipline: within-block midranks are DOUBLED (``r2 = 2·rank
+ ties - 1`` from a rank/count window over the ≤7-row block) so tie-
averaging stays integral; the treatment rank sums pivot into 7 FIXED
columns and the midrank Friedman statistic

    Q = 12/(b·k·(k+1)) · Σ_j R_j² - 3·b·(k+1)

is one IEEE expression tree over exact BIGINTs (R2_j ≤ 15·b, b
calendar-bounded — ~520 weeks/decade — so every integer is tiny at any
corpus scale). NULL when fewer than 2 complete blocks exist.

Scale shape (100 TB): one map-side-combinable daily rollup; the rank
windows run over ≤7-row partitions of the day-grain frame; one fixed-k
rollup per series.

No counterpart in the reference repo (statistics extension surface,
alongside ``kruskal_wallis`` / ``seasonal_decompose``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FRIEDMAN_K = 7


def friedman_by_series(
    daily: DataFrame, series_col: str, x_col: str, y_col: str
) -> DataFrame:
    """``(series_col, n_blocks, q_milli)`` — midrank Friedman Q over
    complete ``x div 7`` blocks with ``x % 7`` treatments."""
    k = FRIEDMAN_K
    base = daily.select(
        series_col,
        F.expr(f"{x_col} div {k}").alias("_blk"),
        F.expr(f"{x_col} % {k}").alias("_dow"),
        F.col(y_col).alias("_y"),
    )
    sizes = base.groupBy(series_col, "_blk").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    complete = base.join(
        sizes.where(F.col("_bn") == k).select(series_col, "_blk"),
        [series_col, "_blk"],
    )
    w_rank = Window.partitionBy(series_col, "_blk").orderBy("_y")
    w_tie = Window.partitionBy(series_col, "_blk", "_y")
    ranked = complete.withColumn(
        "_r2",
        2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1,
    )
    aggs = [
        (F.count_distinct(F.col("_blk"))).cast("long").alias("n_blocks")
    ]
    for j in range(k):
        aggs.append(
            F.sum(
                F.when(F.col("_dow") == j, F.col("_r2")).otherwise(0)
            )
            .cast("long")
            .alias(f"r2_{j}")
        )
    g = ranked.groupBy(series_col).agg(*aggs)
    sum_sq = " + ".join(
        f"CAST(r2_{j} AS DOUBLE) * CAST(r2_{j} AS DOUBLE) / 4.0"
        for j in range(k)
    )
    q = (
        f"12.0 / (CAST(n_blocks AS DOUBLE) * {k}.0 * {k + 1}.0)"
        f" * ({sum_sq})"
        f" - 3.0 * CAST(n_blocks AS DOUBLE) * {k + 1}.0"
    )
    return (
        g.withColumn(
            "q_milli",
            F.expr(
                f"CASE WHEN n_blocks >= 2 THEN "
                f"CAST(floor(({q}) * 1000.0) AS BIGINT) END"
            ),
        )
        .select(series_col, "n_blocks", "q_milli")
        .orderBy(series_col)
    )


def friedman_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: blocked day-of-week effect on daily volume."""
    from faers_datalakehouse_spark.operators.tstests import _daily

    return friedman_by_series(_daily(spark, sf_dir), "event_type", "x", "y")


def friedman_oracle_sql(k: int = FRIEDMAN_K) -> str:
    pivots = ",\n         ".join(
        f"CAST(sum(CASE WHEN dow = {j} THEN r2 ELSE 0 END) AS BIGINT)"
        f" AS r2_{j}"
        for j in range(k)
    )
    sum_sq = " + ".join(
        f"CAST(r2_{j} AS DOUBLE) * CAST(r2_{j} AS DOUBLE) / 4.0"
        for j in range(k)
    )
    q = (
        f"12.0 / (CAST(n_blocks AS DOUBLE) * {k}.0 * {k + 1}.0)"
        f" * ({sum_sq})"
        f" - 3.0 * CAST(n_blocks AS DOUBLE) * {k + 1}.0"
    )
    return f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, x // {k} AS blk, x % {k} AS dow, y
  FROM daily
),
complete AS (
  SELECT event_type, blk
  FROM base GROUP BY 1, 2 HAVING count(*) = {k}
),
ranked AS (
  SELECT b.event_type, b.blk, b.dow,
         2 * rank() OVER (PARTITION BY b.event_type, b.blk
                          ORDER BY b.y)
           + count(*) OVER (PARTITION BY b.event_type, b.blk, b.y)
           - 1 AS r2
  FROM base b JOIN complete c
    ON c.event_type = b.event_type AND c.blk = b.blk
),
g AS (
  SELECT event_type,
         CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
         {pivots}
  FROM ranked GROUP BY 1
)
SELECT event_type, n_blocks,
       CASE WHEN n_blocks >= 2 THEN
         CAST(floor(({q}) * 1000.0) AS BIGINT) END AS q_milli
FROM g
ORDER BY event_type
"""
