"""Paired-sample tests on the daily grain — Wilcoxon signed-rank
(week-over-week shift: is day t+7 systematically higher than day t?),
Cox-Stuart (the minimal sign-based trend test: second half vs first
half), and McNemar switching (user activity transitions: do more users
STOP than START day-over-day?). The paired complements to the unpaired
``mann_whitney`` / ``kruskal_wallis`` family.

Exactness discipline (the ``ranktests.py`` family): ranks derive from
per-(series, |diff|) counts plus an exclusive prefix sum — DOUBLED
tie-averaged ranks so everything stays integral — and each headline z /
chi-square is ONE fixed IEEE expression tree over exact integers. All
counts here are calendar-bounded (day-grain pairs: ≤ ~3.7k per series
per decade, so rank sums ≤ ~2^26 and the n³ tie term ≤ ~2^36 — BIGINT
holds with >2^25 margin at any corpus scale; the McNemar counts are
user-day scaled, so its squared term is computed in DOUBLE from exact
BIGINTs rather than materializing an n²-scaled integer).

Scale shape (100 TB): everything downstream of one map-side-combinable
daily (or distinct user-day) rollup; the pair joins are equi-joins on
the day-grain frame; windows are partitioned by series over the
aggregated |diff| domain, never the base table.

No counterpart in the reference repo (statistics extension surface,
alongside ``mann_whitney`` / ``runs_test`` / ``kendall_tau``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

WSR_LAG_DAYS = 7


def wilcoxon_signed_rank_by_series(
    daily: DataFrame,
    series_col: str,
    x_col: str,
    y_col: str,
    lag: int = WSR_LAG_DAYS,
) -> DataFrame:
    """``(series_col, n_pairs, w2_plus, z_milli)`` — Wilcoxon
    signed-rank over the pairs ``(y_t, y_{t+lag})``; zero differences
    dropped per the standard treatment. ``w2_plus`` is the DOUBLED
    positive-rank sum (integral even under tie-averaging); the
    normal-approximation z uses the tie-corrected variance

        z = (W+ - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 - T/48)

    with ``T = sum(t³ - t)`` over tied |diff| groups. NULL when no
    nonzero pair exists or the variance degenerates (all |diff| equal
    AND n too small never happens with T ≤ n³-n, but guard > 0).
    """
    a = daily.select(
        series_col,
        F.col(x_col).alias("_xa"),
        F.col(y_col).alias("_ya"),
    )
    b = daily.select(
        series_col,
        F.col(x_col).alias("_xb"),
        F.col(y_col).alias("_yb"),
    )
    pairs = (
        a.join(b, series_col)
        .where(F.col("_xb") == F.col("_xa") + F.lit(lag))
        .select(
            series_col,
            (F.col("_yb") - F.col("_ya")).alias("_d"),
        )
        .where(F.col("_d") != 0)
    )
    per_abs = pairs.groupBy(
        series_col, F.abs(F.col("_d")).alias("_ad")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum((F.col("_d") > 0).cast("long")).cast("long").alias("c_pos"),
    )
    w_lt = (
        Window.partitionBy(series_col)
        .orderBy("_ad")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_abs.withColumn(
        "cum_lt", F.coalesce(F.sum("c").over(w_lt), F.lit(0))
    )
    g = ranked.groupBy(series_col).agg(
        F.sum("c").cast("long").alias("n_pairs"),
        F.sum(F.expr("c_pos * (2 * cum_lt + c + 1)"))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.expr("c * c * c - c")).cast("long").alias("t_corr"),
    )
    var = (
        "(CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0)"
        " * (2.0 * n_pairs + 1.0) / 24.0"
        " - CAST(t_corr AS DOUBLE) / 48.0)"
    )
    z = (
        "(CAST(w2_plus AS DOUBLE) / 2.0"
        " - CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0) / 4.0)"
        f" / sqrt({var})"
    )
    return (
        g.withColumn(
            "z_milli",
            F.expr(
                f"CASE WHEN n_pairs > 0 AND {var} > 0 THEN "
                f"CAST(floor(({z}) * 1000.0) AS BIGINT) END"
            ),
        )
        .select(series_col, "n_pairs", "w2_plus", "z_milli")
        .orderBy(series_col)
    )


def wilcoxon_signed_rank_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per event type: is daily volume a week later systematically
    shifted vs the same weekday one week earlier? (Deseasonalized
    paired trend — the signed-rank companion to ``kendall_tau``.)"""
    from faers_datalakehouse_spark.operators.tstests import _daily

    return wilcoxon_signed_rank_by_series(
        _daily(spark, sf_dir), "event_type", "x", "y"
    )


WILCOXON_SIGNED_RANK_SQL = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, b.y - a.y AS d
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type
              AND b.x = a.x + {WSR_LAG_DAYS}
  WHERE b.y <> a.y
),
per_abs AS (
  SELECT event_type, abs(d) AS ad,
         CAST(count(*) AS BIGINT) AS c,
         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_pos
  FROM pairs GROUP BY 1, 2
),
ranked AS (
  SELECT *,
         COALESCE(sum(c) OVER (PARTITION BY event_type ORDER BY ad
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_lt
  FROM per_abs
),
g AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_pairs,
         CAST(sum(c_pos * (2 * cum_lt + c + 1)) AS BIGINT) AS w2_plus,
         CAST(sum(c * c * c - c) AS BIGINT) AS t_corr
  FROM ranked GROUP BY 1
)
SELECT event_type, n_pairs, w2_plus,
       CASE WHEN n_pairs > 0 AND
         (CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0)
          * (2.0 * n_pairs + 1.0) / 24.0
          - CAST(t_corr AS DOUBLE) / 48.0) > 0 THEN
         CAST(floor((CAST(w2_plus AS DOUBLE) / 2.0
             - CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0) / 4.0)
           / sqrt(CAST(n_pairs AS DOUBLE) * (n_pairs + 1.0)
             * (2.0 * n_pairs + 1.0) / 24.0
             - CAST(t_corr AS DOUBLE) / 48.0) * 1000.0)
         AS BIGINT) END AS z_milli
FROM g
ORDER BY event_type
"""


def cox_stuart_by_series(
    daily: DataFrame, series_col: str, x_col: str, y_col: str
) -> DataFrame:
    """``(series_col, n_days, n_pos, n_neg, z_milli)`` — Cox-Stuart
    sign trend: pair the i-th day with the (i+c)-th, ``c = (n+1) div
    2`` (odd n drops the middle observation), count positive/negative
    second-minus-first differences (ties dropped), and take the sign-
    test normal approximation ``z = (n_pos - n_neg)/sqrt(n_pos +
    n_neg)``. NULL when every pair ties or fewer than 2 days exist."""
    w = Window.partitionBy(series_col).orderBy(x_col)
    rn = daily.select(
        series_col,
        F.col(y_col).alias("_y"),
        F.row_number().over(w).alias("_rn"),
    )
    cnt = rn.groupBy(series_col).agg(
        F.max("_rn").cast("long").alias("n_days")
    )
    # c = (n+1) div 2; keep it integral on both sides of the join key
    a = (
        rn.join(cnt, series_col)
        .withColumn("_c", F.expr("(n_days + 1) div 2"))
        .where(F.col("_rn") + F.col("_c") <= F.col("n_days"))
        .select(
            series_col, "n_days", "_rn", "_c",
            F.col("_y").alias("_y1"),
        )
    )
    b = rn.select(
        series_col,
        F.col("_rn").alias("_rn2"),
        F.col("_y").alias("_y2"),
    )
    paired = a.join(
        b,
        (a[series_col] == b[series_col])
        & (F.col("_rn2") == F.col("_rn") + F.col("_c")),
    ).select(a[series_col], "n_days", "_y1", "_y2")
    g = paired.groupBy(series_col, "n_days").agg(
        F.sum((F.col("_y2") > F.col("_y1")).cast("long"))
        .cast("long")
        .alias("n_pos"),
        F.sum((F.col("_y2") < F.col("_y1")).cast("long"))
        .cast("long")
        .alias("n_neg"),
    )
    return (
        g.withColumn(
            "z_milli",
            F.expr(
                "CASE WHEN n_pos + n_neg > 0 THEN "
                "CAST(floor((CAST(n_pos AS DOUBLE) - n_neg) * 1000.0"
                " / sqrt(CAST(n_pos AS DOUBLE) + n_neg)) AS BIGINT) END"
            ),
        )
        .select(series_col, "n_days", "n_pos", "n_neg", "z_milli")
        .orderBy(series_col)
    )


def cox_stuart_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: is the second half of the observation window
    systematically above the first? (The assumption-free trend screen
    next to ``theil_sen``/``kendall_tau``.)"""
    from faers_datalakehouse_spark.operators.tstests import _daily

    return cox_stuart_by_series(_daily(spark, sf_dir), "event_type", "x", "y")


COX_STUART_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
rn AS (
  SELECT event_type, y,
         row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn
  FROM daily
),
cnt AS (
  SELECT event_type, CAST(max(rn) AS BIGINT) AS n_days
  FROM rn GROUP BY 1
),
paired AS (
  SELECT a.event_type, c.n_days, a.y AS y1, b.y AS y2
  FROM rn a
  JOIN cnt c ON c.event_type = a.event_type
  JOIN rn b ON b.event_type = a.event_type
           AND b.rn = a.rn + (c.n_days + 1) // 2
  WHERE a.rn + (c.n_days + 1) // 2 <= c.n_days
),
g AS (
  SELECT event_type, n_days,
         CAST(sum(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
         CAST(sum(CASE WHEN y2 < y1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_neg
  FROM paired GROUP BY 1, 2
)
SELECT event_type, n_days, n_pos, n_neg,
       CASE WHEN n_pos + n_neg > 0 THEN
         CAST(floor((CAST(n_pos AS DOUBLE) - n_neg) * 1000.0
           / sqrt(CAST(n_pos AS DOUBLE) + n_neg)) AS BIGINT) END
         AS z_milli
FROM g
ORDER BY event_type
"""


def mcnemar_switching_from_acts(acts: DataFrame) -> DataFrame:
    """``(event_type, n_stop, n_start, chi2_milli)`` — McNemar's test
    on day-over-day user activity transitions over a distinct
    ``(event_type, user_id, x)`` activity frame: ``n_stop`` counts
    (user, day) cells active on day d but not d+1 (d below the type's
    last day), ``n_start`` the reverse (active on d, not on d-1, d
    above the first day). Under "churn = onboarding" the discordant
    counts match; ``chi2 = (b-c)²/(b+c)`` flags asymmetric drift.
    The squared term is DOUBLE over exact BIGINTs (user-day counts are
    corpus-scaled — an integer square would be n²-scaled, the
    overflow-audit rule). NULL when b + c = 0."""
    bounds = acts.groupBy("event_type").agg(
        F.min("x").alias("_minx"), F.max("x").alias("_maxx")
    )
    nxt = acts.select(
        "event_type",
        "user_id",
        (F.col("x") - 1).alias("x"),
    )
    prv = acts.select(
        "event_type",
        "user_id",
        (F.col("x") + 1).alias("x"),
    )
    stops = (
        acts.join(bounds, "event_type")
        .where(F.col("x") < F.col("_maxx"))
        .join(nxt, ["event_type", "user_id", "x"], "left_anti")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_stop"))
    )
    starts = (
        acts.join(bounds, "event_type")
        .where(F.col("x") > F.col("_minx"))
        .join(prv, ["event_type", "user_id", "x"], "left_anti")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_start"))
    )
    g = (
        bounds.select("event_type")
        .join(stops, "event_type", "left")
        .join(starts, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_stop", F.lit(0)).alias("n_stop"),
            F.coalesce("n_start", F.lit(0)).alias("n_start"),
        )
    )
    return (
        g.withColumn(
            "chi2_milli",
            F.expr(
                "CASE WHEN n_stop + n_start > 0 THEN "
                "CAST(floor((CAST(n_stop AS DOUBLE) - n_start)"
                " * (CAST(n_stop AS DOUBLE) - n_start) * 1000.0"
                " / (CAST(n_stop AS DOUBLE) + n_start)) AS BIGINT) END"
            ),
        )
        .orderBy("event_type")
    )


def mcnemar_switching_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per event type: do more users STOP than START day-over-day?"""
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    acts = events.select(
        "event_type",
        "user_id",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .alias("x"),
    ).distinct()
    return mcnemar_switching_from_acts(acts)


MCNEMAR_SQL = """
WITH acts AS (
  SELECT DISTINCT event_type, user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x
  FROM events
),
bounds AS (
  SELECT event_type, min(x) AS minx, max(x) AS maxx
  FROM acts GROUP BY 1
),
stops AS (
  SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_stop
  FROM acts a JOIN bounds bo ON bo.event_type = a.event_type
  WHERE a.x < bo.maxx AND NOT EXISTS (
    SELECT 1 FROM acts n
    WHERE n.event_type = a.event_type AND n.user_id = a.user_id
      AND n.x = a.x + 1)
  GROUP BY 1
),
starts AS (
  SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_start
  FROM acts a JOIN bounds bo ON bo.event_type = a.event_type
  WHERE a.x > bo.minx AND NOT EXISTS (
    SELECT 1 FROM acts p
    WHERE p.event_type = a.event_type AND p.user_id = a.user_id
      AND p.x = a.x - 1)
  GROUP BY 1
)
SELECT bo.event_type,
       CAST(COALESCE(st.n_stop, 0) AS BIGINT) AS n_stop,
       CAST(COALESCE(sa.n_start, 0) AS BIGINT) AS n_start,
       CASE WHEN COALESCE(st.n_stop, 0) + COALESCE(sa.n_start, 0) > 0
       THEN CAST(floor(
         (CAST(COALESCE(st.n_stop, 0) AS DOUBLE)
            - COALESCE(sa.n_start, 0))
         * (CAST(COALESCE(st.n_stop, 0) AS DOUBLE)
            - COALESCE(sa.n_start, 0)) * 1000.0
         / (CAST(COALESCE(st.n_stop, 0) AS DOUBLE)
            + COALESCE(sa.n_start, 0))) AS BIGINT) END AS chi2_milli
FROM bounds bo
LEFT JOIN stops st ON st.event_type = bo.event_type
LEFT JOIN starts sa ON sa.event_type = bo.event_type
ORDER BY bo.event_type
"""
