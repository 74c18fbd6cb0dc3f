"""Brown-Forsythe (median-based Levene) test — do k cohorts have the
same SPREAD? The variance-homogeneity screen that decides whether a
pooled-variance comparison is even valid, and a drift detector in its
own right (a cohort whose dispersion explodes is misbehaving even when
its mean holds). Median-centered per Brown-Forsythe (1974) — robust
where mean-centered Levene is not.

Two exact distributed pieces composed end-to-end:

1. per-(group, cohort) EXACT lower median of an integer measure via
   per-value counts + a cumulative window over the aggregated value
   frame (never the base table) — the smallest value whose cumulative
   count reaches ``(n+1) div 2``;
2. one-way ANOVA F over the absolute deviations ``z = |x - median|``
   from exact moments: per cohort ``n_i``, ``S_i = sum z`` (BIGINT),
   ``Q_i = sum z²`` (DECIMAL(38,0) — cents² exceeds int64 at realistic
   counts, the overflow-audit rule), with

       SSB = sum_i S_i²/n_i - (sum S)²/N,  SSW = sum_i (Q_i - S_i²/n_i)
       F   = (SSB / (k-1)) / (SSW / (N-k))

   as a FIXED k-term IEEE expression tree (k is a query constant via
   conditional-sum columns — no float SUM whose accumulation order
   could diverge between engines).

Scale shape (100 TB): one ``groupBy(group, cohort, value)`` collapse, a
window over that value-domain frame, a broadcast-size median join back,
then one map-side-combinable moment aggregate.

No counterpart in the reference repo (statistics extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def group_medians(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Exact lower median of ``value_col`` per key tuple:
    ``keys + [med]``. One aggregate + one window over the aggregated
    (key, value) frame."""
    pv = df.groupBy(*keys, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pv.withColumn("_cum", F.sum("_c").over(w))
    tot = pv.groupBy(*keys).agg(F.sum("_c").alias("_n"))
    return (
        cum.join(tot, keys)
        .where(F.col("_cum") >= F.expr("(_n + 1) div 2"))
        .groupBy(*keys)
        .agg(F.min(value_col).alias("med"))
    )


def brown_forsythe_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sample_col: str,
    samples: list[int],
) -> DataFrame:
    """``(group_col, n, n_0..n_{k-1}, f_milli)`` per group — the
    Brown-Forsythe statistic in exact milli units (NULL when any
    cohort has < 2 rows or the within-group deviation is zero)."""
    k = len(samples)
    med = group_medians(df, [group_col, sample_col], value_col)
    z = df.join(med, [group_col, sample_col]).select(
        group_col,
        sample_col,
        F.abs(F.col(value_col) - F.col("med")).alias("_z"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, s in enumerate(samples):
        ind = (F.col(sample_col) == F.lit(s)).cast("long")
        aggs.append(F.sum(ind).cast("long").alias(f"n_{i}"))
        aggs.append(F.sum(ind * F.col("_z")).cast("long").alias(f"s_{i}"))
        aggs.append(
            F.sum(ind * F.col("_z").cast("decimal(38,0)") * F.col("_z"))
            .cast("decimal(38,0)")
            .alias(f"q_{i}")
        )
    g = z.groupBy(group_col).agg(*aggs)

    per = [
        (
            f"CAST(s_{i} AS DOUBLE) * CAST(s_{i} AS DOUBLE)"
            f" / CAST(n_{i} AS DOUBLE)"
        )
        for i in range(k)
    ]
    s_all = " + ".join(f"CAST(s_{i} AS DOUBLE)" for i in range(k))
    ssb = (
        "(" + " + ".join(per) + ")"
        f" - ({s_all}) * ({s_all}) / CAST(n AS DOUBLE)"
    )
    ssw = " + ".join(
        f"(CAST(q_{i} AS DOUBLE) - {p})" for i, p in enumerate(per)
    )
    nonsmall = " AND ".join(f"n_{i} >= 2" for i in range(k))
    out_cols = [group_col, "n"] + [f"n_{i}" for i in range(k)] + [
        "f_milli"
    ]
    return (
        g.withColumn(
            "f_milli",
            F.expr(
                f"CASE WHEN {nonsmall} AND ({ssw}) > 0 THEN "
                f"CAST(floor((({ssb}) / {k - 1}.0) * 1000.0"
                f" / (({ssw}) / (CAST(n AS DOUBLE) - {k}.0)))"
                " AS BIGINT) END"
            ),
        )
        .select(*out_cols)
        .orderBy(group_col)
    )


def brown_forsythe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: do the three deterministic user cohorts show the
    same value DISPERSION? (The spread companion to kruskal_wallis's
    location test on the identical frame.)"""
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    base = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (F.col("user_id") % 3).cast("int").alias("cohort"),
    )
    return brown_forsythe_by_group(
        base, "event_type", "v_cents", "cohort", [0, 1, 2]
    )


BROWN_FORSYTHE_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents,
         CAST(user_id % 3 AS INTEGER) AS cohort
  FROM events
),
pv AS (
  SELECT event_type, cohort, v_cents, count(*) AS c
  FROM base GROUP BY 1, 2, 3
),
cum AS (
  SELECT *,
         sum(c) OVER (PARTITION BY event_type, cohort
                      ORDER BY v_cents ROWS UNBOUNDED PRECEDING) AS cm
  FROM pv
),
tot AS (
  SELECT event_type, cohort, sum(c) AS nn
  FROM pv GROUP BY 1, 2
),
med AS (
  SELECT cum.event_type, cum.cohort, min(v_cents) AS med
  FROM cum JOIN tot ON cum.event_type = tot.event_type
                   AND cum.cohort = tot.cohort
  WHERE cm >= (nn + 1) // 2
  GROUP BY 1, 2
),
z AS (
  SELECT b.event_type, b.cohort, abs(v_cents - med) AS z
  FROM base b JOIN med m
    ON b.event_type = m.event_type AND b.cohort = m.cohort
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_0,
         CAST(sum(CASE WHEN cohort = 0 THEN z ELSE 0 END) AS BIGINT)
           AS s_0,
         CAST(sum(CASE WHEN cohort = 0
                       THEN CAST(z AS HUGEINT) * z ELSE 0 END)
              AS HUGEINT) AS q_0,
         CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_1,
         CAST(sum(CASE WHEN cohort = 1 THEN z ELSE 0 END) AS BIGINT)
           AS s_1,
         CAST(sum(CASE WHEN cohort = 1
                       THEN CAST(z AS HUGEINT) * z ELSE 0 END)
              AS HUGEINT) AS q_1,
         CAST(sum(CASE WHEN cohort = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_2,
         CAST(sum(CASE WHEN cohort = 2 THEN z ELSE 0 END) AS BIGINT)
           AS s_2,
         CAST(sum(CASE WHEN cohort = 2
                       THEN CAST(z AS HUGEINT) * z ELSE 0 END)
              AS HUGEINT) AS q_2
  FROM z GROUP BY 1
)
SELECT event_type, n, n_0, n_1, n_2,
       CASE WHEN n_0 >= 2 AND n_1 >= 2 AND n_2 >= 2 AND
         ((CAST(q_0 AS DOUBLE) - CAST(s_0 AS DOUBLE) * CAST(s_0 AS DOUBLE)
             / CAST(n_0 AS DOUBLE))
          + (CAST(q_1 AS DOUBLE) - CAST(s_1 AS DOUBLE) * CAST(s_1 AS DOUBLE)
             / CAST(n_1 AS DOUBLE))
          + (CAST(q_2 AS DOUBLE) - CAST(s_2 AS DOUBLE) * CAST(s_2 AS DOUBLE)
             / CAST(n_2 AS DOUBLE))) > 0
       THEN CAST(floor(
         (((CAST(s_0 AS DOUBLE) * CAST(s_0 AS DOUBLE) / CAST(n_0 AS DOUBLE)
            + CAST(s_1 AS DOUBLE) * CAST(s_1 AS DOUBLE) / CAST(n_1 AS DOUBLE)
            + CAST(s_2 AS DOUBLE) * CAST(s_2 AS DOUBLE) / CAST(n_2 AS DOUBLE))
           - (CAST(s_0 AS DOUBLE) + CAST(s_1 AS DOUBLE) + CAST(s_2 AS DOUBLE))
             * (CAST(s_0 AS DOUBLE) + CAST(s_1 AS DOUBLE) + CAST(s_2 AS DOUBLE))
             / CAST(n AS DOUBLE)) / 2.0) * 1000.0
         / (((CAST(q_0 AS DOUBLE) - CAST(s_0 AS DOUBLE) * CAST(s_0 AS DOUBLE)
               / CAST(n_0 AS DOUBLE))
             + (CAST(q_1 AS DOUBLE) - CAST(s_1 AS DOUBLE) * CAST(s_1 AS DOUBLE)
               / CAST(n_1 AS DOUBLE))
             + (CAST(q_2 AS DOUBLE) - CAST(s_2 AS DOUBLE) * CAST(s_2 AS DOUBLE)
               / CAST(n_2 AS DOUBLE))) / (CAST(n AS DOUBLE) - 3.0)))
         AS BIGINT) END AS f_milli
FROM g
ORDER BY event_type
"""


def anova_f_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sample_col: str,
    samples: list[int],
) -> DataFrame:
    """``(group_col, n, n_0..n_{k-1}, f_milli)`` per group — the
    classical one-way ANOVA F (equality of cohort MEANS, the
    parametric sibling of ``kruskal_wallis``'s rank test and the
    un-centered counterpart of ``brown_forsythe``'s spread test).

    From exact per-cohort moments ``n_i``, ``S_i = Σv`` (BIGINT — a
    value-weighted sum, not n²-scaled), ``Q_i = Σv²`` (DECIMAL(38,0),
    the overflow-audit rule):

        SSB = Σ S_i²/n_i - (ΣS)²/N,   SSW = Σ (Q_i - S_i²/n_i)
        F = (SSB/(k-1)) / (SSW/(N-k))

    as a fixed k-term IEEE tree. NULL when any cohort has < 2 rows or
    SSW = 0 (all values equal within every cohort)."""
    k = len(samples)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, s in enumerate(samples):
        ind = (F.col(sample_col) == F.lit(s)).cast("long")
        aggs.append(F.sum(ind).cast("long").alias(f"n_{i}"))
        aggs.append(
            F.sum(ind * F.col(value_col)).cast("long").alias(f"s_{i}")
        )
        aggs.append(
            F.sum(
                ind
                * F.col(value_col).cast("decimal(38,0)")
                * F.col(value_col)
            )
            .cast("decimal(38,0)")
            .alias(f"q_{i}")
        )
    g = df.groupBy(group_col).agg(*aggs)

    per = [
        (
            f"CAST(s_{i} AS DOUBLE) * CAST(s_{i} AS DOUBLE)"
            f" / CAST(n_{i} AS DOUBLE)"
        )
        for i in range(k)
    ]
    s_all = " + ".join(f"CAST(s_{i} AS DOUBLE)" for i in range(k))
    ssb = (
        "(" + " + ".join(per) + ")"
        f" - ({s_all}) * ({s_all}) / CAST(n AS DOUBLE)"
    )
    ssw = " + ".join(
        f"(CAST(q_{i} AS DOUBLE) - {p})" for i, p in enumerate(per)
    )
    nonsmall = " AND ".join(f"n_{i} >= 2" for i in range(k))
    out_cols = [group_col, "n"] + [f"n_{i}" for i in range(k)] + [
        "f_milli"
    ]
    return (
        g.withColumn(
            "f_milli",
            F.expr(
                f"CASE WHEN {nonsmall} AND ({ssw}) > 0 THEN "
                f"CAST(floor((({ssb}) / {k - 1}.0) * 1000.0"
                f" / (({ssw}) / (CAST(n AS DOUBLE) - {k}.0)))"
                " AS BIGINT) END"
            ),
        )
        .select(*out_cols)
        .orderBy(group_col)
    )


def anova_f_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: do the three deterministic user cohorts have
    the same MEAN value? (Completes the location/spread/rank triad
    with kruskal_wallis and brown_forsythe on the identical frame.)"""
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    base = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (F.col("user_id") % 3).cast("int").alias("cohort"),
    )
    return anova_f_by_group(
        base, "event_type", "v_cents", "cohort", [0, 1, 2]
    )


ANOVA_F_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents,
         CAST(user_id % 3 AS INTEGER) AS cohort
  FROM events
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_0,
         CAST(sum(CASE WHEN cohort = 0 THEN v_cents ELSE 0 END)
              AS BIGINT) AS s_0,
         CAST(sum(CASE WHEN cohort = 0
                       THEN CAST(v_cents AS HUGEINT) * v_cents
                       ELSE 0 END) AS HUGEINT) AS q_0,
         CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_1,
         CAST(sum(CASE WHEN cohort = 1 THEN v_cents ELSE 0 END)
              AS BIGINT) AS s_1,
         CAST(sum(CASE WHEN cohort = 1
                       THEN CAST(v_cents AS HUGEINT) * v_cents
                       ELSE 0 END) AS HUGEINT) AS q_1,
         CAST(sum(CASE WHEN cohort = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_2,
         CAST(sum(CASE WHEN cohort = 2 THEN v_cents ELSE 0 END)
              AS BIGINT) AS s_2,
         CAST(sum(CASE WHEN cohort = 2
                       THEN CAST(v_cents AS HUGEINT) * v_cents
                       ELSE 0 END) AS HUGEINT) AS q_2
  FROM base GROUP BY 1
)
SELECT event_type, n, n_0, n_1, n_2,
       CASE WHEN n_0 >= 2 AND n_1 >= 2 AND n_2 >= 2 AND
         ((CAST(q_0 AS DOUBLE) - CAST(s_0 AS DOUBLE) * CAST(s_0 AS DOUBLE)
             / CAST(n_0 AS DOUBLE))
          + (CAST(q_1 AS DOUBLE) - CAST(s_1 AS DOUBLE) * CAST(s_1 AS DOUBLE)
             / CAST(n_1 AS DOUBLE))
          + (CAST(q_2 AS DOUBLE) - CAST(s_2 AS DOUBLE) * CAST(s_2 AS DOUBLE)
             / CAST(n_2 AS DOUBLE))) > 0
       THEN CAST(floor(
         (((CAST(s_0 AS DOUBLE) * CAST(s_0 AS DOUBLE) / CAST(n_0 AS DOUBLE)
            + CAST(s_1 AS DOUBLE) * CAST(s_1 AS DOUBLE) / CAST(n_1 AS DOUBLE)
            + CAST(s_2 AS DOUBLE) * CAST(s_2 AS DOUBLE) / CAST(n_2 AS DOUBLE))
           - (CAST(s_0 AS DOUBLE) + CAST(s_1 AS DOUBLE) + CAST(s_2 AS DOUBLE))
             * (CAST(s_0 AS DOUBLE) + CAST(s_1 AS DOUBLE) + CAST(s_2 AS DOUBLE))
             / CAST(n AS DOUBLE)) / 2.0) * 1000.0
         / (((CAST(q_0 AS DOUBLE) - CAST(s_0 AS DOUBLE) * CAST(s_0 AS DOUBLE)
               / CAST(n_0 AS DOUBLE))
             + (CAST(q_1 AS DOUBLE) - CAST(s_1 AS DOUBLE) * CAST(s_1 AS DOUBLE)
               / CAST(n_1 AS DOUBLE))
             + (CAST(q_2 AS DOUBLE) - CAST(s_2 AS DOUBLE) * CAST(s_2 AS DOUBLE)
               / CAST(n_2 AS DOUBLE))) / (CAST(n AS DOUBLE) - 3.0)))
         AS BIGINT) END AS f_milli
FROM g
ORDER BY event_type
"""
