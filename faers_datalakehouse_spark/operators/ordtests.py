"""Ordered-alternative and integrated-distance two-sample statistics —
Jonckheere-Terpstra (is there a MONOTONE dose-response across ordered
cohorts? strictly sharper than Kruskal-Wallis when the alternative is
ordered) and a Cramér-von Mises-type drift statistic (the INTEGRATED
squared ECDF gap between two cohorts — the whole-distribution
complement to ``ks_drift``'s single worst point).

Exactness discipline (the ``ranktests.py`` family): both statistics
derive from per-(group, value) counts plus prefix sums over the
aggregated value domain — never per-row ranks. Jonckheere's pairwise
U counts use DOUBLED form (2·#less + #tied) so tie-averaging stays
integral, with the n²/n³-scaled sums in DECIMAL(38,0) (HUGEINT twins —
the overflow-audit rule at birth). The CvM ECDF gap per support point
is **milli-quantized**: ``d_milli = floor(|n_b·F_a - n_a·F_b| · 1000 /
(n_a·n_b))`` is one correctly-rounded IEEE expression over exact
integers (identical in both engines), and the pooled-weighted sum of
``d_milli²`` stays integral — a float SUM of raw gaps would be
accumulation-order-dependent and can never hash cross-engine. The
quantization error is bounded by 2e-3 per support point and is part of
the operator's contract.

Scale shape (100 TB): one ``groupBy(group, value)`` collapse each
(map-side combinable), prefix-sum windows partitioned by group over the
aggregated value frame, then one fixed-k rollup. No pair joins, no
per-row windows.

No counterpart in the reference repo (statistics extension surface,
alongside ``kruskal_wallis`` / ``ks_drift`` / ``cochran_armitage``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def jonckheere_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sample_col: str,
    samples: list[int],
) -> DataFrame:
    """``(group_col, n, n_0..n_{k-1}, z_milli)`` — the Jonckheere-
    Terpstra statistic for the ordered alternative ``samples[0] ≤ … ≤
    samples[k-1]`` in milli z units. ``J = Σ_{i<j} U_ij`` with ties
    counted half (DOUBLED internally); the normal approximation uses
    the standard no-tie variance ``(N²(2N+3) - Σn_i²(2n_i+3))/72``
    (documented approximation — the twin matches it exactly). NULL
    when any cohort is empty or N < 2."""
    k = len(samples)
    aggs = []
    for i, s in enumerate(samples):
        aggs.append(
            F.sum((F.col(sample_col) == F.lit(s)).cast("long"))
            .cast("long")
            .alias(f"c_{i}")
        )
    per_value = df.groupBy(group_col, value_col).agg(*aggs)
    w_lt = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_value
    for i in range(k):
        ranked = ranked.withColumn(
            f"cum_{i}",
            F.coalesce(F.sum(f"c_{i}").over(w_lt), F.lit(0)),
        )
    # doubled pairwise U: for i<j, per value contribution
    # c_j * (2*cum_i + c_i)  — 2*(#less from cohort i) + #tied
    contrib = " + ".join(
        f"CAST(c_{j} AS DECIMAL(38,0)) * (2 * cum_{i} + c_{i})"
        for i in range(k)
        for j in range(i + 1, k)
    )
    gaggs = [
        F.sum(F.expr(contrib)).cast("decimal(38,0)").alias("j2"),
    ]
    for i in range(k):
        gaggs.append(F.sum(f"c_{i}").cast("long").alias(f"n_{i}"))
    g = ranked.groupBy(group_col).agg(*gaggs)
    n_all = " + ".join(f"n_{i}" for i in range(k))
    g = g.withColumn("n", F.expr(f"CAST({n_all} AS BIGINT)"))
    sum_sq = " + ".join(
        f"CAST(n_{i} AS DECIMAL(38,0)) * n_{i}" for i in range(k)
    )
    sum_var = " + ".join(
        f"CAST(n_{i} AS DECIMAL(38,0)) * n_{i} * (2 * n_{i} + 3)"
        for i in range(k)
    )
    e2 = (
        f"(CAST(n AS DECIMAL(38,0)) * n - ({sum_sq}))"
    )  # = 2*E[J] since E[J] = (N² - Σn_i²)/4 ... doubled twice below
    var = (
        "((CAST(n AS DOUBLE) * n * (2.0 * n + 3.0)"
        f" - CAST({sum_var} AS DOUBLE)) / 72.0)"
    )
    nonempty = " AND ".join(f"n_{i} > 0" for i in range(k))
    # z = (J - E[J]) / sqrt(Var), with J = j2/2 and E[J] = e2/4... care:
    # E[J] = (N² - Σn_i²)/4, so J - E = j2/2 - e2/4 = (2*j2 - e2)/4
    z = (
        f"((2.0 * CAST(j2 AS DOUBLE) - CAST({e2} AS DOUBLE)) / 4.0)"
        f" / sqrt({var})"
    )
    out_cols = [group_col, "n"] + [f"n_{i}" for i in range(k)] + [
        "z_milli"
    ]
    return (
        g.withColumn(
            "z_milli",
            F.expr(
                f"CASE WHEN n > 1 AND {nonempty} AND {var} > 0 THEN "
                f"CAST(floor(({z}) * 1000.0) AS BIGINT) END"
            ),
        )
        .select(*out_cols)
        .orderBy(group_col)
    )


def jonckheere_trend_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per event type: do event values INCREASE across the ordered
    cohorts 0 < 1 < 2 (``user_id % 3``)? (The ordered-alternative
    sharpening of ``kruskal_wallis`` on the identical frame.)"""
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    base = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (F.col("user_id") % 3).cast("int").alias("cohort"),
    )
    return jonckheere_by_group(
        base, "event_type", "v_cents", "cohort", [0, 1, 2]
    )


JONCKHEERE_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents,
         CAST(user_id % 3 AS INTEGER) AS cohort
  FROM events
),
per_value AS (
  SELECT event_type, v_cents,
         sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS c_0,
         sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS c_1,
         sum(CASE WHEN cohort = 2 THEN 1 ELSE 0 END) AS c_2
  FROM base GROUP BY 1, 2
),
ranked AS (
  SELECT *,
         COALESCE(sum(c_0) OVER (PARTITION BY event_type
             ORDER BY v_cents ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS cum_0,
         COALESCE(sum(c_1) OVER (PARTITION BY event_type
             ORDER BY v_cents ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS cum_1
  FROM per_value
),
g AS (
  SELECT event_type,
         CAST(sum(CAST(c_1 AS HUGEINT) * (2 * cum_0 + c_0)
                + CAST(c_2 AS HUGEINT) * (2 * cum_0 + c_0)
                + CAST(c_2 AS HUGEINT) * (2 * cum_1 + c_1))
              AS HUGEINT) AS j2,
         CAST(sum(c_0) AS BIGINT) AS n_0,
         CAST(sum(c_1) AS BIGINT) AS n_1,
         CAST(sum(c_2) AS BIGINT) AS n_2
  FROM ranked GROUP BY 1
)
SELECT event_type,
       CAST(n_0 + n_1 + n_2 AS BIGINT) AS n, n_0, n_1, n_2,
       CASE WHEN n_0 + n_1 + n_2 > 1
            AND n_0 > 0 AND n_1 > 0 AND n_2 > 0
            AND ((CAST(n_0 + n_1 + n_2 AS DOUBLE)
                  * (n_0 + n_1 + n_2)
                  * (2.0 * (n_0 + n_1 + n_2) + 3.0)
                 - CAST(CAST(n_0 AS HUGEINT) * n_0 * (2 * n_0 + 3)
                      + CAST(n_1 AS HUGEINT) * n_1 * (2 * n_1 + 3)
                      + CAST(n_2 AS HUGEINT) * n_2 * (2 * n_2 + 3)
                      AS DOUBLE)) / 72.0) > 0 THEN
         CAST(floor(
           ((2.0 * CAST(j2 AS DOUBLE)
             - CAST(CAST(n_0 + n_1 + n_2 AS HUGEINT)
                    * (n_0 + n_1 + n_2)
                  - (CAST(n_0 AS HUGEINT) * n_0
                     + CAST(n_1 AS HUGEINT) * n_1
                     + CAST(n_2 AS HUGEINT) * n_2) AS DOUBLE)) / 4.0)
           / sqrt((CAST(n_0 + n_1 + n_2 AS DOUBLE)
                   * (n_0 + n_1 + n_2)
                   * (2.0 * (n_0 + n_1 + n_2) + 3.0)
                  - CAST(CAST(n_0 AS HUGEINT) * n_0 * (2 * n_0 + 3)
                       + CAST(n_1 AS HUGEINT) * n_1 * (2 * n_1 + 3)
                       + CAST(n_2 AS HUGEINT) * n_2 * (2 * n_2 + 3)
                       AS DOUBLE)) / 72.0)
           * 1000.0) AS BIGINT) END AS z_milli
FROM g
ORDER BY event_type
"""


def cvm_drift_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sample_col: str,
    sample_a: int,
    sample_b: int,
) -> DataFrame:
    """``(group_col, n_a, n_b, psi_micro)`` — pooled-weighted mean
    squared ECDF gap between two cohorts, in micro units:

        psi = (1/N) Σ_values (c_a + c_b) · (F_a/n_a - F_b/n_b)²

    with the per-point gap milli-quantized (see module doc). psi_micro
    = floor(psi · 1e6) up to that quantization. 0 = identical
    distributions; 1e6·(max gap)² bounds the top. NULL when either
    cohort is empty."""
    per_value = df.groupBy(group_col, value_col).agg(
        F.sum((F.col(sample_col) == F.lit(sample_a)).cast("long"))
        .cast("long")
        .alias("c_a"),
        F.sum((F.col(sample_col) == F.lit(sample_b)).cast("long"))
        .cast("long")
        .alias("c_b"),
    )
    w_le = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(group_col)
    cum = (
        per_value.withColumn("f_a", F.sum("c_a").over(w_le))
        .withColumn("f_b", F.sum("c_b").over(w_le))
        .withColumn("n_a", F.sum("c_a").over(w_all))
        .withColumn("n_b", F.sum("c_b").over(w_all))
    )
    # |n_b·F_a - n_a·F_b| is n²-scaled -> DECIMAL(38,0); the milli
    # quantization is one IEEE expression (identical cross-engine)
    d = cum.withColumn(
        "d_milli",
        F.expr(
            "CASE WHEN n_a > 0 AND n_b > 0 THEN "
            "CAST(floor(CAST(abs(CAST(n_b AS DECIMAL(38,0)) * f_a"
            " - CAST(n_a AS DECIMAL(38,0)) * f_b) AS DOUBLE)"
            " * 1000.0 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
            " AS BIGINT) ELSE 0 END"
        ),
    )
    g = d.groupBy(group_col).agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.sum(
            F.expr(
                "CAST(c_a + c_b AS DECIMAL(38,0)) * d_milli * d_milli"
            )
        )
        .cast("decimal(38,0)")
        .alias("wsum"),
    )
    return (
        g.withColumn(
            "psi_micro",
            F.expr(
                "CASE WHEN n_a > 0 AND n_b > 0 THEN "
                "CAST(floor(CAST(wsum AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) + n_b)) AS BIGINT) END"
            ),
        )
        .select(group_col, "n_a", "n_b", "psi_micro")
        .orderBy(group_col)
    )


def cvm_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the integrated squared ECDF gap between the two
    parity cohorts (``user_id % 2``) — the whole-distribution drift
    companion to ``ks_drift``'s max-gap."""
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    base = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (F.col("user_id") % 2).cast("int").alias("cohort"),
    )
    return cvm_drift_by_group(
        base, "event_type", "v_cents", "cohort", 0, 1
    )


CVM_DRIFT_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents,
         CAST(user_id % 2 AS INTEGER) AS cohort
  FROM events
),
per_value AS (
  SELECT event_type, v_cents,
         CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_a,
         CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_b
  FROM base GROUP BY 1, 2
),
cum AS (
  SELECT *,
         sum(c_a) OVER (PARTITION BY event_type ORDER BY v_cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f_a,
         sum(c_b) OVER (PARTITION BY event_type ORDER BY v_cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f_b,
         sum(c_a) OVER (PARTITION BY event_type) AS n_a,
         sum(c_b) OVER (PARTITION BY event_type) AS n_b
  FROM per_value
),
d AS (
  SELECT *,
         CASE WHEN n_a > 0 AND n_b > 0 THEN
           CAST(floor(CAST(abs(CAST(n_b AS HUGEINT) * f_a
               - CAST(n_a AS HUGEINT) * f_b) AS DOUBLE)
             * 1000.0 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
           AS BIGINT) ELSE 0 END AS d_milli
  FROM cum
),
g AS (
  SELECT event_type,
         CAST(max(n_a) AS BIGINT) AS n_a,
         CAST(max(n_b) AS BIGINT) AS n_b,
         CAST(sum(CAST(c_a + c_b AS HUGEINT) * d_milli * d_milli)
              AS HUGEINT) AS wsum
  FROM d GROUP BY 1
)
SELECT event_type, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         CAST(floor(CAST(wsum AS DOUBLE)
           / (CAST(n_a AS DOUBLE) + n_b)) AS BIGINT) END AS psi_micro
FROM g
ORDER BY event_type
"""
