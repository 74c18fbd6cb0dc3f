"""RFM segmentation — the classic recency/frequency/monetary customer
scoring (Hughes, "Strategic Database Marketing" 1994): each customer
gets three quintile scores (5 = best) and the output is the 125-cell
segment census marketers actually consume ("champions" = 555,
"at-risk big spenders" = 155, ...).

Deterministic quintiles WITHOUT ntile: score = ``(rank - 1) * 5 div n
+ 1`` over an exact global row_number with the customer key as
tiebreak — positional, integer, and identical in the DuckDB twin
(ntile's remainder-distribution rules are engine-trivia this sidesteps).
Recency inverts the scale (most recent = 5).

Scale shape (100 TB): per-customer RFM facts are one
map-side-combinable ``groupBy(custkey)``; the global anchor date rides
a 1-row broadcast (in-plan, no eager count — the ``decayed_activity``
pattern); each of the three global ranks uses
``bucketed_global_rank`` — the two-phase bucketed scan — so NO
single-partition window ever forms over the customer frame. Output is
the <=125-row census.

No counterpart in the reference repo (analytics extension surface,
alongside ``cohort_retention`` / ``quantile_binning``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.normalize import (
    bucketed_global_rank,
)


def _quintile(rank_col: str, n_col: str) -> F.Column:
    return (
        F.expr(f"({rank_col} - 1) * 5 div {n_col}") + 1
    ).cast("int")


def rfm_scores(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Per-customer ``(custkey, recency_days, freq, monetary_c,
    r_score, f_score, m_score)`` — quintile scores 1..5, 5 best."""
    anchor = orders.agg(
        F.max(F.col(date_col)).alias("_anchor")
    )  # 1-row broadcast, derived in-plan
    per_cust = (
        orders.groupBy(F.col(cust_col).alias("custkey"))
        .agg(
            F.max(F.col(date_col)).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(
                F.round(F.col(amount_col) * 100).cast("long")
            ).alias("monetary_c"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "custkey",
            F.datediff("_anchor", "_last").cast("long").alias(
                "recency_days"
            ),
            "freq",
            "monetary_c",
        )
    )
    all_col = F.lit("all").alias("_g")
    # The three rank levels nest: each level references its input ~4x
    # (bucketed_global_rank consumes it twice, the offsets join twice
    # more), so unchecked the executed plan re-derives the per-customer
    # aggregate ~4^3 times. Checkpointing the customer-count-sized frame
    # between levels truncates that to one derivation per level — the
    # same caller-side fix as spearman_by_group (r12, guide §3.3; the
    # shared primitive itself stays lazy for its light single-level
    # consumers). Measured 2.76 -> 1.90 s median at sf0.1, results
    # identical.
    r = bucketed_global_rank(
        per_cust.withColumn("_g", all_col),
        "_g",
        "recency_days",
        "custkey",
    ).withColumnsRenamed({"rnk": "_rr", "n_group": "_n"}).localCheckpoint(
        eager=True
    )
    f = bucketed_global_rank(r, "_g", "freq", "custkey").drop(
        "n_group"
    ).withColumnRenamed("rnk", "_rf").localCheckpoint(eager=True)
    m = bucketed_global_rank(f, "_g", "monetary_c", "custkey").drop(
        "n_group"
    ).withColumnRenamed("rnk", "_rm")
    return m.select(
        "custkey",
        "recency_days",
        "freq",
        "monetary_c",
        (F.lit(6) - _quintile("_rr", "_n")).alias("r_score"),
        _quintile("_rf", "_n").alias("f_score"),
        _quintile("_rm", "_n").alias("m_score"),
    )


def rfm_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """125-cell RFM census of the order book: segment sizes and the
    money in each segment."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    scored = rfm_scores(orders)
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_c").cast("long").alias("segment_c"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


RFM_SEGMENTS_SQL = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS _last,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_c
  FROM orders GROUP BY 1
),
anchor AS (SELECT max(o_orderdate) AS _anchor FROM orders),
base AS (
  SELECT custkey,
         CAST(date_diff('day', _last, _anchor) AS BIGINT)
           AS recency_days,
         freq, monetary_c
  FROM per_cust CROSS JOIN anchor
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY recency_days, custkey) AS rr,
         row_number() OVER (ORDER BY freq, custkey) AS rf,
         row_number() OVER (ORDER BY monetary_c, custkey) AS rm,
         count(*) OVER () AS n
  FROM base
),
scored AS (
  SELECT custkey, monetary_c,
         CAST(6 - ((rr - 1) * 5 // n + 1) AS INT) AS r_score,
         CAST((rf - 1) * 5 // n + 1 AS INT) AS f_score,
         CAST((rm - 1) * 5 // n + 1 AS INT) AS m_score
  FROM ranked
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary_c) AS BIGINT) AS segment_c
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""
