"""Per-group top-p (nucleus) selection without a group-sized window.

"Keep the heaviest rows of each group until their cumulative weight
reaches fraction p of the group total" — nucleus sampling's data-side
twin, used to cap long-tail sources in corpus mixing (keep the head
that carries p of the mass, drop the tail). The textbook SQL is a
running-sum window over each ENTIRE group — a scale hazard when a
group is a whole source/domain (billions of rows through one window
partition).

Two-phase shape that avoids it (the same histogram-then-refine idea as
distributed quantiles):

1. bucket rows by weight magnitude (integer bit length — floor log2,
   no libm): all rows in a higher bucket outrank all rows in a lower
   one, so bucket order is consistent with the exact (weight desc)
   order;
2. per (group, bucket) sums — a tiny frame; per-group running totals
   over THAT frame (window frames are #buckets ≤ 64 rows) classify
   every bucket: FULL (even its last row is inside the nucleus),
   DROPPED (even its first row is out), or the single BOUNDARY bucket
   that brackets the p threshold;
3. FULL-bucket rows pass through a broadcast semi-join — no sort, no
   window; only BOUNDARY rows (one bucket's worth per group, ~1/log of
   the group under long-tail weights) get the exact within-bucket
   running-sum window seeded with the bucket's preceding cumulative.

Exactness: the kept set is IDENTICAL to the naive definition — row r
(ordered by weight desc, id asc) is kept iff ``cum_before(r) * p_den <
p_num * total`` — all integer arithmetic, verified against the plain
windowed SQL in the DuckDB oracle. Bucket classification uses the
integer-weight fact w >= 1: ``cum_end * den <= num * total`` implies
every row's strict inequality holds.

Worst case: uniform weights put the threshold bucket over most of a
group and phase 3 degrades to the naive window — long-tail weight
distributions (the motivating case) keep it ~1/log2(range).

No counterpart in the reference (corpus-mixing extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_p_filter(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    p_num: int = 1,
    p_den: int = 2,
) -> DataFrame:
    """Rows of each group's nucleus: ordered by (weight desc, id asc),
    keep while the cumulative weight BEFORE the row is < (p_num/p_den)
    of the group total. Weights must be positive integers; rows with
    weight <= 0 or NULL carry no mass and are dropped."""
    if not (0 < p_num <= p_den):
        raise ValueError("need 0 < p_num <= p_den")
    t = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    rows = t.withColumn("bkt", F.length(F.bin("w")))

    per_bucket = rows.groupBy("g", "bkt").agg(F.sum("w").alias("bw"))
    wg = Window.partitionBy("g")
    wrun = (
        Window.partitionBy("g")
        .orderBy(F.desc("bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    classified = per_bucket.select(
        "g",
        "bkt",
        "bw",
        (F.sum("bw").over(wrun) - F.col("bw")).alias("cum_before"),
        F.sum("bw").over(wg).alias("total"),
    ).select(
        "g",
        "bkt",
        "cum_before",
        F.when(
            (F.col("cum_before") + F.col("bw")) * p_den
            <= p_num * F.col("total"),
            F.lit("full"),
        )
        .when(
            F.col("cum_before") * p_den >= p_num * F.col("total"),
            F.lit("dropped"),
        )
        .otherwise(F.lit("boundary"))
        .alias("cls"),
        "total",
    )
    full = rows.join(
        F.broadcast(
            classified.where(F.col("cls") == "full").select("g", "bkt")
        ),
        ["g", "bkt"],
        "semi",
    ).select("g", "id", "w")

    boundary_rows = rows.join(
        F.broadcast(
            classified.where(F.col("cls") == "boundary").select(
                "g", "bkt", "cum_before", "total"
            )
        ),
        ["g", "bkt"],
    )
    wexact = (
        Window.partitionBy("g", "bkt")
        .orderBy(F.desc("w"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary_kept = (
        boundary_rows.withColumn(
            "cum_before_row",
            F.col("cum_before") + F.sum("w").over(wexact) - F.col("w"),
        )
        .where(F.col("cum_before_row") * p_den < p_num * F.col("total"))
        .select("g", "id", "w")
    )
    return full.unionByName(boundary_kept)


def top_p_sources_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: per-source nucleus at p = 1/2 over documents,
    weight = n_chars — 'the head documents carrying half of each
    source's character mass'."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = top_p_filter(docs, "source", "doc_id", "n_chars")
    return out.select(
        F.col("g").alias("source"),
        F.col("id").alias("doc_id"),
        F.col("w").alias("n_chars"),
    ).orderBy("source", F.desc("n_chars"), "doc_id")


TOP_P_SOURCES_SQL = """
WITH t AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w
  FROM documents WHERE n_chars > 0
), c AS (
  SELECT source, doc_id, w,
         sum(w) OVER (PARTITION BY source ORDER BY w DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w
           AS cum_before,
         sum(w) OVER (PARTITION BY source) AS total
  FROM t
)
SELECT source, doc_id, w AS n_chars
FROM c
WHERE cum_before * 2 < total
ORDER BY source, n_chars DESC, doc_id
"""
