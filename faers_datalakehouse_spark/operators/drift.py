"""Distribution-drift monitoring: per-slice Kolmogorov-Smirnov distance
against the full corpus.

A mixture pipeline needs to notice when one source's length/quality
distribution walks away from the corpus (scraper regressions, template
floods). The KS statistic ``D = max_x |F_slice(x) - F_corpus(x)]`` is the
standard nonparametric detector; here both CDFs are evaluated on the
shared grid of observed values in exact integer milli-units
(``c * 1000000 div n`` — deterministic, no ratio-of-counts overflow at
any n < 9e12), so the reported gap is bit-identical cross-engine and
within 2e-6 of the exact statistic.

Scale shape: value counts are one partial-agged groupBy per (slice,
value); the evaluation grid is the DISTINCT value domain (bounded by the
measure's resolution, not row count); per-slice CDFs are keyed windows
over |grid| rows after a slices x grid expansion (|slices| * |grid| rows
— KBs for any bounded-domain measure); the final max-gap is a
|slices|-group aggregate. No corpus-sized window, nothing collected.

No counterpart in the reference (engine extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000


def ks_drift(
    df: DataFrame,
    slice_col: str,
    value_col: str,
) -> DataFrame:
    """Per-slice KS distance of ``value_col`` vs the whole frame:
    ``(slice, n_rows, ks_micro)`` ordered by slice, where ``ks_micro``
    is the max CDF gap in integer micro-units."""
    vals = df.select(
        F.col(slice_col).alias("slice"),
        F.col(value_col).cast("long").alias("v"),
    )
    counts = vals.groupBy("slice", "v").agg(F.count(F.lit(1)).alias("c"))
    grid = counts.select("v").distinct()
    slices = counts.groupBy("slice").agg(F.sum("c").alias("n_s"))
    # corpus row count derived INSIDE the plan (1-row broadcast aggregate,
    # the pmi_collocations pattern) — no eager scan at construction time,
    # no stale literal if the input changes before execution, and an empty
    # corpus yields an empty result instead of div-0
    total = counts.agg(F.sum("c").alias("n_total"))

    # slice x grid expansion (bounded: |slices| * |value domain|), then
    # cumulative counts via one keyed window per slice
    expanded = (
        slices.crossJoin(F.broadcast(grid))
        .join(counts, ["slice", "v"], "left")
        .select("slice", "v", "n_s", F.coalesce("c", F.lit(0)).alias("c"))
    )
    # integer div on BOTH engines (Spark / on longs is double division and
    # its long cast truncates while DuckDB's CAST rounds — the repo-wide
    # cross-engine trap; div/// sidestep it entirely)
    w = Window.partitionBy("slice").orderBy("v")
    slice_cdf = expanded.select(
        "slice", "v", "n_s", F.sum("c").over(w).alias("cum")
    ).select(
        "slice",
        "v",
        "n_s",
        F.expr(f"(cum * {SCALE}) div n_s").alias("f_s"),
    )
    corpus_counts = counts.groupBy("v").agg(F.sum("c").alias("c"))
    wc = Window.orderBy("v")  # |grid|-row frame: bounded, never the corpus
    corpus_cdf = (
        corpus_counts.select("v", F.sum("c").over(wc).alias("cum"))
        .crossJoin(F.broadcast(total))
        .select("v", F.expr(f"(cum * {SCALE}) div n_total").alias("f_n"))
    )
    return (
        slice_cdf.join(F.broadcast(corpus_cdf), "v")
        .groupBy("slice")
        .agg(
            F.max("n_s").alias("n_rows"),
            F.max(F.abs(F.col("f_s") - F.col("f_n"))).alias("ks_micro"),
        )
        .orderBy("slice")
    )


def ks_drift_oracle_sql(
    table: str, slice_col: str, value_col: str
) -> str:
    return f"""
WITH vals AS (
  SELECT {slice_col} AS slice, CAST({value_col} AS BIGINT) AS v FROM {table}
),
counts AS (SELECT slice, v, count(*) AS c FROM vals GROUP BY 1, 2),
grid AS (SELECT DISTINCT v FROM counts),
slices AS (SELECT slice, CAST(sum(c) AS BIGINT) AS n_s FROM counts GROUP BY 1),
total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
expanded AS (
  SELECT s.slice, g.v, s.n_s, coalesce(c.c, 0) AS c
  FROM slices s CROSS JOIN grid g
  LEFT JOIN counts c ON c.slice = s.slice AND c.v = g.v
),
slice_cdf AS (
  SELECT slice, v, n_s,
         CAST((sum(c) OVER (PARTITION BY slice ORDER BY v) * {SCALE}) // n_s
              AS BIGINT) AS f_s
  FROM expanded
),
corpus_cdf AS (
  SELECT v,
         CAST((sum(c) OVER (ORDER BY v) * {SCALE})
              // (SELECT n FROM total) AS BIGINT) AS f_n
  FROM (SELECT v, sum(c) AS c FROM counts GROUP BY 1)
)
SELECT s.slice,
       CAST(max(s.n_s) AS BIGINT) AS n_rows,
       CAST(max(abs(s.f_s - c.f_n)) AS BIGINT) AS ks_micro
FROM slice_cdf s JOIN corpus_cdf c ON s.v = c.v
GROUP BY s.slice
ORDER BY s.slice
"""
