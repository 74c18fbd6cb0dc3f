"""Mergeable fixed-bin histogram quantiles — the quantile leg of the
sketch family (``operators/sketches.py`` has HLL for distincts and CMS
for frequencies; this covers distribution shape).

Exact quantiles need a full sort (or Greenwald-Khanna-style summaries
whose state depends on merge order); at 100 TB the scalable primitive
is a **fixed-width histogram**: quantize values to integer units,
bucketize into ``bins`` equal-width bins between the global min/max,
and ``groupBy(group, bin).count()``. That per-(group, bin) count table
IS the sketch — it is trivially mergeable (counts add), bounded
(``|groups| * bins`` rows regardless of input size), and every
downstream read (any quantile, any histogram overlay) is a window
cumsum over it. The quantile estimate returned is the UPPER EDGE of the
first bin whose cumulative count reaches the target rank — error is
bounded by one bin width, the standard fixed-histogram trade.

Everything is integer arithmetic (quantized units, integer div) so
DuckDB reproduces the result bit-for-bit: the only float touch is the
initial ``round(value * scale)`` quantization, identical in both
engines (both round-half-away on positive doubles via ``round``).

The 1-row global min/max collect is broadcast-the-bounds, same pattern
as ``value_histogram`` (``plans/analytics.py``); nothing else reaches
the driver.

No counterpart in the reference (its aggregates are sums/counts —
``src/gold/``); LLM-pipeline extension surface (length/quality-score
distributions over a corpus).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    bins: int = 256,
    scale: int = 100,
) -> tuple[DataFrame, int, int]:
    """The mergeable state: ``(group_cols..., bin, n)`` counts plus the
    global quantized ``(lo, hi)`` bounds used for bucketing."""
    q = F.round(F.col(value_col) * F.lit(scale)).cast("long")
    lo, hi = df.agg(F.min(q), F.max(q)).first()
    if lo is None:
        raise ValueError(f"histogram_sketch: no non-null {value_col!r} rows")
    width_den = hi - lo + 1
    sketch = (
        df.select(*group_cols, q.alias("_q"))
        .withColumn(
            "bin",
            F.expr(f"((_q - {lo}) * {bins}) div {width_den}").cast("long"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return sketch, int(lo), int(hi)


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs_milli: Sequence[int] = (500, 950),
    bins: int = 256,
    scale: int = 100,
) -> DataFrame:
    """``(group_cols..., p_milli, approx_q_units)`` — per-group quantile
    estimates read from the histogram sketch. ``approx_q_units`` is the
    upper edge (in quantized units) of the first bin where the
    cumulative count reaches ``ceil(p_milli * total / 1000)``."""
    sketch, lo, hi = histogram_sketch(df, value_col, group_cols, bins, scale)
    width_den = hi - lo + 1
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("bin")
    cum = sketch.select(
        *gcols,
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.partitionBy(*gcols)).alias("total"),
    )
    spark = df.sparkSession
    probs = spark.createDataFrame(
        [(int(p),) for p in probs_milli], "p_milli long"
    )
    hit = (
        cum.crossJoin(F.broadcast(probs))
        # cum >= ceil(p * total / 1000)  <=>  cum * 1000 >= p * total
        .where(F.expr("cum * 1000 >= p_milli * total"))
        .groupBy(*gcols, "p_milli")
        .agg(F.min("bin").alias("qbin"))
    )
    # upper edge via CEILING division: with fewer quantized units than
    # bins (degenerate narrow range) floor division would land one unit
    # below the smallest value in the bin
    return hit.select(
        *gcols,
        "p_milli",
        F.expr(
            f"{lo} + (((qbin + 1) * {width_den} + {bins} - 1) div {bins}) - 1"
        )
        .cast("long")
        .alias("approx_q_units"),
    ).orderBy(*gcols, "p_milli")


def histogram_quantiles_oracle_sql(
    table_expr: str,
    value_col: str,
    group_cols: Sequence[str],
    probs_milli: Sequence[int] = (500, 950),
    bins: int = 256,
    scale: int = 100,
) -> str:
    """DuckDB oracle: same integer pipeline, bounds re-derived in SQL."""
    gl = ", ".join(group_cols)
    probs_rows = ", ".join(f"({int(p)})" for p in probs_milli)
    return f"""
WITH qz AS (
  SELECT {gl}, CAST(round({value_col} * {scale}) AS BIGINT) AS q
  FROM {table_expr} WHERE {value_col} IS NOT NULL
), bounds AS (
  SELECT min(q) AS lo, max(q) AS hi FROM qz
), sk AS (
  SELECT {gl}, ((q - lo) * {bins}) // (hi - lo + 1) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM qz, bounds GROUP BY {gl}, bin
), cum AS (
  SELECT {gl}, bin,
         sum(n) OVER (PARTITION BY {gl} ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY {gl}) AS total
  FROM sk
), probs(p_milli) AS (VALUES {probs_rows})
SELECT {gl}, CAST(p_milli AS BIGINT) AS p_milli,
       CAST(lo + (((min(bin) + 1) * (hi - lo + 1) + {bins} - 1) // {bins}) - 1
            AS BIGINT) AS approx_q_units
FROM cum, probs, bounds
WHERE cum * 1000 >= p_milli * total
GROUP BY {gl}, p_milli, lo, hi
ORDER BY {gl}, p_milli
"""
