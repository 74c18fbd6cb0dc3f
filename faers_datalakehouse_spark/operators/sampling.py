"""Deterministic sampling for training-data pipelines.

``randomSplit`` is the obvious tool and the wrong one for corpus work: its
assignment depends on partition layout and seed plumbing, so re-running on
re-partitioned data re-shuffles examples across splits (train/test
contamination). Both operators here key the decision on a HASH OF THE ROW'S
IDENTITY, so membership is a pure function of the data — stable across
runs, partitionings, and engines (xxhash64 ≡ DuckDB's hash? no — so the
oracle uses the same md5-derived bucket both engines compute identically).

- ``deterministic_split``  — fractional train/val/test assignment from
  md5(id) mod N. Zero shuffle: one projection.
- ``stratified_cap``       — at most ``cap`` rows per stratum, chosen by
  the same hash order (not arrival order): one window per stratum, the
  standard balanced-downsampling layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(id_col: Column, n: int) -> Column:
    """Engine-portable deterministic bucket in [0, n): md5 of the id's
    string form, low 8 hex digits as an integer. (xxhash64 would be faster
    JVM-side but has no DuckDB twin; md5 is shared vocabulary.)"""
    return F.pmod(
        F.conv(F.substring(F.md5(id_col.cast("string")), 25, 8), 16, 10).cast(
            "long"
        ),
        F.lit(n),
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    fractions: Sequence[tuple[str, int]] = (("train", 96), ("val", 2), ("test", 2)),
) -> DataFrame:
    """Assign each row a split label with the given percentage weights
    (must sum to 100). Pure projection — membership depends only on the id.
    """
    total = sum(w for _, w in fractions)
    if total != 100:
        raise ValueError(f"fractions must sum to 100, got {total}")
    # NULL ids hash as a sentinel instead of falling through every
    # when-branch with split=NULL (rows silently in NO split)
    bucket = _hash_bucket(
        F.coalesce(F.col(id_col).cast("string"), F.lit("\0NULL")), 100
    )
    expr = None
    upper = 0
    for label, weight in fractions:
        upper += weight
        cond = bucket < upper
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr)


def stratified_cap(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, selected by hash order.

    Hash-ordered selection (not arrival order) makes the sample a pure
    function of the data; the per-stratum window is the standard one-shuffle
    balanced-downsampling plan. Heavily-skewed strata cost what any keyed
    window costs — AQE's problem, same as every groupBy.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_bucket(F.col(id_col), 1_000_000_007), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
