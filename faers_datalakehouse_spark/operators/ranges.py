"""Bucketed range (interval) join — point-in-interval matching without a
cross product.

Open-source Spark plans ``l.point BETWEEN r.start AND r.end`` as a broadcast
nested-loop or cartesian join — O(|L|·|R|) comparisons, a scale-killer. The
standard fix (Databricks' range-join optimization, or any interval-join
paper) is binning: quantize the domain into fixed-width bins, replicate each
interval onto every bin it overlaps, tag each point with its single bin, and
equi-join on (bin [, extra keys]) with the exact BETWEEN as a residual
filter. Cost: |L| + Σ_r ceil(len_r / bin) join rows — linear when intervals
are short relative to ``bin_width`` — and the join is a plain hash join that
partitions/broadcasts like any other.

No duplicate elimination is needed: a point lies in exactly one bin, so each
qualifying (left, right) pair meets in exactly that bin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    on: Sequence[str] = (),
    bin_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose ``point`` falls in right's [start, end] interval.

    ``point``/``start``/``end`` are timestamp or numeric columns (timestamps
    bin on epoch seconds via a double cast; ``bin_width`` then is seconds).
    ``on`` adds equi keys (e.g. a user id) to the bin key. Intervals must be
    well-formed (start <= end); rows violating that simply match nothing.
    Only inner semantics: an outer range join would need null-tolerant
    residual handling that no caller here requires.

    Left/right column names (beyond the ``on`` keys) must be disjoint —
    the residual filter references ``point``/``start``/``end`` by name, and
    shared names would make those references ambiguous. Violations raise
    here rather than at analysis time.
    """
    if how != "inner":
        raise ValueError(f"range_join supports inner joins, got {how!r}")
    on = list(on)
    shared = (set(left.columns) & set(right.columns)) - set(on)
    if shared:
        raise ValueError(
            f"range_join requires disjoint non-key column names; shared: "
            f"{sorted(shared)} (rename or drop before joining)"
        )
    bin_col = "_range_join_bin"
    if bin_col in left.columns or bin_col in right.columns:
        raise ValueError(f"column name {bin_col!r} is reserved by range_join")

    def to_bin(c: Column) -> Column:
        # timestamp → epoch seconds (with fraction); numerics pass through
        return F.floor(c.cast("double") / F.lit(float(bin_width))).cast("long")

    l_binned = left.withColumn(bin_col, to_bin(F.col(point)))
    # Replicate each interval across the bins it overlaps (inclusive).
    # Malformed intervals (start > end) are filtered BEFORE the explode:
    # F.sequence(a, b) with a > b generates a DESCENDING sequence, so one
    # dirty row with swapped bounds would fan out into a huge bin array
    # (or exceed Spark's array limit) only for the residual to discard
    # every copy — the filter makes "match nothing" cost nothing.
    r_binned = right.filter(F.col(start) <= F.col(end)).withColumn(
        bin_col,
        F.explode(F.sequence(to_bin(F.col(start)), to_bin(F.col(end)))),
    )
    joined = l_binned.join(r_binned, [*on, bin_col], "inner")
    residual = (F.col(point) >= F.col(start)) & (F.col(point) <= F.col(end))
    return joined.filter(residual).drop(bin_col)
