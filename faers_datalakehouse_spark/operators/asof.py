"""As-of (point-in-time) join — an operator Spark has no native form of.

``as_of_join(left, right, ...)``: for every left row, attach the most recent
right row with ``right_ts <= left_ts`` for the same key (optionally within a
tolerance). The classic union-and-forward-fill formulation:

1. tag and union both sides (right rows sort *before* left rows at equal
   timestamps, giving ``<=`` semantics),
2. one window pass per key ordered by time, forward-filling the right-side
   payload with ``last(..., ignorenulls=True)`` — over a SINGLE struct
   column holding the whole right row, so the matched row attaches
   atomically (filling each payload column independently would stitch
   together fields from different right rows whenever the latest right row
   has NULLs, which DuckDB ASOF JOIN / pandas merge_asof never do),
3. keep only left rows and expand the struct.

Scale: exactly one shuffle (partition by key) + one sort — the same cost as
any keyed window, with none of the range-explosion a naive
``l.ts >= r.ts`` theta-join would create. Skewed keys are AQE's problem, as
with every keyed window. An alternative ``applyInPandas``+``merge_asof``
formulation is deliberately avoided: it leaves the JVM for no expressiveness
gain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: latest right row with ``right_ts <= left_ts`` per key.

    ``direction`` (pandas ``merge_asof`` parity):

    - ``"backward"`` (default): latest right row with right_ts <= left_ts;
    - ``"forward"``: earliest right row with right_ts >= left_ts
      (the mirrored window — ``first(..., ignorenulls)`` over
      [currentRow, unboundedFollowing] with right rows sorting after
      left at equal timestamps so ``>=`` includes ties);
    - ``"nearest"``: whichever of the two is closer in event time; an
      exact tie attaches the BACKWARD match (documented, deterministic).
      Both candidate passes share one partition exchange — two sorts,
      no second shuffle.

    Output = all left columns + ``<right_col><suffix>`` for each requested
    right column + ``<right_ts><suffix>`` (the matched timestamp, NULL when
    no right row precedes the left row or the tolerance is exceeded).

    Ties: when several RIGHT rows share one key+timestamp, any of them may be
    attached (whole-row atomically) — the same unspecified-among-ties
    contract as DuckDB ASOF JOIN / pandas merge_asof.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if direction == "nearest" and not isinstance(
        left.schema[left_ts].dataType, T.TimestampType
    ):
        raise ValueError(
            "direction='nearest' requires timestamp event-time columns "
            "(distance comparison uses epoch micros)"
        )
    on = list(on)
    left_cols = left.columns
    matched_ts = f"{right_ts}{suffix}"
    reserved = {"_t", "_side", "_rp", "_rpb", "_rpf"} & (
        set(left.columns) | set(right.columns)
    )
    if reserved:
        raise ValueError(
            f"as_of_join reserves column names {sorted(reserved)}; rename "
            "them on the inputs"
        )
    out_collide = {f"{c}{suffix}" for c in [*right_cols, right_ts]} & set(
        left.columns
    )
    if out_collide:
        raise ValueError(
            f"suffixed right columns {sorted(out_collide)} collide with "
            "left columns; pick a different suffix"
        )
    if tolerance_seconds is not None and not isinstance(
        left.schema[left_ts].dataType, T.TimestampType
    ):
        raise ValueError(
            "tolerance_seconds requires timestamp event-time columns "
            f"(got {left.schema[left_ts].dataType.simpleString()} for "
            f"{left_ts!r}); the no-tolerance path supports any ordered type"
        )
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    payload_type = T.StructType(
        [T.StructField(f"{c}{suffix}", rtypes[c]) for c in right_cols]
        + [T.StructField(matched_ts, rtypes[right_ts])]
    )

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        F.lit(None).cast(payload_type).alias("_rp"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
            if c not in on and c != left_ts
        ],
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
            F.col(right_ts).alias(matched_ts),
        ).alias("_rp"),
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows first at equal _t → "<=" as-of semantics
    w_back = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # left rows first at equal _t (desc on the side tag) → the
    # [current, following] frame still sees an equal-ts right row: ">="
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_t"), F.desc("_side"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    back_p = F.last("_rp", ignorenulls=True).over(w_back)
    fwd_p = F.first("_rp", ignorenulls=True).over(w_fwd)
    if direction == "backward":
        picked = [back_p.alias("_rp")]
    elif direction == "forward":
        picked = [fwd_p.alias("_rp")]
    else:
        picked = [back_p.alias("_rpb"), fwd_p.alias("_rpf")]
    filled = u.select(
        *on,
        "_t",
        "_side",
        *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        *picked,
    ).filter(F.col("_side") == 1)

    def _delta(payload_col: str) -> F.Column:
        d = F.unix_micros(F.col(f"{payload_col}.{matched_ts}")) - F.unix_micros(
            F.col("_t")
        )
        return F.abs(d)

    def _within_tol(payload_col: str, col: F.Column) -> F.Column:
        if tolerance_seconds is None:
            return col
        return F.when(
            _delta(payload_col) > tolerance_seconds * 1_000_000,
            F.lit(None).cast(payload_type),
        ).otherwise(col)

    if direction == "nearest":
        rpb = _within_tol("_rpb", F.col("_rpb"))
        rpf = _within_tol("_rpf", F.col("_rpf"))
        # tie (equal distance) attaches the backward match
        filled = (
            filled.withColumn("_rpb", rpb)
            .withColumn("_rpf", rpf)
            .withColumn(
                "_rp",
                F.when(F.col("_rpb").isNull(), F.col("_rpf"))
                .when(F.col("_rpf").isNull(), F.col("_rpb"))
                .when(_delta("_rpf") < _delta("_rpb"), F.col("_rpf"))
                .otherwise(F.col("_rpb")),
            )
            .drop("_rpb", "_rpf")
        )
    elif tolerance_seconds is not None:
        filled = filled.withColumn(
            "_rp", _within_tol("_rp", F.col("_rp"))
        )
    expanded = filled.select(
        *on,
        "_t",
        *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        *[F.col(f"_rp.{c}{suffix}") for c in right_cols],
        F.col(f"_rp.{matched_ts}"),
    )
    return expanded.withColumnRenamed("_t", left_ts)
