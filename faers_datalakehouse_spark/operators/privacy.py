"""Privacy screening: k-anonymity audit and suppression.

A release-readiness gate for training corpora and analytics extracts:
a row is k-anonymous w.r.t. a set of quasi-identifier columns if at
least ``k`` rows share its full quasi-identifier combination. Groups
below ``k`` are re-identification risks (Sweeney, "k-anonymity: a model
for protecting privacy", IJUFKS 2002 — public literature).

Two operators over one shuffle shape:

- :func:`k_anonymity_audit` — the per-combination census
  ``(quasi..., n, anonymous)``: one map-side-combined ``groupBy``
  (equivalence-class-count-sized output, not row-sized — bounded by the
  quasi-identifier domain product, which is exactly what makes
  k-anonymity meaningful to audit at 100 TB).
- :func:`k_suppress` — the enforcement twin: rows in under-``k``
  classes have their quasi-identifier columns NULLed (suppression, the
  simplest generalization step). Implemented as an inner join back to
  the audit frame on the quasi columns — at scale the audit side is the
  small side (broadcast when the domain product allows), and the row
  side streams through unshuffled.

Related: ``functions/text.py::redact_pii`` handles free-text
identifiers; this handles STRUCTURED quasi-identifiers. No counterpart
in the reference repo; extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """``(quasi_cols..., n, anonymous)`` — one row per equivalence
    class; ``anonymous`` = class size ``>= k``. NULL quasi values form
    their own class (first-class grouping keys)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("k_anonymity_audit needs at least one quasi column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("anonymous", F.col("n") >= F.lit(k))
    )


def k_suppress(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """``df`` with quasi-identifier columns NULLed on rows whose
    equivalence class is smaller than ``k``. Schema is preserved; NULL
    quasi keys join null-safely so pre-existing NULL classes are
    handled like any other."""
    audit = k_anonymity_audit(df, quasi_cols, k).where(~F.col("anonymous"))
    # a matched (suppressed) row is one where the join found a small class;
    # detect via a constant marker column instead of value null-ness
    small_marked = F.broadcast(
        audit.select(
            *[F.col(c).alias(f"_s_{c}") for c in quasi_cols],
            F.lit(1).alias("_suppress"),
        )
    )
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_s_{c}"))
        cond = eq if cond is None else cond & eq
    joined = df.join(small_marked, on=cond, how="left")
    out_cols = []
    for c in df.columns:
        if c in quasi_cols:
            out_cols.append(
                F.when(F.col("_suppress").isNotNull(), F.lit(None))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity census (Machanavajjhala et al., "l-diversity:
    privacy beyond k-anonymity", TKDD 2007): k-anonymity leaves a class
    re-identifiable when every row in it shares the same SENSITIVE value
    (the homogeneity attack). Per equivalence class this emits
    ``(quasi..., n, l_distinct, top_ppm, diverse)`` — row count, distinct
    sensitive values, the modal sensitive value's share in ppm (integer
    division, the skewness signal behind entropy/recursive l-diversity),
    and ``diverse = l_distinct >= l``.

    Scale shape: two stacked map-side-combinable groupBys — first on
    (quasi..., sensitive) then on (quasi...) — so the shuffle carries
    cell-count-sized data, never rows; output is class-count-sized.
    """
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    if not quasi_cols:
        raise ValueError("l_diversity_audit needs at least one quasi column")
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        cells.groupBy(*quasi_cols)
        .agg(
            F.sum("_c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
            F.max("_c").alias("_top"),
        )
        .select(
            *quasi_cols,
            "n",
            "l_distinct",
            F.expr("(_top * 1000000) div n").alias("top_ppm"),
            (F.col("l_distinct") >= F.lit(l)).alias("diverse"),
        )
        .orderBy(*quasi_cols)
    )


def l_diversity_oracle_sql(
    table_expr: str,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> str:
    gl = ", ".join(quasi_cols)
    return f"""
WITH cells AS (
  SELECT {gl}, {sensitive_col} AS s, count(*) AS c
  FROM {table_expr}
  GROUP BY {gl}, {sensitive_col}
)
SELECT {gl},
       CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS l_distinct,
       CAST((max(c) * 1000000) // sum(c) AS BIGINT) AS top_ppm,
       count(*) >= {l} AS diverse
FROM cells
GROUP BY {gl}
ORDER BY {gl}
"""


def k_anonymity_audit_oracle_sql(
    table_expr: str, quasi_cols: Sequence[str], k: int = 5
) -> str:
    gl = ", ".join(quasi_cols)
    return f"""
SELECT {gl}, CAST(count(*) AS BIGINT) AS n, count(*) >= {k} AS anonymous
FROM {table_expr}
GROUP BY {gl}
ORDER BY {gl}
"""
