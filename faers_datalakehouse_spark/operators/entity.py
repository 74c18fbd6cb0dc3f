"""Entity resolution: edit-distance near-duplicate values via blocked
self-join.

The string-similarity leg of the dedup stack (``operators/dedup.py``
covers token-set similarity — MinHash/Jaccard/SimHash; this module
covers CHARACTER-level similarity): find pairs of values whose
Levenshtein distance is at most ``max_dist`` — the classic entity-
resolution kernel for catalog/master-data cleanup ("smal ring" vs
"small ring").

Scale shape (the part that matters at 100 TB):

1. **Collapse to distinct values first.** Entity resolution operates on
   the VALUE domain, not the row domain — ``groupBy(value).count()``
   shrinks a 100 TB column to its vocabulary (one map-side-combined
   shuffle), and every downstream cost is vocabulary-sized. The per-
   value row count rides along so consumers can weigh a merge decision
   by how many rows each side represents.
2. **Recall-exact length-band blocking.** ``lev(a,b) <= d`` implies
   ``|len(a)-len(b)| <= d``, so with band width ``w >= d`` two matching
   values sit in the same or adjacent length bands. Each value emits
   TWO keys (``band``, ``band+1``); any pair within one band of each
   other then shares at least one key, turning the candidate search
   into a plain **equi-join** (hash-partitionable, AQE-splittable) —
   no theta-join, no cartesian, and no recall loss, unlike first-letter
   or prefix blocking (an edit can change any character). Equal-band
   pairs share two keys, so candidates are ``distinct``-ed before the
   (comparatively expensive) edit-distance filter.
3. The quadratic bit is confined to values sharing a length band. For
   skewed vocabularies (every string the same length) compose a second
   blocking key via ``extra_key`` — recall then depends on that key,
   which is the caller's declared trade, not a silent one.

``F.levenshtein`` is the textbook Wagner-Fischer distance in both Spark
and DuckDB, so the oracle reproduces results exactly.

No counterpart in the reference repo (its dedup is exact-key only —
``src/silver/silver_demographics.py`` ``dropDuplicates``); this is
LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def levenshtein_pairs(
    df: DataFrame,
    value_col: str,
    max_dist: int = 3,
    band_width: int = 4,
    extra_key: Column | None = None,
) -> DataFrame:
    """``(name1, name2, n1, n2, dist)`` for distinct ``value_col`` pairs
    with ``levenshtein <= max_dist`` (``name1 < name2``), ``n`` = rows
    carrying each value. Recall-exact when ``band_width >= max_dist``
    and ``extra_key`` is None."""
    if band_width < max_dist:
        raise ValueError(
            f"band_width {band_width} < max_dist {max_dist} loses recall: "
            "pairs can differ in length by up to max_dist"
        )
    vals = df.groupBy(F.col(value_col).alias("name")).agg(
        F.count(F.lit(1)).alias("n")
    )
    if extra_key is not None:
        vals = df.groupBy(
            F.col(value_col).alias("name"), extra_key.alias("_xk")
        ).agg(F.count(F.lit(1)).alias("n"))
    band = (F.length("name") / F.lit(band_width)).cast("long")
    emitted = vals.select(
        "name", "n", *(["_xk"] if extra_key is not None else []),
        band.alias("key"),
    ).unionAll(
        vals.select(
            "name", "n", *(["_xk"] if extra_key is not None else []),
            (band + F.lit(1)).alias("key"),
        )
    )
    join_on = ["key"] + (["_xk"] if extra_key is not None else [])
    a = emitted.select(
        *join_on, F.col("name").alias("name1"), F.col("n").alias("n1")
    )
    b = emitted.select(
        *join_on, F.col("name").alias("name2"), F.col("n").alias("n2")
    )
    cand = (
        a.join(b, on=join_on)
        .where(F.col("name1") < F.col("name2"))
        .select("name1", "name2", "n1", "n2")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name1", "name2"))
        .where(F.col("dist") <= F.lit(max_dist))
        .select("name1", "name2", "n1", "n2", "dist")
    )


def levenshtein_pairs_oracle_sql(
    table_expr: str,
    value_col: str,
    max_dist: int = 3,
    band_width: int = 4,
) -> str:
    """DuckDB oracle mirroring :func:`levenshtein_pairs` (no extra_key)."""
    return f"""
WITH vals AS (
  SELECT {value_col} AS name, CAST(count(*) AS BIGINT) AS n,
         CAST(length({value_col}) // {band_width} AS BIGINT) AS band
  FROM {table_expr} GROUP BY {value_col}
), emitted AS (
  SELECT name, n, band AS key FROM vals
  UNION ALL
  SELECT name, n, band + 1 AS key FROM vals
), cand AS (
  SELECT DISTINCT a.name AS name1, b.name AS name2,
         a.n AS n1, b.n AS n2
  FROM emitted a JOIN emitted b
    ON a.key = b.key AND a.name < b.name
)
SELECT name1, name2, n1, n2,
       CAST(levenshtein(name1, name2) AS INTEGER) AS dist
FROM cand WHERE levenshtein(name1, name2) <= {max_dist}
ORDER BY name1, name2
"""
