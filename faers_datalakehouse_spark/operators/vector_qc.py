"""Embedding-column quality audit: per-dimension statistics over an
``array<float>`` column — the vector-QC pass a training pipeline runs
before trusting an embedding table (dead dimensions, clipped ranges,
mean drift, zero-inflation from failed encoders).

All statistics are over the repo's quantized integer embeddings
(``operators/similarity.QUANT`` — the same quantization every
ANN/kcenter oracle uses), so min/max/sum and the milli-mean are exact
int64 and the DuckDB twin is bit-identical.

Scale shape: one ``posexplode`` flatMap (x dims row growth — dims is a
small constant) followed by ONE map-side-combinable groupBy on the
dimension index (|dims| groups, KB-sized output at any corpus scale).
No windows, no joins, nothing collected. Integer headroom: |sum_q| <=
n_vectors * max|q| — at QUANT=1000 and |x|<=~10 that overflows only
past ~1e14 vectors per dimension; variance-grade sums of squares are
deliberately NOT emitted (they would overflow ~1e12 rows at this
quantization — recompute at coarser QUANT if needed).

No counterpart in the reference (data-quality extension surface,
alongside ``expectations_audit``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import QUANT, _quantized


def embedding_qc(
    emb: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Per-dimension audit: ``(dim, n_vals, n_zero, min_q, max_q, sum_q,
    avg_milli)`` ordered by dim — ``*_q`` in QUANT units, ``avg_milli``
    the exact integer-division mean in milli-QUANT units."""
    vals = emb.select(
        F.posexplode(_quantized(F.col(emb_col))).alias("dim", "v")
    )
    return (
        vals.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.sum((F.col("v") == 0).cast("long")).alias("n_zero"),
            F.min("v").alias("min_q"),
            F.max("v").alias("max_q"),
            F.sum("v").alias("sum_q"),
        )
        .select(
            "dim",
            "n_vals",
            "n_zero",
            "min_q",
            "max_q",
            "sum_q",
            F.expr("(sum_q * 1000) div n_vals").alias("avg_milli"),
        )
        .orderBy("dim")
    )


def embedding_qc_oracle_sql(table: str = "embeddings") -> str:
    return f"""
WITH vals AS (
  SELECT generate_subscripts(qe, 1) - 1 AS dim, unnest(qe) AS v
  FROM (
    SELECT list_transform(embedding,
             x -> CAST(round(x * {QUANT}) AS BIGINT)) AS qe
    FROM {table}
  )
)
SELECT CAST(dim AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vals,
       CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(min(v) AS BIGINT) AS min_q,
       CAST(max(v) AS BIGINT) AS max_q,
       CAST(sum(v) AS BIGINT) AS sum_q,
       CAST((CAST(sum(v) AS BIGINT) * 1000) // count(*) AS BIGINT)
         AS avg_milli
FROM vals
GROUP BY dim
ORDER BY dim
"""
