"""Python user-defined table functions (Spark 4 UDTF API).

A UDTF is the lateral-join primitive: one input row expands to N output
rows with their own schema — ``SELECT c.* FROM docs, LATERAL
text_chunks(doc_id, text) c``. Spark plans it like any generator
(explode-style), so the expansion distributes with the scan.

The reference workload's chunkers are SQL-expressible and stay on the
JVM path (``plans.training_prep``); this module exists for the cases a
table function genuinely needs imperative Python per row (pluggable
tokenizers, external parsers) and to keep the UDTF surface tested. The
chunker here is deliberately the SQL-twin-able one so the driver oracle
can hash-check the UDTF machinery end to end.

Determinism contract: chunk starts are ``1 + k*stride`` for
``k in [0, (len-1) div stride]`` (empty text expands to zero rows) —
exactly reproducible in DuckDB with ``generate_series``.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_WIDTH = 200
CHUNK_STRIDE = 150


@udtf(returnType="doc_id bigint, chunk_idx int, chunk string")
class TextChunks:
    """Overlapping fixed-width character chunks of one document."""

    def eval(self, doc_id: int, text: str):
        if not text:
            return
        n = (len(text) - 1) // CHUNK_STRIDE + 1
        for k in range(n):
            start = k * CHUNK_STRIDE
            yield doc_id, k, text[start : start + CHUNK_WIDTH]


def register_udtfs(spark) -> None:
    spark.udtf.register("text_chunks", TextChunks)


def udtf_chunks(spark, sf_dir: str):
    """Driver surface: documents laterally expanded by the UDTF."""
    register_udtfs(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk
        FROM _udtf_docs d, LATERAL text_chunks(d.doc_id, d.text) c
        ORDER BY c.doc_id, c.chunk_idx
        """
    )


UDTF_CHUNKS_SQL = """
SELECT d.doc_id, CAST(k AS INT) AS chunk_idx,
       substr(d.text, CAST(k * 150 + 1 AS BIGINT), 200) AS chunk
FROM documents d
JOIN LATERAL (
  SELECT unnest(generate_series(0, (length(d.text) - 1) // 150)) AS k
) g ON length(d.text) > 0
ORDER BY d.doc_id, chunk_idx
"""
