"""Cross-source n-gram overlap matrix — corpus-level contamination
diagnosis between SOURCES (not documents).

``contamination_check`` answers "which documents overlap a benchmark";
curation teams also need the source-pair view: "does crawl-A
substantially duplicate crawl-B?" — the signal for dropping or
down-weighting a whole feed before any per-document dedup runs. The
statistic is per-pair distinct n-gram overlap and its exact Jaccard
(in milli-units, the repo-wide integer-exactness convention).

Scale shape: the fact reduces to DISTINCT (source, ngram) in one
shuffle (map-side partial dedup; size = vocabulary x sources, NOT
corpus rows). The pair counts come from a SELF-JOIN ON THE NGRAM KEY —
each n-gram key carries at most |sources| replicas, so a key's join
fan-out is bounded by |sources|² (a constant ~tens), never
corpus-quadratic; the aggregation is a |source-pairs|-sized groupBy.
Marginals are a |sources|-row frame broadcast onto the pairs. At
100 TB the only data-proportional stage is the initial distinct.

N-grams reuse ``contamination._distinct_ngrams`` (lowercased
whitespace token windows, per-document dedup before explode) so the
DuckDB twin shares the exact tokenization already proven cross-engine.

No counterpart in the reference (LLM-curation extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .contamination import _distinct_ngrams


def source_overlap_matrix(
    docs: DataFrame,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Upper-triangle source-pair overlap: ``(source_a, source_b,
    n_a, n_b, shared, jaccard_milli)`` where n_a/n_b are each side's
    distinct n-gram counts, ``shared`` the distinct n-grams present in
    both, and ``jaccard_milli = (1000*shared) div (n_a+n_b-shared)``
    exact integer."""
    grams = (
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(_distinct_ngrams(F.col(text_col), n)).alias("ng"),
        )
        .distinct()
    )
    marginals = grams.groupBy("src").agg(F.count(F.lit(1)).alias("n_ng"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.ng") == F.col("b.ng"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("source_a"),
            F.col("b.src").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(
            F.broadcast(
                marginals.select(
                    F.col("src").alias("source_a"),
                    F.col("n_ng").alias("n_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                marginals.select(
                    F.col("src").alias("source_b"),
                    F.col("n_ng").alias("n_b"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "shared",
            F.expr("(1000 * shared) div (n_a + n_b - shared)")
            .cast("long")
            .alias("jaccard_milli"),
        )
    )
    return out.orderBy("source_a", "source_b")


def source_overlap_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: trigram overlap matrix over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return source_overlap_matrix(docs)


def source_overlap_oracle_sql(n: int = 3) -> str:
    parts = ", ".join(f"words[i+{j}]" for j in range(n))
    return f"""
WITH w AS (
  SELECT source AS src,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS words
  FROM documents
), g AS (
  SELECT DISTINCT src, unnest(
           CASE WHEN len(words) >= {n}
                THEN list_distinct(list_transform(
                       range(1, len(words) - {n - 2}),
                       i -> concat_ws(' ', {parts})))
                ELSE [] END) AS ng
  FROM w
), marg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_ng FROM g GROUP BY src
), pairs AS (
  SELECT a.src AS source_a, b.src AS source_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM g a JOIN g b ON a.ng = b.ng AND a.src < b.src
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       ma.n_ng AS n_a, mb.n_ng AS n_b, shared,
       CAST((1000 * shared) // (ma.n_ng + mb.n_ng - shared) AS BIGINT)
         AS jaccard_milli
FROM pairs
JOIN marg ma ON ma.src = pairs.source_a
JOIN marg mb ON mb.src = pairs.source_b
ORDER BY source_a, source_b
"""
