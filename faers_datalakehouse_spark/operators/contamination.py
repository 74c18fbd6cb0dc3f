"""Benchmark-contamination screening for training corpora.

Before training, every serious data pipeline checks the corpus for verbatim
n-gram overlap with evaluation benchmarks (the GPT-3/Gopher "13-gram overlap"
decontamination step). This is the Spark-first layout of that check:

- The benchmark side is tiny (eval suites are MBs, the corpus is TBs), so its
  distinct n-gram set is **broadcast** — the 100 TB corpus side never
  shuffles for the membership probe; the only shuffle is the final per-doc
  count aggregation (partial map-side combine applies, and the key is the
  high-cardinality doc id, so there is no skew).
- N-grams are deduplicated **per document before the explode** (a per-row
  ``array_distinct``), so a pathological document that repeats one benchmark
  sentence a million times contributes one probe row, not a million.

No counterpart in the reference (an LLM-pipeline extension operator); the
explode→broadcast-join→count shape mirrors how the published
decontamination pipelines (e.g. Brown et al. 2020 §C) are described.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _let


def _distinct_ngrams(col: Column, n: int) -> Column:
    """Distinct whitespace-token ``n``-grams of a lowercased text column.

    All higher-order array expressions (split → sequence → concat), one
    codegen'd projection; documents shorter than ``n`` tokens yield an empty
    array (NOT a null), so downstream ``size``/``explode`` behave.
    """

    def build(words: Column) -> Column:
        count = F.size(words)
        return F.when(
            count >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), count - (n - 1)),
                    lambda i: F.concat_ws(
                        " ",
                        *[F.element_at(words, i + j) for j in range(n)],
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    # let binding: evaluate the split once, not per sequence element
    words = F.split(F.trim(F.lower(col)), r"\s+")
    return _let(words, build)


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_threshold: float = 0.0,
) -> DataFrame:
    """Per-document benchmark-overlap stats.

    Returns one row per corpus document:
    ``(doc_id, n_ngrams, n_contaminated, contamination_frac, is_contaminated)``
    where ``n_contaminated`` counts the document's *distinct* n-grams that
    appear anywhere in the benchmark and ``contamination_frac`` is the single
    exact division ``n_contaminated / n_ngrams`` (cross-engine stable).

    ``flag_threshold``: strictly-greater cut for the boolean flag (0.0 ⇒ any
    overlap flags the document).
    """
    grams = _distinct_ngrams(F.col(text_col), n)
    base = corpus.select(
        F.col(id_col), grams.alias("_ngrams"), F.size(grams).alias("n_ngrams")
    )
    bench_set = (
        benchmark.select(F.explode(_distinct_ngrams(F.col(text_col), n)).alias("_ng"))
        .distinct()
    )
    hits = (
        base.select(id_col, F.explode("_ngrams").alias("_ng"))
        .join(F.broadcast(bench_set), "_ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    frac = F.when(
        F.col("n_ngrams") > 0,
        F.round(
            F.col("n_contaminated").cast("double")
            / F.col("n_ngrams").cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return (
        base.drop("_ngrams")
        .join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .select(
            id_col,
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            frac.alias("contamination_frac"),
            (frac > flag_threshold).alias("is_contaminated"),
        )
        .orderBy(id_col)
    )


def contamination_oracle_sql(n: int = 3, bench_mod: int = 97) -> str:
    """DuckDB twin for ``contamination_check`` with the showcase's
    deterministic benchmark split (``doc_id % bench_mod == 0``)."""
    parts = ", ".join(f"words[i+{j}]" for j in range(n))
    return f"""
WITH w AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS words
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(words) >= {n}
              THEN list_distinct(list_transform(
                     range(1, len(words) - {n - 2}),
                     i -> concat_ws(' ', {parts})))
              ELSE [] END AS ngrams
  FROM w
), bench AS (
  SELECT DISTINCT unnest(ngrams) AS ng FROM g WHERE doc_id % {bench_mod} = 0
), corpus AS (
  SELECT doc_id, ngrams, len(ngrams) AS n_ngrams
  FROM g WHERE doc_id % {bench_mod} <> 0
), hits AS (
  SELECT c.doc_id, count(*) AS n_contaminated
  FROM (SELECT doc_id, unnest(ngrams) AS ng FROM corpus) c
  JOIN bench b USING (ng)
  GROUP BY c.doc_id
), r AS (
  SELECT c.doc_id,
         CAST(c.n_ngrams AS BIGINT) AS n_ngrams,
         CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
         CASE WHEN c.n_ngrams > 0
              THEN round(CAST(coalesce(h.n_contaminated, 0) AS DOUBLE)
                         / CAST(c.n_ngrams AS DOUBLE), 4)
              ELSE 0.0 END AS contamination_frac
  FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
)
SELECT doc_id, n_ngrams, n_contaminated, contamination_frac,
       contamination_frac > 0.0 AS is_contaminated
FROM r
ORDER BY doc_id
"""
