"""Corpus-order n-gram novelty scoring: for each document, the fraction
of its distinct word-shingle set never seen in any EARLIER document
(by ascending doc_id) — the redundancy/novelty curve used to order or
prune training corpora (novelty collapsing toward 0 over a crawl is the
classic diminishing-returns signal; documents with novelty ~0 are
near-free to drop).

Uses the repo's portable md5 word-shingle hashes
(``operators.dedup.word_shingle_hashes(portable=True)``), so the DuckDB
twin reproduces every shingle bit-for-bit; scores are integer milli.

Scale shape: one explode of the per-doc distinct shingle set, ONE
groupBy on the shingle hash computing the min owning doc_id (map-side
combinable; the "first occurrence" relation), then one equi-join back
on (shingle, doc) and a per-doc count — all shuffles keyed on the
shingle hash or doc_id, no windows, no self-join, nothing collected.
The first-occurrence groupBy is the same shape as ``dedup_exact``'s
canonical-survivor min-struct.

No counterpart in the reference (LLM-curation extension surface,
alongside dedup / contamination / DSIR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingle_hashes


def ngram_novelty(
    docs: DataFrame,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document novelty: ``(doc_id, n_shingles, n_novel,
    novelty_milli)`` ordered by doc_id, where a shingle is novel iff no
    document with a smaller doc_id contains it (a doc's own duplicates
    count once — shingle sets are distinct per doc)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            word_shingle_hashes(F.col(text_col), ngram, portable=True)
        ).alias("h"),
    )
    first = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("(n_novel * 1000) div n_shingles").alias(
                "novelty_milli"
            ),
        )
        .orderBy("doc_id")
    )


def ngram_novelty_oracle_sql(
    ngram: int = 3, table: str = "documents", mersenne_p: int | None = None
) -> str:
    from .dedup import MERSENNE_P

    p = mersenne_p or MERSENNE_P
    return f"""
WITH docs AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS words
  FROM {table}
),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(words) - {ngram - 1}, 1)),
           i -> ('0x' || substr(md5(
                  array_to_string(list_slice(words, i, i + {ngram - 1}), ' ')
                ), 1, 15))::BIGINT % {p}))) AS h
  FROM docs
),
first AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY h)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST((sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
             * 1000) // count(*) AS BIGINT) AS novelty_milli
FROM sh JOIN first f ON sh.h = f.h
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""
