"""Bigram collocation mining (PMI-style lift) over a document corpus.

Training-data pipelines surface collocations to build tokenizer merge
hints, stop-phrase lists, and boilerplate detectors (reference scope:
the engine's text-analysis family; this extends the unigram machinery in
``functions/text.py`` / ``operators/surprisal.py`` to word pairs).

Score: ``lift = c_xy * N / (c_x * c_y)`` — the count ratio whose log is
PMI. Log is monotone, so ranking by lift ranks by PMI without needing a
cross-engine-stable transcendental; the division itself follows the
repo-wide float rule (one IEEE expression over exact int64 counts,
written identically in both engines, so the doubles are bit-identical).

Scale shape: tokenization is a scan-stage higher-order-function
projection (no Python); bigram and unigram counts are partial-agged
groupBys (the only corpus-sized shuffles carry (token, 1) pairs, never
text); the two count joins are equi-joins on word keys; the global
bigram total N is a 1-row broadcast; top-n is TakeOrderedAndProject.
Nothing in the plan is proportional to corpus text bytes after the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _norm_text


def _words(text_col: Column) -> Column:
    """normalized word array (may be [''] for junk-only docs)."""
    return F.split(_norm_text(text_col), " ")


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top ``top_n`` bigram collocations by lift (monotone in PMI).

    Output: (w1, w2, c_xy, c_x, c_y, lift) ordered by lift desc with a
    deterministic (w1, w2) tie-break. ``min_count`` guards the classic
    PMI pathology (rare pairs with sky-high lift).
    """
    ws = _words(F.col(text_col))
    toks = df.select(ws.alias("ws")).filter(F.size("ws") >= 2)
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("w1"),
                    F.element_at(F.col("ws"), i + 1).alias("w2"),
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = big.agg(F.sum("c_xy").alias("n_bigrams"))  # 1-row broadcast
    scored = (
        big.filter(F.col("c_xy") >= min_count)
        .join(F.broadcast(total))
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), "w2")
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            # identical IEEE tree in the SQL twin: (xy * n) / (x * y)
            (
                (F.col("c_xy").cast("double") * F.col("n_bigrams").cast("double"))
                / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "w1", "w2"
    ).limit(top_n)


def pmi_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> str:
    return f"""
WITH norm AS (
  SELECT regexp_split_to_array(
           trim(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g')),
           ' ') AS ws
  FROM {table}
),
big AS (
  SELECT b[1] AS w1, b[2] AS w2, count(*) AS c_xy
  FROM (
    SELECT unnest(list_transform(
             generate_series(1, len(ws) - 1),
             i -> [ws[i], ws[i + 1]])) AS b
    FROM norm WHERE len(ws) >= 2
  )
  GROUP BY 1, 2
),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(ws) AS w FROM norm)
  WHERE w <> ''
  GROUP BY 1
),
total AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bigrams FROM big)
SELECT b.w1, b.w2,
       CAST(b.c_xy AS BIGINT) AS c_xy,
       CAST(u1.c AS BIGINT) AS c_x,
       CAST(u2.c AS BIGINT) AS c_y,
       (CAST(b.c_xy AS DOUBLE) * CAST(t.n_bigrams AS DOUBLE))
         / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
FROM big b
CROSS JOIN total t
JOIN uni u1 ON b.w1 = u1.w
JOIN uni u2 ON b.w2 = u2.w
WHERE b.c_xy >= {min_count}
ORDER BY lift DESC, b.w1, b.w2
LIMIT {top_n}
"""
