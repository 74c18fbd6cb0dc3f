"""Bitmap-index distinct aggregation — exact COUNT DISTINCT that merges.

The ClickHouse ``groupBitmap`` / roaring-bitmap pattern with dense
64-bit words: map each integer id to (word = id div 63, bit = id mod
63), OR the single-bit masks per (group, word) — ``bit_or`` is
associative and commutative, so Spark computes map-side partial bitmaps
before the shuffle — then sum ``bit_count`` over a group's words.

Why this beats ``count(distinct)`` at 100 TB: the shuffle carries at
most ``|distinct ids| / 63`` words per group instead of one row per
distinct id (a 63x reduction on dense id spaces), the per-word state is
one int64 (mergeable across files, partitions, days — the same property
the HLL sketch has, but EXACT), and incremental maintenance is another
``bit_or`` — yesterday's bitmap OR today's. Sparse id spaces degrade
gracefully: a lone id costs one word, identical to count-distinct's one
row.

Words hold 63 ids (bits 0..62), not 64: DuckDB raises on ``1 << 63``
(signed overflow) where Spark wraps, so bit 63 is simply never used —
every word stays a positive int64 both engines agree on bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bitmap_words(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """Per-(group, word) bitmap state: the mergeable intermediate."""
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(f"{id_col} div 63").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({id_col} % 63 AS INT))"
            ).alias("mask"),
        )
        .groupBy("grp", "word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface: exact distinct users per event type via word
    bitmaps, plus the bitmap's storage footprint (word count) — the
    quantity a capacity planner actually sizes. Includes a bitmap
    checksum (sum of words) so the oracle verifies the REGISTER STATE,
    not just the final count."""
    from ..sources.tables import read_events

    events = read_events(spark, sf_dir)
    words = bitmap_words(events, "event_type", "user_id")
    return (
        words.groupBy(F.col("grp").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.expr("bit_count(word)")).alias("distinct_users"),
            # XOR folds the register state without int64-sum overflow
            F.expr("bit_xor(word)").alias("word_checksum"),
        )
        .orderBy("event_type")
    )


BITMAP_DISTINCT_SQL = """
WITH words AS (
  SELECT event_type AS grp, user_id // 63 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS word
  FROM events
  GROUP BY 1, 2
)
SELECT grp AS event_type,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(bit_count(word)) AS BIGINT) AS distinct_users,
       CAST(bit_xor(word) AS BIGINT) AS word_checksum
FROM words
GROUP BY grp
ORDER BY event_type
"""
