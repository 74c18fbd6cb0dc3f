"""Linear quality-classifier inference: hashed bag-of-words → logit.

The standard corpus-quality gate (CCNet, GPT-3's WebText classifier,
fastText supervised models) is a linear model over hashed token features:
hash each token into one of ``n_buckets`` feature ids, look up a weight,
sum. This module implements the *inference* shape distributedly:

- featurize: explode tokens, bucket by the engine-portable md5 hash —
  a flatMap, no shuffle;
- weights: one ``n_buckets``-row table joined broadcast (never shuffled) —
  at 100 TB the corpus side stays put and only the model moves;
- score: one groupBy(doc) partial-aggregated sum — the single shuffle.

Weights here are integer-quantized (how linear models actually deploy at
scale — int8 weights, integer accumulation, no float drift across
executors) and *frozen to a deterministic pseudo-model* derived from the
bucket id, since no trained artifact ships in this container. Swapping in
a real model = replacing ``hashed_weights`` with ``spark.read`` of the
trained table; every other line is production-shape. Integer accumulation
also makes the whole pipeline bit-identical in DuckDB (``QUALITY_SQL``).

No counterpart in the reference (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import _hash_bucket

TERM_RE = "[a-z0-9]+"


def _pseudo_weight(bucket: Column) -> Column:
    """Frozen pseudo-model weight in [-8, 8]: md5 of ``'w:<bucket>'``.

    Same low-8-hex-digit construction as ``sampling._hash_bucket``, so
    DuckDB reproduces it bit-for-bit.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 25, 8),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(17)) - F.lit(8)).alias("weight")


def hashed_weights(spark: SparkSession, n_buckets: int = 1024) -> DataFrame:
    """The frozen model as a table: ``(bucket, weight)``, one row per
    feature bucket. Bounded (n_buckets rows) — always broadcast-joined."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"), _pseudo_weight(F.col("id")).alias("weight")
    )


def quality_scores(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document classifier scores: ``(doc_id, n_tokens, logit, keep)``.

    ``logit`` is the integer sum of per-token bucket weights; ``keep`` is
    the decision at threshold 0. Documents with zero tokens produce no
    features and are absent from the output (no tokens → no evidence), the
    same contract fastText inference has.
    """
    feats = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TERM_RE), 0)
        ).alias("term"),
    ).select("doc_id", _hash_bucket(F.col("term"), n_buckets).alias("bucket"))
    # LEFT join + zero-weight default: an inner join silently DROPPED
    # tokens whose bucket is absent from the weights table (sparse trained
    # tables), corrupting n_tokens and logit with no error — unknown
    # tokens must count as evidence-seen with weight 0
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .withColumn("weight", F.coalesce("weight", F.lit(0)))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("weight").alias("logit"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "logit",
            (F.col("logit") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


QUALITY_SQL_TEMPLATE = """
WITH wts AS (
  SELECT i AS bucket,
         (('0x' || substr(md5('w:' || i), 25, 8))::BIGINT % 17) - 8 AS weight
  FROM unnest(range(0, {n_buckets})) AS t(i)
),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{term_re}')) AS term
  FROM documents
),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5(term), 25, 8))::BIGINT % {n_buckets} AS bucket
  FROM tok
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(coalesce(weight, 0)) AS BIGINT) AS logit,
       sum(coalesce(weight, 0)) > 0 AS keep
FROM feats LEFT JOIN wts USING (bucket)
GROUP BY doc_id
ORDER BY doc_id
"""


def quality_oracle_sql(n_buckets: int = 1024) -> str:
    return QUALITY_SQL_TEMPLATE.format(n_buckets=n_buckets, term_re=TERM_RE)
