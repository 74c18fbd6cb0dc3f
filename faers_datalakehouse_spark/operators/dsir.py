"""DSIR-lite: data selection by importance resampling (hashed n-grams).

Xie et al., "Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023): score each raw document by how much more likely its
hashed-n-gram features are under a TARGET distribution (a trusted corpus)
than under the RAW distribution, then sample proportionally. The
production recipe is exactly bag-of-hashed-features with two unigram
count tables — a pure relational shape.

Integer-exact variant (repo-wide cross-engine float rule): the per-token
log-likelihood ratio ``log2(p_target/p_raw)`` is quantized to bit-lengths

    llr_bits(tok) = [bl(t_cnt+1) - bl(t_total)] - [bl(r_cnt+1) - bl(r_total)]

with ``bl(x) = length(bin(x)) - 1`` (exact in both engines) and +1
Laplace smoothing so buckets absent from the target stay finite. A
document's weight is the integer SUM over its tokens — order-free,
reproducible to the last bit; the final per-token average is one IEEE
division over exact integers.

Scale layout (100 TB): the two count tables are ``n_buckets`` rows
(feature-hashed — bounded by construction, unlike raw vocabularies), so
both ride as broadcasts; token streams are map-side explodes; the only
corpus-sized shuffle is the per-doc aggregation. The 1-row totals frame
uses the same broadcast-crossJoin idiom as ``operators.surprisal`` (the
plan-invariant gate's documented exception).

No counterpart in the reference (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _hash_bucket
from .surprisal import corpus_tokens


def _bucket_counts(toks: DataFrame, n_buckets: int, name: str) -> DataFrame:
    """(bucket, <name>_cnt): hashed-unigram counts — ≤ n_buckets rows."""
    return (
        toks.withColumn("bucket", _hash_bucket(F.col("word"), n_buckets))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(f"{name}_cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-raw-document importance weights against ``target``:
    ``(doc_id, n_tokens, weight_bits, avg_weight_bits)``.

    ``weight_bits > 0`` ⇒ the document looks more target-like than
    raw-average (upsample it); ``< 0`` ⇒ generic/noise (downsample).
    """
    # raw_toks feeds two consumers (the raw bucket counts and the scoring
    # join) — persisted so the normalize+tokenize+explode pass over the
    # raw corpus runs once instead of twice (r12; run-internal cache,
    # cleared by bench/clearCache like the minhash frame).
    raw_toks = corpus_tokens(raw, id_col, text_col).withColumn(
        "bucket", _hash_bucket(F.col("word"), n_buckets)
    ).persist()
    r_counts = raw_toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r_cnt")
    )
    t_counts = _bucket_counts(
        corpus_tokens(target, id_col, text_col), n_buckets, "t"
    )
    # totals AFTER smoothing: every possible bucket contributes its +1
    totals = (
        r_counts.agg(F.sum("r_cnt").alias("r_sum"))
        .crossJoin(t_counts.agg(F.sum("t_cnt").alias("t_sum")))
        .select(
            (F.col("r_sum") + F.lit(n_buckets)).alias("r_total"),
            (F.coalesce(F.col("t_sum"), F.lit(0)) + F.lit(n_buckets)).alias(
                "t_total"
            ),
        )
    )
    model = (
        r_counts.join(t_counts, "bucket", "left")
        .select(
            "bucket",
            (F.col("r_cnt") + 1).alias("r_smooth"),
            (F.coalesce(F.col("t_cnt"), F.lit(0)) + 1).alias("t_smooth"),
        )
    )

    def bl(c):  # floor(log2(x)) for x >= 1, exact in both engines
        return (F.length(F.bin(c)) - F.lit(1)).cast("long")

    scored = (
        raw_toks.join(F.broadcast(model), "bucket")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "llr_bits",
            (bl(F.col("t_smooth")) - bl(F.col("t_total")))
            - (bl(F.col("r_smooth")) - bl(F.col("r_total"))),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("llr_bits").alias("weight_bits"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "weight_bits",
            (
                F.col("weight_bits").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("avg_weight_bits"),
        )
        .orderBy(id_col)
    )


def dsir_oracle_sql(
    raw_pred: str, target_pred: str, n_buckets: int = 256
) -> str:
    """DuckDB twin of ``dsir_weights`` where raw/target are predicate
    slices of ``documents`` (e.g. ``"TRUE"`` and ``"lang = 'en'"``)."""
    return f"""
WITH toks AS (
  SELECT doc_id AS id, lang,
         unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents
),
toks2 AS (
  SELECT id, lang, word,
         CAST(('0x' || substr(md5(word), 25, 8))::BIGINT % {n_buckets} AS BIGINT)
           AS bucket
  FROM toks WHERE word <> ''
),
raw_t AS (SELECT * FROM toks2 WHERE {raw_pred}),
tgt_t AS (SELECT * FROM toks2 WHERE {target_pred}),
r_counts AS (SELECT bucket, count(*) AS r_cnt FROM raw_t GROUP BY bucket),
t_counts AS (SELECT bucket, count(*) AS t_cnt FROM tgt_t GROUP BY bucket),
totals AS (
  SELECT (SELECT sum(r_cnt) FROM r_counts) + {n_buckets} AS r_total,
         COALESCE((SELECT sum(t_cnt) FROM t_counts), 0) + {n_buckets} AS t_total
),
model AS (
  SELECT r.bucket, r.r_cnt + 1 AS r_smooth,
         COALESCE(t.t_cnt, 0) + 1 AS t_smooth
  FROM r_counts r LEFT JOIN t_counts t USING (bucket)
),
scored AS (
  SELECT rt.id,
         ((length(bin(m.t_smooth)) - 1) - (length(bin(tt.t_total)) - 1))
       - ((length(bin(m.r_smooth)) - 1) - (length(bin(tt.r_total)) - 1))
           AS llr_bits
  FROM raw_t rt JOIN model m USING (bucket) CROSS JOIN totals tt
)
SELECT id AS doc_id,
       count(*) AS n_tokens,
       CAST(sum(llr_bits) AS BIGINT) AS weight_bits,
       CAST(sum(llr_bits) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS avg_weight_bits
FROM scored
GROUP BY id
ORDER BY doc_id
"""


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic DSIR selection: the ``n`` most target-like raw
    documents by ``(weight_bits desc, per-token avg desc, doc_id asc)`` —
    a global top-n, planned as TakeOrderedAndProject (no full sort, no
    single-partition window). The tie-break chain makes selection exact
    and repartition-stable; the full importance-*sampling* variant (draw
    proportional to exp(weight)) needs seeded randomness that has no
    cross-engine twin, so selection-by-rank is the oracle-able production
    default (top-k selection is what DSIR's released pipeline does too).
    """
    w = dsir_weights(raw, target, n_buckets, id_col, text_col)
    return (
        w.orderBy(
            F.desc("weight_bits"), F.desc("avg_weight_bits"), F.col(id_col)
        )
        .limit(n)
    )


def dsir_select_oracle_sql(
    raw_pred: str, target_pred: str, n: int, n_buckets: int = 256
) -> str:
    inner = dsir_oracle_sql(raw_pred, target_pred, n_buckets).rstrip()
    # reuse the weights oracle verbatim as a subquery; re-sort for top-n
    return f"""
SELECT * FROM ({inner})
ORDER BY weight_bits DESC, avg_weight_bits DESC, doc_id
LIMIT {n}
"""
