"""Exact set-similarity join via prefix filtering (PPJoin-lite).

The third candidate-generation strategy in the dedup stack, and the
only EXACT one:

- ``operators/dedup.py:minhash_lsh_pairs`` — probabilistic, linear,
  misses a tunable fraction of true pairs;
- ``operators/dedup.py:ngram_jaccard_pairs`` — exact but blocked on
  (lang, length-band), ~quadratic within a block;
- THIS — exact with NO recall loss and no equality blocking key:
  Chaudhuri/Ganti/Kaushik's prefix filter (ICDE'06; the candidate core
  of Xiao et al.'s PPJoin). Order the token universe by ascending
  document frequency; a record of size ``m`` need only index its first
  ``p = m - ceil(t*m) + 1`` tokens (its "prefix" — the rarest ones),
  because two sets with Jaccard >= t MUST share at least one prefix
  token under ANY common total order. Candidates come from an
  equi-join on prefix tokens — and because prefixes are rare-first,
  the join keys are the LOW-frequency tokens, so posting lists stay
  short and the join never hubs on stopwords.

Scale shape: token marginals are one map-side-combined groupBy
(|vocab|-sized); the global rare-first rank is a row_number over that
vocabulary frame; prefix postings are ~(1-t) of the corpus token mass;
the candidate join is an equi-join on token with bounded hub size by
construction. Verification joins candidates back to FULL postings
twice (hash joins on id, then (id, token)) and counts the exact
intersection — integers end-to-end, Jaccard emitted in exact
milli-units (``(inter*1000) div union``).

DuckDB twin: the prefix filter is recall-lossless, so the oracle skips
it entirely — brute-force shared-token pairs + exact Jaccard + the
same integer threshold. Identical output, independently derived.

No counterpart in the reference (engine extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TERM_RE = "[a-z0-9]+"


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold_milli: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with token-set Jaccard >= ``threshold_milli``/1000:
    ``(id_a, id_b, n_inter, n_union, jaccard_milli)`` ordered by
    (id_a, id_b). Tokens are lowercased ``[a-z0-9]+`` runs, distinct
    per document."""
    if not 0 < threshold_milli <= 1000:
        raise ValueError(f"threshold_milli in (0, 1000], got {threshold_milli}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TERM_RE), 0
                )
            )
        ).alias("tok"),
    )
    # rare-first total order on the token universe (ties broken by the
    # token itself -> total, deterministic)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))
    ranked = vocab.select(
        "tok",
        F.row_number()
        .over(Window.orderBy("tok_df", "tok"))
        .alias("tok_rank"),
    )
    post = toks.join(ranked, "tok").select("id", "tok_rank")
    sizes = post.groupBy("id").agg(F.count(F.lit(1)).alias("m"))
    # prefix length p = m - ceil(t*m) + 1, integer ceil in milli-units
    pref = (
        post.withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy("tok_rank")
            ),
        )
        .join(sizes, "id")
        .filter(
            F.col("pos")
            <= F.col("m")
            - F.expr(f"(m * {threshold_milli} + 999) div 1000")
            + F.lit(1)
        )
        .select("id", "tok_rank")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok_rank") == F.col("b.tok_rank"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pa, pb = post.alias("pa"), post.alias("pb")
    inter = (
        cand.join(pa, F.col("id_a") == F.col("pa.id"))
        .join(
            pb,
            (F.col("id_b") == F.col("pb.id"))
            & (F.col("pa.tok_rank") == F.col("pb.tok_rank")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("m").alias("m_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("m").alias("m_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("m_a") + F.col("m_b") - F.col("n_inter")).alias("n_union"),
        )
        .filter(
            F.col("n_inter") * 1000 >= F.lit(threshold_milli) * F.col("n_union")
        )
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            F.expr("(n_inter * 1000) div n_union").cast("long").alias(
                "jaccard_milli"
            ),
        )
    )
    return out.orderBy("id_a", "id_b")


def prefix_filter_oracle_sql(threshold_milli: int = 500) -> str:
    """DuckDB twin over the ``documents`` view: brute-force exact
    Jaccard (no prefix filter — it is recall-lossless, so skipping it
    proves the Spark plan's filter loses nothing)."""
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id AS id, tok
  FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '{TERM_RE}')) AS tok
    FROM documents
  )
), sizes AS (
  SELECT id, count(*) AS m FROM toks GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sa.m + sb.m - n_inter AS BIGINT) AS n_union,
       CAST((n_inter * 1000) // (sa.m + sb.m - n_inter) AS BIGINT)
         AS jaccard_milli
FROM inter
JOIN sizes sa ON inter.id_a = sa.id
JOIN sizes sb ON inter.id_b = sb.id
WHERE n_inter * 1000 >= {threshold_milli} * (sa.m + sb.m - n_inter)
ORDER BY id_a, id_b
"""
