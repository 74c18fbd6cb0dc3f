"""Reciprocal-rank fusion (RRF) — the standard hybrid-retrieval combiner
(Cormack, Clarke & Buettcher 2009): given rankings of the same corpus
from heterogeneous retrievers (keyword BM25, vector ANN, recency,
quality priors), each document scores

    RRF(d) = SUM over rankings r of  1 / (k0 + rank_r(d))

with k0 ~ 60 damping the head. RRF needs no score calibration between
retrievers — only ranks — which is exactly why every RAG stack uses it
to merge lexical and semantic hits.

Integer-exact: the contribution is ``1e9 div (k0 + rank)`` (integer
division over exact integer ranks), so the fused score is bit-identical
in the DuckDB twin — no float reciprocal.

Scale shape (100 TB): each input ranking is already a top-N —
distributed TakeOrderedAndProject, never a global sort — so the fusion
itself (rank windows + full outer join + final top-k) runs over
2N bounded rows, KBs regardless of corpus size. The expensive parts are
the retrievers themselves (BM25's inverted stats, ANN's index), which
this repo implements and audits separately (``bm25_topk``,
``ann_*_topk``).

No counterpart in the reference repo (retrieval extension surface,
alongside ``bm25_topk`` / ``ann_topk``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranking import bm25_oracle_sql, bm25_topk

RRF_SCALE = 1_000_000_000


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k0: int = 60,
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse two pre-ranked frames (each carrying ``id_col`` and a
    ``rank`` column, 1-based, bounded top-N lists) into the RRF top-k:
    ``(doc_id, rank_a, rank_b, rrf_micro)``. A document absent from one
    list contributes 0 for it (rank column NULL in the output)."""
    a = ranked_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = ranked_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    fused = a.join(b, id_col, "full_outer").select(
        id_col,
        "rank_a",
        "rank_b",
        (
            F.coalesce(
                F.expr(f"{RRF_SCALE} div ({k0} + rank_a)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{RRF_SCALE} div ({k0} + rank_b)"), F.lit(0)
            )
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.desc("rrf_micro"), id_col).limit(k)


def rrf_hybrid_query(
    docs: DataFrame,
    query_terms: Sequence[str],
    n_per_list: int = 50,
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Hybrid retrieval demo over ``documents``: fuse the BM25 top-N for
    ``query_terms`` with a length-prior top-N (longest documents first —
    the "more content = more likely useful" heuristic standing in for a
    second retriever; swap in ``ann_topk`` when queries are vectors).

    The rank windows run over LIMIT-bounded frames (N rows), never the
    corpus."""
    bm25 = bm25_topk(docs, query_terms, k=n_per_list)
    w_a = Window.orderBy(F.desc("score_milli"), "doc_id")
    ranked_a = bm25.select(
        "doc_id", F.row_number().over(w_a).cast("long").alias("rank")
    )
    longest = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), "doc_id")
        .limit(n_per_list)
    )
    w_b = Window.orderBy(F.desc("n_chars"), "doc_id")
    ranked_b = longest.select(
        "doc_id", F.row_number().over(w_b).cast("long").alias("rank")
    )
    return rrf_fuse(ranked_a, ranked_b, k0=k0, k=k)


def rrf_hybrid_oracle_sql(
    query_terms: Sequence[str],
    n_per_list: int = 50,
    k0: int = 60,
    k: int = 20,
) -> str:
    bm25 = bm25_oracle_sql(query_terms, k=n_per_list)
    return f"""
WITH a AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_milli DESC, doc_id) AS rank_a
  FROM ({bm25}) bm
), b AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_b
  FROM (SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT {n_per_list}) t
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       a.rank_a, b.rank_b,
       COALESCE({RRF_SCALE} // ({k0} + a.rank_a), 0)
         + COALESCE({RRF_SCALE} // ({k0} + b.rank_b), 0) AS rrf_micro
FROM a FULL JOIN b ON a.doc_id = b.doc_id
ORDER BY rrf_micro DESC, doc_id
LIMIT {k}
"""
