"""Maximal Marginal Relevance (MMR) diversified retrieval — re-rank a
relevance-ordered candidate pool so each successive pick balances query
relevance against redundancy with what is already picked (Carbonell &
Goldstein, SIGIR 1998):

    next = argmax over remaining d of
           λ·rel(q, d) − (1−λ)·max_{s ∈ picked} sim(d, s)

The de-facto diversification step in RAG retrieval stacks; here it
composes with the repo's ANN tier: brute-force (or IVF/LSH) top-N forms
the POOL, MMR greedily selects k from it.

Determinism / oracle parity: relevance and pairwise similarity are both
micro-scaled integers derived from the repo's quantized-cosine formula
(integer dot and norms; one IEEE double division; ``round(x·1e6)`` with
half-away-from-zero ties — matched by an explicit symmetric-half
rounding in the Arrow kernel, since ``np.round`` is half-EVEN). λ is
the integer pair (7, 3) — scores are ``7·rel − 3·maxsim``, pure BIGINT.
Ties break on vec_id. The DuckDB twin unrolls the greedy loop as k−1
chained MATERIALIZED CTE rounds (the bpe_merges lesson: un-materialized
recursive references inline exponentially).

Scale shape (100 TB): the pool build is the ANN tier's cost (already
bounded); MMR itself runs per query over a ≤ pool_n frame inside one
``applyInPandas`` group — thousands of queries parallelize across the
cluster, and the greedy state never leaves the executor. The k·pool_n²
arithmetic per query is numpy-vectorized.

No counterpart in the reference repo (retrieval extension surface,
alongside ``bm25_topk`` / ``rrf_fusion`` / the ANN family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (
    _quantized,
    topk_neighbors_bruteforce,
)

_SCHEMA = (
    "query_id long, pick long, vec_id long, rel_micro long, mmr_score long"
)


def _mmr_kernel(k_sel: int, lam_num: int = 7, lam_den_minus: int = 3):
    def kernel(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        qid = int(pdf["query_id"].iloc[0])
        ids = pdf["neighbor_id"].to_numpy(dtype="int64")
        rel = pdf["rel_micro"].to_numpy(dtype="int64")
        emb = np.stack(
            [np.asarray(e, dtype="int64") for e in pdf["c_emb"]]
        )
        # pairwise micro cosine between pool members: integer dots and
        # norms, one IEEE division, symmetric half-away-from-zero micro
        # rounding (DuckDB round(x*1e6) parity; np.round is half-even)
        dots = emb @ emb.T
        norms = np.sqrt(np.einsum("ij,ij->i", emb, emb).astype("float64"))
        denom = np.outer(norms, norms)
        cos = dots / denom
        scaled = cos * 1_000_000.0
        sim = np.where(
            scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
        ).astype("int64")
        n = len(ids)
        picked: list[int] = []
        out = []
        remaining = np.ones(n, dtype=bool)
        for pick in range(1, min(k_sel, n) + 1):
            if picked:
                maxsim = sim[:, picked].max(axis=1)
                score = lam_num * rel - lam_den_minus * maxsim
            else:
                score = lam_num * rel
            score = np.where(remaining, score, np.int64(-(1 << 62)))
            # argmax with vec_id tie-break: ids are sorted ascending, and
            # np.argmax returns the first (lowest-id) maximal entry
            j = int(np.argmax(score))
            out.append((qid, pick, int(ids[j]), int(rel[j]), int(score[j])))
            picked.append(j)
            remaining[j] = False
        return pd.DataFrame(
            out,
            columns=["query_id", "pick", "vec_id", "rel_micro", "mmr_score"],
        )

    return kernel


def mmr_diversify(
    corpus: DataFrame,
    queries: DataFrame,
    pool_n: int = 16,
    k_sel: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """``(query_id, pick, vec_id, rel_micro, mmr_score)`` — the k_sel
    MMR picks per query from its brute-force top-``pool_n`` pool,
    ordered by (query_id, pick)."""
    pool = topk_neighbors_bruteforce(
        corpus, queries, id_col=id_col, emb_col=emb_col, k=pool_n
    ).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine") * 1_000_000).cast("long").alias("rel_micro"),
    )
    ce = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _quantized(F.col(emb_col)).alias("c_emb"),
    )
    rows = pool.join(ce, "neighbor_id")
    return (
        rows.groupBy("query_id")
        .applyInPandas(_mmr_kernel(k_sel), schema=_SCHEMA)
        .orderBy("query_id", "pick")
    )


def mmr_oracle_sql(
    query_mod: int = 50,
    pool_n: int = 16,
    k_sel: int = 5,
    quant: int = 1000,
) -> str:
    """Unrolled greedy twin: pool + pairwise sims once, then k_sel−1
    MATERIALIZED selection rounds."""
    rounds = []
    prev = "sel1"
    for r in range(2, k_sel + 1):
        rounds.append(
            f"""
cand{r} AS MATERIALIZED (
  SELECT p.query_id, p.neighbor_id AS id, p.rel_micro,
         7 * p.rel_micro - 3 * max(s.sim_micro) AS score
  FROM pool p
  JOIN sims s ON s.query_id = p.query_id AND s.a = p.neighbor_id
  JOIN {prev} t ON t.query_id = s.query_id AND t.id = s.b
  LEFT JOIN {prev} x ON x.query_id = p.query_id AND x.id = p.neighbor_id
  WHERE x.id IS NULL
  GROUP BY p.query_id, p.neighbor_id, p.rel_micro
),
pick{r} AS MATERIALIZED (
  SELECT query_id, {r} AS pick, id, rel_micro, score
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, id ASC) AS rn
    FROM cand{r}
  ) WHERE rn = 1
),
sel{r} AS MATERIALIZED (
  SELECT query_id, id FROM {prev}
  UNION ALL SELECT query_id, id FROM pick{r}
)"""
        )
        prev = f"sel{r}"
    picks_union = "\nUNION ALL ".join(
        [
            "SELECT query_id, 1 AS pick, id, rel_micro, 7 * rel_micro AS score"
            " FROM pick1"
        ]
        + [
            f"SELECT query_id, pick, id, rel_micro, score FROM pick{r}"
            for r in range(2, k_sel + 1)
        ]
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS qe
  FROM embeddings WHERE vec_id % {query_mod} = 0
),
c AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * {quant}) AS BIGINT)) AS ce
  FROM embeddings
),
scored AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           CAST(list_sum(list_transform(list_zip(q.qe, c.ce),
                                        p -> p[1] * p[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(q.qe, x -> x*x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(c.ce, x -> x*x)) AS DOUBLE))),
           6) AS cosine
  FROM q JOIN c ON q.vec_id <> c.vec_id
),
pool AS MATERIALIZED (
  SELECT query_id, neighbor_id,
         CAST(round(cosine * 1000000) AS BIGINT) AS rel_micro
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {pool_n}
),
sims AS MATERIALIZED (
  SELECT pa.query_id, pa.neighbor_id AS a, pb.neighbor_id AS b,
         CAST(round(
           CAST(list_sum(list_transform(list_zip(ca.ce, cb.ce),
                                        p -> p[1] * p[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(ca.ce, x -> x*x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(cb.ce, x -> x*x)) AS DOUBLE)))
           * 1000000) AS BIGINT) AS sim_micro
  FROM pool pa
  JOIN pool pb ON pa.query_id = pb.query_id
              AND pa.neighbor_id <> pb.neighbor_id
  JOIN c ca ON ca.vec_id = pa.neighbor_id
  JOIN c cb ON cb.vec_id = pb.neighbor_id
),
pick1 AS MATERIALIZED (
  SELECT query_id, neighbor_id AS id, rel_micro
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel_micro DESC, neighbor_id ASC) AS rn
    FROM pool
  ) WHERE rn = 1
),
sel1 AS MATERIALIZED (SELECT query_id, id FROM pick1),
{",".join(rounds)}
SELECT query_id,
       CAST(pick AS BIGINT) AS pick,
       id AS vec_id,
       rel_micro,
       CAST(score AS BIGINT) AS mmr_score
FROM ({picks_union})
ORDER BY query_id, pick
"""
