"""Greedy k-center coreset selection (farthest-point traversal) over an
embedding column — the diversity-subset primitive of data curation
(pick k maximally-spread exemplars; 2-approximation of the k-center
objective, Gonzalez 1985).

Distances are EXACT int64 squared-L2 over the repo's quantized integer
embeddings (``operators/similarity.QUANT`` — the same quantization the
cosine oracles use), so selection order and radii are bit-identical
cross-engine; ties on distance break by ascending id.

Scale shape: per round, ONE corpus-wide projection updates the running
min-distance (``least(mind, d2(row, new_center))`` — the new center's
vector travels as a broadcast literal, dims x 8 bytes) and ONE
TakeOrderedAndProject picks the farthest row (no sort materialization,
no corpus shuffle anywhere). Driver state is k (id, vector) pairs — the
bounded-collect pattern. Lineage grows one projection per round (k is
small and fixed); the quantized frame is cached across rounds so each
round re-reads memory/disk-cached columns, not parquet.

The DuckDB twin unrolls the identical k rounds as chained CTEs (scalar
list subqueries for the center vectors).

No counterpart in the reference (engine extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import QUANT, _quantized


def _d2_to_literal(qe: str, vec: list[int]):
    # ONE F.expr parse (one JVM call) instead of a literal + two py4j-built
    # lambdas — the k greedy rounds each rebuild this expression, and the
    # bridge-built form dominated plan-construction time (r12, guide §7.3).
    # ``qe`` is the SQL name of the quantized-vector column; the parsed
    # tree is the identical Catalyst expression (tests/test_sql_expr_parity).
    arr = "array(" + ",".join(f"{int(v)}L" for v in vec) + ")"
    return F.expr(
        f"aggregate(zip_with({qe}, {arr}, "
        f"(__a, __b) -> (__a - __b) * (__a - __b)), "
        f"CAST(0 AS BIGINT), (__acc, __v) -> __acc + __v)"
    )


def kcenter_coreset(
    emb: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Select ``k`` exemplars by greedy farthest-point traversal, seeded
    at the minimum id. Returns ``(rank, vec_id, d2_prev)`` — the squared
    quantized-L2 distance from each pick to the previously selected set
    (0 for the seed); ``d2_prev`` is non-increasing and is the coverage
    radius achieved after each pick.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = emb.select(
        F.col(id_col).alias("vec_id"), _quantized(F.col(emb_col)).alias("qe")
    ).cache()
    seeds = q.orderBy("vec_id").limit(1).collect()
    if not seeds:
        raise ValueError("kcenter_coreset: empty input")
    seed = seeds[0]
    picks = [(1, int(seed["vec_id"]), 0)]
    state = q.withColumn(
        "mind", _d2_to_literal("qe", list(seed["qe"]))
    )
    for rank in range(2, k + 1):
        far = (
            state.orderBy(F.col("mind").desc(), "vec_id").limit(1).collect()
        )[0]
        if int(far["mind"]) == 0:
            # every remaining point is a duplicate of an already-picked
            # center (coverage radius 0) — further rounds would re-pick
            # the minimum-id row forever; stop with < k picks. The oracle
            # contract therefore requires >= k distinct vectors.
            break
        picks.append((rank, int(far["vec_id"]), int(far["mind"])))
        state = state.withColumn(
            "mind",
            F.least(
                F.col("mind"), _d2_to_literal("qe", list(far["qe"]))
            ),
        )
    spark = emb.sparkSession
    out = spark.createDataFrame(
        picks, "rank int, vec_id long, d2_prev long"
    )
    q.unpersist()
    return out.orderBy("rank")


def _d2_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> (p[1]-p[2])*(p[1]-p[2])))"
    )


def kcenter_oracle_sql(
    k: int = 6, table: str = "embeddings"
) -> str:
    """Round-unrolled DuckDB twin: dN carries each row's min distance to
    the first N centers; cN+1 is the farthest row of dN."""
    parts = [
        f"""WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(x * {QUANT}) AS BIGINT))
           AS qe
  FROM {table}
),
c1 AS (SELECT vec_id, qe FROM e ORDER BY vec_id LIMIT 1),
d1 AS (
  SELECT e.vec_id, e.qe,
         {_d2_sql("e.qe", "(SELECT qe FROM c1)")} AS mind
  FROM e
)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""",
c{i} AS (SELECT vec_id, qe, mind FROM d{i - 1}
        ORDER BY mind DESC, vec_id LIMIT 1),
d{i} AS (
  SELECT d.vec_id, d.qe,
         least(d.mind, {_d2_sql("d.qe", f"(SELECT qe FROM c{i})")}) AS mind
  FROM d{i - 1} d
)"""
        )
    selects = [
        "SELECT 1 AS rank, (SELECT vec_id FROM c1) AS vec_id,"
        " CAST(0 AS BIGINT) AS d2_prev"
    ]
    for i in range(2, k + 1):
        selects.append(
            f"SELECT {i} AS rank, (SELECT vec_id FROM c{i}) AS vec_id,"
            f" (SELECT CAST(mind AS BIGINT) FROM c{i}) AS d2_prev"
        )
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY rank"
