"""PageRank-lite: integer-exact iterative graph ranking.

Connected components (``operators.clustering``) answers "which nodes
belong together"; ranking answers "which nodes matter" — spam/authority
scoring over link graphs is a standard corpus-curation signal (e.g.
harmonic/PageRank centrality feeds quality classifiers for web corpora).

This is the classic damped power iteration in EXACT integer arithmetic
(the repo-wide cross-engine float rule): ranks live in micro-units
(``scale`` = 1e6 per node initially) and every step is integer:

    contrib(u)  = rank(u) div outdeg(u)          -- truncating div
    rank'(v)    = (100 - d)% · scale  +  d% · Σ_{u→v} contrib(u)
                = ((100 - d) * scale) div 100 + (d * Σ contrib) div 100

Truncation loses a few micro-units of mass per step — the deliberate
price for a bit-identical DuckDB twin (``pagerank_oracle_sql`` unrolls
the same iterations as CTEs, like the k-means oracle); relative order,
the quantity rankings consume, is unaffected at micro-unit resolution.
Dangling nodes (no out-edges) leak their rank, the textbook simplified
variant — both engines identically.

Scale layout: each iteration is ONE hash join (ranks ⋈ edges on src) +
one groupBy(dst) with map-side partial sums — the canonical distributed
PR; nothing is collected, state between iterations is a |nodes|-sized
frame. ``iters`` is small and fixed (rank stabilizes in a handful of
damped steps); lineage stays linear in ``iters``.

No counterpart in the reference (engine extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro-rank units


def pagerank_lite(
    edges: DataFrame,
    iters: int = 2,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(node, rank_micro)`` after ``iters`` damped integer power steps
    over the DISTINCT directed edge set; ordered by rank desc, node asc."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = F.lit(((100 - damping_pct) * SCALE) // 100).cast("long")

    ranks = nodes.withColumn("rank_micro", F.lit(SCALE).cast("long"))
    for _ in range(iters):
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({damping_pct} * coalesce(in_sum, 0L)) div 100"
                    )
                ).alias("rank_micro"),
            )
        )
    return ranks.orderBy(F.desc("rank_micro"), "node")


def pagerank_oracle_sql(
    edges_sql: str, iters: int = 2, damping_pct: int = 85
) -> str:
    """DuckDB twin: the same iterations unrolled as CTEs over any
    edge-producing SQL with columns ``(src, dst)``."""
    base = ((100 - damping_pct) * SCALE) // 100
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        f"r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS rank_micro FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node, sum(r{i}.rank_micro // o.outdeg) AS in_sum
  FROM r{i} JOIN e ON r{i}.node = e.src JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{i + 1} AS (
  SELECT n.node,
         CAST({base} + ({damping_pct} * COALESCE(c{i}.in_sum, 0)) // 100
              AS BIGINT) AS rank_micro
  FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_micro FROM r{iters}"
        + "\nORDER BY rank_micro DESC, node"
    )
