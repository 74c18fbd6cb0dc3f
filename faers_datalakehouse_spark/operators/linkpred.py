"""Graph neighborhood analytics: local clustering coefficient and
resource-allocation link prediction.

- :func:`clustering_coefficient` — per-node local clustering
  coefficient (Watts & Strogatz 1998): the fraction of a node's
  neighbor pairs that are themselves connected, ``2·T(v) /
  (deg(v)·(deg(v)−1))``. The classic local-cohesion signal on link
  graphs (spam-farm detection, community seeds), and the per-node
  refinement of the existing ``triangle_counts`` entry.
- :func:`resource_allocation_pairs` — Resource Allocation link
  prediction (Zhou, Lü & Zhang 2009): for a candidate pair ``(a, b)``,
  ``RA(a,b) = Σ_{z ∈ Γ(a)∩Γ(b)} 1/deg(z)`` — hubs contribute little,
  rare shared neighbors a lot. Implemented on a bipartite graph
  (left entities linked through shared right-side nodes), the paper's
  original recommender formulation.

Integer-exact cross-engine: the coefficient is emitted in micro
(``(2·T·1e6) div (deg·(deg−1))``, integer division) and RA scores as
``Σ (1e6 div deg(z))`` micro units — no floats, no libm.

Scale shape (100 TB):
- clustering coefficient reuses the degree-oriented edge-iterator
  triangle counter (out-degrees bounded O(√m); no wedge shuffle) plus
  one node-sized degree aggregate — both linear in |E|.
- RA enumerates wedges only through ``z`` nodes with
  ``deg(z) <= max_hub_deg`` (default 100). The wedge count is then
  bounded by ``max_hub_deg · |E|`` instead of ``Σ deg(z)²`` — the same
  bounded-bucket discipline as ``minhash_lsh_pairs(max_bucket=...)``;
  dropped hubs contribute ≤ 1e6/max_hub_deg micro per wedge, the
  published justification for hub-skipping in RA. The cap is applied
  identically in the DuckDB oracle, so it is semantics, not drift.

No counterpart in the reference repo (graph-analytics extension
surface, alongside ``pagerank_lite`` / ``triangle_counts`` /
``kcore_peel`` in ``operators/graph.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.graph import triangle_counts


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient over the undirected simple
    graph of ``edges``: ``(node, deg, n_triangles, lcc_micro)`` for
    nodes with ``deg >= 2`` (the coefficient is undefined below that),
    ordered by node.

    ``und`` is checkpointed once and feeds both the degree aggregate
    and the triangle counter, so the upstream edge derivation (often a
    fact-table join) runs exactly once.
    """
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).filter(
        F.col("x") != F.col("y")
    )
    und = (
        e.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # deg is consumed three times (the >=2 filter/join here plus both
    # orientation joins inside triangle_counts) — node-sized, so
    # materialize it once; triangle_counts is told the edge frame is
    # already canonical+checkpointed and given the shared degrees, so
    # the pre-r12 redundant distinct shuffle + second degree aggregate
    # inside it are gone (plan: 30 exchanges -> see _after plan).
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    tri = triangle_counts(und, "a", "b", pre_canonical=True, degrees=deg)
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "node", "left")
        .na.fill({"n_triangles": 0})
        .select(
            "node",
            "deg",
            "n_triangles",
            F.expr("(2 * n_triangles * 1000000) div (deg * (deg - 1))").alias(
                "lcc_micro"
            ),
        )
        .orderBy("node")
    )


LCC_SQL_TEMPLATE = """
WITH raw AS ({edges_sql}),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE src <> dst
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
tcnt AS (
  SELECT node, count(*) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT d.node,
       CAST(d.deg AS BIGINT) AS deg,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST((2 * coalesce(t.n_triangles, 0) * 1000000)
            // (d.deg * (d.deg - 1)) AS BIGINT) AS lcc_micro
FROM deg d LEFT JOIN tcnt t USING (node)
WHERE d.deg >= 2
ORDER BY d.node
"""


def lcc_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin over any ``(src, dst)``-producing SQL: direct
    ``a < b < c`` triangle enumeration + a degree CTE — same integer
    micro division as the Spark plan."""
    return LCC_SQL_TEMPLATE.format(edges_sql=edges_sql)


def resource_allocation_pairs(
    bipartite: DataFrame,
    left: str,
    right: str,
    max_hub_deg: int = 100,
    min_score_micro: int = 0,
) -> DataFrame:
    """RA link-prediction scores between distinct ``left`` entities that
    share at least one ``right`` neighbor:
    ``(a, b, n_common, ra_micro)`` with ``a < b``, ordered by
    ``ra_micro`` desc then ``(a, b)``.

    ``ra_micro = Σ_z 1_000_000 div deg(z)`` over shared right-side
    neighbors ``z`` with ``deg(z) <= max_hub_deg`` (deg counted on the
    deduplicated bipartite incidence list).
    """
    inc = (
        bipartite.select(
            F.col(left).alias("a"), F.col(right).alias("z")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    zdeg = inc.groupBy("z").agg(F.count(F.lit(1)).alias("zdeg"))
    # wedge enumeration only through bounded-degree z: ≤ max_hub_deg·|E|
    bounded = inc.join(
        zdeg.filter(F.col("zdeg") <= max_hub_deg), "z"
    )
    other = bounded.select(
        F.col("z"), F.col("a").alias("b"), F.col("zdeg").alias("zdeg_b")
    )
    wedges = bounded.join(other, "z").filter(F.col("a") < F.col("b"))
    return (
        wedges.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr("1000000 div zdeg")).alias("ra_micro"),
        )
        .filter(F.col("ra_micro") >= min_score_micro)
        .orderBy(F.col("ra_micro").desc(), "a", "b")
    )


RA_SQL_TEMPLATE = """
WITH raw AS ({bipartite_sql}),
inc AS (SELECT DISTINCT a, z FROM raw),
zdeg AS (SELECT z, count(*) AS zdeg FROM inc GROUP BY z),
bounded AS (
  SELECT i.a, i.z, d.zdeg FROM inc i JOIN zdeg d USING (z)
  WHERE d.zdeg <= {max_hub_deg}
),
wedges AS (
  SELECT w1.a AS a, w2.a AS b, w1.zdeg
  FROM bounded w1 JOIN bounded w2
    ON w1.z = w2.z AND w1.a < w2.a
)
SELECT a, b,
       CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(1000000 // zdeg) AS BIGINT) AS ra_micro
FROM wedges
GROUP BY a, b
HAVING sum(1000000 // zdeg) >= {min_score_micro}
ORDER BY ra_micro DESC, a, b
"""


def ra_oracle_sql(
    bipartite_sql: str, max_hub_deg: int = 100, min_score_micro: int = 0
) -> str:
    """DuckDB twin: ``bipartite_sql`` must produce ``(a, z)`` columns
    (left entity, shared right-side neighbor)."""
    return RA_SQL_TEMPLATE.format(
        bipartite_sql=bipartite_sql,
        max_hub_deg=max_hub_deg,
        min_score_micro=min_score_micro,
    )
