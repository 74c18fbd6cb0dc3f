"""Connected components over candidate-pair graphs (dedup clustering).

Pair generators (MinHash LSH, SimHash, embedding LSH) emit *edges*; a real
dedup pipeline must then group edges into clusters and keep one canonical
document per cluster — transitively: if A~B and B~C, all three are one
cluster even though (A, C) was never a candidate pair.

Spark-first layout: iterative **min-label propagation** expressed as joins —
each round every node adopts the smallest label among itself and its
neighbors; fixpoint = connected components, with each component labeled by
its smallest node id (deterministic, integer-only → oracle-checkable via a
recursive CTE).

Scale notes (100 TB corpus → billions of candidate edges):
- Rounds needed = graph diameter. Near-dup graphs are dense, low-diameter
  clusters (typically ≤ 3 hops), so propagation converges in a handful of
  rounds; the pathological long-chain case is bounded by ``max_iter``. For
  adversarial graphs the O(log n)-round alternating large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce", SOCC'14)
  drops in behind the same signature.
- Each round is one join + one groupBy, both hashed on the node id — AQE
  coalesces and the per-round frames are persisted so round N+1 starts from
  materialized round N, not a replay of the whole lineage. The convergence
  probe is a single scalar aggregate (sum of labels, monotone
  non-increasing), not a driver-side collect of the labels.

No counterpart in the reference (LLM-pipeline extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum node id
    of its component. Returns ``(node, component)`` for nodes that appear in
    at least one edge (callers union in singletons if they need them).

    Node ids must be integral (labels are compared with ``least``).
    Raises if propagation has not converged after ``max_iter`` rounds.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    # Monotone convergence probe: every round can only lower labels, so the
    # label sum is strictly decreasing until fixpoint. decimal(38) keeps the
    # probe overflow-free for 64-bit ids at any node count.
    prev_sum = labels.agg(
        F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]

    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und["a"] == labels["node"])
            .select(F.col("b").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .persist()
        )
        new_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            und.unpersist()
            return labels
        prev_sum = new_sum
    und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter; raise it or switch to "
        "large-star/small-star)"
    )


def cluster_assignments(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Dedup-cluster view of a candidate-pair graph:
    ``(doc_id, cluster_id, cluster_size, is_canonical)`` — ``cluster_id`` is
    the component's smallest doc id and the canonical row is that doc.
    The size window partitions by cluster id over the (tiny) label frame,
    never the corpus.
    """
    from pyspark.sql.window import Window

    cc = connected_components(edges, src=src, dst=dst, max_iter=max_iter)
    by_cluster = Window.partitionBy("comp")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.count(F.lit(1)).over(by_cluster).alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    ).orderBy("cluster_id", "doc_id")


def cluster_oracle_sql(pairs_sql: str) -> str:
    """Recursive-CTE DuckDB twin of ``cluster_assignments`` over any
    pair-producing SQL with columns ``(id_a, id_b)``.

    Min-label propagation as recursion: a label walks an edge only when it
    is smaller than the destination node id; UNION dedup terminates the
    recursion, and ``min`` over all labels a node ever saw is its component.
    """
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM und),
walk(node, comp) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT u.b AS node, w.comp
  FROM walk w JOIN und u ON w.node = u.a
  WHERE w.comp < u.b
),
cc AS (SELECT node, min(comp) AS component FROM walk GROUP BY node)
SELECT node AS doc_id,
       component AS cluster_id,
       count(*) OVER (PARTITION BY component) AS cluster_size,
       node = component AS is_canonical
FROM cc
ORDER BY cluster_id, doc_id
"""
