"""Bounded-round k-core peel — the graph-density filter that keeps only
nodes embedded in a mutually-dense neighborhood: repeatedly delete
nodes of degree < k until none remain (Seidman 1983; the standard
spam-farm / link-ring detector in web-graph curation and the seed
selector for community mining — complements this repo's graph family:
PageRank = importance, components = membership, triangles = local
density, BFS/SSSP = reachability, k-core = global density).

Bounded-round semantics (the repo's iterative idiom, cf. ``bfs_distances``
/ ``sssp_weighted``): ``rounds`` peel sweeps, each removing EVERY
currently-under-k node at once (the parallel peel — one sweep removes
entire shells, so convergence is fast; for any fixed testdata the round
count is validated by the no-op last round in the oracle twin). All
arithmetic is integer degree counting — bit-identical in DuckDB's
round-unrolled CTE twin.

Scale shape (100 TB graph): each round is ONE ``groupBy(node)`` degree
count (map-side combinable) + two hash semi-joins of the edge list
against the surviving-node set — all keyed shuffles, nothing collected,
no windows. The edge frame is ``localCheckpoint(eager=True)``-ed per
round: each round's frame is consumed by the next round's degree count
AND both joins, and without truncation the lineage would re-derive the
upstream plan 3^rounds times (the round-7 triangle-count lesson,
``graph.py:113-120``).

No counterpart in the reference repo (graph extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(node, deg)`` for nodes surviving ``rounds`` parallel peel
    sweeps at threshold ``k``, with their degree inside the surviving
    subgraph, ordered by node. Input is treated as UNDIRECTED: edges are
    canonicalized (self-loops dropped, both orientations merged) and
    symmetrized so degree = out-degree of the doubled edge list."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # symmetrize in ONE pass: explode both orientations per canonical
    # edge — the self-union form executed the distinct-over-upstream
    # subtree (a fact-table join in the bench entry) once per branch
    e = (
        und.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("src"), F.col("b").alias("dst")
                    ),
                    F.struct(
                        F.col("b").alias("src"), F.col("a").alias("dst")
                    ),
                )
            ).alias("ed")
        )
        .select("ed.src", "ed.dst")
        .localCheckpoint(eager=True)
    )
    # The eager checkpoint freezes the AQE-coalesced partition layout
    # into the RDD and every peel sweep's broadcast joins STREAM that
    # frozen layout (no re-exchange). If the materialized frame landed
    # below the session's parallelism, re-spread it once — the
    # condition only fires when the frame is small (AQE coalesces by
    # bytes), so the re-checkpoint is cheap exactly when it triggers
    # and a no-op on any at-scale layout.
    par = edges.sparkSession.sparkContext.defaultParallelism
    if e.rdd.getNumPartitions() < par:
        e = e.repartition(par).localCheckpoint(eager=True)
    # ADVICE r12 asked for the same guard after EVERY round's checkpoint
    # (the frame shrinks, so the condition can reappear). Measured r13,
    # paired same-window A/B at sf0.1: per-round guard 16.0 s min vs
    # 4.6 s for this round-1-only form — when it fires each round it
    # adds a repartition job + second checkpoint barrier per round,
    # which costs far more than the streaming parallelism it restores
    # on the already-peeled (small) frame. Round-1 is where the guard
    # pays: the full 2|E| frame is streamed through all subsequent
    # rounds' broadcast joins.
    for _ in range(rounds):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        e = (
            e.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("node"), "deg")
        .orderBy("node")
    )


def kcore_oracle_sql(
    edges_sql: str, k: int = 3, rounds: int = 4
) -> str:
    ctes = [
        f"""raw AS ({edges_sql})""",
        """und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE src <> dst
)""",
        """e0 AS (
  SELECT a AS src, b AS dst FROM und
  UNION ALL
  SELECT b AS src, a AS dst FROM und
)""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""k{r} AS (
  SELECT src FROM e{r} GROUP BY src HAVING count(*) >= {k}
)"""
        )
        ctes.append(
            f"""e{r + 1} AS (
  SELECT e.src, e.dst
  FROM e{r} e
  JOIN k{r} s ON e.src = s.src
  JOIN k{r} d ON e.dst = d.src
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
FROM e{rounds}
GROUP BY src
ORDER BY node
"""
    )
