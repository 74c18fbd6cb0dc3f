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


# ADVICE r12 asked whether the pagerank/bfs/sssp edge checkpoints need
# kcore's below-parallelism re-spread guard (their per-round joins
# broadcast the small side and stream the frozen checkpoint layout).
# Measured r13, paired same-window A/B at sf0.1 (3 runs + warmup each):
# the guard REGRESSED all three — pagerank 2.42 -> 4.16 s min,
# bfs_distances 3.03 -> 4.32, sssp_weighted 4.15 -> 5.60 — because the
# extra repartition+re-checkpoint barrier costs more than the layout
# pays: unlike kcore (2|E| rows streamed through 4 peel rounds), these
# ops stream node- or relax-sized frames a handful of times, and their
# per-round aggregations re-exchange anyway. Rejected; kcore keeps its
# guard (r12: 5x corpus 12.1 -> 8.4 s, exponent 0.68 -> 0.43).


def pagerank_lite(
    edges: DataFrame,
    iters: int = 2,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(node, rank_micro)`` after ``iters`` damped integer power steps
    over the DISTINCT directed edge set; ordered by rank desc, node asc.

    The edge frame is materialized ONCE (eager ``localCheckpoint``, the
    repo's iterative-lineage standard — see ``operators/clustering.py``):
    ``e`` is referenced by ``nodes`` (twice), ``outdeg``, and every
    iteration's join, so without materialization the executed tree
    re-derives the upstream edge plan (often a fact-table join) per
    reference — the r12 plan audit measured 40 parquet scans / 60
    exchanges for iters=2 on this operator. ``nodes`` and ``outdeg`` are
    node-sized and each referenced per iteration, so they are
    materialized too. At 100 TB this is exactly the state a distributed
    PR keeps per iteration anyway (GraphX checkpoints the same frames)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
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


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    pre_canonical: bool = False,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph of
    ``edges`` — ``(node, n_triangles)`` for nodes in ≥1 triangle,
    ordered by node. Triangle density is the classic cohesion signal
    (clustering coefficient numerator, spam-farm detection on link
    graphs).

    Algorithm: degree-ordered orientation + edge iterator. Each
    undirected edge is oriented from its lower-(degree, id) endpoint to
    the higher, bounding every out-degree by O(sqrt(m)); out-neighbor
    ADJACENCY ARRAYS are then joined onto each oriented edge (u, v) and
    the closing vertices are ``array_intersect(N+(u), N+(v))`` — each
    triangle found exactly once at its lowest-rank base edge. The
    earlier wedge-join formulation (self-join on u, then a semi-join
    probe) shuffled the full wedge set — tens of millions of rows here,
    Σ outdeg² in general — where the intersect form shuffles only the
    node-sized adjacency table and streams the edge list through two
    hash joins; per-edge work is O(deg_u + deg_v), the same total
    compute without materializing wedges through an exchange. All exact
    integers (DuckDB twin enumerates ``a < b < c`` directly — same
    triangle set, same counts).
    """
    # ``pre_canonical=True`` promises ``edges`` is ALREADY the distinct
    # undirected (a=src < b=dst) edge set, materialized by the caller —
    # clustering_coefficient builds exactly that frame for its degree
    # aggregate, and before r12 this function re-ran the
    # least/greatest+distinct shuffle and a second degree aggregate on
    # it (a full redundant exchange + materialization per call).
    # ``degrees`` likewise lets the caller share its (node, deg) frame.
    if pre_canonical:
        und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y")).filter(
            F.col("x") != F.col("y")
        )
        # und feeds degree (twice, via the union) AND the orientation join;
        # without reuse every reference re-runs the upstream edge plan (the
        # round-7 plan audit showed 8 scans of the source tables for what is
        # logically one edge list). localCheckpoint(eager=True) — not
        # persist(): cache-manager entries are keyed by analyzed plan and
        # accumulate across invocations, and under storage pressure their
        # eviction churn made this operator bimodal (4.5 s vs 21 s runs in
        # BENCH_local_session2_r07); checkpoint blocks are per-call, disk-
        # backed, lineage-truncating, and reclaimed when the frame is GC'd.
        und = (
            e.select(
                F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    # both endpoints in ONE pass (explode, not a two-branch self-union):
    # und is materialized, but the union form still read it twice —
    # the same rewrite class as linkpred.clustering_coefficient's
    # identical degree computation (ADVICE r12)
    deg = degrees if degrees is not None else (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wd = und.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(
        deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b"
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # o: u -> v with rank(u) < rank(v); consumed twice (adjacency build
    # + edge stream), checkpointed so the orientation join runs once
    o = wd.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint(eager=True)
    # node-sized adjacency table; array lengths bounded O(sqrt(m)) by
    # the orientation, so collect_list state can't blow up on a hub
    adj = o.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    tris = (
        o.join(adj, "u")
        .join(
            adj.select(
                F.col("u").alias("v"), F.col("nbrs").alias("nbrs_v")
            ),
            "v",
            "left",  # v may have no out-neighbors; null intersect -> no rows
        )
        .select(
            "u",
            "v",
            F.explode(F.array_intersect("nbrs", "nbrs_v")).alias("w"),
        )
    )
    # ONE pass over the triangle stream: each (u, v, w) row contributes
    # its three corners via explode. The previous 3-way self-union
    # re-executed the whole adjacency-join + array_intersect pipeline
    # once per branch (the final plan carried 3 ArrayIntersect nodes /
    # 12 joins — r12 plan audit); Spark does not de-duplicate common
    # subtrees across union branches.
    members = tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
    return (
        members.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("node")
    )


TRIANGLE_SQL_TEMPLATE = """
WITH raw AS ({edges_sql}),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE src <> dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
GROUP BY node
ORDER BY node
"""


def triangle_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin over any ``(src, dst)``-producing SQL: direct
    ``a < b < c`` enumeration — each triangle exactly once, so the
    per-node counts match the oriented algorithm bit-for-bit."""
    return TRIANGLE_SQL_TEMPLATE.format(edges_sql=edges_sql)


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


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Minimum-hop BFS distances from a fixed source set over the
    DISTINCT directed edge set — ``(node, dist)`` for every node
    reachable within ``max_hops``, ordered by (dist, node). Completes
    the graph family (PageRank = importance, connected components =
    membership, triangles = density, BFS = reachability radius); the
    multi-source form is the building block for landmark/seed-distance
    features (e.g. spam-distance from a trusted seed set in web-graph
    curation).

    Frontier algorithm: per hop, ONE hash join (frontier ⋈ edges on
    src) + distinct + anti-join against the settled set — the settled
    frame is |reachable nodes|-sized, nothing is collected, and lineage
    is linear in ``max_hops`` (small, fixed). Only NEW nodes join the
    next frontier, so each edge is traversed at most once per endpoint
    discovery — the textbook distributed BFS.

    Exactness: hop counts are integers; the DuckDB twin
    (``bfs_oracle_sql``) walks the same graph with a bounded recursive
    CTE and takes ``min(dist)`` — bit-identical.

    No counterpart in the reference (engine extension surface).
    """
    spark = edges.sparkSession
    # Materialize the edge frame once and each hop's NEW frontier
    # (eager localCheckpoint — operators/clustering.py's documented
    # iterative-lineage rule). ``settled`` references the previous hop's
    # frame twice (anti-join + union), so without per-hop
    # materialization the executed tree doubles per hop: the r12 plan
    # audit measured 48 parquet scans / 138 exchanges / 72 joins at
    # max_hops=3. With it, each hop is ONE join + distinct + anti-join
    # over materialized, frontier-sized frames.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    settled = spark.createDataFrame(
        [(int(s), 0) for s in sorted(set(sources))], "node long, dist long"
    )
    frontier = settled.select("node")
    for hop in range(1, max_hops + 1):
        new = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        settled = settled.union(new)
        frontier = new.select("node")
    return settled.orderBy("dist", "node")


def bfs_oracle_sql(
    edges_sql: str, sources: list[int], max_hops: int = 3
) -> str:
    """DuckDB twin: bounded recursive CTE over any ``(src, dst)``
    edge SQL. The recursive UNION dedups (node, dist) pairs, so the
    walk is bounded by |nodes| x hops rows; min(dist) recovers the
    BFS level."""
    seeds = ", ".join(
        f"({int(s)}, 0)" for s in sorted(set(sources))
    )
    return f"""
WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
walk(node, dist) AS (
    SELECT CAST(v.node AS BIGINT), CAST(v.dist AS BIGINT)
    FROM (VALUES {seeds}) v(node, dist)
  UNION
    SELECT e.dst, walk.dist + 1
    FROM walk JOIN e ON e.src = walk.node
    WHERE walk.dist < {max_hops}
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
ORDER BY dist, node
"""


def sssp_weighted(
    edges: DataFrame,
    sources: list[int],
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Bounded Bellman-Ford: cheapest weighted path cost from a source
    set, relaxing every edge ``rounds`` times — exact shortest paths for
    any path of <= ``rounds`` hops (the landmark-distance / lead-time
    primitive; BFS is the unit-weight special case).

    Weights must be non-negative int64. Per round: ONE hash join
    (settled distances x edges on src) + a partial-agged min groupBy —
    nothing collected, state is |reached nodes| rows, lineage linear in
    ``rounds`` (small, fixed). The DuckDB twin unrolls the identical
    rounds as nested CTEs (a recursive-CTE walk would enumerate paths —
    exponential in fan-out — instead of relaxing distances).

    No counterpart in the reference (engine extension surface).
    """
    spark = edges.sparkSession
    # Edge frame materialized once, per-round distance frame materialized
    # per round (eager localCheckpoint — the clustering.py iterative-
    # lineage rule): ``dist`` is referenced twice per round (relaxation
    # join + union), so the unmaterialized tree doubles per round — the
    # r12 plan audit measured 56 parquet scans / 80 exchanges at
    # rounds=3, each re-deriving the weighted fact-table edge join.
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sorted(set(sources))], "node long, dist long"
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.orderBy("dist", "node")


def sssp_oracle_sql(
    edges_sql: str, sources: list[int], rounds: int = 3
) -> str:
    """Round-unrolled Bellman-Ford twin: r0 = seeds; r_{i+1} =
    min-groupBy over r_i UNION ALL (r_i relaxed through edges)."""
    seeds = ", ".join(f"({int(s)}, 0)" for s in sorted(set(sources)))
    sql = [
        f"WITH e AS (SELECT src, dst, CAST(min(w) AS BIGINT) AS w FROM ({edges_sql}) GROUP BY 1, 2),",
        f"r0(node, dist) AS (SELECT * FROM (VALUES {seeds}) AS t(node, dist)),",
    ]
    for i in range(rounds):
        sql.append(
            f"r{i + 1} AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM ("
            f"SELECT node, dist FROM r{i} UNION ALL "
            f"SELECT e.dst AS node, r{i}.dist + e.w AS dist "
            f"FROM r{i} JOIN e ON e.src = r{i}.node) GROUP BY node),"
        )
    sql[-1] = sql[-1].rstrip(",")
    sql.append(
        f"SELECT CAST(node AS BIGINT) AS node, dist FROM r{rounds} "
        "ORDER BY dist, node"
    )
    return "\n".join(sql)
