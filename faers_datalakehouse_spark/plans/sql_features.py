"""Spark 4 SQL-surface features as first-class engine coverage:
session variables, EXECUTE IMMEDIATE, SQL scripting (BEGIN ... END),
and the Observation metrics API.

The reference drives its silver/gold layers through ``spark.sql`` over
temp views (S8 in SURVEY §2; e.g. `/root/reference` gold notebooks);
production SQL pipelines additionally lean on procedural SQL —
variables for parameterized thresholds, scripting for multi-statement
transactions of logic — and on query-attached metrics for data-quality
telemetry that costs NO extra pass. These entries prove each feature
end-to-end against plain-SQL oracles.

Determinism note (the repo-wide cross-engine float rule): the script's
threshold is an AVG over exact integer cents — one exactly-rounded IEEE
division of exact int64 sums — so Spark and DuckDB derive the identical
cutoff; everything downstream is integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sql_scripting_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statement SQL script (Spark 4 SQL scripting): declare a
    variable, derive a data-driven threshold (mean order value in exact
    cents), then report per-priority volume above the threshold. The
    script's LAST statement is its result — the whole block runs inside
    Spark's SQL scripting interpreter, not Python glue."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_script_v"
    )
    return spark.sql(
        """
BEGIN
  DECLARE cut BIGINT DEFAULT 0;
  SET cut = (
    SELECT CAST(avg(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    FROM orders_script_v
  );
  SELECT o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n_above,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents_above,
         cut AS cut_cents
  FROM orders_script_v
  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > cut
  GROUP BY o_orderpriority
  ORDER BY priority;
END
"""
    )


SQL_SCRIPTING_SQL = """
WITH cents AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), cut AS (
  SELECT CAST(avg(c) AS BIGINT) AS cut_cents FROM cents
)
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(sum(c) AS BIGINT) AS cents_above,
       cut.cut_cents
FROM cents CROSS JOIN cut
WHERE c > cut.cut_cents
GROUP BY o_orderpriority, cut.cut_cents
ORDER BY priority
"""


def sql_variables_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables + EXECUTE IMMEDIATE with USING parameters: a
    parameterized top-N report where the group column arrives through
    IDENTIFIER() — the safe dynamic-SQL idiom (no string splicing)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_vars_v"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE report_top INT DEFAULT 3")
    spark.sql("SET VAR report_top = 4")
    return spark.sql(
        """
EXECUTE IMMEDIATE
  'SELECT IDENTIFIER(?) AS grp,
          CAST(count(*) AS BIGINT) AS n
   FROM orders_vars_v
   GROUP BY grp ORDER BY n DESC, grp LIMIT report_top'
  USING 'o_orderstatus'
"""
    )


SQL_VARIABLES_SQL = """
SELECT o_orderstatus AS grp, CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY n DESC, grp LIMIT 4
"""


def recursive_cte_reach_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 recursive CTE) transitive reach over the
    nation-level trade graph: min-hop distance from nation 0 along
    high-volume supplier-nation -> customer-nation edges.

    The edge list is AGGREGATED first (<= 625 rows for 25 nations — a
    bounded frame whatever the fact-table scale), so the recursion
    iterates over KBs. Spark 4.1 supports only UNION ALL in recursive
    CTEs (UNION raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the
    walk must bound its own path count: edges are restricted to
    ``src < dst`` (a DAG over the 25 nation keys — every path is a
    strictly increasing key sequence, combinatorially bounded at
    C(24,k) per length regardless of fact-table scale) plus a ``hops
    < 5`` depth guard. The outer min() collapses the path multiset to
    shortest-hop distances — classic BFS-via-recursion, here exercising
    the SQL engine surface itself (the DataFrame twin is
    ``operators.graph.bfs_distances``).

    The edge list is AGGREGATED AND COLLECTED before the walk: the
    post-aggregation frame is bounded by the nation-key domain (top-2
    lanes per source -> <= 50 rows at ANY corpus scale), so collecting
    it is the repo's standard bounded collect, not a data-proportional
    one. r12 optimization (guide §1.2 "fix the distributed algorithm"):
    the walk itself now runs as a driver BFS over those <= 50 collected
    edges instead of Spark's UnionLoop — UnionLoop re-plans and
    re-schedules the recursive branch per iteration (~0.5 s/iteration
    fixed cost; measured 2.9-4.2 s for the 6-level guard even over a
    3-row LOCAL edge table, with shuffle.partitions=1 making no
    difference), which is pure engine overhead on a domain-bounded
    problem, the same class as k-means' k-row centroid loop. The
    recursive-CTE SQL surface itself stays exercised (and pinned
    result-identical to this unrolled walk) by
    ``tests/test_round8_ops.py::test_recursive_cte_matches_unrolled``;
    the DuckDB oracle still runs the genuine single-statement
    WITH RECURSIVE. Result set unchanged: BFS min-hop = min over the
    recursion's path multiset, depth guard identical (new hops =
    r.hops + 1 <= 5)."""
    for t in ("lineitem", "orders", "customer", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(
            f"{t}_rec_v"
        )
    edge_rows = spark.sql(
        RECURSIVE_REACH_EDGES_BODY.format(suffix="_rec_v")
    ).collect()
    dist = bfs_min_hops(
        [(int(r["src"]), int(r["dst"])) for r in edge_rows],
        source=0,
        max_hops=5,
    )
    out = spark.createDataFrame(
        sorted(dist.items()), "nation long, min_hops long"
    )
    return out.orderBy("nation")


def bfs_min_hops(
    edges: list[tuple[int, int]], source: int, max_hops: int
) -> dict[int, int]:
    """Min-hop distances from ``source`` along directed ``edges``, depth
    capped at ``max_hops`` — the driver-side unroll of
    ``RECURSIVE_REACH_RECURSION_BODY`` (min over the recursion's path
    multiset == first-visit BFS depth; both exclude nodes first reached
    beyond the cap)."""
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {source: 0}
    frontier = [source]
    for hop in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    return dist


# shared body: identical SQL runs on both engines (tables differ only by
# the view suffix; DuckDB reads the bare names)
# edge derivation (shared semantics): top-2 outgoing lanes per source
# nation (deterministic tie-break) over the src < dst trade DAG — a
# sparse, scale-invariant graph where multi-hop reach matters
RECURSIVE_REACH_EDGES_BODY = """
WITH all_edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         count(*) AS n_ship
  FROM lineitem{suffix} l
  JOIN orders{suffix} o ON l.l_orderkey = o.o_orderkey
  JOIN customer{suffix} c ON o.o_custkey = c.c_custkey
  JOIN supplier{suffix} s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey < c.c_nationkey
  GROUP BY 1, 2
)
SELECT src, dst FROM (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY n_ship DESC, dst)
           AS rk
  FROM all_edges
) WHERE rk <= 2
"""

# the recursion itself, over any (src, dst) edge relation
RECURSIVE_REACH_RECURSION_BODY = """
WITH RECURSIVE reach(nation, hops) AS (
  SELECT CAST(0 AS BIGINT) AS nation, CAST(0 AS BIGINT) AS hops
  UNION ALL
  SELECT CAST(e.dst AS BIGINT), r.hops + 1
  FROM reach r JOIN {edges} e ON e.src = r.nation
  WHERE r.hops < 5
)
SELECT nation, CAST(min(hops) AS BIGINT) AS min_hops
FROM reach
GROUP BY nation
ORDER BY nation
"""

# DuckDB oracle: one statement with the edge CTE inline (DuckDB
# materializes CTEs, so its recursion does NOT re-derive the edges)
RECURSIVE_REACH_SQL = f"""
WITH RECURSIVE edges AS ({RECURSIVE_REACH_EDGES_BODY.format(suffix="")}),
reach(nation, hops) AS (
  SELECT CAST(0 AS BIGINT) AS nation, CAST(0 AS BIGINT) AS hops
  UNION ALL
  SELECT CAST(e.dst AS BIGINT), r.hops + 1
  FROM reach r JOIN edges e ON e.src = r.nation
  WHERE r.hops < 5
)
SELECT nation, CAST(min(hops) AS BIGINT) AS min_hops
FROM reach
GROUP BY nation
ORDER BY nation
"""


def pipe_syntax_trend_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>`` operators): the monthly order
    volume/revenue trend written as a linear pipeline — FROM, then WHERE,
    EXTEND (computed column), AGGREGATE ... GROUP BY, ORDER BY — each
    stage a pipe step. Same Catalyst plan as the nested form; this entry
    pins the parser surface. Revenue is exact integer cents, so the
    plain-SQL DuckDB twin hashes bit-for-bit."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "orders_pipe_v"
    )
    return spark.sql(
        """
FROM orders_pipe_v
|> WHERE o_orderstatus <> 'F'
|> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
          substr(CAST(o_orderdate AS STRING), 1, 7) AS month
|> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
   GROUP BY month
|> ORDER BY month
"""
    )


PIPE_SYNTAX_TREND_SQL = """
SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY 1
ORDER BY month
"""


def observed_quality_query(spark: SparkSession, sf_dir: str):
    """Observation-metered curation filter: keep documents above a
    length floor while a query-attached ``Observation`` records
    telemetry (rows seen, rows kept, chars kept) in the SAME pass — the
    zero-extra-scan data-quality pattern. Returns the filtered frame;
    ``observed_quality_metrics`` exposes the observation for tests."""
    from pyspark.sql import Observation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    obs = Observation("curation")
    metered = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum((F.col("n_chars") >= 200).cast("long")).alias("rows_kept"),
        F.sum(
            F.when(F.col("n_chars") >= 200, F.col("n_chars")).otherwise(0)
        ).alias("chars_kept"),
    )
    # deliberately NO global orderBy here: a global sort runs a
    # range-boundary SAMPLING pass that re-executes the observed subtree
    # and double-counts every metric (measured: rows_seen = 2x). Attach
    # observations above sorts, or skip the sort — the driver compare is
    # order-insensitive.
    out = metered.where(F.col("n_chars") >= 200).select(
        "doc_id", "source", "n_chars"
    )
    return out, obs


def observed_quality_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    df, _obs = observed_quality_query(spark, sf_dir)
    return df


OBSERVED_QUALITY_SQL = """
SELECT doc_id, source, n_chars
FROM documents WHERE n_chars >= 200
ORDER BY doc_id
"""


def pandas_api_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark (``pyspark.pandas``): the pricing rollup
    written as idiomatic pandas — groupby/agg/reset_index — executing
    as the SAME distributed Catalyst plan underneath (``.to_spark()``
    hands back the lazily-built DataFrame; nothing collects). Measures
    are exact integer cents so the twin SQL hashes bit-for-bit.

    This is migration-surface coverage: a pandas-speaking user of the
    reference can keep their idioms and inherit the cluster execution
    model. The default-index advice is followed (``index_col`` set) so
    no monotonically-increasing-id stage sneaks into the plan."""
    import pyspark.pandas as ps

    li = ps.read_parquet(
        f"{sf_dir}/lineitem.parquet", index_col="l_orderkey"
    )
    li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")
    li["qty"] = li["l_quantity"].round().astype("int64")
    g = (
        li.groupby(["l_returnflag", "l_linestatus"])
        .agg(n=("cents", "count"), cents=("cents", "sum"), qty=("qty", "sum"))
        .reset_index()
    )
    out = g.to_spark()
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
        F.col("qty").cast("long").alias("qty"),
    ).orderBy("l_returnflag", "l_linestatus")


PANDAS_API_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
FROM lineitem
GROUP BY 1, 2
ORDER BY l_returnflag, l_linestatus
"""


def lateral_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (Spark >= 3.2 SQL surface):
    per-nation top-3 customers by account balance, written as
    ``nation JOIN LATERAL (... WHERE c_nationkey = n.n_nationkey ORDER
    BY ... LIMIT 3)``. Catalyst rewrites the correlated limit into a
    partitioned window top-k (DomainJoin -> rank filter), so the
    physical plan is the scalable shape — this entry pins the PARSER
    surface, not a per-nation re-scan. Balance kept as exact cents so
    the DuckDB LATERAL twin hashes bit-for-bit."""
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "nation_lat_v"
    )
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer_lat_v"
    )
    return spark.sql(
        """
SELECT n.n_name, t.c_name, t.bal_c
FROM nation_lat_v n JOIN LATERAL (
  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer_lat_v
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 3
) t
ORDER BY n.n_name, t.bal_c DESC, t.c_name
"""
    )


LATERAL_TOPK_SQL = """
SELECT n.n_name, t.c_name, t.bal_c
FROM nation n JOIN LATERAL (
  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 3
) t ON true
ORDER BY n.n_name, t.bal_c DESC, t.c_name
"""
