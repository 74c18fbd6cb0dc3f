"""r12 session-5 shuffle/scan-dedup fix: mirror/members self-unions that
re-executed their upstream subtree once per branch are now a single-pass
``explode(array(...))``. These tests pin the explode spelling row- AND
dtype-identical to the union spelling it replaced (including the implicit
type unification a positional union performs), so the rewrite rule can
never drift semantically. Operator-level outputs stay pinned by the
existing graph/clustering/kmv/concurrency tests and the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_struct_mirror_explode_matches_union(spark):
    # mixed int/long columns: the positional union widens per-slot; the
    # array-of-structs form must unify to the identical schema
    pairs = spark.createDataFrame(
        [(1, 1000001, 5), (2, 1000002, 7), (1, 1000001, 3)],
        "s int, c long, w int",
    )
    old = pairs.selectExpr("s AS src", "c AS dst", "w").unionByName(
        pairs.selectExpr("c AS src", "s AS dst", "w")
    )
    new = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("src"), F.col("c").alias("dst"), F.col("w")
                ),
                F.struct(
                    F.col("c").alias("src"), F.col("s").alias("dst"), F.col("w")
                ),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst", "ed.w")
    assert new.dtypes == old.dtypes
    assert _rows(new, "src", "dst", "w") == _rows(old, "src", "dst", "w")


def test_members_explode_matches_three_way_union(spark):
    tris = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 4), (1, 3, 3)], "u long, v long, w long"
    )
    old = (
        tris.select(F.col("u").alias("node"))
        .union(tris.select(F.col("v").alias("node")))
        .union(tris.select(F.col("w").alias("node")))
    )
    new = tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
    assert new.dtypes == old.dtypes
    assert sorted(r[0] for r in new.collect()) == sorted(
        r[0] for r in old.collect()
    )


def test_lit_tag_explode_matches_union(spark):
    # the kmv 'ALL'-row union: (grp, h) + ('ALL', h) in one pass
    cands = spark.createDataFrame(
        [("a", 10), ("b", 20), ("a", 20)], "grp string, h long"
    )
    old = cands.union(cands.select(F.lit("ALL").alias("grp"), "h"))
    new = cands.select(
        F.explode(F.array(F.col("grp"), F.lit("ALL"))).alias("grp"), "h"
    )
    assert new.dtypes == old.dtypes
    assert _rows(new, "grp", "h") == _rows(old, "grp", "h")


def test_boundary_events_explode_matches_union(spark):
    events = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 10:30:00",)], "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    iv = F.expr("INTERVAL 15 MINUTES")
    old = events.select(F.col("ts").alias("t"), F.lit(1).alias("d")).unionByName(
        events.select((F.col("ts") + iv).alias("t"), F.lit(-1).alias("d"))
    )
    new = events.select(
        F.explode(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("d")),
                F.struct((F.col("ts") + iv).alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("ev")
    ).select("ev.t", "ev.d")
    assert new.dtypes == old.dtypes
    assert _rows(new, "t", "d") == _rows(old, "t", "d")


def test_graph_operators_small_graph_after_rewrite(spark):
    """End-to-end sanity on a hand-checkable graph: K4 plus a pendant.
    Triangles of K4: each node of {1,2,3,4} is in C(3,2)=3 triangles;
    node 5 (pendant) in none. 3-core of K4 = all four nodes at deg 3."""
    from faers_datalakehouse_spark.operators.graph import triangle_counts
    from faers_datalakehouse_spark.operators.kcore import kcore_peel
    from faers_datalakehouse_spark.operators.clustering import (
        connected_components,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(k4 + [(4, 5)], "src long, dst long")
    tri = _rows(triangle_counts(edges), "node")
    assert tri == [(1, 3), (2, 3), (3, 3), (4, 3)]
    core = _rows(kcore_peel(edges, k=3, rounds=3), "node")
    assert core == [(1, 3), (2, 3), (3, 3), (4, 3)]
    cc = _rows(connected_components(edges).select("node", "comp"), "node")
    assert cc == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)]
