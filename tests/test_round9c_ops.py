"""Round-9 second-session additions: clustering coefficient, resource-
allocation link prediction."""

from __future__ import annotations


def test_lcc_triangle_with_pendant(spark):
    """Triangle 1-2-3 plus pendant 3-4: nodes 1,2 have lcc=1, node 3 has
    deg 3 and one closed pair of three -> 1/3, node 4 (deg 1) excluded."""
    from faers_datalakehouse_spark.operators.linkpred import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r["node"]: r for r in clustering_coefficient(edges).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["lcc_micro"] == 1_000_000
    assert got[2]["lcc_micro"] == 1_000_000
    assert got[3]["deg"] == 3
    assert got[3]["n_triangles"] == 1
    assert got[3]["lcc_micro"] == 333_333


def test_lcc_ignores_direction_and_duplicates(spark):
    from faers_datalakehouse_spark.operators.linkpred import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)],
        "src long, dst long",
    )
    got = {r["node"]: r for r in clustering_coefficient(edges).collect()}
    assert all(r["lcc_micro"] == 1_000_000 for r in got.values())
    assert all(r["deg"] == 2 for r in got.values())


def test_ra_scores_and_common_counts(spark):
    """a=1,2 share z=10 (deg 2) and z=11 (deg 3); a=3 only touches 11:
    RA(1,2) = 1/2 + 1/3, RA(1,3) = RA(2,3) = 1/3 (micro, floor)."""
    from faers_datalakehouse_spark.operators.linkpred import (
        resource_allocation_pairs,
    )

    bip = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11)], "a long, z long"
    )
    got = {
        (r["a"], r["b"]): r
        for r in resource_allocation_pairs(bip, "a", "z").collect()
    }
    assert got[(1, 2)]["n_common"] == 2
    assert got[(1, 2)]["ra_micro"] == 500_000 + 333_333
    assert got[(1, 3)]["ra_micro"] == 333_333
    assert got[(2, 3)]["ra_micro"] == 333_333


def test_ra_hub_cap_bounds_wedges(spark):
    """With max_hub_deg=2 the deg-3 hub z=11 is excluded: only the (1,2)
    pair via z=10 survives — the candidate set is linearly bounded."""
    from faers_datalakehouse_spark.operators.linkpred import (
        resource_allocation_pairs,
    )

    bip = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11)], "a long, z long"
    )
    got = resource_allocation_pairs(bip, "a", "z", max_hub_deg=2).collect()
    assert len(got) == 1
    assert (got[0]["a"], got[0]["b"], got[0]["ra_micro"]) == (1, 2, 500_000)


def test_ra_min_score_filter(spark):
    from faers_datalakehouse_spark.operators.linkpred import (
        resource_allocation_pairs,
    )

    bip = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11)], "a long, z long"
    )
    got = resource_allocation_pairs(
        bip, "a", "z", min_score_micro=400_000
    ).collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 2)]
