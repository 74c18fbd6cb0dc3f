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


def test_l_diversity_homogeneous_class_flagged(spark):
    """One class has a single sensitive value (l=1, top=100%), the other
    two distinct values."""
    from faers_datalakehouse_spark.operators.privacy import l_diversity_audit

    rows = [("a", "s1"), ("a", "s1"), ("a", "s1"), ("b", "s1"), ("b", "s2")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = {r["q"]: r for r in l_diversity_audit(df, ["q"], "s", l=2).collect()}
    assert got["a"]["l_distinct"] == 1
    assert got["a"]["top_ppm"] == 1_000_000
    assert got["a"]["diverse"] is False
    assert got["b"]["l_distinct"] == 2
    assert got["b"]["top_ppm"] == 500_000
    assert got["b"]["diverse"] is True


def test_l_diversity_counts(spark):
    from faers_datalakehouse_spark.operators.privacy import l_diversity_audit

    rows = [("a", "x")] * 7 + [("a", "y")] * 2 + [("a", "z")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = l_diversity_audit(df, ["q"], "s", l=3).collect()[0]
    assert got["n"] == 10
    assert got["l_distinct"] == 3
    assert got["top_ppm"] == 700_000
    assert got["diverse"] is True


def test_spearman_perfect_monotone(spark):
    """y strictly increasing with x: rho = +1 exactly (1000 milli)."""
    from faers_datalakehouse_spark.operators.spearman import spearman_by_group

    rows = [("g", i, i * i, i) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long, tb long")
    got = spearman_by_group(df, "g", "x", "y", "tb").collect()[0]
    assert got["rho_milli"] == 1000
    assert got["sxy"] == got["sxx"] == got["syy"]


def test_spearman_perfect_inverse(spark):
    from faers_datalakehouse_spark.operators.spearman import spearman_by_group

    rows = [("g", i, 100 - i, i) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long, tb long")
    got = spearman_by_group(df, "g", "x", "y", "tb").collect()[0]
    assert got["rho_milli"] == -1000


def test_spearman_ties_average_ranks(spark):
    """x = (1,1,2) with tie-averaged ranks (1.5,1.5,3): doubled ranks
    (3,3,6). y = (5,5,9) identical pattern -> rho = 1."""
    from faers_datalakehouse_spark.operators.spearman import spearman_by_group

    rows = [("g", 1, 5, 1), ("g", 1, 5, 2), ("g", 2, 9, 3)]
    df = spark.createDataFrame(rows, "g string, x long, y long, tb long")
    got = spearman_by_group(df, "g", "x", "y", "tb").collect()[0]
    assert got["rho_milli"] == 1000


def test_spearman_zero_variance_is_null(spark):
    from faers_datalakehouse_spark.operators.spearman import spearman_by_group

    rows = [("g", 7, i, i) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "g string, x long, y long, tb long")
    got = spearman_by_group(df, "g", "x", "y", "tb").collect()[0]
    assert got["rho_milli"] is None
