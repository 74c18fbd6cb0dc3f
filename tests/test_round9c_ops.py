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


def test_kmv_small_group_is_exact(spark):
    """Fewer distinct values than k: the sketch IS the distinct set and
    the estimate equals the exact count (err 0)."""
    from faers_datalakehouse_spark.operators.kmv import kmv_distinct

    rows = [("g", v % 10) for v in range(100)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {r["grp"]: r for r in kmv_distinct(df, "grp", "v", k=64).collect()}
    assert got["g"]["exact_distinct"] == 10
    assert got["g"]["est_distinct"] == 10
    assert got["g"]["err_ppm"] == 0
    assert got["ALL"]["est_distinct"] == 10


def test_kmv_partition_invariant(spark):
    """The bottom-k merge is lossless: any partition layout yields the
    identical sketch row."""
    from faers_datalakehouse_spark.operators.kmv import kmv_distinct

    rows = [("g", v) for v in range(500)]
    df = spark.createDataFrame(rows, "grp string, v long")
    a = kmv_distinct(df.coalesce(1), "grp", "v", k=32).collect()
    b = kmv_distinct(df.repartition(13), "grp", "v", k=32).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_kmv_estimate_matches_reference_order_statistic(spark):
    """The estimate equals the pure-Python (k-1)*2^32 // kth-smallest-
    md5-prefix computation — for md5("0".."499") at k=32 that is 858
    (an unlucky draw, ~1.7x: the k-th order statistic landed low; the
    point of the assert is bit-exactness, not estimator luck)."""
    from faers_datalakehouse_spark.operators.kmv import kmv_distinct

    rows = [("g", v) for v in range(500)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = kmv_distinct(df, "grp", "v", k=32).collect()
    g = {r["grp"]: r for r in got}["g"]
    import hashlib

    hs = sorted(
        int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        for v in range(500)
    )
    assert g["kth_min"] == hs[31]
    assert g["est_distinct"] == 31 * (1 << 32) // hs[31] == 858


def test_hash_features_shape_and_domain(spark):
    from faers_datalakehouse_spark.operators.feathash import hash_features

    df = spark.createDataFrame(
        [(1, "A", 5), (2, "B", None)], "id long, seg string, nk int"
    )
    got = hash_features(df, "id", ["seg", "nk"], n_buckets=16).collect()
    assert len(got) == 4
    assert all(0 <= r["bucket"] < 16 for r in got)
    assert all(r["sign"] in (-1, 1) for r in got)
    feats = {r["feat"] for r in got}
    assert "seg=A" in feats and "nk=" in feats  # NULL hashes as absence


def test_feature_hash_profile_mass_conserved(spark):
    from faers_datalakehouse_spark.operators.feathash import (
        feature_hash_profile,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", i % 7) for i in range(50)],
        "id long, seg string, nk long",
    )
    got = feature_hash_profile(df, "id", ["seg", "nk"], n_buckets=8).collect()
    assert sum(r["n"] for r in got) == 100  # 50 rows x 2 features
    assert sum(r["n_feats"] for r in got) == 10  # 3 segs + 7 nks


def _holt_ref(xs, a=307, b=205):
    l, t = xs[0] * 1000, 0
    for x in xs[1:]:
        lp = (a * x * 1000 + (1024 - a) * (l + t)) >> 10
        t = (b * (lp - l) + (1024 - b) * t) >> 10
        l = lp
    return l, t


def test_holt_matches_pure_python_fold(spark):
    from faers_datalakehouse_spark.operators.holt import holt_smooth

    xs = [100, 120, 90, 150, 200, 180, 30]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "grp string, day long, x long")
    got = holt_smooth(df, "grp", "day", "x").collect()[0]
    l, t = _holt_ref(xs)
    assert (got["level_milli"], got["trend_milli"]) == (l, t)
    assert got["forecast_milli"] == l + t
    assert got["n_days"] == 7


def test_holt_single_point(spark):
    from faers_datalakehouse_spark.operators.holt import holt_smooth

    df = spark.createDataFrame([("g", 1, 42)], "grp string, day long, x long")
    got = holt_smooth(df, "grp", "day", "x").collect()[0]
    assert got["level_milli"] == 42_000
    assert got["trend_milli"] == 0


def test_holt_negative_trend_floor_division(spark):
    """A collapsing series drives the trend negative: the arithmetic-
    shift recursion must still match the pure-Python floor fold."""
    from faers_datalakehouse_spark.operators.holt import holt_smooth

    xs = [1000, 500, 100, 50, 10, 1]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "grp string, day long, x long")
    got = holt_smooth(df, "grp", "day", "x").collect()[0]
    l, t = _holt_ref(xs)
    assert t < 0
    assert (got["level_milli"], got["trend_milli"]) == (l, t)
