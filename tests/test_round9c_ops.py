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
    # r10: raw moment diagnostics removed from the output (their BIGINT
    # narrowing overflowed at ~72k rows/group under ANSI — ADVICE r9)
    assert set(got.asDict()) == {"g", "n", "rho_milli"}


def test_spearman_large_group_no_ansi_overflow(spark):
    """ADVICE r9 regression: 80k rows in one group used to raise
    CAST_OVERFLOW narrowing the ~n^4-scaled variance numerators to
    BIGINT under ANSI mode. The diagnostics are gone; rho survives."""
    from pyspark.sql import functions as F

    from faers_datalakehouse_spark.operators.spearman import spearman_by_group

    df = (
        spark.range(80_000)
        .select(
            F.lit("g").alias("g"),
            F.col("id").alias("x"),
            F.col("id").alias("y"),
            F.col("id").alias("tb"),
        )
    )
    got = spearman_by_group(df, "g", "x", "y", "tb").collect()[0]
    assert got["n"] == 80_000 and got["rho_milli"] == 1000


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


def test_doc_keywords_ranks_rare_terms_first(spark):
    """'zebra' appears once in one doc of four (idf_bits high); 'the'
    appears everywhere and is dropped by the df cap."""
    from faers_datalakehouse_spark.operators.keywords import doc_keywords

    rows = [
        (1, "the zebra runs fast"),
        (2, "the dog runs"),
        (3, "the dog sleeps"),
        (4, "the cat sleeps"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = doc_keywords(df, k=2, max_df_pct=60).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1's top keyword is one of its unique terms (df=1 of 4 -> idf 3)
    assert by_doc[1][0]["word"] in {"zebra", "fast"}
    assert by_doc[1][0]["idf_bits"] == 3
    assert all(r["word"] != "the" for r in got)  # df cap drops it
    assert all(r["rk"] <= 2 for r in got)


def test_doc_keywords_tf_breaks_idf_ties(spark):
    from faers_datalakehouse_spark.operators.keywords import doc_keywords

    rows = [(1, "apple apple banana"), (2, "cherry")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_keywords(df, k=1, max_df_pct=100).collect()}
    assert got[1]["word"] == "apple"  # tf=2 beats banana tf=1 at equal idf
    assert got[1]["score"] == 2 * got[1]["idf_bits"]


def test_mmr_first_pick_is_most_relevant_then_diversifies(spark):
    """Query q=[10,0,0]. a (rel .90) is picked first. b (rel .85) is
    nearly parallel to a (sim ~.995): score_b = 7*.85 - 3*.995 ~ 2.97M.
    c (rel .80) is partly orthogonal (sim(c,a) = .72): score_c =
    7*.80 - 3*.72 = 3.44M — diversity flips the relevance order."""
    from faers_datalakehouse_spark.operators.mmr import mmr_diversify

    rows = [
        (0, [10.0, 0.0, 0.0]),  # the query
        (1, [9.0, 4.36, 0.0]),  # a: top relevance
        (2, [8.5, 5.27, 0.0]),  # b: slightly less relevant, near-dup of a
        (3, [8.0, 0.0, 6.0]),  # c: least relevant, diverse
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from pyspark.sql import functions as F

    got = mmr_diversify(
        emb, emb.filter(F.col("vec_id") == 0), pool_n=3, k_sel=3
    ).collect()
    picks = [r["vec_id"] for r in got]
    assert picks == [1, 3, 2]
    assert [r["pick"] for r in got] == [1, 2, 3]
    # plain relevance order would have been [1, 2, 3]
    rels = {r["vec_id"]: r["rel_micro"] for r in got}
    assert rels[2] > rels[3]


def test_mmr_pool_smaller_than_k(spark):
    from pyspark.sql import functions as F

    from faers_datalakehouse_spark.operators.mmr import mmr_diversify

    rows = [(0, [1.0, 0.0]), (1, [1.0, 1.0]), (2, [0.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = mmr_diversify(
        emb, emb.filter(F.col("vec_id") == 0), pool_n=10, k_sel=5
    ).collect()
    assert len(got) == 2  # only 2 non-self candidates exist
