"""Semantic pins for the round-8 operators: collocation lift, exact
stratified proportions, vocabulary coverage, CUSUM closed form, and the
Spark-4 SQL surfaces (recursive CTE, pipe syntax)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.collocations import pmi_collocations
from faers_datalakehouse_spark.plans.analytics import cusum_changepoint
from faers_datalakehouse_spark.plans.training_prep import (
    proportional_split_query,
    vocab_coverage_query,
)


def test_pmi_known_counts(spark):
    # bigram multiset: ab, bc, cd | ab, bx | xa, ab  -> N = 7
    rows = [
        (1, "a b c d"),
        (2, "a b x"),
        (3, "x a b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, min_count=1, top_n=100).collect()
    }
    ab = got[("a", "b")]
    # c_xy=3, N=7 bigrams (ab,bc,cd,ab,bx,xa,ab), c_a=3, c_b=3
    assert ab["c_xy"] == 3 and ab["c_x"] == 3 and ab["c_y"] == 3
    assert ab["lift"] == pytest.approx(3 * 7 / 9)
    # rare pair keeps exact counts too
    cd = got[("c", "d")]
    assert cd["c_xy"] == 1 and cd["c_x"] == 1 and cd["c_y"] == 1
    assert cd["lift"] == pytest.approx(7.0)


def test_pmi_min_count_filters(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b")], ["doc_id", "text"]
    )
    pairs = {
        (r["w1"], r["w2"])
        for r in pmi_collocations(df, min_count=2, top_n=10).collect()
    }
    assert pairs == {("a", "b")}


def test_proportional_split_exact_proportions(spark, sf_dir):
    out = proportional_split_query(spark, sf_dir)
    counts = (
        out.groupBy("stratum")
        .pivot("split", ["train", "val", "test"])
        .count()
        .fillna(0)
        .collect()
    )
    for r in counts:
        n = r["train"] + r["val"] + r["test"]
        # rn*1000 <= n*800 gives exactly floor(n*0.8) etc.
        assert r["train"] == n * 800 // 1000, r
        assert r["train"] + r["val"] == n * 900 // 1000, r


def test_proportional_split_deterministic(spark, sf_dir):
    a = sorted(map(tuple, proportional_split_query(spark, sf_dir).collect()))
    b = sorted(map(tuple, proportional_split_query(spark, sf_dir).collect()))
    assert a == b


def test_vocab_coverage_bounds(spark, sf_dir):
    rows = vocab_coverage_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["oov_milli"] <= 1000
        assert r["oov_tokens"] <= r["total_tokens"]
        assert r["fully_covered"] <= r["n_docs"]
    # a vocab covering every word leaves zero OOV mass
    full = vocab_coverage_query(spark, sf_dir, vocab_size=100000).collect()
    assert all(r["oov_tokens"] == 0 for r in full)


def test_cusum_closed_form_matches_recursion(spark, sf_dir):
    """C_t = S_t - min(0, min_{i<=t} S_i) must equal the textbook
    per-key recursion max(0, C_{t-1} + dev_t)."""
    out = cusum_changepoint(spark, sf_dir).orderBy("status", "day").collect()
    by_status: dict[str, list] = {}
    for r in out:
        by_status.setdefault(r["status"], []).append(r)
    for status, rows in by_status.items():
        xs = [r["x"] for r in rows]
        mu0 = sum(xs) // len(xs)
        c = 0
        for r in rows:
            dev = r["x"] - mu0 - mu0 // 2
            c = max(0, c + dev)
            assert r["cusum"] == c, (status, r["day"])
            assert r["is_alarm"] == (c > mu0 * 2)


def test_recursive_cte_reach_is_bfs(spark, sf_dir):
    """min_hops must be consistent: every nation at hops h>0 has an
    in-window predecessor at h-1 (BFS layering property)."""
    import faers_datalakehouse_spark.plans.sql_features as SQ

    rows = sorted(
        map(tuple, SQ.recursive_cte_reach_query(spark, sf_dir).collect())
    )
    hops = dict(rows)
    assert hops.get(0) == 0
    assert all(h >= 0 for h in hops.values())
    # layering: some node exists at every hop level up to the max
    levels = sorted(set(hops.values()))
    assert levels == list(range(len(levels)))


def test_recursive_cte_matches_unrolled(spark):
    """The r12 driver-BFS unroll of recursive_cte_reach must be
    row-identical to Spark's own WITH RECURSIVE over the same edge
    relation — this test both pins the equivalence and keeps the
    Spark-4 recursive-CTE engine surface exercised. The edge set
    includes a diamond (two paths, different lengths), a depth-cap
    victim (first reached at hop 6 > 5), and an unreachable node."""
    import faers_datalakehouse_spark.plans.sql_features as SQ

    edges = [
        (0, 1), (1, 2), (0, 2),        # diamond: 2 reachable at 1 and 2 hops
        (2, 3), (3, 4), (4, 5),
        (5, 6), (6, 7), (7, 8),        # 8 first reached at hop 6 -> excluded
        (11, 12),                      # unreachable from 0
    ]
    spark.createDataFrame(
        edges, "src long, dst long"
    ).createOrReplaceTempView("rec_unroll_test_edges")
    got_sql = sorted(
        map(
            tuple,
            spark.sql(
                SQ.RECURSIVE_REACH_RECURSION_BODY.format(
                    edges="rec_unroll_test_edges"
                )
            ).collect(),
        )
    )
    want = sorted(SQ.bfs_min_hops(edges, source=0, max_hops=5).items())
    assert got_sql == [(int(n), int(h)) for n, h in want]
    assert (8, 6) not in got_sql and all(n != 11 for n, _ in got_sql)


def test_pipe_syntax_matches_dataframe_form(spark, sf_dir):
    import faers_datalakehouse_spark.plans.sql_features as SQ

    got = sorted(
        map(tuple, SQ.pipe_syntax_trend_query(spark, sf_dir).collect())
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = sorted(
        map(
            tuple,
            orders.filter(F.col("o_orderstatus") != "F")
            .select(
                F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
                    "month"
                ),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("cents"),
            )
            .groupBy("month")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("revenue_cents"),
            )
            .collect(),
        )
    )
    assert got == want


def test_fingerprint_containment_detects_embedded_doc(spark):
    from faers_datalakehouse_spark.operators.substring import (
        fingerprint_containment,
    )

    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, core),  # small doc
        (2, "prefix words here " + core + " and a long suffix tail of text"),
        (3, "totally unrelated content about something else entirely now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["containment_milli"]
        for r in fingerprint_containment(
            df, threshold_milli=500, max_df=10
        ).collect()
    }
    # doc 1's fingerprints must be (near-)fully contained in doc 2
    assert got.get((1, 2), 0) >= 500
    assert (1, 3) not in got and (2, 3) not in got


def test_winsorized_stats_matches_bruteforce(spark, sf_dir):
    import math

    from faers_datalakehouse_spark.plans.analytics import winsorized_stats

    got = {r["priority"]: r for r in winsorized_stats(spark, sf_dir).collect()}
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_p: dict[str, list[int]] = {}
    for r in orders:
        by_p.setdefault(r["o_orderpriority"], []).append(
            int(round(r["o_totalprice"] * 100))
        )
    for p, vs in by_p.items():
        vs.sort()
        n = len(vs)
        lo = vs[math.ceil(n * 0.05) - 1]
        hi = vs[math.ceil(n * 0.95) - 1]
        r = got[p]
        assert (r["lo_cents"], r["hi_cents"]) == (lo, hi), p
        assert r["winsorized_sum_cents"] == sum(
            min(max(v, lo), hi) for v in vs
        )
        assert r["n_clipped_lo"] == sum(1 for v in vs if v < lo)
        assert r["n_clipped_hi"] == sum(1 for v in vs if v > hi)


def test_sssp_known_graph(spark):
    from faers_datalakehouse_spark.operators.graph import sssp_weighted

    edges = spark.createDataFrame(
        [
            (1, 2, 10), (1, 3, 1), (3, 2, 2),   # 1->2 direct 10, via 3: 3
            (2, 4, 1), (5, 6, 1),               # 5,6 unreachable from 1
        ],
        "src long, dst long, w long",
    )
    got = dict(
        (r["node"], r["dist"])
        for r in sssp_weighted(edges, [1], rounds=3).collect()
    )
    assert got == {1: 0, 3: 1, 2: 3, 4: 4}


def test_sssp_rounds_bound(spark):
    from faers_datalakehouse_spark.operators.graph import sssp_weighted

    # chain 1->2->3->4: with rounds=2 node 4 is not yet settled
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, w long"
    )
    got = dict(
        (r["node"], r["dist"])
        for r in sssp_weighted(edges, [1], rounds=2).collect()
    )
    assert got == {1: 0, 2: 1, 3: 2}


def test_ks_drift_detects_shifted_slice(spark):
    from faers_datalakehouse_spark.operators.drift import ks_drift

    rows = [("same", v) for v in range(100)]
    rows += [("shifted", v + 90) for v in range(100)]
    df = spark.createDataFrame(rows, "slice string, v long")
    got = {r["slice"]: r["ks_micro"] for r in ks_drift(df, "slice", "v").collect()}
    # each slice is half the corpus; a disjoint-support slice has KS vs
    # corpus of ~0.5, identical for both by symmetry
    assert got["shifted"] > 400_000
    assert abs(got["shifted"] - got["same"]) <= 10_000


def test_ks_drift_zero_for_identical(spark):
    from faers_datalakehouse_spark.operators.drift import ks_drift

    rows = [(s, v) for s in ("a", "b") for v in range(50)]
    df = spark.createDataFrame(rows, "slice string, v long")
    got = {r["slice"]: r["ks_micro"] for r in ks_drift(df, "slice", "v").collect()}
    assert got == {"a": 0, "b": 0}


def test_kcenter_coreset_properties(spark, sf_dir):
    from faers_datalakehouse_spark.operators.coreset import kcenter_coreset

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = kcenter_coreset(emb, k=5).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 5  # no exemplar picked twice
    radii = [r["d2_prev"] for r in rows[1:]]
    # greedy farthest-point radii are non-increasing
    assert radii == sorted(radii, reverse=True)
    assert all(r > 0 for r in radii)


def test_kcenter_known_points(spark):
    from faers_datalakehouse_spark.operators.coreset import kcenter_coreset

    # 1-D line: seed at min id (x=0.0); farthest is x=1.0; then x=0.5
    rows = [
        (0, [0.0]), (1, [0.1]), (2, [0.5]), (3, [1.0]), (4, [0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["rank"], r["vec_id"], r["d2_prev"])
        for r in kcenter_coreset(df, k=3).orderBy("rank").collect()
    ]
    assert got == [(1, 0, 0), (2, 3, 1000 * 1000), (3, 2, 500 * 500)]


def test_minhash_estimator_statistics(spark, sf_dir):
    """The MinHash estimator over 64 permutations should track exact
    Jaccard within a few std errors on every candidate (sigma ~ 62 milli
    at J=0.5), and identical docs must estimate exactly 1000."""
    from faers_datalakehouse_spark.operators.dedup import (
        minhash_estimate_error,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = minhash_estimate_error(docs).collect()
    assert rows, "LSH candidates expected in the synthetic corpus"
    for r in rows:
        assert 0 <= r["est_milli"] <= 1000
        assert r["err_milli"] == abs(r["est_milli"] - r["exact_milli"])
        assert r["err_milli"] <= 250, dict(r.asDict())
    dup = spark.createDataFrame(
        [(1, "the same exact text here repeated"),
         (2, "the same exact text here repeated")],
        ["doc_id", "text"],
    )
    d = minhash_estimate_error(dup).collect()
    assert len(d) == 1 and d[0]["est_milli"] == 1000
    assert d[0]["exact_milli"] == 1000 and d[0]["err_milli"] == 0
