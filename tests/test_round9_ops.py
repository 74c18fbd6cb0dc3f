"""Round-9 hardening tests: the LSH band-bucket cap (VERDICT r8 "What's
wrong" #2), the kcenter covered-corpus guard and the ks_drift laziness
fix (ADVICE r8 #2/#3)."""

from __future__ import annotations

from pyspark.sql import functions as F

BOILER = (
    "terms of service apply to all users of this website please read "
    "carefully before continuing to browse these pages thank you kindly"
)
DOC_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
DOC_B = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam nu"


def _flood(spark, n_boiler: int = 40):
    rows = [(i, BOILER) for i in range(n_boiler)]
    rows += [(1000, DOC_A), (1001, DOC_B)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_bucket_cap_drops_boilerplate_flood(spark):
    """An adversarial corpus where 40 identical boilerplate docs share
    every band bucket: uncapped, the band self-join is quadratic in the
    flood (40*39/2 pairs); with max_bucket=10 the flooded buckets are
    dropped entirely while the genuine near-dup pair (bucket size 2)
    survives."""
    from faers_datalakehouse_spark.operators.dedup import minhash_lsh_pairs

    df = _flood(spark)
    uncapped = minhash_lsh_pairs(
        df, threshold=0.5, materialize=False, max_bucket=None
    ).collect()
    assert len(uncapped) == 40 * 39 // 2 + 1  # flood pairs + (1000,1001)

    capped = minhash_lsh_pairs(
        df, threshold=0.5, materialize=False, max_bucket=10
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert pairs == {(1000, 1001)}, pairs


def test_lsh_bucket_cap_candidate_bound(spark):
    """With bucket size capped at c, candidate pairs per (band, bucket)
    are <= c*(c-1)/2, so the total is <= bands * n/c * c^2/2 — linear in
    n for fixed c. Checked here as the per-run global bound."""
    from faers_datalakehouse_spark.operators.dedup import (
        minhash_lsh_pairs,
        signature_bands,
    )

    df = _flood(spark, n_boiler=25)
    cap = 30  # flood bucket (25) stays under the cap
    got = minhash_lsh_pairs(
        df, threshold=0.0, materialize=False, max_bucket=cap
    ).count()
    _, banded = signature_bands(df, materialize=False)
    n_buckets = banded.select("band", "band_hash").distinct().count()
    assert got <= n_buckets * cap * (cap - 1) // 2


def test_lsh_cap_matches_duckdb_oracle_when_binding(spark):
    """The DuckDB twin applies the identical cap, so Spark and oracle
    agree even when the cap BINDS (not just when it's above the max)."""
    import duckdb

    from faers_datalakehouse_spark.operators.dedup import (
        minhash_lsh_oracle_sql,
        minhash_lsh_pairs,
    )

    df = _flood(spark)
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(
            df,
            threshold=0.5,
            materialize=False,
            portable_hash=True,
            max_bucket=10,
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents_pd", df.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
    want = sorted(
        tuple(r)
        for r in con.execute(
            minhash_lsh_oracle_sql(threshold=0.5, max_bucket=10)
        ).fetchall()
    )
    assert got == want


def test_kcenter_stops_when_corpus_covered(spark):
    """k greater than the number of distinct vectors must not emit
    duplicate picks with d2_prev=0 (ADVICE r8 #2): the loop stops at
    coverage radius 0."""
    from faers_datalakehouse_spark.operators.coreset import kcenter_coreset

    vecs = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    rows = [(i, vecs[i % 3]) for i in range(9)]  # 3 distinct, x3 dups
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_coreset(emb, k=6).collect()
    assert len(got) == 3
    assert len({r["vec_id"] for r in got}) == 3
    assert all(r["d2_prev"] > 0 for r in got if r["rank"] > 1)


def test_kcenter_empty_input_raises(spark):
    import pytest

    from faers_datalakehouse_spark.operators.coreset import kcenter_coreset

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty input"):
        kcenter_coreset(emb, k=3)


def test_ks_drift_construction_is_lazy(spark):
    """Building the ks_drift plan must not run a job (ADVICE r8 #3: the
    old eager .count() scanned the corpus at construction time). A UDF
    that raises on execution proves nothing executes."""
    from faers_datalakehouse_spark.operators.drift import ks_drift

    def boom():
        raise RuntimeError("executed at construction time")

    boom_udf = F.udf(boom, "long")
    df = spark.range(10).select(
        F.lit("s").alias("slice"), boom_udf().alias("v")
    )
    ks_drift(df, "slice", "v")  # must not raise


def test_ks_drift_empty_input_yields_empty(spark):
    from faers_datalakehouse_spark.operators.drift import ks_drift

    empty = spark.createDataFrame([], "slice string, v long")
    assert ks_drift(empty, "slice", "v").count() == 0


def test_embedding_qc_stats(spark):
    from faers_datalakehouse_spark.operators.vector_qc import embedding_qc

    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0, -2.0]),
            (2, [0.0, 3.0, 2.0]),
            (3, [0.0, 2.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["dim"]: r for r in embedding_qc(emb).collect()}
    assert set(rows) == {0, 1, 2}
    # dim 0 is dead: all zeros
    assert rows[0]["n_zero"] == 3 and rows[0]["min_q"] == rows[0]["max_q"] == 0
    # dim 1: values 1000, 3000, 2000 (QUANT=1000)
    assert (rows[1]["min_q"], rows[1]["max_q"], rows[1]["sum_q"]) == (
        1000,
        3000,
        6000,
    )
    assert rows[1]["avg_milli"] == 6000 * 1000 // 3
    # dim 2: negative min survives exactly
    assert rows[2]["min_q"] == -2000 and rows[2]["n_zero"] == 1


def test_decayed_activity_weekly_halving(spark):
    from faers_datalakehouse_spark.operators.activity import decayed_activity

    rows = [
        (1, "2024-03-01 10:00:00"),  # anchor week: 1000 milli
        (1, "2024-02-22 09:00:00"),  # 8 days old -> 1 week -> 500
        (2, "2023-11-01 00:00:00"),  # ~17 weeks old -> 1000 div 2^17 = 0
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    got = {r["user_id"]: r for r in decayed_activity(ev).collect()}
    assert got[1]["score_milli"] == 1500 and got[1]["n_events"] == 2
    assert got[2]["score_milli"] == 0
    assert str(got[1]["last_day"]) == "2024-03-01"


def test_linear_interpolate_exact_line(spark):
    from faers_datalakehouse_spark.operators.timeseries import (
        linear_interpolate_daily,
    )

    # one series, observations on day 0 (v=1.0) and day 4 (v=5.0) of a
    # 5-day span; days 1-3 have no events -> the interpolated line is
    # 1000, 2000, 3000, 4000, 5000 milli
    rows = [
        (1, "t", "2024-01-01 01:00:00", 1.0),
        (2, "t", "2024-01-05 01:00:00", 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).selectExpr(
        "event_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    got = linear_interpolate_daily(ev, mask_mod=0).collect()
    assert [r["interp_milli"] for r in got] == [
        1000,
        2000,
        3000,
        4000,
        5000,
    ]
    # observed endpoints pass through untouched
    assert got[0]["obs_milli"] == 1000 and got[-1]["obs_milli"] == 5000


def test_linear_interpolate_edges_clamp(spark):
    from faers_datalakehouse_spark.operators.timeseries import (
        linear_interpolate_daily,
    )

    # mask removes the FIRST observation (1970-epoch day % 2 == 0 etc. is
    # hard to pin by date; instead use mask_mod=0 and a leading gap via
    # the spine: single obs -> every row clamps to it)
    ev = spark.createDataFrame(
        [(1, "t", "2024-01-02 01:00:00", 7.0)],
        "event_id long, event_type string, ts string, value double",
    ).selectExpr(
        "event_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    got = linear_interpolate_daily(ev, mask_mod=0).collect()
    assert len(got) == 1 and got[0]["interp_milli"] == 7000


def test_rendezvous_minimal_movement(spark):
    """The HRW property: growing from N to N+1 shards only moves keys TO
    the new shard — every key that moves lands on shard N, and no key
    moves between old shards (the consistent-routing guarantee that
    hash%N lacks)."""
    from faers_datalakehouse_spark.operators.sharding import (
        rendezvous_shards,
    )

    df = spark.range(400).selectExpr("id AS doc_id")
    a = {r["doc_id"]: r["shard"] for r in rendezvous_shards(df, 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in rendezvous_shards(df, 9).collect()}
    moved = {k for k in a if a[k] != b[k]}
    assert moved, "some keys must move to the new shard"
    assert all(b[k] == 8 for k in moved), "keys may only move TO shard 8"
    # expected movement ~1/9 of keys; allow generous slack
    assert len(moved) < 400 * 0.25


def test_rendezvous_balance_and_determinism(spark):
    from faers_datalakehouse_spark.operators.sharding import (
        rendezvous_shards,
    )

    df = spark.range(800).selectExpr("id AS doc_id")
    out = rendezvous_shards(df, 8).collect()
    again = rendezvous_shards(df.repartition(7), 8).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    from collections import Counter

    sizes = Counter(r["shard"] for r in out)
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) < 3 * min(sizes.values())


def test_ngram_novelty_first_occurrence_rule(spark):
    from faers_datalakehouse_spark.operators.novelty import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),     # all shingles novel
            (2, "alpha beta gamma delta"),     # exact dup -> novelty 0
            (3, "alpha beta gamma epsilon"),   # shares 1 of 2 shingles
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, ngram=3).collect()}
    assert got[1]["novelty_milli"] == 1000
    assert got[2]["n_novel"] == 0 and got[2]["novelty_milli"] == 0
    # doc 3: shingles {alpha beta gamma, beta gamma epsilon} — second is new
    assert (got[3]["n_shingles"], got[3]["n_novel"]) == (2, 1)
    assert got[3]["novelty_milli"] == 500
