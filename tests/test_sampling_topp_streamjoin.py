"""Unit tests: priority sampling, two-phase top-p nucleus filter,
watermarked stream-stream join."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.sampling import priority_sample
from faers_datalakehouse_spark.operators.top_p import top_p_filter


def test_priority_sample_deterministic_and_weighted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = priority_sample(docs, "doc_id", "n_chars", k=20).toPandas()
    b = (
        priority_sample(docs.repartition(13), "doc_id", "n_chars", k=20)
        .toPandas()
    )
    # identical across partitionings
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert len(a) == 20
    # weighted: the sample's mean weight should exceed the corpus mean
    # (heavier rows are proportionally more likely)
    corpus_mean = (
        docs.where(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert a["weight"].mean() > corpus_mean
    with pytest.raises(ValueError):
        priority_sample(docs, "doc_id", "n_chars", k=0)


def test_top_p_filter_matches_naive_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        top_p_filter(docs, "source", "doc_id", "n_chars", 3, 10)
        .orderBy("g", "id")
        .toPandas()
    )
    t = docs.select(
        F.col("source").alias("g"),
        F.col("doc_id").alias("id"),
        F.col("n_chars").cast("long").alias("w"),
    ).where(F.col("w") > 0)
    wrun = (
        Window.partitionBy("g")
        .orderBy(F.desc("w"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = (
        t.select(
            "g",
            "id",
            "w",
            (F.sum("w").over(wrun) - F.col("w")).alias("cb"),
            F.sum("w").over(Window.partitionBy("g")).alias("total"),
        )
        .where(F.col("cb") * 10 < 3 * F.col("total"))
        .select("g", "id", "w")
        .orderBy("g", "id")
        .toPandas()
    )
    assert got.equals(naive)


def test_top_p_filter_uniform_weights_single_bucket(spark):
    # uniform weights: everything lands in one (boundary) bucket — the
    # degraded path must still be exact
    rows = [Row(g="a", id=i, w=8) for i in range(10)]
    df = spark.createDataFrame(rows)
    got = (
        top_p_filter(df, "g", "id", "w", 1, 2)
        .orderBy("id")
        .toPandas()
    )
    # total 80, threshold 40: rows with cum_before < 40 → ids 0..4
    assert list(got["id"]) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        top_p_filter(df, "g", "id", "w", 3, 2)


def test_streaming_join_equals_batch(spark, sf_dir):
    from faers_datalakehouse_spark.plans.showcase import (
        streaming_join_query,
    )
    from faers_datalakehouse_spark.sources.tables import read_events

    got = streaming_join_query(spark, sf_dir).toPandas()
    ev = read_events(spark, sf_dir)
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    batch = (
        p.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 minutes")),
        )
        .select("purchase_id", "click_id", "user_id")
        .orderBy("purchase_id", "click_id")
        .toPandas()
    )
    assert list(got["purchase_id"]) == list(batch["purchase_id"])
    assert list(got["click_id"]) == list(batch["click_id"])
    assert (got["delta_s"] >= 0).all()
    assert (got["delta_s"] <= 1800).all()


def test_source_overlap_matrix_invariants(spark, sf_dir):
    from faers_datalakehouse_spark.operators.source_overlap import (
        source_overlap_matrix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = source_overlap_matrix(docs).toPandas()
    # upper triangle only, shared bounded by both marginals
    assert (m["source_a"] < m["source_b"]).all()
    assert (m["shared"] <= m[["n_a", "n_b"]].min(axis=1)).all()
    assert (m["jaccard_milli"] >= 0).all()
    assert (m["jaccard_milli"] <= 1000).all()
    # self-overlap sanity via a doubled source: duplicate one source
    # under a new name -> jaccard with its twin must be 1000 (identical)
    from pyspark.sql import functions as F

    one = docs.where(F.col("source") == "src0")
    twin = one.withColumn("source", F.lit("zz_twin"))
    m2 = source_overlap_matrix(one.unionByName(twin)).toPandas()
    assert list(m2["jaccard_milli"]) == [1000]


def test_source_minhash_estimates_track_exact(spark, sf_dir):
    """Sketch-accuracy harness: the 16-component MinHash estimate must
    agree with the exact Jaccard within the Broder bound's practical
    envelope at these (low) similarities, and be exactly 1000 for a
    duplicated source."""
    from pyspark.sql import functions as F

    from faers_datalakehouse_spark.operators.source_overlap import (
        source_minhash_similarity,
        source_overlap_matrix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = source_minhash_similarity(docs, k=16).toPandas()
    exact = source_overlap_matrix(docs).toPandas()
    m = est.merge(exact, on=["source_a", "source_b"])
    assert len(m) == len(est)
    # k=16 → one component is 62.5 milli; allow a few components of slack
    assert (abs(m["est_jaccard_milli"] - m["jaccard_milli"]) <= 350).all()
    # identical sources estimate exactly 1000 (all minima equal)
    one = docs.where(F.col("source") == "src0")
    twin = one.withColumn("source", F.lit("zz_twin"))
    e2 = source_minhash_similarity(one.unionByName(twin)).toPandas()
    assert list(e2["est_jaccard_milli"]) == [1000]
