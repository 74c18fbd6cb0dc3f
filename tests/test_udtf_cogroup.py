"""Tests: Python UDTF lateral expansion and cogrouped-map reconciliation."""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.functions.udtf_ops import (
    CHUNK_STRIDE,
    CHUNK_WIDTH,
    udtf_chunks,
)
from faers_datalakehouse_spark.operators.cogroup import order_reconciliation


def test_udtf_chunk_geometry(spark, sf_dir):
    out = udtf_chunks(spark, sf_dir)
    rows = out.where(F.col("doc_id") == out.select(F.min("doc_id")).first()[0])
    rows = rows.orderBy("chunk_idx").collect()
    assert rows[0].chunk_idx == 0
    text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") == rows[0].doc_id)
        .first()
        .text
    )
    n = (len(text) - 1) // CHUNK_STRIDE + 1
    assert len(rows) == n
    for r in rows:
        start = r.chunk_idx * CHUNK_STRIDE
        assert r.chunk == text[start : start + CHUNK_WIDTH]


def test_udtf_empty_text_expands_to_zero_rows(spark):
    from faers_datalakehouse_spark.functions.udtf_ops import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "abc")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("_udtf_edge")
    out = spark.sql(
        "SELECT c.* FROM _udtf_edge d,"
        " LATERAL text_chunks(d.doc_id, d.text) c"
    ).collect()
    assert [(r.doc_id, r.chunk) for r in out] == [(3, "abc")]


def test_cogroup_reconciliation_bucket_invariance(spark, sf_dir):
    a = order_reconciliation(spark, sf_dir, buckets=8).collect()
    b = order_reconciliation(spark, sf_dir, buckets=64).collect()
    assert a == b  # bucketing is a physical knob, not a semantic one
    assert len(a) > 0
    assert all(r.o_cents == r.li_cents + r.delta_cents for r in a)
    # the line rollup is genuinely populated (orders with no lines — a
    # real occurrence in this synthetic data — roll up to exactly 0)
    assert any(r.li_cents > 0 for r in a)


def test_linkage_rare_agreement_outscores_common(spark):
    from faers_datalakehouse_spark.operators.linkage import linkage_scores

    # sf0.001's ~60 blocked pairs rarely agree on anything; the score
    # distribution needs the sf0.01 pair universe
    out = linkage_scores(spark, "/root/testdata/sf0.01", min_score=1).collect()
    assert out
    # a positive score requires at least one field agreement
    assert all(r.agree_bal_band or r.agree_bal_cents for r in out)
    assert all(r.score >= 1 for r in out)
    # frequency weighting in aggregate: the high-cardinality cents
    # field (≈100 values) averages a higher weight than the coarse
    # band field across single-field agreements
    cents_only = [
        r.score for r in out if r.agree_bal_cents and not r.agree_bal_band
    ]
    band_only = [
        r.score for r in out if r.agree_bal_band and not r.agree_bal_cents
    ]
    assert cents_only and band_only
    assert sum(cents_only) / len(cents_only) > sum(band_only) / len(band_only)
    # deterministic: a second build yields the identical scored set
    again = linkage_scores(
        spark, "/root/testdata/sf0.01", min_score=1
    ).collect()
    assert out == again
