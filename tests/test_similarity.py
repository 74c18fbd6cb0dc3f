"""Product-quantization tests (the ANN similarity ops' own tests live
in test_operators.py / the oracle sweep; this file covers operators/pq.py)."""

from __future__ import annotations

import pytest

# -- product quantization --------------------------------------------------


def test_pq_codes_deterministic_and_bounded(spark):
    from faers_datalakehouse_spark.operators.pq import (
        CODE_BASE,
        pq_encode,
        pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    models = pq_train(emb, m_sub=8, k=16, iters=1)
    a = {(r["vec_id"], r["code"]) for r in pq_encode(emb, models).collect()}
    b = {
        (r["vec_id"], r["code"])
        for r in pq_encode(emb.repartition(7), models).collect()
    }
    assert a == b and a
    assert all(0 <= c < CODE_BASE**8 for _, c in a)


def test_pq_self_query_is_top1(spark):
    from faers_datalakehouse_spark.operators.pq import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    models = pq_train(emb, m_sub=8, k=16, iters=1)
    codes = pq_encode(emb, models)
    q = emb.orderBy("vec_id").first()["embedding"]
    top = pq_topk(codes, models, list(q), topk=5).collect()
    # the vector itself quantizes to the cell nearest its own subvectors
    assert top[0]["vec_id"] == 0
    # ADC distances are non-decreasing in rank
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)


def test_pq_validation(spark):
    from faers_datalakehouse_spark.operators.pq import pq_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m_sub=7)
    with pytest.raises(ValueError, match="base-16"):
        pq_train(emb, m_sub=8, k=32)
