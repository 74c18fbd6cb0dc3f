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


def test_pq_recall_matches_oracle_and_bounds(spark):
    """pq_recall's every value (sampled queries, both rank lists, recall
    integers) matches the DuckDB re-derivation, and the recall numbers
    are sane: n_exact == topk, 0 <= n_hits <= topk."""
    import duckdb

    from faers_datalakehouse_spark.operators.pq import (
        pq_recall,
        pq_recall_oracle_sql,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [tuple(r) for r in pq_recall(emb, iters=1).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    want = con.execute(pq_recall_oracle_sql(iters=1)).fetchall()
    assert got == [tuple(r) for r in want]
    assert len(got) == 8
    for _, n_exact, n_hits, pct in got:
        assert n_exact == 5 and 0 <= n_hits <= 5
        assert pct == n_hits * 100 // n_exact
