"""Tests: grid-bucketed spatial radius join, referential-integrity
audit, and lag-k autocorrelation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.integrity import referential_audit
from faers_datalakehouse_spark.operators.spatial import (
    derive_points,
    radius_join,
    spatial_radius_pairs,
)
from faers_datalakehouse_spark.plans.analytics import lag_autocorrelation


def test_radius_join_matches_brute_force(spark, sf_dir):
    cust = derive_points(
        spark.read.parquet(f"{sf_dir}/customer.parquet"), "c_custkey"
    )
    supp = derive_points(
        spark.read.parquet(f"{sf_dir}/supplier.parquet"), "s_suppkey"
    )
    r = 80_000
    got = {
        (x.probe_id, x.build_id, x.dist2_m2)
        for x in radius_join(cust, supp, r).collect()
    }
    cpts = cust.collect()
    spts = supp.collect()
    want = {
        (c.pid, s.pid, (c.x_m - s.x_m) ** 2 + (c.y_m - s.y_m) ** 2)
        for c in cpts
        for s in spts
        if (c.x_m - s.x_m) ** 2 + (c.y_m - s.y_m) ** 2 <= r * r
    }
    assert got == want
    assert len(want) > 0  # density high enough to exercise matches


def test_radius_join_no_duplicate_pairs(spark, sf_dir):
    out = spatial_radius_pairs(spark, sf_dir)
    total = out.count()
    distinct = out.select("c_custkey", "s_suppkey").distinct().count()
    assert total == distinct


def test_radius_join_no_cartesian_in_plan(spark, sf_dir):
    out = spatial_radius_pairs(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_referential_audit_clean_edges_and_degraded(spark, sf_dir):
    rows = {r.edge: r for r in referential_audit(spark, sf_dir).collect()}
    assert len(rows) == 7
    for edge, r in rows.items():
        assert r.fk_rows > 0
        if edge == "orders->customer[!BUILDING]":
            assert r.orphans > 0  # degraded parent must show real orphans
        else:
            assert r.orphans == 0  # generated data is referentially clean
    # degraded orphan count equals orders of BUILDING-segment customers
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    building = (
        orders.join(
            cust.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        ).count()
    )
    assert rows["orders->customer[!BUILDING]"].orphans == building


def test_lag_autocorrelation_bounds_and_grid(spark, sf_dir):
    out = lag_autocorrelation(spark, sf_dir, max_lag=5).collect()
    types = {r.event_type for r in out}
    for t in types:
        lags = sorted(r.lag for r in out if r.event_type == t)
        assert lags == [1, 2, 3, 4, 5]
    for r in out:
        assert r.n > 1
        assert not math.isnan(r.acf)
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9


def test_lag_autocorrelation_perfect_on_constant_shiftfree_series(spark):
    # A strictly linear series has ACF exactly 1 at every lag after the
    # Pearson normalization (linear in x -> r = 1).
    import datetime as dt

    # build daily counts 1..30 by repeating each day i+1 times
    data = []
    for i in range(30):
        for _ in range(i + 1):
            data.append(("a", dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i)))
    df = spark.createDataFrame(data, "event_type string, ts timestamp")
    import tempfile
    import shutil

    root = tempfile.mkdtemp()
    try:
        df.select(
            F.lit(1).alias("event_id"),
            F.lit(1).alias("user_id"),
            "event_type",
            "ts",
            F.lit(None).cast("string").alias("payload"),
        ).write.mode("overwrite").parquet(f"{root}/events.parquet")
        out = lag_autocorrelation(spark, root, max_lag=3).collect()
        assert len(out) == 3
        for r in out:
            assert abs(r.acf - 1.0) < 1e-12
    finally:
        shutil.rmtree(root, ignore_errors=True)
