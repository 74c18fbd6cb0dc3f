"""Bloom-filter semi-join reduction: no false negatives ever, bounded
false positives, exact mode identical to a plain LEFT SEMI join, and the
probe-side filter stays a shuffle-free scan-stage expression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.bloom import (
    bloom_apply,
    bloom_build,
    bloom_semi_join,
    sizing,
)


def test_sizing_textbook_values():
    m, k = sizing(10_000, 0.01)
    assert m % 64 == 0
    # k capped at 4 (JIT huge-method cliff past ~4 position tests);
    # m re-solved for 1% fp at k=4 is ~10.5 bits/key
    assert 10 * 10_000 < m < 11 * 10_000
    assert k == 4
    # uncapped regime: small k targets keep the textbook optimum
    m2, k2 = sizing(10_000, 0.1)
    assert k2 == 3
    assert 4.5 * 10_000 < m2 < 5.2 * 10_000  # ~4.8 bits/key at 10%


def test_no_false_negatives(spark):
    members = spark.range(0, 5000).select((F.col("id") * 7).alias("k"))
    m, k = sizing(5000, 0.01)
    words = bloom_build(members, "k", m, k)
    hits = bloom_apply(members, F.col("k"), words, m, k).count()
    assert hits == 5000  # every true member passes, always


def test_false_positive_rate_bounded(spark):
    members = spark.range(0, 5000).select(F.col("id").alias("k"))
    m, k = sizing(5000, 0.01)
    words = bloom_build(members, "k", m, k)
    non_members = spark.range(1_000_000, 1_050_000).select(
        F.col("id").alias("k")
    )
    fp = bloom_apply(non_members, F.col("k"), words, m, k).count()
    assert fp / 50_000 < 0.03  # 3x headroom over the 1% design point


def test_exact_semi_join_identical(spark):
    probe = spark.range(0, 20_000).select(
        (F.col("id") % 3000).alias("key"), F.col("id").alias("payload")
    )
    build = spark.range(0, 1000).select((F.col("id") * 2).alias("bkey"))
    got = bloom_semi_join(probe, build, "key", "bkey", exact=True)
    want = probe.join(
        build, on=probe["key"] == build["bkey"], how="left_semi"
    )
    assert sorted(r["payload"] for r in got.collect()) == sorted(
        r["payload"] for r in want.collect()
    )


def test_inexact_mode_superset_and_shuffle_free(spark):
    probe = spark.range(0, 10_000).select((F.col("id") % 997).alias("key"))
    build = spark.range(0, 200).select(F.col("id").alias("key"))
    loose = bloom_semi_join(probe, build, "key", fp_rate=0.01, exact=False)
    strict = probe.join(build, "key", "left_semi")
    loose_keys = {r["key"] for r in loose.collect()}
    strict_keys = {r["key"] for r in strict.collect()}
    assert strict_keys <= loose_keys  # superset: FPs allowed, FNs never
    # the probe side of the inexact path never shuffles: the only
    # exchange is the 1-row broadcast of the filter words
    plan = loose._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan and "hashpartitioning" not in plan


def test_build_rejects_bad_m(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(spark.range(5).withColumnRenamed("id", "k"), "k", 100, 3)


def test_exact_semi_join_same_key_name(spark):
    """The default path (probe and build share the key column name) —
    regression: the finishing join used to be ambiguous."""
    probe = spark.range(0, 5000).select((F.col("id") % 700).alias("key"))
    build = spark.range(0, 200).select(F.col("id").alias("key"))
    got = bloom_semi_join(probe, build, "key", exact=True)
    want = probe.join(build, "key", "left_semi")
    assert sorted(r["key"] for r in got.collect()) == sorted(
        r["key"] for r in want.collect()
    )


def test_inexact_mode_excludes_null_probe_keys(spark):
    """A true LEFT SEMI never matches NULL keys; NULL probe keys hash to
    a constant and could pass the bit test — the inexact path must filter
    them so it diverges from the exact join only by false positives."""
    probe = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "key long"
    )
    build = spark.createDataFrame([(1,), (2,), (3,)], "key long")
    loose = bloom_semi_join(probe, build, "key", exact=False)
    got = [r["key"] for r in loose.collect()]
    assert None not in got
    assert set(got) >= {1, 2}
