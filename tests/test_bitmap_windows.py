"""Tests: bitmap-index distinct aggregation and the window suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.bitmap import (
    bitmap_distinct,
    bitmap_words,
)
from faers_datalakehouse_spark.plans.analytics import window_suite
from faers_datalakehouse_spark.sources.tables import read_events


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    got = {
        r.event_type: r.distinct_users
        for r in bitmap_distinct(spark, sf_dir).collect()
    }
    want = {
        r.event_type: r.d
        for r in read_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert got == want


def test_bitmap_words_merge_across_slices(spark, sf_dir):
    # bit_or of two half-corpus bitmaps == one-shot bitmap (mergeability)
    events = read_events(spark, sf_dir)
    lo = events.where(F.col("event_id") % 2 == 0)
    hi = events.where(F.col("event_id") % 2 == 1)
    merged = (
        bitmap_words(lo, "event_type", "user_id")
        .unionAll(bitmap_words(hi, "event_type", "user_id"))
        .groupBy("grp", "word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )
    full = bitmap_words(events, "event_type", "user_id")
    assert (
        merged.exceptAll(full).count() == 0
        and full.exceptAll(merged).count() == 0
    )


def test_bitmap_words_positive(spark, sf_dir):
    # 63-bit words: no sign bit is ever set (DuckDB portability contract)
    events = read_events(spark, sf_dir)
    neg = bitmap_words(events, "event_type", "user_id").where(
        F.col("word") < 0
    )
    assert neg.count() == 0


def test_window_suite_invariants(spark, sf_dir):
    out = window_suite(spark, sf_dir).where(F.col("o_custkey") <= 50)
    by_cust = {}
    for r in out.collect():
        by_cust.setdefault(r.o_custkey, []).append(r)
    assert by_cust
    for rs in by_cust.values():
        rs.sort(key=lambda r: r.rn)
        n = len(rs)
        # recover each row's cents from the prefix-sum deltas
        cents = [
            r.run_cents - (rs[i - 1].run_cents if i else 0)
            for i, r in enumerate(rs)
        ]
        for i, r in enumerate(rs):
            assert r.rn == i + 1
            assert r.pr == (0.0 if n == 1 else i / (n - 1))
            assert abs(r.cd - (i + 1) / n) < 1e-12
            assert r.prev_cents == (cents[i - 1] if i else None)
            assert r.next_cents == (cents[i + 1] if i < n - 1 else None)
            assert r.second_cents == (cents[1] if i >= 1 else None)
            lo, hi = max(0, i - 1), min(n - 1, i + 1)
            assert r.near_first == cents[lo]
            assert r.near_last == cents[hi]
