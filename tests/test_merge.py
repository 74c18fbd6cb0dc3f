"""DataFrame-native MERGE INTO semantics tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.merge import merge_into


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )


def test_basic_upsert(spark, target):
    source = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40)], ["id", "name", "v"]
    )
    out = {r["id"]: (r["name"], r["v"]) for r in merge_into(target, source, ["id"]).collect()}
    assert out == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30), 4: ("d", 40)}


def test_conditional_update_and_delete(spark, target):
    source = spark.createDataFrame(
        [(1, "a1", 11), (2, "b1", 5), (3, "c1", 31)], ["id", "name", "v"]
    )
    out = merge_into(
        target,
        source,
        ["id"],
        update_cond=F.col("s.v") > F.col("t.v"),  # only upgrades
        delete_cond=F.col("s.v") < 10,  # low-value source deletes the row
    )
    got = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
    # id=1: updated; id=2: deleted (s.v=5); id=3: updated (31>30)
    assert got == {1: ("a1", 11), 3: ("c1", 31)}


def test_insert_condition(spark, target):
    source = spark.createDataFrame([(8, "x", 1), (9, "y", 99)], ["id", "name", "v"])
    out = merge_into(target, source, ["id"], insert_cond=F.col("s.v") > 50)
    ids = {r["id"] for r in out.collect()}
    assert ids == {1, 2, 3, 9}


def test_duplicate_source_keys_rejected(spark, target):
    dup = spark.createDataFrame([(2, "x", 1), (2, "y", 2)], ["id", "name", "v"])
    with pytest.raises(Exception, match="duplicate source keys"):
        merge_into(target, dup, ["id"]).collect()


def test_idempotent_when_source_equals_target(spark, target):
    out = merge_into(target, target, ["id"])
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in target.collect()
    )


def test_null_merge_keys_are_matched_not_dropped(spark):
    # eqNullSafe matches NULL keys; presence detection must not rely on
    # key.isNotNull() or these rows silently vanish
    target = spark.createDataFrame([(None, "old", 1), (1, "a", 10)],
                                   "id int, name string, v int")
    source = spark.createDataFrame([(None, "new", 2)],
                                   "id int, name string, v int")
    out = {(r["id"], r["name"], r["v"]) for r in merge_into(target, source, ["id"]).collect()}
    assert out == {(None, "new", 2), (1, "a", 10)}
