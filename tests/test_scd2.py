"""SCD Type 2 merge semantics — the reference's untested core algorithm
(SURVEY.md §2.9); properties: idempotent re-run, change closes + inserts,
missing keys untouched, new keys inserted, history preserved."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.scd2 import (
    scd2_current_view,
    scd2_initial_load,
    scd2_merge,
)

BK = ["customer_id"]
TRACKED = ["customer_name", "status"]


@pytest.fixture
def base(spark):
    return spark.createDataFrame(
        [("C001", "John Doe", "Active"), ("C002", "Jane Smith", "Inactive")],
        ["customer_id", "customer_name", "status"],
    )


def test_initial_load_metadata(base):
    dim = scd2_initial_load(base, BK, TRACKED, "2024-01-01")
    rows = dim.collect()
    assert len(rows) == 2
    for r in rows:
        assert r["is_current"] is True
        assert r["end_date"] is None
        assert r["effective_date"] == dt.date(2024, 1, 1)
        assert r["row_hash"] and r["dim_key"]


def test_rerun_same_input_is_noop(base):
    dim = scd2_initial_load(base, BK, TRACKED, "2024-01-01")
    merged = scd2_merge(dim, base, BK, TRACKED, "2024-06-01")
    assert merged.count() == 2
    assert merged.filter(F.col("is_current")).count() == 2
    # effective dates unchanged
    assert {r["effective_date"] for r in merged.collect()} == {dt.date(2024, 1, 1)}


def test_change_closes_and_inserts(spark, base):
    dim = scd2_initial_load(base, BK, TRACKED, "2024-01-01")
    changed = spark.createDataFrame(
        [("C001", "John Doe", "Suspended"), ("C002", "Jane Smith", "Inactive")],
        ["customer_id", "customer_name", "status"],
    )
    merged = scd2_merge(dim, changed, BK, TRACKED, "2024-06-01")
    c1 = {
        (r["status"], r["is_current"], r["effective_date"], r["end_date"])
        for r in merged.filter(F.col("customer_id") == "C001").collect()
    }
    assert c1 == {
        ("Active", False, dt.date(2024, 1, 1), dt.date(2024, 6, 1)),
        ("Suspended", True, dt.date(2024, 6, 1), None),
    }
    # untouched key stays a single current row
    assert merged.filter(F.col("customer_id") == "C002").count() == 1


def test_missing_key_untouched_and_new_key_inserted(spark, base):
    dim = scd2_initial_load(base, BK, TRACKED, "2024-01-01")
    batch = spark.createDataFrame(
        [("C003", "New Person", "Active")],  # C001/C002 absent
        ["customer_id", "customer_name", "status"],
    )
    merged = scd2_merge(dim, batch, BK, TRACKED, "2024-06-01")
    assert merged.count() == 3
    assert scd2_current_view(merged).count() == 3
    c3 = merged.filter(F.col("customer_id") == "C003").collect()[0]
    assert c3["effective_date"] == dt.date(2024, 6, 1) and c3["is_current"]


def test_second_change_keeps_full_history(spark, base):
    dim = scd2_initial_load(base, BK, TRACKED, "2024-01-01")
    v2 = spark.createDataFrame(
        [("C001", "John Doe", "Suspended")], ["customer_id", "customer_name", "status"]
    )
    dim = scd2_merge(dim, v2, BK, TRACKED, "2024-03-01")
    v3 = spark.createDataFrame(
        [("C001", "John Doe", "Closed")], ["customer_id", "customer_name", "status"]
    )
    dim = scd2_merge(dim, v3, BK, TRACKED, "2024-06-01")
    hist = (
        dim.filter(F.col("customer_id") == "C001")
        .orderBy("effective_date")
        .collect()
    )
    assert [(r["status"], r["is_current"]) for r in hist] == [
        ("Active", False),
        ("Suspended", False),
        ("Closed", True),
    ]
    assert hist[0]["end_date"] == dt.date(2024, 3, 1)
    assert hist[1]["end_date"] == dt.date(2024, 6, 1)


def test_source_duplicates_are_collapsed(spark, base):
    dup = spark.createDataFrame(
        [("C009", "Dup", "A"), ("C009", "Dup", "A")],
        ["customer_id", "customer_name", "status"],
    )
    dim = scd2_initial_load(dup, BK, TRACKED, "2024-01-01")
    assert dim.count() == 1


def test_null_business_key_survives_merge(spark):
    base = spark.createDataFrame(
        [(None, "Null Key", "Active"), ("C001", "John Doe", "Active")],
        "customer_id string, customer_name string, status string",
    )
    dim = scd2_initial_load(base, BK, TRACKED, "2024-01-01")
    batch = spark.createDataFrame(
        [(None, "Null Key", "Suspended")],
        "customer_id string, customer_name string, status string",
    )
    merged = scd2_merge(dim, batch, BK, TRACKED, "2024-06-01")
    nulls = merged.filter(F.col("customer_id").isNull()).collect()
    assert {(r["status"], r["is_current"]) for r in nulls} == {
        ("Active", False),
        ("Suspended", True),
    }
    assert merged.count() == 3
