"""Transform-library unit tests — mirrors the reference's test strategy
(inline createDataFrame fixtures + expected frames, SURVEY.md §5 /
FIXTURES.md §A) and extends it to the decode/bucket/hash builders."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from faers_datalakehouse_spark.functions.transforms import (
    age_group,
    bucketize,
    decode_ladder,
    guarded_double,
    parse_dosage,
    row_hash,
    standardize_date,
    standardize_name,
    surrogate_key,
)


def test_standardize_date(spark):
    df = spark.createDataFrame(
        [("20230115",), ("202302",), ("1999",), ("invalid",), ("",), (None,)],
        ["d"],
    )
    got = [r[0] for r in df.select(standardize_date("d")).collect()]
    assert got == [
        dt.date(2023, 1, 15),
        dt.date(2023, 2, 1),
        dt.date(1999, 1, 1),
        None,
        None,
        None,
    ]


def test_standardize_date_bad_8digit(spark):
    # 8 digits but not a real date must yield NULL, not an ANSI error
    df = spark.createDataFrame([("20231345",)], ["d"])
    # standardize_date uses to_date under a regex guard; the invalid-month
    # case needs the try_ path — guard against regressions
    from faers_datalakehouse_spark.functions.transforms import standardize_date as sd

    got = df.select(sd("d")).collect()[0][0]
    assert got is None


def test_guarded_double(spark):
    df = spark.createDataFrame(
        [("25",), ("30.0",), ("invalid",), ("1e5",), (" 70.5 ",), ("",), (None,)],
        ["x"],
    )
    got = [r[0] for r in df.select(guarded_double("x")).collect()]
    assert got == [25.0, 30.0, None, None, 70.5, None, None]


def test_age_group(spark):
    df = spark.createDataFrame([(5,), (17,), (18,), (25,), (64,), (65,), (70,), (None,)], ["age"])
    got = [r[0] for r in df.select(age_group("age")).collect()]
    assert got == [
        "Pediatric (0-17)",
        "Pediatric (0-17)",
        "Adult (18-64)",
        "Adult (18-64)",
        "Adult (18-64)",
        "Elderly (65+)",
        "Elderly (65+)",
        "Unknown",
    ]


def test_standardize_name(spark):
    df = spark.createDataFrame(
        [("aspirin",), ("  Tylenol  ",), ("ibuprofen-400mg",), ("Advil (R)",), ("",)],
        ["n"],
    )
    got = [r[0] for r in df.select(standardize_name("n")).collect()]
    assert got == ["ASPIRIN", "TYLENOL", "IBUPROFEN400MG", "ADVIL R", ""]


def test_parse_dosage(spark):
    df = spark.createDataFrame(
        [("10 mg, TWICE DAILY",), ("25.5 tablets, ONCE",), ("500 units",),
         ("unknown dose",), ("",)],
        ["dose_vbm"],
    )
    parts = parse_dosage("dose_vbm")
    got = df.select(*[v.alias(k) for k, v in parts.items()]).collect()
    assert [tuple(r) for r in got] == [
        (10.0, "MG", "TWICE DAILY"),
        (25.5, "TABLETS", "ONCE"),
        (500.0, "UNITS", ""),
        (None, "", ""),
        (None, "", ""),
    ]


def test_decode_ladder_and_bucketize(spark):
    df = spark.createDataFrame([("DE", 5.0), ("HO", 50.0), ("??", None)], ["c", "v"])
    out = df.select(
        decode_ladder("c", {"DE": "Death", "HO": "Hospitalized"}).alias("d"),
        bucketize("v", [10.0, 40.0], ["low", "mid", "high"]).alias("b"),
    ).collect()
    assert [tuple(r) for r in out] == [
        ("Death", "low"),
        ("Hospitalized", "high"),
        ("Unknown", "Unknown"),
    ]


def test_row_hash_and_surrogate_key_null_safety(spark):
    df = spark.createDataFrame([("a", None), ("a", "NULL")], ["k", "v"])
    hashes = [r[0] for r in df.select(row_hash(["k", "v"])).collect()]
    # NULL coalesces to the sentinel string — same hash as literal "NULL".
    # Documented tradeoff matching the reference (scd_type2.py:54-61).
    assert hashes[0] == hashes[1]
    keys = df.select(surrogate_key(["k"], F.lit("2024-01-01"))).collect()
    assert all(r[0] is not None and len(r[0]) == 32 for r in keys)
