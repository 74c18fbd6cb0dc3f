"""Round-9 third-session additions: two-sample hypothesis tests."""

from __future__ import annotations

import math


def test_mann_whitney_separated_groups(spark):
    """Cohort 1 = {1,2,3}, cohort 0 = {4,5,6}: U1 = 0 (every cohort-1
    value below every cohort-0 value), no ties, z < 0."""
    from faers_datalakehouse_spark.operators.stattests import (
        mann_whitney_by_group,
    )

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 1),
         ("g", 4, 0), ("g", 5, 0), ("g", 6, 0)],
        "grp string, v long, c int",
    )
    got = mann_whitney_by_group(df, "grp", "v", "c").collect()[0]
    assert (got["n1"], got["n2"]) == (3, 3)
    assert got["u2"] == 0
    assert got["t_corr"] == 0
    # z = (U - n1n2/2)/sqrt(n1n2(n+1)/12) = -4.5/sqrt(9*7/12)
    assert got["z_milli"] == math.floor(-4.5 / math.sqrt(5.25) * 1000)


def test_mann_whitney_identical_distributions(spark):
    """Interleaved identical samples: U = n1*n2/2, z = 0."""
    from faers_datalakehouse_spark.operators.stattests import (
        mann_whitney_by_group,
    )

    rows = [("g", v, 1) for v in (1, 3, 5, 7)] + [
        ("g", v, 0) for v in (1, 3, 5, 7)
    ]
    df = spark.createDataFrame(rows, "grp string, v long, c int")
    got = mann_whitney_by_group(df, "grp", "v", "c").collect()[0]
    assert got["u2"] == got["n1"] * got["n2"]  # doubled U == 2 * n1n2/2
    assert got["t_corr"] == 4 * (8 - 2)  # four tie groups of 2: 2^3-2
    assert got["z_milli"] == 0


def test_mann_whitney_empty_cohort_is_null(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        mann_whitney_by_group,
    )

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1)], "grp string, v long, c int"
    )
    got = mann_whitney_by_group(df, "grp", "v", "c").collect()[0]
    assert got["n2"] == 0 and got["z_milli"] is None


def test_welch_known_example(spark):
    """Cohort 1 = {10,12,14}, cohort 0 = {20,24,28}: means 12 vs 24,
    s1^2 = 4, s2^2 = 16, t = -12/sqrt(4/3 + 16/3)."""
    from faers_datalakehouse_spark.operators.stattests import (
        welch_ttest_by_group,
    )

    df = spark.createDataFrame(
        [("g", 10, 1), ("g", 12, 1), ("g", 14, 1),
         ("g", 20, 0), ("g", 24, 0), ("g", 28, 0)],
        "grp string, v long, c int",
    )
    got = welch_ttest_by_group(df, "grp", "v", "c").collect()[0]
    assert (got["mean1_milli"], got["mean2_milli"]) == (12_000, 24_000)
    expect = math.floor(-12.0 / math.sqrt(4.0 / 3 + 16.0 / 3) * 1000)
    assert got["t_milli"] == expect


def test_welch_zero_variance_both_null(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        welch_ttest_by_group,
    )

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 1), ("g", 5, 0), ("g", 5, 0)],
        "grp string, v long, c int",
    )
    got = welch_ttest_by_group(df, "grp", "v", "c").collect()[0]
    assert got["t_milli"] is None


def test_welch_single_row_cohort_is_null(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        welch_ttest_by_group,
    )

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 7, 0), ("g", 9, 0)],
        "grp string, v long, c int",
    )
    got = welch_ttest_by_group(df, "grp", "v", "c").collect()[0]
    assert got["t_milli"] is None and got["mean1_milli"] == 5_000
