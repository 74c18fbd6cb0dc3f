"""Snapshot reconciliation diff (operators/diff.py)."""

from faers_datalakehouse_spark.operators.diff import (
    table_diff_rows,
    table_diff_summary,
)


def test_diff_rows_all_statuses(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    right = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], ["k", "v"]
    )
    got = {
        r.k: r.status
        for r in table_diff_rows(left, right, ["k"], ["v"]).collect()
    }
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "added",
    }


def test_diff_summary_counts_and_checksums(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(2, "b"), (7, "z")], ["k", "v"])
    got = {
        r.status: (r.n_rows, r.key_checksum)
        for r in table_diff_summary(left, right, ["k"], ["v"]).collect()
    }
    assert got == {
        "removed": (1, 1),
        "unchanged": (1, 2),
        "added": (1, 7),
    }


def test_diff_null_value_vs_sentinel_string(spark):
    # a NULL and the literal string 'NULL' must NOT collide silently —
    # they share the sentinel, which is the documented tradeoff; the
    # pair counts as unchanged (known limitation of the row_hash idiom)
    left = spark.createDataFrame([(1, None)], "k long, v string")
    right = spark.createDataFrame([(1, "NULL")], "k long, v string")
    got = table_diff_rows(left, right, ["k"], ["v"]).collect()
    assert got[0].status == "unchanged"


def test_diff_composite_key(spark):
    left = spark.createDataFrame([(1, "x", "a"), (1, "y", "b")], ["k1", "k2", "v"])
    right = spark.createDataFrame([(1, "x", "a"), (1, "y", "B")], ["k1", "k2", "v"])
    got = {
        (r.k1, r.k2): r.status
        for r in table_diff_rows(left, right, ["k1", "k2"], ["v"]).collect()
    }
    assert got == {(1, "x"): "unchanged", (1, "y"): "changed"}
