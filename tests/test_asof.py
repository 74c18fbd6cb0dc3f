"""As-of join semantics: <= matching, per-key isolation, tolerance."""

from __future__ import annotations

import datetime as dt

import pytest

from faers_datalakehouse_spark.operators.asof import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic_and_equal_ts(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l1"),
            (1, _ts("2024-01-01 12:00:00"), "l2"),
            (2, _ts("2024-01-01 09:00:00"), "l3"),  # before any right row
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100.0),
            (1, _ts("2024-01-01 12:00:00"), 200.0),  # equal ts → matches (<=)
            (2, _ts("2024-01-01 11:00:00"), 300.0),
        ],
        ["k", "ts", "price"],
    )
    out = {
        r["tag"]: (r["price_asof"], r["ts_asof"])
        for r in as_of_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["price"]
        ).collect()
    }
    assert out["l1"] == (100.0, _ts("2024-01-01 09:30:00"))
    assert out["l2"] == (200.0, _ts("2024-01-01 12:00:00"))  # <= semantics
    assert out["l3"] == (None, None)  # no right row precedes; key isolation


def test_asof_null_payload_attaches_atomically(spark):
    """The matched right row attaches wholesale: a NULL field in the latest
    preceding right row must stay NULL, not be stitched from an older row
    (DuckDB ASOF JOIN / pandas merge_asof semantics)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), "l1")], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 10.0, "old"),
            (1, _ts("2024-01-01 11:00:00"), None, "new"),  # latest; price NULL
        ],
        ["k", "ts", "price", "label"],
    )
    row = as_of_join(
        left, right, ["k"], "ts", "ts", right_cols=["price", "label"]
    ).collect()[0]
    assert row["label_asof"] == "new"
    assert row["price_asof"] is None  # NOT 10.0 from the older row
    assert row["ts_asof"] == _ts("2024-01-01 11:00:00")


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")], ["k", "ts", "tag"]
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:00:00"), 7.0)], ["k", "ts", "v"]
    )
    hit = as_of_join(
        left, right, ["k"], "ts", "ts", ["v"], tolerance_seconds=3 * 3600
    ).collect()[0]
    miss = as_of_join(
        left, right, ["k"], "ts", "ts", ["v"], tolerance_seconds=3600
    ).collect()[0]
    assert hit["v_asof"] == 7.0
    assert miss["v_asof"] is None and miss["ts_asof"] is None


def test_asof_rejects_reserved_and_colliding_names(spark):

    left = spark.createDataFrame([(1, 1, 2)], "k long, ts long, _t long")
    right = spark.createDataFrame([(1, 1, 5)], "k long, ts long, v long")
    with pytest.raises(ValueError, match="reserves column names"):
        as_of_join(left, right, ["k"], "ts", "ts", ["v"])
    left2 = spark.createDataFrame([(1, 1, 9)], "k long, ts long, v_asof long")
    with pytest.raises(ValueError, match="collide with"):
        as_of_join(left2, right, ["k"], "ts", "ts", ["v"])


def test_asof_tolerance_requires_timestamps(spark):

    left = spark.createDataFrame([(1, 10)], "k long, seq long")
    right = spark.createDataFrame([(1, 9, 5)], "k long, seq long, v long")
    with pytest.raises(ValueError, match="tolerance_seconds requires"):
        as_of_join(
            left, right, ["k"], "seq", "seq", ["v"], tolerance_seconds=10
        )


def _mk(spark, rows, cols):
    from pyspark.sql import Row

    return spark.createDataFrame([Row(**dict(zip(cols, r))) for r in rows])


def _ts(s):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def test_asof_forward_direction(spark):
    from faers_datalakehouse_spark.operators.asof import as_of_join

    left = _mk(
        spark,
        [(1, _ts("2024-01-01 10:00:00"))],
        ["k", "lts"],
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 09:00:00"), 1.0),  # before: not forward
            (1, _ts("2024-01-01 10:00:00"), 2.0),  # equal: qualifies (>=)
            (1, _ts("2024-01-01 11:00:00"), 3.0),
        ],
        ["k", "rts", "v"],
    )
    got = as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["v"], direction="forward",
    ).collect()
    assert got[0].v_asof == 2.0
    # without the equal-ts row, the next later one attaches
    got2 = as_of_join(
        left,
        right.where("v <> 2.0"),
        on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["v"], direction="forward",
    ).collect()
    assert got2[0].v_asof == 3.0


def test_asof_nearest_tie_prefers_backward(spark):
    from faers_datalakehouse_spark.operators.asof import as_of_join

    left = _mk(spark, [(1, _ts("2024-01-01 10:00:00"))], ["k", "lts"])
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 09:30:00"), 1.0),  # 30 min back
            (1, _ts("2024-01-01 10:30:00"), 2.0),  # 30 min forward: tie
            (1, _ts("2024-01-01 10:20:00"), 3.0),  # 20 min forward: wins
        ],
        ["k", "rts", "v"],
    )
    got = as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["v"], direction="nearest",
    ).collect()
    assert got[0].v_asof == 3.0
    # drop the 10:20 row → exact 30-min tie → backward wins
    got2 = as_of_join(
        left,
        right.where("v <> 3.0"),
        on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["v"], direction="nearest",
    ).collect()
    assert got2[0].v_asof == 1.0


def test_asof_nearest_tolerance_and_validation(spark):
    import pytest

    from faers_datalakehouse_spark.operators.asof import as_of_join

    left = _mk(spark, [(1, _ts("2024-01-01 10:00:00"))], ["k", "lts"])
    right = _mk(
        spark,
        [(1, _ts("2024-01-01 12:00:00"), 9.0)],
        ["k", "rts", "v"],
    )
    got = as_of_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_cols=["v"], direction="nearest", tolerance_seconds=3600,
    ).collect()
    assert got[0].v_asof is None  # 2 h away, 1 h tolerance
    with pytest.raises(ValueError, match="direction"):
        as_of_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_cols=["v"], direction="sideways",
        )
