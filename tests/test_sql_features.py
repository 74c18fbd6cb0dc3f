"""Spark 4 SQL-surface tests: scripting, session variables, EXECUTE
IMMEDIATE, and Observation metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.plans import sql_features as SQ


def test_sql_scripting_threshold_is_data_driven(spark, sf_dir):
    got = SQ.sql_scripting_query(spark, sf_dir).toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    cut = cents.agg(
        F.avg("c").cast("long").alias("cut")
    ).collect()[0]["cut"]
    assert (got["cut_cents"] == cut).all()
    expect = (
        cents.where(F.col("c") > cut).count()
    )
    assert got["n_above"].sum() == expect


def test_sql_variables_parameterized_limit(spark, sf_dir):
    got = SQ.sql_variables_query(spark, sf_dir).toPandas()
    # report_top = 4, but orderstatus has 3 domain values
    assert len(got) <= 4
    assert list(got["n"]) == sorted(got["n"], reverse=True)


def test_observation_metrics_match_result(spark, sf_dir):
    df, obs = SQ.observed_quality_query(spark, sf_dir)
    pdf = df.toPandas()  # materializing fires the observation
    m = obs.get
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert m["rows_seen"] == docs.count()
    assert m["rows_kept"] == len(pdf)
    assert m["chars_kept"] == int(pdf["n_chars"].sum())


def test_pandas_api_is_lazy_distributed(spark, sf_dir):
    from faers_datalakehouse_spark.plans.sql_features import (
        pandas_api_query,
    )

    df = pandas_api_query(spark, sf_dir)
    # returns a plain Spark DataFrame with a distributed plan (an
    # aggregate over the parquet scan — no collected pandas roundtrip)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan or "FileScan" in plan
    assert df.count() == 6


def test_udtf_dateparts_polymorphic_schema(spark, sf_dir):
    import pytest

    from faers_datalakehouse_spark.functions.udtf_ops import DateParts

    spark.udtf.register("date_parts_t", DateParts)
    spark.sql("SELECT TIMESTAMP '2024-01-07 10:30:00' AS ts").createOrReplaceTempView("_one_ts")
    two = spark.sql(
        "SELECT p.* FROM _one_ts t, LATERAL date_parts_t(t.ts, 'year,hour') p"
    )
    assert two.columns == ["year", "hour"]
    assert two.collect()[0].asDict() == {"year": 2024, "hour": 10}
    three = spark.sql(
        "SELECT p.* FROM _one_ts t, LATERAL date_parts_t(t.ts, 'dow,month,day') p"
    )
    assert three.columns == ["dow", "month", "day"]
    assert three.collect()[0].asDict() == {"dow": 1, "month": 1, "day": 7}
    with pytest.raises(Exception, match="unsupported parts"):
        spark.sql(
            "SELECT p.* FROM _one_ts t, LATERAL date_parts_t(t.ts, 'week') p"
        ).collect()


def test_seq_match_semantics(spark):
    import datetime as dt

    from pyspark.sql import Row

    from faers_datalakehouse_spark.operators.seqmatch import seq_match

    def ev(u, et, s):
        return Row(
            user_id=u, event_type=et,
            ts=dt.datetime.fromisoformat(f"2024-01-01 {s}"),
        )

    rows = [
        # user 1: clean match with a decoy purchase BEFORE the click
        ev(1, "purchase", "08:00:00"),
        ev(1, "click", "09:00:00"),
        ev(1, "view", "10:00:00"),
        ev(1, "purchase", "11:00:00"),
        # user 2: out of order only -> no match
        ev(2, "purchase", "09:00:00"),
        ev(2, "view", "10:00:00"),
        ev(2, "click", "11:00:00"),
        # user 3: simultaneous view+click -> strict > rejects the view
        ev(3, "click", "09:00:00"),
        ev(3, "view", "09:00:00"),
        ev(3, "purchase", "10:00:00"),
        # user 4: greedy-earliest must not get stuck (late view works)
        ev(4, "click", "09:00:00"),
        ev(4, "view", "09:30:00"),
        ev(4, "view", "11:00:00"),
        ev(4, "purchase", "10:00:00"),
    ]
    got = seq_match(
        spark.createDataFrame(rows), ("click", "view", "purchase")
    ).toPandas()
    assert list(got["user_id"]) == [1, 4]
    u1 = got[got.user_id == 1].iloc[0]
    assert u1["span_s"] == 7200  # 09:00 click -> 11:00 purchase
    u4 = got[got.user_id == 4].iloc[0]
    assert u4["t2"].hour == 9 and u4["t2"].minute == 30


def test_twap_piecewise_constant_integral(spark):
    import datetime as dt

    from pyspark.sql import Row

    from faers_datalakehouse_spark.operators.bars import (
        ohlc_bars,
        twap_daily,
    )

    def ev(i, s, v):
        return Row(
            event_id=i, event_type="m", value=v,
            ts=dt.datetime.fromisoformat(f"2024-01-01 {s}"),
        )

    # value 10.0 from 00:00 to 12:00 (43200 s), 20.0 from 12:00 to
    # midnight (43200 s) -> TWAP = 15.00 = 1500 cents
    rows = [ev(1, "00:00:00", 10.0), ev(2, "12:00:00", 20.0)]
    t = twap_daily(spark.createDataFrame(rows)).toPandas()
    assert t.iloc[0]["weighted_c"] == 1000 * 43200 + 2000 * 43200
    assert t.iloc[0]["covered_s"] == 86400
    assert t.iloc[0]["twap_c"] == 1500.0
    # same-timestamp tie: the earlier event_id gets weight 0
    rows2 = rows + [ev(0, "00:00:00", 99.0)]
    t2 = twap_daily(spark.createDataFrame(rows2)).toPandas()
    assert t2.iloc[0]["twap_c"] == 1500.0
    bars = ohlc_bars(spark.createDataFrame(rows2)).toPandas()
    assert bars.iloc[0]["open_c"] == 9900  # earliest (ts, id)
    assert bars.iloc[0]["close_c"] == 2000
    assert bars.iloc[0]["high_c"] == 9900
    assert bars.iloc[0]["low_c"] == 1000


def test_window_funnel_anchor_choice_matters(spark):
    import datetime as dt

    from pyspark.sql import Row

    from faers_datalakehouse_spark.operators.seqmatch import window_funnel

    def ev(u, et, s):
        return Row(
            user_id=u, event_type=et,
            ts=dt.datetime.fromisoformat(f"2024-01-01 {s}"),
        )

    rows = [
        # the EARLIEST click cannot complete within 1h, a later one can:
        # anchoring only at the first click would under-report
        ev(1, "click", "08:00:00"),
        ev(1, "click", "11:30:00"),
        ev(1, "view", "11:45:00"),
        ev(1, "purchase", "12:15:00"),
        # user 2: chain exists but exceeds the window -> max_steps 2
        ev(2, "click", "08:00:00"),
        ev(2, "view", "08:30:00"),
        ev(2, "purchase", "10:00:00"),
    ]
    got = window_funnel(
        spark.createDataFrame(rows),
        ("click", "view", "purchase"),
        window_seconds=3600,
    ).toPandas()
    u1 = got[got.user_id == 1].iloc[0]
    assert u1["max_steps"] == 3 and u1["n_complete"] == 1
    assert u1["n_starts"] == 2
    u2 = got[got.user_id == 2].iloc[0]
    assert u2["max_steps"] == 2 and u2["n_complete"] == 0


def test_rolling_hll_estimates_track_exact(spark, sf_dir):
    """The merged trailing-window sketch's estimate must track the
    exact rolling distinct within HLL's error envelope (p=8 -> ~6.5%
    std error; allow 4 sigma), and day-1 registers must equal the
    plain daily sketch (merge identity)."""
    from faers_datalakehouse_spark.operators.rolling_distinct import (
        rolling_distinct_users,
        rolling_hll_registers,
    )
    from faers_datalakehouse_spark.operators.sketches import (
        hll_estimate_grouped,
    )
    from faers_datalakehouse_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    regs = rolling_hll_registers(ev)
    est = (
        hll_estimate_grouped(
            regs.withColumnRenamed("day", "d"), ["d"]
        )
        .orderBy("d")
        .toPandas()
    )
    exact = rolling_distinct_users(ev).orderBy("day").toPandas()
    assert len(est) == len(exact)
    rel = (
        (est["estimate"].values - exact["rolling_users"].values)
        / exact["rolling_users"].values
    )
    assert (abs(rel) < 0.26).all()  # 4 x 1.04/sqrt(256)
    # window_days=1 merge identity
    one = rolling_hll_registers(ev, window_days=1).toPandas()
    from faers_datalakehouse_spark.operators.sketches import (
        hll_sketch_grouped,
    )
    from pyspark.sql import functions as F

    daily = (
        hll_sketch_grouped(
            ev.select("user_id", F.to_date("ts").alias("day")),
            ["day"],
            "user_id",
        )
        .orderBy("day", "bucket")
        .toPandas()
    )
    assert list(one["max_rank"]) == list(daily["max_rank"])
