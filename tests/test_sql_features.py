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
