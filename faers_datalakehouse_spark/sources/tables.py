"""Testdata table loaders.

The driver's synthetic TPC-H-ish parquet tables (``TESTDATA.md``) are the
correctness substrate for every operator. Loading is a plain columnar parquet
scan — Catalyst pushes filters and prunes columns into the scan, so callers
should *not* cache or materialize here; they compose lazy plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` normalized to a microsecond timestamp.

    The parquet file stores TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` Spark surfaces it as LONG nanos,
    which we integer-divide (exact) down to microseconds. The testdata's
    values are µs-resolution, so the conversion is lossless.
    """
    # Runtime-settable conf: the caller's session may not have been built by
    # our get_spark(), so make the read self-sufficient under any session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Lazy DataFrames for each table under ``sf_dir``."""
    return {
        name: (
            read_events(spark, sf_dir)
            if name == "events"
            else spark.read.parquet(f"{sf_dir}/{name}.parquet")
        )
        for name in names
    }


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> None:
    """Register each table as a temp view for the SQL API paths."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
