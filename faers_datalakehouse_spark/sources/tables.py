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


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zoned TIMESTAMP (µs).

    The testdata's parquet encoding for ``events.ts`` has changed across
    driver regenerations, so every encoding observed so far is handled:

    - parquet TIMESTAMP(NANOS): surfaced as LONG nanos under
      ``spark.sql.legacy.parquet.nanosAsLong`` → integer-divide to µs
      (exact; the values are µs-resolution).
    - parquet ``timestamp[us]`` with ``isAdjustedToUTC=false``: surfaced as
      TIMESTAMP_NTZ → cast to TIMESTAMP. Lossless under the session's UTC
      timezone (session.py pins ``spark.sql.session.timeZone=UTC``), and
      required because timestamp arithmetic (``unix_micros``, numeric casts,
      watermarks) rejects NTZ inputs.
    - already TIMESTAMP: no-op.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if isinstance(dt, T.TimestampType):
        return df
    # a FOURTH encoding would otherwise surface as silent hash mismatches
    # rounds later (the r3 sessionize incident) — fail loudly at the scan
    raise TypeError(
        f"unhandled events.{col} encoding {dt!r}; extend normalize_event_ts "
        "(see tests/test_plans.py::test_read_events_ts_encodings_equivalent)"
    )


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` normalized to a microsecond TIMESTAMP."""
    # Runtime-settable conf: the caller's session may not have been built by
    # our get_spark(), so make the read self-sufficient under any session —
    # but RESTORE the prior value afterwards (the conf is captured by this
    # relation at analysis; leaving it set would silently change how every
    # OTHER parquet read in the session surfaces TIMESTAMP(NANOS) columns)
    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(key)
    except Exception:  # noqa: BLE001 - unset on vanilla sessions
        prev = None
    spark.conf.set(key, "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return normalize_event_ts(df)


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
