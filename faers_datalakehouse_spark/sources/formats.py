"""Lakehouse table-format shim: Delta/Iceberg when available, Parquet else.

The reference writes Delta everywhere (``.write.format("delta")``); this
build environment carries no Delta/Iceberg jars, so the engine is written
format-agnostically: all merge/SCD2 logic is DataFrame-native (no
``MERGE INTO`` dependency) and every writer goes through ``table_format()``.

On a cluster with delta-spark installed, ``table_format()`` returns
``"delta"`` and the same pipelines gain ACID appends/overwrites and the
native MERGE fast path (``operators.scd2`` documents the Delta mapping);
nothing else changes.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame


@lru_cache(maxsize=1)
def table_format() -> str:
    """Best available lakehouse format: delta > iceberg > parquet."""
    try:  # pragma: no cover - depends on environment jars
        import delta  # noqa: F401

        return "delta"
    except ImportError:
        pass
    try:  # pragma: no cover
        import pyiceberg  # noqa: F401

        return "iceberg"
    except ImportError:
        pass
    return "parquet"


def format_writer(df: DataFrame):
    """A DataFrameWriter pinned to the best available table format."""
    return df.write.format(table_format())
