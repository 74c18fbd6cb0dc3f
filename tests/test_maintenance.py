"""Small-file compaction (OSS OPTIMIZE analog): fragmented partitions are
rewritten to target-size file counts, compact partitions stay physically
untouched, and row data is preserved exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.catalog import ensure_schemas
from faers_datalakehouse_spark.sources.maintenance import (
    compact_table,
    file_inventory,
)


def _paths(spark, table):
    inv, _ = file_inventory(spark, table)
    return {r["file_path"] for r in inv.collect()}


def test_compact_partitioned_table_rewrites_only_fragmented(spark):
    ensure_schemas(spark)
    t = "gold.compaction_demo"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    a = spark.range(0, 400).select(
        F.col("id"), F.lit("A").alias("p")
    ).repartition(8)
    a.write.partitionBy("p").saveAsTable(t)
    b = spark.range(400, 500).select(
        F.col("id"), F.lit("B").alias("p")
    ).coalesce(1)
    b.write.mode("append").insertInto(t)

    inv, part_cols = file_inventory(spark, t)
    assert part_cols == ["p"]
    by_part = {
        r["p"]: r["n"]
        for r in inv.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_part["A"] == 8 and by_part["B"] == 1

    b_paths_before = {
        r["file_path"] for r in inv.filter(F.col("p") == "B").collect()
    }
    rows_before = sorted(
        (r["id"], r["p"]) for r in spark.table(t).collect()
    )

    stats = compact_table(spark, t, target_file_bytes=1 << 30)
    assert stats["partitions_compacted"] == 1
    assert stats["files_before"] == 9
    assert stats["files_after"] == 2  # A -> 1 file, B untouched

    inv2, _ = file_inventory(spark, t)
    b_paths_after = {
        r["file_path"] for r in inv2.filter(F.col("p") == "B").collect()
    }
    assert b_paths_after == b_paths_before  # compact partition untouched
    rows_after = sorted((r["id"], r["p"]) for r in spark.table(t).collect())
    assert rows_after == rows_before


def test_compact_unpartitioned_table(spark):
    ensure_schemas(spark)
    t = "gold.compaction_flat"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.range(0, 1000).repartition(12).write.saveAsTable(t)
    assert len(_paths(spark, t)) == 12

    rows_before = sorted(r["id"] for r in spark.table(t).collect())
    stats = compact_table(spark, t, target_file_bytes=1 << 30)
    assert stats["partitions_compacted"] == 1
    assert stats["files_after"] == 1
    assert len(_paths(spark, t)) == 1
    assert sorted(r["id"] for r in spark.table(t).collect()) == rows_before


def test_compact_noop_when_already_compact(spark):
    ensure_schemas(spark)
    t = "gold.compaction_noop"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.range(0, 100).coalesce(1).write.saveAsTable(t)
    paths_before = _paths(spark, t)

    stats = compact_table(spark, t, target_file_bytes=1 << 30)
    assert stats == {
        "partitions_compacted": 0,
        "files_before": 1,
        "files_after": 1,
    }
    assert _paths(spark, t) == paths_before  # zero rewrites
