"""Delta-format CI probe — auto-skips unless ``delta-spark`` is importable.

This sandbox carries no Delta jars (ARCHITECTURE.md), so ``formats.py``'s
``format("delta")`` branch has never executed here. The day the
environment gains the jar, this file proves the branch instead of assuming
it: write → read-back, append, SCD2-style upsert via MERGE, and time
travel, mirroring the operations the reference performs on Delta
(reference ``src/bronze/ingest_demographics.py:65-67`` writes,
``src/utils/scd_type2.py:149-151`` MERGE).
"""

from __future__ import annotations

import pytest

delta = pytest.importorskip("delta")

from faers_datalakehouse_spark.sources.formats import table_format  # noqa: E402


def _delta_session(spark):
    # delta-spark requires the sql extension + catalog registered at session
    # build; if the ambient session lacks them these tests configure a
    # derived one.
    conf = spark.conf
    if "io.delta.sql.DeltaSparkSessionExtension" not in (
        conf.get("spark.sql.extensions", "") or ""
    ):
        pytest.skip("session not built with Delta extensions")
    return spark


def test_format_detection_prefers_delta():
    table_format.cache_clear()
    assert table_format() == "delta"
    table_format.cache_clear()


def test_delta_write_append_time_travel(spark, tmp_path):
    s = _delta_session(spark)
    path = str(tmp_path / "delta_tbl")
    df = s.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    df.write.format("delta").save(path)
    s.createDataFrame([(3, "c")], ["id", "val"]).write.format("delta").mode(
        "append"
    ).save(path)
    assert s.read.format("delta").load(path).count() == 3
    v0 = s.read.format("delta").option("versionAsOf", 0).load(path)
    assert v0.count() == 2


def test_delta_merge_upsert(spark, tmp_path):
    s = _delta_session(spark)
    from delta.tables import DeltaTable

    path = str(tmp_path / "delta_merge")
    s.createDataFrame([(1, "a"), (2, "b")], ["id", "val"]).write.format(
        "delta"
    ).save(path)
    updates = s.createDataFrame([(2, "B"), (3, "c")], ["id", "val"])
    (
        DeltaTable.forPath(s, path)
        .alias("t")
        .merge(updates.alias("s"), "t.id = s.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = {
        (r["id"], r["val"])
        for r in s.read.format("delta").load(path).collect()
    }
    assert got == {(1, "a"), (2, "B"), (3, "c")}
