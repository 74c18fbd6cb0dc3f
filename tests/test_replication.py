"""Incremental replication: a Mirror converges to the source through
updates/deletes/appends/compactions, syncs are incremental (untouched
mirror files carried by reference), idempotent when the source is quiet,
and the watermark publishes atomically with the data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.replication import Mirror
from faers_datalakehouse_spark.sources.versioned import VersionedTable


def _content(spark, t):
    return {(r["id"], r["flag"]) for r in t.read(spark).collect()}


def test_mirror_converges_and_is_incremental(spark, tmp_path):
    src = VersionedTable(str(tmp_path / "src"))
    src.write(
        spark.range(0, 300).withColumn("flag", F.lit("a"))
        .repartitionByRange(6, "id"),
        committed_at="t1",
    )
    m = Mirror(src, str(tmp_path / "dst"), ["id"])

    info = m.sync(spark, "m1")
    assert info["synced"] and m.applied_version() == 1
    assert _content(spark, m.dst) == _content(spark, src)

    # quiet source -> no-op, no new mirror version
    v_before = m.dst.current_version()
    assert not m.sync(spark, "m2")["synced"]
    assert m.dst.current_version() == v_before

    # narrow change -> incremental apply, most mirror files untouched
    dst_files_before = {f["path"] for f in m.dst.snapshot().files}
    src.update_where(spark, "id = 7", {"flag": "'b'"}, committed_at="t2")
    info = m.sync(spark, "m3")
    assert info == {"applied_from": 1, "applied_to": 2, "synced": True}
    dst_files_after = {f["path"] for f in m.dst.snapshot().files}
    # the mirror was written as one overwrite (few files); at least the
    # data converges and SOME files carry by reference when the mirror
    # has multiple files
    assert _content(spark, m.dst) == _content(spark, src)
    assert m.applied_version() == 2
    assert dst_files_before & dst_files_after or len(dst_files_before) == 1

    # deletes + appends + a source compaction (zero net changes)
    src.delete_where(spark, "id % 5 = 0", committed_at="t3")
    src.write(
        spark.range(300, 320).withColumn("flag", F.lit("c")),
        mode="append",
        committed_at="t4",
    )
    src.compact(spark, target_file_bytes=1 << 30, committed_at="t5")
    m.sync(spark, "m4")
    assert _content(spark, m.dst) == _content(spark, src)
    assert m.applied_version() == src.current_version()


def test_mirror_watermark_is_atomic_with_data(spark, tmp_path):
    src = VersionedTable(str(tmp_path / "src"))
    src.write(spark.range(0, 50).withColumn("flag", F.lit("a")), committed_at="t1")
    m = Mirror(src, str(tmp_path / "dst"), ["id"])
    m.sync(spark, "m1")
    # watermark lives IN the published manifest, not a sidecar
    assert m.dst.snapshot().extra == {"applied_src_version": 1}


def test_mirror_requires_source_snapshots(spark, tmp_path):
    src = VersionedTable(str(tmp_path / "empty_src"))
    m = Mirror(src, str(tmp_path / "dst"), ["id"])
    with pytest.raises(FileNotFoundError):
        m.sync(spark)


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from faers_datalakehouse_spark.sources.versioned import (
        ConstraintViolation,
    )

    t = VersionedTable(str(tmp_path / "vt"))
    t.write(spark.range(0, 10), committed_at="t1")
    # id >= 0 holds -> metadata-only snapshot, live files untouched
    files_before = {f["path"] for f in t.snapshot().files}
    v = t.add_constraint(spark, "id >= 0", committed_at="t2")
    assert v == 2
    assert {f["path"] for f in t.snapshot().files} == files_before
    assert t.read(spark).count() == 10

    # id > 0 fails on the existing id=0 row -> rejected, LIVE FILES KEPT
    with pytest.raises(ConstraintViolation):
        t.add_constraint(spark, "id > 0", committed_at="t3")
    assert t.current_version() == 2
    assert t.read(spark).count() == 10  # nothing deleted

    # duplicate add is a no-op
    assert t.add_constraint(spark, "id >= 0") == 2


def test_mirror_falls_back_to_full_copy_after_source_vacuum(spark, tmp_path):
    src = VersionedTable(str(tmp_path / "src"))
    src.write(spark.range(0, 100).withColumn("flag", F.lit("a")), committed_at="t1")
    m = Mirror(src, str(tmp_path / "dst"), ["id"])
    m.sync(spark, "m1")  # applied = 1

    src.delete_where(spark, "id < 10", committed_at="t2")
    src.write(
        spark.range(100, 110).withColumn("flag", F.lit("b")),
        mode="append", committed_at="t3",
    )
    src.vacuum(keep_last=1)  # drops v1/v2 — the mirror's diff base
    assert 1 not in src.versions()

    info = m.sync(spark, "m2")
    assert info["synced"] and info["applied_from"] is None  # full re-copy
    assert _content(spark, m.dst) == _content(spark, src)
    assert m.applied_version() == src.current_version()


def test_mirror_survives_dst_maintenance_commits(spark, tmp_path):
    """Regression: a dst-side compact used to drop the watermark (it
    lives in commit extra, which maintenance commits don't carry),
    silently degrading the next sync to a full re-copy."""
    src = VersionedTable(str(tmp_path / "src"))
    src.write(
        spark.range(0, 200).withColumn("flag", F.lit("a")).repartition(6),
        committed_at="t1",
    )
    m = Mirror(src, str(tmp_path / "dst"), ["id"])
    m.sync(spark, "m1")
    m.dst.compact(spark, target_file_bytes=1 << 30, committed_at="c1")

    assert m.applied_version() == 1  # backscan finds the sync commit
    src.write(spark.range(200, 210).withColumn("flag", F.lit("b")),
              mode="append", committed_at="t2")
    info = m.sync(spark, "m2")
    assert info["applied_from"] == 1  # incremental, not a full re-copy
    assert _content(spark, m.dst) == _content(spark, src)
