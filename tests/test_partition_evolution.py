"""Partition-spec evolution: metadata-only spec changes, mixed-layout
reads, exact pruning with residual filters, and compaction migrating
old generations to the live spec (Iceberg partition-evolution parity on
the manifest-log format)."""

from __future__ import annotations

import pytest

from faers_datalakehouse_spark.sources.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, day string, region string, v bigint")


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


ROWS1 = [(1, "d1", "eu", 10), (2, "d1", "us", 20), (3, "d2", "eu", 30)]
ROWS2 = [(4, "d2", "us", 40), (5, "d3", "eu", 50)]


def test_evolve_mixed_generation_read(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.write(_df(spark, ROWS1), partition_by=("day",), committed_at="t1")
    v = t.evolve_partition_spec(["region"], committed_at="t2")
    assert t.partition_spec() == {
        "cols": ["region"],
        "types": {"region": "string"},
    }
    # the evolve commit is metadata-only: same files, new spec
    assert t.snapshot(v).files == t.snapshot(v - 1).files
    t.write(_df(spark, ROWS2), committed_at="t3")  # inherits new spec
    got = t.read(spark)
    assert got.columns == ["id", "day", "region", "v"]
    assert _vals(got) == sorted(ROWS1 + ROWS2)
    # new files laid out under the new spec, old ones untouched
    snap = t.snapshot()
    specs = {tuple(sorted(f.get("partition", {}))) for f in snap.files}
    assert specs == {("day",), ("region",)}
    # time travel to the pre-evolution snapshot still reads old layout
    assert _vals(t.read(spark, version=1)) == sorted(ROWS1)


def test_evolved_pruning_is_exact_with_residual(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.write(_df(spark, ROWS1), partition_by=("day",), committed_at="t1")
    t.evolve_partition_spec(["region"], committed_at="t2")
    t.write(_df(spark, ROWS2), committed_at="t3")
    got, report = t.read_partitions(spark, {"region": "eu"})
    assert _vals(got) == sorted(
        r for r in ROWS1 + ROWS2 if r[2] == "eu"
    )
    # old-generation files (no region in their manifest entries) cannot
    # be pruned; new-generation us-files are
    assert report["files_skipped"] >= 1
    # filtering by the HISTORIC column still works: new-generation files
    # are kept conservatively, the residual filter restores exactness
    got2, report2 = t.read_partitions(spark, {"day": "d1"})
    assert _vals(got2) == sorted(r for r in ROWS1 + ROWS2 if r[1] == "d1")
    assert report2["files_skipped"] >= 1


def test_evolve_from_unpartitioned_and_to_empty(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.write(_df(spark, ROWS1), committed_at="t1")  # unpartitioned
    t.evolve_partition_spec(["day"], committed_at="t2")
    t.write(_df(spark, ROWS2), committed_at="t3")
    assert _vals(t.read(spark)) == sorted(ROWS1 + ROWS2)
    got, _ = t.read_partitions(spark, {"day": "d3"})
    assert _vals(got) == sorted(r for r in ROWS1 + ROWS2 if r[1] == "d3")
    # back to unpartitioned for future writes
    t.evolve_partition_spec([], committed_at="t4")
    assert t.partition_spec() is None
    t.write(_df(spark, [(6, "d4", "ap", 60)]), committed_at="t5")
    assert len(t.read(spark).collect()) == 6


def test_compact_migrates_to_live_spec(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.write(_df(spark, ROWS1), partition_by=("day",), committed_at="t1")
    t.evolve_partition_spec(["region"], committed_at="t2")
    t.compact(spark, committed_at="t3")
    snap = t.snapshot()
    assert all(
        tuple(sorted(f.get("partition", {}))) == ("region",)
        for f in snap.files
    )
    assert _vals(t.read(spark)) == sorted(ROWS1)
    got, report = t.read_partitions(spark, {"region": "us"})
    assert _vals(got) == sorted(r for r in ROWS1 if r[2] == "us")
    # post-compaction the table is single-generation: pure manifest prune
    assert report["files_skipped"] >= 1


def test_evolve_validation(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    with pytest.raises(ValueError, match="no snapshot"):
        t.evolve_partition_spec(["day"])
    t.write(_df(spark, ROWS1), partition_by=("day",), committed_at="t1")
    with pytest.raises(ValueError, match="not in the table schema"):
        t.evolve_partition_spec(["nope"])
    with pytest.raises(ValueError, match="already partitioned"):
        t.evolve_partition_spec(["day"])
    # the fixed-spec write guard still fires and names the escape hatch
    with pytest.raises(ValueError, match="evolve_partition_spec"):
        t.write(
            _df(spark, ROWS2), partition_by=("region",), committed_at="t2"
        )


def test_delete_where_on_mixed_generations(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.write(_df(spark, ROWS1), partition_by=("day",), committed_at="t1")
    t.evolve_partition_spec(["region"], committed_at="t2")
    t.write(_df(spark, ROWS2), committed_at="t3")
    # the predicate hits rows in BOTH layout generations
    t.delete_where(spark, "region = 'eu'", committed_at="t4")
    got = _vals(t.read(spark))
    assert got == sorted(r for r in ROWS1 + ROWS2 if r[2] != "eu")
    # rewritten survivors land under the LIVE spec; untouched us-files
    # of the old generation keep their old layout
    snap = t.snapshot()
    specs = {tuple(sorted(f.get("partition", {}))) for f in snap.files}
    assert ("region",) in specs
    # pruning still exact post-delete
    got2, _ = t.read_partitions(spark, {"region": "us"})
    assert _vals(got2) == sorted(
        r for r in ROWS1 + ROWS2 if r[2] == "us"
    )
