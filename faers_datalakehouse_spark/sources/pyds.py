"""Python DataSource API integration for versioned tables.

Registers the homegrown :class:`~.versioned.VersionedTable` layout as a
first-class Spark source — ``spark.read.format("versioned_py")`` — via
the Spark 4 Python DataSource API (SPARK-44076), so the snapshot log
participates in Catalyst planning like any V2 source instead of only
through the library's ``read()`` helpers:

- **partition planning from the manifest**: one input partition per
  live data file in the selected snapshot — Spark schedules file-grain
  tasks exactly as a native parquet scan would, and a 1000-executor
  cluster fans out across the manifest with no driver-side scan.
- **filter pushdown → file skipping** (``pushFilters``, 4.1): eq/range
  predicates on columns with recorded per-file min/max stats drop
  whole files BEFORE tasks launch — the Delta data-skipping model run
  through Spark's own pushdown protocol. Every filter is also returned
  to Spark (post-scan re-evaluation), so pruning can only skip files,
  never change results.
- **time travel**: ``.option("version", n)`` selects any snapshot.
- **Arrow batch reads**: workers yield pyarrow RecordBatches (no
  row-at-a-time Python), columns aligned to the snapshot schema with
  schema-evolution nulls and partition-directory values restored.

Scope: plain and partitioned snapshots. Tables carrying merge-on-read
tombstones or column-mapping renames refuse loudly (read those through
``VersionedTable.read``, which applies the deletion vectors/mapping);
wiring those through this reader is mechanical but not yet needed by
any driver surface.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_ARROW_TYPES = {
    "long": "int64",
    "integer": "int32",
    "short": "int16",
    "byte": "int8",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
    "date": "date32",
    "timestamp_ntz": "timestamp[us]",
}


class _FilePart(InputPartition):
    def __init__(self, path: str, partition: dict | None):
        self.path = path
        self.partition = partition or {}


class VersionedReader(DataSourceReader):
    """Manifest-driven reader: plans one partition per live file and
    prunes on pushed filters using the per-file min/max stats."""

    def __init__(self, root: str, schema: StructType, options: dict):
        self.root = root
        self.schema_fields = [
            (f.name, f.dataType.typeName()) for f in schema.fields
        ]
        manifest_dir = Path(root) / "_manifests"
        versions = sorted(
            int(p.stem[1:]) for p in manifest_dir.glob("v*.json")
        )
        if not versions:
            raise ValueError(f"{root}: not a versioned table (no manifests)")
        want = options.get("version")
        version = int(want) if want is not None else versions[-1]
        if version not in versions:
            raise ValueError(f"{root}: no snapshot v{version}")
        snap = json.loads(
            (manifest_dir / f"v{version:08d}.json").read_text()
        )
        extra = snap.get("extra") or {}
        if extra.get("deletes"):
            raise ValueError(
                "versioned_py cannot read tables with merge-on-read "
                "tombstones; use VersionedTable.read"
            )
        if extra.get("column_mapping"):
            raise ValueError(
                "versioned_py cannot read column-mapped tables; use "
                "VersionedTable.read"
            )
        self.entries = snap["files"]
        spec = extra.get("partition_spec") or {}
        self.part_cols = list(spec.get("cols", []))
        self.bounds: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        stat_cols = {
            c for e in self.entries for c in e.get("stats", {})
        }
        for f in filters:
            if (
                isinstance(
                    f,
                    (
                        EqualTo,
                        GreaterThan,
                        GreaterThanOrEqual,
                        LessThan,
                        LessThanOrEqual,
                    ),
                )
                and len(f.attribute) == 1
                and f.attribute[0] in stat_cols
            ):
                self.bounds.append(
                    (f.attribute[0], type(f).__name__, f.value)
                )
        # every filter is re-evaluated by Spark post-scan: pruning may
        # only SKIP files, never stand in for the predicate
        return filters

    def _keep(self, entry: dict) -> bool:
        stats = entry.get("stats", {})
        for col, op, v in self.bounds:
            if col not in stats:
                continue
            lo, hi = stats[col]
            if lo is None or hi is None:
                continue
            if op == "EqualTo" and not (lo <= v <= hi):
                return False
            if op == "GreaterThan" and not (hi > v):
                return False
            if op == "GreaterThanOrEqual" and not (hi >= v):
                return False
            if op == "LessThan" and not (lo < v):
                return False
            if op == "LessThanOrEqual" and not (lo <= v):
                return False
        return True

    def partitions(self):
        return [
            _FilePart(
                str(Path(self.root) / e["path"]), e.get("partition")
            )
            for e in self.entries
            if self._keep(e)
        ]

    def read(self, partition: _FilePart):
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        n = table.num_rows
        arrays, names = [], []
        for name, spark_type in self.schema_fields:
            atype = pa.type_for_alias(_ARROW_TYPES.get(spark_type, "null"))
            if name in partition.partition:
                arr = pa.array([partition.partition[name]] * n).cast(atype)
            elif name in table.column_names:
                arr = table.column(name).combine_chunks()
                if arr.type != atype and _ARROW_TYPES.get(spark_type):
                    arr = arr.cast(atype)
            else:
                arr = pa.nulls(n, atype)  # schema-evolution gap
            arrays.append(arr)
            names.append(name)
        out = pa.table(arrays, names=names)
        yield from out.to_batches(max_chunksize=65536)


class VersionedDataSource(DataSource):
    """``spark.read.format("versioned_py").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "versioned_py"

    def schema(self):
        root = self.options.get("path")
        if not root:
            raise ValueError("versioned_py requires .option/load path")
        manifest_dir = Path(root) / "_manifests"
        versions = sorted(
            int(p.stem[1:]) for p in manifest_dir.glob("v*.json")
        )
        if not versions:
            raise ValueError(f"{root}: not a versioned table")
        want = self.options.get("version")
        version = int(want) if want is not None else versions[-1]
        snap = json.loads(
            (manifest_dir / f"v{version:08d}.json").read_text()
        )
        if not snap.get("schema"):
            raise ValueError(f"{root}: snapshot v{version} has no schema")
        return StructType.fromJson(json.loads(snap["schema"]))

    def reader(self, schema: StructType) -> VersionedReader:
        return VersionedReader(
            self.options["path"], schema, dict(self.options)
        )


def register(spark) -> None:
    # Spark refuses a reader that implements pushFilters while the
    # pushdown protocol is off, so registration enables it (runtime-
    # settable session conf).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedDataSource)
