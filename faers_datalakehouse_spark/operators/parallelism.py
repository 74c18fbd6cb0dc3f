"""Compute-parallelism guard for CPU-heavy map stages.

Parquet only splits at row-group boundaries, so a table written as one
small file scans as ONE task — and every expression evaluated before the
first shuffle (shingling, 64-permutation MinHash signatures, quantized
vector distances, window fingerprints) serializes onto a single core no
matter how many executors exist. The round-5 scale probe measured this
directly: `semantic_neardup` ran 2.5x faster on a 32-file layout than on
a byte-identical single-file layout (PERF.md round 5).

``ensure_compute_parallelism`` repartitions ONLY when the input's split
count is materially below the cluster's parallelism — a no-op on any
well-laid-out table (the 100 TB case: thousands of files), one cheap
round-robin exchange on degenerate layouts, where the exchange cost is
dwarfed by the serialized compute it unblocks. Operators that are pure
aggregations (their first shuffle IS the work) don't need it; it is wired
into the operators whose map-side expression trees dominate their runtime
(kmeans rounds, SemDeDup quantization, substring window fingerprints).

Relation to ``dedup.fan_out``: fan_out repartitions UNCONDITIONALLY and
doubles as a materialization barrier ahead of persist()/mapInPandas in
the MinHash/SimHash/ANN paths — that shape stays. This guard is for the
paths with no such barrier, where an unconditional corpus shuffle would
be pure cost on a well-partitioned 100 TB input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_compute_parallelism(
    df: DataFrame, min_fraction: float = 0.5
) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    current partition count is below ``min_fraction`` of it. Partition
    count comes from the file listing — no job is triggered."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — streaming frames etc.: leave as-is
        return df
    if current < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df
