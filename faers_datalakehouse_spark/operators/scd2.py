"""Slowly Changing Dimension Type 2 — DataFrame-native merge.

Parity: the reference implements SCD2 with two Delta ``MERGE INTO`` statements
(``src/utils/scd_type2.py:111-226``): (1) ``ON business_keys AND
target.is_current`` — close changed rows / insert brand-new keys; (2) an
insert-only pass (``ON false``) adding the new versions of just-closed keys.
Change detection is an md5 row-hash over tracked columns; surrogate keys are
md5(business keys + effective date).

Spark-first rewrite (SURVEY.md §2.9): Delta MERGE is not required — the same
end-state is one full-outer join between the *current* slice of the target and
the deduplicated source, split three ways (unchanged / closed+new-version /
brand-new), unioned with untouched history. This is format-agnostic (works on
plain Parquet), testable against a SQL oracle, and runs as a single shuffle
on the business keys. At 100 TB you bucket the dimension by business key so
each merge is a co-partitioned join; history rows never re-shuffle because
they bypass the join entirely.

Determinism: the reference stamps ``current_date()``/``current_timestamp()``
inside the merge — untestable. Here the clock is an explicit
``effective_date`` parameter (the production caller passes today).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.transforms import row_hash, surrogate_key

HIGH_DATE = "9999-12-31"

SCD2_META_COLS = ("dim_key", "row_hash", "effective_date", "end_date", "is_current")


def add_scd2_metadata(
    df: DataFrame,
    business_keys: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date: str,
    key_extra: str | None = None,
) -> DataFrame:
    """Stamp SCD2 metadata on a source frame (reference ``scd_type2.py:19-89``).

    ``key_extra`` is an optional extra surrogate-key component. The default
    key md5(business_keys + effective_date) matches the reference, but it
    collides when the SAME business key changes twice under the SAME
    effective date — impossible for quarterly batch loads, routine for a
    change stream merging several micro-batches per day. Streaming callers
    pass a per-batch token (the micro-batch id) so every inserted version
    gets a unique ``dim_key``; batch callers omit it and keep
    reference-identical keys.
    """
    eff = F.to_date(F.lit(effective_date))
    key_parts = [F.col("effective_date").cast("string")]
    if key_extra is not None:
        key_parts.append(F.lit(key_extra))
    return (
        df.withColumn("row_hash", row_hash(list(tracked_cols)))
        .withColumn("effective_date", eff)
        .withColumn("end_date", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
        .withColumn(
            "dim_key",
            surrogate_key(list(business_keys), *key_parts),
        )
    )


def scd2_initial_load(
    source: DataFrame,
    business_keys: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date: str,
    key_extra: str | None = None,
) -> DataFrame:
    """First load: every (deduplicated) source row becomes a current version.

    Column order is canonical (attributes, then SCD metadata) and identical
    to ``scd2_merge`` output, so repeated merges are stable frames.
    """
    from pyspark.sql.window import Window as _W

    attr_cols = list(source.columns)
    # content-hash tiebreak, like scd2_merge: the surviving row per key
    # is a function of the data, not of partition order
    _w = _W.partitionBy(*business_keys).orderBy(
        F.md5(F.to_json(F.struct(*source.columns))).desc()
    )
    one_per_key = (
        source.withColumn("_rn", F.row_number().over(_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return add_scd2_metadata(
        one_per_key,
        business_keys,
        tracked_cols,
        effective_date,
        key_extra=key_extra,
    ).select(*attr_cols, *SCD2_META_COLS)


def scd2_merge(
    target: DataFrame,
    source: DataFrame,
    business_keys: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date: str,
    key_extra: str | None = None,
) -> DataFrame:
    """Apply one SCD2 merge; returns the full new dimension state.

    Semantics (matching the reference's two MERGEs):
    - source row matches a current target row with a different row_hash →
      close the target row (end_date=effective_date, is_current=false) AND
      insert the source row as the new current version;
    - source row with no current target match → insert as new current row;
    - source row with identical hash → no-op (idempotent re-runs);
    - target rows absent from the source are left untouched (the reference
      never closes missing keys);
    - historical (non-current) target rows bypass the join entirely.
    """
    keys = list(business_keys)
    attr_cols = [c for c in target.columns if c not in SCD2_META_COLS]

    # deterministic one-row-per-key reduction: dropDuplicates keeps an
    # arbitrary partition-order-dependent survivor; ordering by a content
    # hash makes the winner a function of the DATA (rows identical in
    # every column are interchangeable), preserving run-to-run and
    # replay determinism. Streams with a real event-time ordering should
    # pre-reduce via streaming.scd2.latest_per_key instead.
    from pyspark.sql.window import Window as _W

    _w = _W.partitionBy(*keys).orderBy(
        F.md5(F.to_json(F.struct(*source.columns))).desc()
    )
    one_per_key = (
        source.withColumn("_rn", F.row_number().over(_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    src = add_scd2_metadata(
        one_per_key, keys, tracked_cols, effective_date,
        key_extra=key_extra,
    ).select(*attr_cols, *SCD2_META_COLS)

    current = target.filter(F.col("is_current"))
    history = target.filter(~F.col("is_current"))

    # Presence markers (not keys[0].isNotNull()): a NULL business key is
    # matched by eqNullSafe and must not be silently dropped.
    t = current.withColumn("_t_present", F.lit(True)).alias("t")
    s = src.withColumn("_s_present", F.lit(True)).alias("s")
    joined = t.join(
        s, on=[F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys], how="full"
    )

    t_present = F.col("t._t_present").isNotNull()
    s_present = F.col("s._s_present").isNotNull()
    changed = (
        t_present & s_present & (F.col("t.row_hash") != F.col("s.row_hash"))
    )

    def _side(side: str) -> list[F.Column]:
        return [F.col(f"{side}.{c}").alias(c) for c in [*attr_cols, *SCD2_META_COLS]]

    # Target-side survivors: unchanged current rows as-is, changed rows closed.
    kept = (
        joined.filter(t_present)
        .select(*_side("t"), changed.alias("_changed"))
        .withColumn(
            "end_date",
            F.when(F.col("_changed"), F.to_date(F.lit(effective_date))).otherwise(
                F.col("end_date")
            ),
        )
        .withColumn("is_current", F.col("is_current") & ~F.col("_changed"))
        .drop("_changed")
    )
    # Source-side inserts: new business keys + new versions of changed keys.
    inserted = joined.filter(
        (~t_present & s_present) | changed
    ).select(*_side("s"))

    return history.select(*[*attr_cols, *SCD2_META_COLS]).unionByName(
        kept
    ).unionByName(inserted)


def scd2_current_view(dim: DataFrame) -> DataFrame:
    """Convenience: the current slice (reference's dead ``get_current_records``)."""
    return dim.filter(F.col("is_current"))


def scd2_history(dim: DataFrame, business_key_values: dict[str, object]) -> DataFrame:
    """Full change history for one business key (``get_change_history`` analog)."""
    cond = None
    for k, v in business_key_values.items():
        # eqNullSafe: NULL business keys are first-class here (tracked by
        # the merge via eqNullSafe), so their history must be retrievable
        c = F.col(k).eqNullSafe(F.lit(v))
        cond = c if cond is None else (cond & c)
    return dim.filter(cond).orderBy("effective_date")


def scd2_versioned_apply(
    table,
    source: DataFrame,
    business_keys: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date: str,
    committed_at: str = "1970-01-01T00:00:00Z",
    key_extra: str | None = None,
) -> int:
    """Apply one SCD2 merge against a ``sources.versioned.VersionedTable``.

    ``key_extra``: per-batch surrogate-key token (see
    ``add_scd2_metadata``) — REQUIRED when merging more than one batch
    under the same ``effective_date``, or the new and closed versions of
    a key collide on ``dim_key``.

    The cleanest writer shape: the merge reads the current snapshot's
    files and the commit stages brand-new files, so there is no
    read-overwrite conflict — no staging table, no ``localCheckpoint``
    (compare the managed-table dance in ``plans.medallion._scd2_dim_write``)
    — and the swap is atomic: readers see the pre- or post-merge dimension,
    never a mix. Every merge is also a retained snapshot, so
    ``table.read(spark, version=N)`` time-travels the dimension state as
    of merge N on top of the row-level history SCD2 itself keeps.
    Returns the committed version.
    """
    spark = source.sparkSession
    if table.current_version() is None:
        out = scd2_initial_load(
            source, business_keys, tracked_cols, effective_date
        )
    else:
        out = scd2_merge(
            table.read(spark),
            source,
            business_keys,
            tracked_cols,
            effective_date,
            key_extra=key_extra,
        )
    return table.write(out, mode="overwrite", committed_at=committed_at)


def scd2_table_apply(
    spark,
    table: str,
    source: DataFrame,
    business_keys: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date: str,
    key_extra: str | None = None,
) -> None:
    """Initial-load or merge ``source`` into the managed table ``table``.

    The merge plan reads ``table`` while the write overwrites it, so the
    merged frame is materialized first by staging it as a real table
    (write → read back → overwrite target → drop stage): durable storage
    with a recompute path, safe on a real cluster. ``localCheckpoint``
    was rejected for this shape — blocks live on executor local disk with
    lineage truncated, so one executor loss mid-overwrite loses both old
    and new state. Delta/Iceberg replace the dance with an atomic MERGE;
    ``scd2_versioned_apply`` gets atomicity from the manifest log instead.
    Shared by the batch dims (plans.medallion) and the streaming sink
    (streaming.scd2) — one code path, one set of semantics.
    """
    if not spark.catalog.tableExists(table):
        scd2_initial_load(
            source, business_keys, tracked_cols, effective_date,
            key_extra=key_extra,
        ).write.mode("overwrite").option("overwriteSchema", "true").saveAsTable(
            table
        )
        return
    dim = scd2_merge(
        spark.table(table), source, business_keys, tracked_cols, effective_date,
        key_extra=key_extra,
    )
    stage = f"{table}__stage"
    dim.write.mode("overwrite").option("overwriteSchema", "true").saveAsTable(
        stage
    )
    spark.table(stage).write.mode("overwrite").option(
        "overwriteSchema", "true"
    ).saveAsTable(table)
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
