"""Exactly-once streaming appends into a ``VersionedTable``.

``foreachBatch`` is at-least-once: after a partial failure the restarted
query re-runs the last micro-batch, and a plain append would commit its
rows twice. Delta's streaming sink solves this with per-writer
transaction watermarks (``txnAppId``/``txnVersion``: the table remembers
the highest batch id each writer committed, and a replayed batch is
skipped); this module is that mechanism on the manifest-log format —
reference parity for the reference's Delta streaming ingestion surface,
re-expressed over ``sources.versioned``.

Mechanics: every streaming commit records ``{"txn": {app_id: batch_id}}``
in the snapshot's ``extra``; ``_commit`` carries the txn map forward
through UNRELATED commits (compaction, MERGE, manual appends) exactly as
it carries the partition spec, so the watermark survives table
maintenance. ``idempotent_append`` reads the current watermark, skips
batches at-or-below it, and otherwise appends batch + updated watermark
in ONE atomic manifest publish — the batch's rows and the fact that the
batch committed can never diverge. Concurrent writers with DISTINCT
``app_id`` values are safe: appends go through the table's optimistic
commit loop, and a publish conflict rebases without rewriting data. One
running instance per ``app_id`` (the watermark check-then-commit is not
atomic against a same-app twin — which Structured Streaming's
checkpoint-held query lock already guarantees).

Scale: the idempotence decision is one driver-side manifest read (KBs);
the data path is the ordinary staged parquet write. State held by the
stream itself: none — the table IS the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.versioned import VersionedTable


def idempotent_append(
    table: VersionedTable,
    batch: DataFrame,
    batch_id: int,
    app_id: str = "stream",
    committed_at: str | None = None,
    partition_by: tuple[str, ...] = (),
) -> int | None:
    """Append ``batch`` as a new snapshot unless a batch with this
    ``app_id`` and an id >= ``batch_id`` already committed (replay →
    no-op). Returns the new version, or None when skipped.

    ``committed_at`` defaults to a zero-padded batch stamp so commit
    times stay deterministic and ISO-sortable without a wall clock
    (the repo's injectable-clock rule)."""
    cur = table.current_version()
    txn = (
        dict(table.snapshot(cur).extra.get("txn") or {})
        if cur is not None
        else {}
    )
    if txn.get(app_id, -1) >= batch_id:
        return None
    txn[app_id] = batch_id
    return table.write(
        batch,
        mode="append",
        committed_at=(
            committed_at
            if committed_at is not None
            else f"batch-{batch_id:012d}"
        ),
        commit_extra={"txn": txn},
        partition_by=partition_by,
    )


def stream_to_versioned(
    stream: DataFrame,
    root: str,
    app_id: str = "stream",
    query_name: str = "versioned_sink",
    checkpoint_dir: str | None = None,
    partition_by: tuple[str, ...] = (),
):
    """Start a ``foreachBatch`` query appending every micro-batch to the
    versioned table at ``root`` through ``idempotent_append`` — the
    exactly-once streaming sink. Empty batches commit nothing (no empty
    snapshots from idle triggers)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        idempotent_append(
            VersionedTable(root),
            batch,
            batch_id,
            app_id=app_id,
            partition_by=partition_by,
        )

    writer = stream.writeStream.foreachBatch(_apply).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
