"""Streaming SCD2: dimension maintenance from a change stream.

The reference's SCD2 is batch-only (two Delta MERGEs per quarterly load,
reference ``src/utils/scd_type2.py:111-226``). A lakehouse that ingests
dimension changes continuously needs the same semantics per micro-batch —
the canonical Spark shape is ``foreachBatch``: inside the hook each
micro-batch is a plain DataFrame, so the *batch* SCD2 engine
(``operators.scd2``) is reused verbatim — one code path, one set of
semantics, batch and streaming.

Delivery semantics: ``foreachBatch`` + a checkpoint location gives
at-least-once batch delivery; SCD2 absorbs replays because a re-merge of an
already-applied batch is a no-op (identical row hashes → "unchanged"
branch) — tested. At scale the overwrite step is the non-transactional
window (same caveat as ``sources.maintenance``); on Delta/Iceberg the
``foreachBatch`` body becomes the native transactional ``MERGE`` with the
same surrounding logic.

The effective-date clock is injectable per batch (``batch_id -> str``), so
streaming runs are as deterministic/testable as the batch engine — never
``current_date()`` inside the merge.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from ..operators.scd2 import scd2_table_apply


def apply_scd2_batch(
    batch: DataFrame,
    table: str,
    business_keys: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date: str,
) -> None:
    """Merge one micro-batch into the managed dimension table ``table``
    (creating it on first batch). Delegates to the shared staging-table
    apply (``operators.scd2.scd2_table_apply``) — the same durable
    materialization the batch dims use, NOT ``localCheckpoint`` (executor-
    local blocks with truncated lineage would make an executor loss
    mid-overwrite unrecoverable).
    """
    if batch.isEmpty():
        return
    scd2_table_apply(
        batch.sparkSession,
        table,
        batch,
        business_keys,
        tracked_cols,
        effective_date,
    )


def scd2_streaming_sink(
    stream: DataFrame,
    table: str,
    business_keys: Sequence[str],
    tracked_cols: Sequence[str],
    effective_date_for_batch: Callable[[int], str] | str,
    checkpoint_dir: str | None = None,
    query_name: str = "scd2_sink",
):
    """Attach an SCD2 merge sink to a change stream; returns the started
    ``StreamingQuery``. Each micro-batch runs one full merge, so dimension
    state advances transactionally per trigger from the stream's point of
    view."""

    def _eff(batch_id: int) -> str:
        if callable(effective_date_for_batch):
            return effective_date_for_batch(batch_id)
        return effective_date_for_batch

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_scd2_batch(
            batch, table, business_keys, tracked_cols, _eff(batch_id)
        )

    writer = stream.writeStream.foreachBatch(_apply).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
