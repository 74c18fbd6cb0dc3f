"""Continuous near-dup corpus curation: a streaming document sink that
admits only novel documents.

The batch dedup stack answers "which of these N docs duplicate each
other"; a LIVE ingestion pipeline asks the incremental question per
micro-batch: "which of these new docs duplicate anything already
ACCEPTED". ``operators.incremental`` built exactly that probe (exact
content-hash layer + cross-frame MinHash band buckets, corpus side not
recomputed); this sink runs it per micro-batch via ``foreachBatch`` —
the batch engine IS the streaming engine, the same stance as
``streaming.scd2`` and the funnel sink.

Semantics per batch:
1. within-batch exact dedup (lowest id per content hash survives — two
   copies arriving in ONE batch must not both be admitted);
2. cross-corpus decisions via ``incremental_dedup_decisions``
   (``dup_exact`` / ``dup_near`` / ``keep``);
3. survivors append to ``corpus_table``; every decision appends to
   ``decisions_table`` with the batch id (the audit trail: WHY a doc was
   dropped, when, against what corpus state).

Within-batch NEAR-dups (two novel paraphrases in one batch) are both
admitted and left to a periodic batch `minhash_lsh_pairs` sweep over the
corpus — deliberate: resolving them online would run the full self-join
on every trigger for a case the daily compaction sweep handles at 1/1000
the cost. Documented trade, same as SemDeDup's cross-cluster recall.

At-least-once replay: a re-delivered batch's docs are all ``dup_exact``
against the corpus (their first delivery admitted them), so the corpus
stays duplicate-free; only the decisions log gains duplicate audit rows
(append-only logs tolerate that; dedup on (batch_id, doc_id) at read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_exact
from ..operators.incremental import incremental_dedup_decisions


def curate_batch(
    batch: DataFrame,
    corpus_table: str,
    decisions_table: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> None:
    """Apply one micro-batch of documents to the curated corpus."""
    if batch.isEmpty():
        return
    spark = batch.sparkSession

    survivors_ids = dedup_exact(batch, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    batch_unique = batch.join(survivors_ids, id_col)
    # within-batch exact drops get audit rows too — the decisions log
    # records WHY every doc vanished, including same-batch copies
    in_batch_dropped = (
        batch.join(survivors_ids, id_col, "left_anti")
        .select(
            F.col(id_col).alias("doc_id"),
            F.lit(True).alias("dup_exact"),
            F.lit(False).alias("dup_near"),
            F.lit(False).alias("keep"),
        )
    )

    if spark.catalog.tableExists(corpus_table):
        corpus = spark.table(corpus_table)
        decisions = incremental_dedup_decisions(
            batch_unique, corpus, id_col=id_col, text_col=text_col,
            threshold=threshold,
            # the exact layer must agree with dedup_exact's NORMALIZED
            # hashing, or the same pair classifies differently depending
            # on which micro-batch it arrived in
            normalize=True,
        )
    else:
        decisions = batch_unique.select(
            F.col(id_col).alias("doc_id"),
            F.lit(False).alias("dup_exact"),
            F.lit(False).alias("dup_near"),
            F.lit(True).alias("keep"),
        )
    decisions = decisions.unionByName(in_batch_dropped).withColumn(
        "batch_id", F.lit(batch_id)
    )
    # one row per batch doc: persist so the corpus append below reuses
    # the computed decisions instead of re-running the full-corpus
    # banding a second time per trigger
    decisions = decisions.persist()
    # Write decisions BEFORE mutating the corpus they were computed
    # against; the `kept` filter below reuses the SAME pre-mutation plan
    # (never a read-back from the decisions table — on an at-least-once
    # replay the first delivery's keep=true audit rows share the batch_id
    # and would re-admit every replayed doc).
    decisions.write.mode("append").saveAsTable(decisions_table)

    kept = decisions.filter(F.col("keep")).select(
        F.col("doc_id").alias(id_col)
    )
    batch_unique.join(kept, id_col).write.mode("append").saveAsTable(
        corpus_table
    )
    decisions.unpersist()


def streaming_curation_sink(
    stream: DataFrame,
    corpus_table: str,
    decisions_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
    query_name: str = "curation_sink",
):
    """Attach the near-dup curation sink to a document stream; returns the
    started ``StreamingQuery``."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        curate_batch(
            batch,
            corpus_table,
            decisions_table,
            batch_id,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
        )

    writer = stream.writeStream.foreachBatch(_apply).queryName(query_name)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
