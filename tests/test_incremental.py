"""Unit tests for cross-corpus incremental dedup decisions."""

from __future__ import annotations

from faers_datalakehouse_spark.operators.incremental import (
    incremental_dedup_decisions,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def test_decisions_cover_exact_near_and_fresh(spark):
    existing = _docs(spark, [(100, BASE), (101, "completely different text")])
    new = _docs(
        spark,
        [
            (1, BASE),  # exact duplicate of 100
            (2, BASE.replace("afternoon", "evening")),  # near-dup of 100
            (3, "entirely novel content about distributed query engines"),
        ],
    )
    out = {
        r.doc_id: (r.dup_exact, r.dup_near, r.keep)
        for r in incremental_dedup_decisions(new, existing, threshold=0.5).collect()
    }
    assert out[1] == (True, True, False)  # exact implies near too
    assert out[2] == (False, True, False)
    assert out[3] == (False, False, True)


def test_no_existing_corpus_keeps_everything(spark):
    existing = _docs(spark, []).filter("doc_id IS NOT NULL")
    new = _docs(spark, [(1, BASE), (2, BASE)])
    out = incremental_dedup_decisions(new, existing).collect()
    # Within-batch duplicates are NOT this operator's job (the self-join
    # path handles those); both must survive the cross-corpus probe.
    assert all(r.keep for r in out)


def test_new_batch_never_loses_rows(spark):
    existing = _docs(spark, [(100, BASE)])
    new = _docs(spark, [(i, f"doc number {i} with its own words") for i in range(7)])
    out = incremental_dedup_decisions(new, existing).collect()
    assert sorted(r.doc_id for r in out) == list(range(7))
