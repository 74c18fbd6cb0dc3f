"""Unit tests for substring-span dedup and the hashed linear classifier.

Oracle parity at sf0.01 is covered by the driver gate; these pin the
span-merge semantics and classifier contract on constructed inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.classifier import (
    hashed_weights,
    quality_scores,
)
from faers_datalakehouse_spark.operators.substring import (
    duplicated_window_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def test_dup_spans_finds_shared_substring(spark):
    # Docs 1 and 2 share an 8-token run embedded in distinct text; doc 3
    # is unrelated. The span must cover exactly the shared tokens.
    shared = "the quick brown fox jumps over the lazy"
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three {shared} four"),
            (3, "totally unrelated content with enough tokens to window"),
        ],
    )
    out = duplicated_window_spans(docs, k=8).collect()
    spans = {(r.doc_id, r.span_start, r.span_end) for r in out}
    # doc 1: shared run at token offsets 2..9; doc 2: offsets 3..10.
    assert spans == {(1, 2, 9), (2, 3, 10)}


def test_dup_spans_merges_overlapping_windows(spark):
    # A 10-token duplicated run produces 3 overlapping 8-token windows
    # (starts 0,1,2) that must merge into ONE maximal span, not three.
    run = "a1 b2 c3 d4 e5 f6 g7 h8 i9 j10"
    docs = _docs(spark, [(1, run), (2, run)])
    out = duplicated_window_spans(docs, k=8).collect()
    assert len(out) == 2
    for r in out:
        assert (r.span_start, r.span_end, r.n_windows) == (0, 9, 3)


def test_dup_spans_catches_within_doc_repetition(spark):
    # The same 8 tokens twice in ONE doc: corpus-wide count is 2, so the
    # self-repeat is flagged even with no second document.
    run = "p q r s t u v w"
    docs = _docs(
        spark,
        [(1, f"{run} interlude tokens here {run}"), (2, "other text")],
    )
    out = duplicated_window_spans(docs, k=8).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in out} == {
        (1, 0, 7),
        (1, 11, 18),
    }


def test_dup_spans_short_docs_excluded(spark):
    # Under k tokens → no windows, never a reversed-sequence artifact.
    docs = _docs(spark, [(1, "too short"), (2, "too short")])
    assert duplicated_window_spans(docs, k=8).count() == 0


def test_classifier_scores_are_frozen_model_sums(spark):
    docs = _docs(spark, [(1, "hello world hello")])
    w = hashed_weights(spark, 64)
    out = quality_scores(docs, w, n_buckets=64).collect()
    assert len(out) == 1
    wmap = {r.bucket: r.weight for r in w.collect()}
    from faers_datalakehouse_spark.operators.sampling import _hash_bucket

    buckets = (
        spark.createDataFrame([("hello",), ("world",)], "term: string")
        .select("term", _hash_bucket(F.col("term"), 64).alias("b"))
        .collect()
    )
    bmap = {r.term: r.b for r in buckets}
    expect = 2 * wmap[bmap["hello"]] + wmap[bmap["world"]]
    r = out[0]
    assert (r.n_tokens, r.logit, r.keep) == (3, expect, expect > 0)


def test_classifier_weights_bounded_and_deterministic(spark):
    w1 = hashed_weights(spark, 256).collect()
    w2 = hashed_weights(spark, 256).collect()
    assert w1 == w2
    assert all(-8 <= r.weight <= 8 for r in w1)


def test_classifier_empty_docs_absent(spark):
    docs = _docs(spark, [(1, "words here"), (2, "!!!")])
    out = quality_scores(docs, hashed_weights(spark, 64), n_buckets=64).collect()
    assert [r.doc_id for r in out] == [1]
