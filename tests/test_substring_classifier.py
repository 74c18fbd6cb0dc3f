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


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """Schleimer et al. guarantee: documents sharing a token run of at
    least w + k - 1 tokens share at least one fingerprint."""
    from faers_datalakehouse_spark.operators.substring import (
        winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"nine ten {shared} eleven twelve"),
            (3, "completely different words everywhere here today now ok"),
        ],
        ["doc_id", "text"],
    )
    fp = winnowing_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fhash"])
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # density: winnowing must select strictly fewer than all windows
    n_windows_doc1 = len(docs.filter("doc_id = 1").collect()[0]["text"].split()) - 5 + 1
    assert len(by_doc[1]) < n_windows_doc1


def test_winnowing_deterministic(spark, sf_dir):
    from faers_datalakehouse_spark.operators.substring import (
        winnowing_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    a = winnowing_fingerprints(docs).collect()
    b = winnowing_fingerprints(docs).collect()
    assert a == b and len(a) > 0


def test_bigram_surprisal_rewards_predictable_sequences(spark):
    """A document of maximally predictable bigrams scores fewer bits per
    bigram than one full of unique transitions."""
    from faers_datalakehouse_spark.operators.surprisal import (
        bigram_surprisal_scores,
    )

    rows = [(1, "x y " * 20)]  # x->y and y->x dominate their prefixes
    rows += [(i, f"u{i} v{i} w{i} z{i}") for i in range(2, 12)]  # unique transitions
    rows += [(99, "x q")]  # x->q is rare given prefix x appears 40 times
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["avg_surprisal_bits"] for r in bigram_surprisal_scores(docs).collect()}
    # common prefix, rare continuation -> high conditional surprisal
    assert out[1] < out[99]
    # a once-seen prefix determines its continuation: exactly 0 bits
    assert out[2] == 0.0
