"""Unit tests for the r12 composed entry: curation_pipeline.

The strict parquet oracle (sf0.01 driver-sim) proves cross-engine
exactness; these tests pin the SEMANTICS on hand-built frames where the
expected outcome is computable by hand — including a PII-laden source
(the synthetic driver corpus contains no PII, so the scrub leg would
otherwise only ever see zeros) and a binding token budget.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.curation import curation_pipeline


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def _pairs(spark, rows):
    return spark.createDataFrame(rows or [], "id_a long, id_b long")


def test_pipeline_keep_best_and_scrub(spark):
    docs = _docs(
        spark,
        [
            # near-dup pair in source a; doc 2 is longer -> kept.
            # both carry an email so source a flags for scrubbing.
            (1, "a", "alpha beta x@y.com"),
            (2, "a", "alpha beta gamma delta epsilon x@y.com"),
            (3, "b", "one two three"),
        ],
    )
    pairs = _pairs(spark, [(1, 2)])
    out = curation_pipeline(docs, pairs, n_shards=2).collect()
    # doc 1 dropped by keep-best: 2 docs survive, both within budget
    # (water-filled allocations are > 0 for both sources, and the greedy
    # prefix always ships a source's first doc when alloc > 0)
    assert sum(r.n_docs for r in out) == 2
    # norm("alpha beta gamma delta epsilon x@y.com") = 8 tokens,
    # norm("one two three") = 3
    assert sum(r.total_tokens for r in out) == 11
    # exactly the source-a doc is scrub-flagged; source b is clean
    assert sum(r.n_scrub_docs for r in out) == 1
    for r in out:
        assert 0 <= r.n_scrub_docs <= r.n_docs
        assert 0 <= r.shard_id < 2
        assert r.split in {"train", "val", "test"}


def test_pipeline_budget_prefix(spark):
    # one source, 4 equal 10-token docs, budget = half of 40 = 20:
    # the greedy prefix ships exactly 2 docs (cum-before 0 and 10 < 20;
    # the third starts at 20 and is excluded), whatever the hash order.
    docs = _docs(
        spark,
        [
            (i, "s", "tok " * 10) for i in range(1, 5)
        ],
    )
    out = curation_pipeline(docs, _pairs(spark, []), n_shards=4).collect()
    assert sum(r.n_docs for r in out) == 2
    assert sum(r.total_tokens for r in out) == 20
    assert sum(r.n_scrub_docs for r in out) == 0


def test_pipeline_fingerprint_deterministic(spark):
    docs = _docs(
        spark,
        [(i, f"s{i % 3}", f"doc number {i} body text") for i in range(30)],
    )
    pairs = _pairs(spark, [(0, 3)])
    a = {
        (r.split, r.shard_id): r.content_fingerprint
        for r in curation_pipeline(docs, pairs).collect()
    }
    # recompute from a shuffled input partitioning: the manifest and its
    # XOR fingerprints are order/partitioning-independent
    b = {
        (r.split, r.shard_id): r.content_fingerprint
        for r in curation_pipeline(
            docs.repartition(7, F.col("source")), pairs
        ).collect()
    }
    assert a == b and len(a) > 0
