"""Corpus search (inverted index, BM25) and DSIR importance weighting."""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.dsir import dsir_weights
from faers_datalakehouse_spark.operators.ranking import bm25_topk, inverted_index


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_inverted_index_postings_and_stopword_pruning(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "alpha beta common"),
            (2, "en", "beta gamma common"),
            (3, "en", "alpha gamma common"),
        ],
    )
    idx = {r["word"]: r for r in inverted_index(docs, max_df=2).collect()}
    assert "common" not in idx  # df=3 > max_df
    assert idx["alpha"]["df"] == 2 and idx["alpha"]["postings"] == [1, 3]
    assert idx["beta"]["postings"] == [1, 2]
    assert idx["gamma"]["postings"] == [2, 3]


def test_bm25_ranks_term_rich_docs_first(spark):
    docs = _docs(
        spark,
        [
            # doc 1: both query terms, short -> top
            (1, "en", "spark query spark query"),
            # doc 2: one query term, diluted by length
            (2, "en", "spark filler filler filler filler filler filler"),
            # doc 3: no query terms -> not a candidate
            (3, "en", "unrelated words only here"),
            # doc 4: one query term, short
            (4, "en", "query words"),
        ],
    )
    out = bm25_topk(docs, ["spark", "query"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids
    assert ids[0] == 1  # hits both terms, highest density
    hits = {r["doc_id"]: r["n_terms_hit"] for r in out}
    assert hits[1] == 2 and hits[2] == 1 and hits[4] == 1
    # scores are exact integers (milli-scaled) — rerun must be identical
    again = bm25_topk(docs, ["spark", "query"], k=10).collect()
    assert out == again


def test_dsir_upweights_target_like_documents(spark):
    # target distribution = 'en' docs about cats; raw adds dog docs
    docs = _docs(
        spark,
        [
            (1, "en", "cat cat feline cat"),
            (2, "en", "cat feline whiskers"),
            (3, "xx", "dog canine dog dog"),
            (4, "xx", "dog canine bark"),
            (5, "xx", "cat feline cat cat"),  # target-like but raw-only lang
        ],
    )
    target = docs.filter(F.col("lang") == "en")
    rows = dsir_weights(docs, target, n_buckets=64).collect()
    w = {r["doc_id"]: r["avg_weight_bits"] for r in rows}
    # every raw doc is scored
    assert set(w) == {1, 2, 3, 4, 5}
    # per-token averages: cat-vocabulary docs must outweigh dog-vocabulary
    # docs (doc 5 has cat text despite its raw-only lang tag)
    assert w[5] > w[3] and w[5] > w[4]
    assert w[1] > w[3] and w[2] > w[4]


def test_dsir_output_is_deterministic_and_integer(spark):
    docs = _docs(
        spark,
        [(i, "en" if i % 2 else "xx", f"token{i % 3} token{i % 5} filler") for i in range(1, 21)],
    )
    target = docs.filter(F.col("lang") == "en")
    a = dsir_weights(docs, target).collect()
    b = dsir_weights(docs, target).collect()
    assert a == b
    assert all(isinstance(r["weight_bits"], int) for r in a)
