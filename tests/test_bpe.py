"""BPE trainer + encoder: determinism, fold-vs-Python parity, round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.bpe import (
    _py_apply_merges,
    bpe_encode,
    train_bpe_merges,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_trainer_learns_most_frequent_pair_first(spark):
    docs = _docs(
        spark,
        [
            (1, "aaab aaab aaab"),
            (2, "abcd xyz"),
        ],
    )
    merges = train_bpe_merges(docs, n_merges=2)
    # 'aa' appears 2x per 'aaab' word x3 + ... -> (a, a) must win round 1
    assert merges[0] == ("a", "a")
    assert len(merges) == 2


def test_trainer_is_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    m1 = train_bpe_merges(docs, n_merges=5)
    m2 = train_bpe_merges(docs, n_merges=5)
    assert m1 == m2 and len(m1) == 5


def test_encoder_round_trip_and_compression(spark):
    docs = _docs(
        spark,
        [
            (1, "the theme theater thesis"),
            (2, "breathe lathe the the the"),
        ],
    )
    merges = train_bpe_merges(docs, n_merges=6)
    enc = bpe_encode(docs, merges).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in enc:
        # detokenization: concatenating subwords reproduces the words
        words = texts[r["doc_id"]].split()
        n_chars = sum(len(w) for w in words)
        assert "".join(r["tokens"]) == "".join(words)
        assert r["n_words"] == len(words)
        # merges compress: fewer tokens than characters
        assert r["n_tokens"] < n_chars
    # 'the' must have fused into a single token somewhere
    all_toks = {t for r in enc for t in r["tokens"]}
    assert "the" in all_toks


def test_spark_fold_matches_python_reference(spark):
    """The distributed trainer's fold-based merge application must agree
    with the sequential Python reference on every vocab word."""
    from faers_datalakehouse_spark.operators.bpe import _apply_merge, _chars

    words = ["banana", "bandana", "aaaa", "abab", "a", "xy"]
    merges = [("a", "n"), ("an", "a"), ("b", "an")]
    df = spark.createDataFrame([(w,) for w in words], ["word"]).withColumn(
        "toks", _chars(F.col("word"))
    )
    for a, b in merges:
        df = df.withColumn("toks", _apply_merge(F.col("toks"), a, b))
    got = {r["word"]: r["toks"] for r in df.collect()}
    for w in words:
        assert got[w] == _py_apply_merges(w, merges), w
