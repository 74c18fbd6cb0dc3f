"""Streaming near-dup curation sink: admits only novel documents,
equivalent to sequential batch application of the incremental probe."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from faers_datalakehouse_spark.sources.catalog import ensure_schemas
from faers_datalakehouse_spark.streaming.curation import (
    curate_batch,
    streaming_curation_sink,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_stream_scratch_dir_registers_exit_cleanup(monkeypatch):
    """Every streaming entry stages its landing zone / checkpoint / sink
    through stream_scratch_dir, which must register removal of the WHOLE
    tree at interpreter exit (ADVICE r7: the sessionize entry leaked one
    staged events.parquet copy per invocation)."""
    import atexit
    import os

    from faers_datalakehouse_spark.plans.showcase import stream_scratch_dir

    registered = []
    monkeypatch.setattr(
        atexit, "register", lambda fn, *a, **kw: registered.append((fn, a, kw))
    )
    root = stream_scratch_dir("spark_graft_test_scratch_")
    assert os.path.isdir(root)
    assert len(registered) == 1
    fn, a, kw = registered[0]
    fn(*a, **kw)  # the registered callable must remove the tree
    assert not os.path.exists(root)


BATCH_A = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely unrelated text about spark query engines and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1 IN-batch
]
BATCH_B = [
    (10, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of accepted 1
    (11, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near dup of 1
    (12, "fresh novel content with entirely different words and meaning here"),
]


def test_streaming_curation_admits_only_novel_docs(spark, tmp_path):
    ensure_schemas(spark)
    corpus, decisions = "gold.curated_corpus", "gold.curation_decisions"
    for t in (corpus, decisions):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    src = tmp_path / "doc_stream"
    src.mkdir()
    _docs(spark, BATCH_A).coalesce(1).write.parquet(str(src / "batch-a"))
    time.sleep(1.1)
    _docs(spark, BATCH_B).coalesce(1).write.parquet(str(src / "batch-b"))

    schema = _docs(spark, BATCH_A).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "batch-*"))
    )
    q = streaming_curation_sink(
        stream, corpus, decisions, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ids = sorted(r["doc_id"] for r in spark.table(corpus).collect())
    assert ids == [1, 2, 12]  # 3 in-batch dup; 10 exact; 11 near-dup

    d = {r["doc_id"]: r for r in spark.table(decisions).collect()}
    assert d[10]["dup_exact"] and not d[10]["keep"]
    assert d[11]["dup_near"] and not d[11]["keep"]
    assert d[12]["keep"]
    # in-batch exact dup gets an audit row too (dup_exact, dropped) —
    # the decisions log records WHY every doc vanished
    assert d[3]["dup_exact"] and not d[3]["keep"]


def test_curate_batch_equals_sequential_batches(spark, tmp_path):
    """The streaming sink's per-batch function applied twice equals two
    manual sequential applications (same engine, same outcome)."""
    ensure_schemas(spark)
    c1, d1 = "gold.cur_seq_corpus", "gold.cur_seq_dec"
    for t in (c1, d1):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    curate_batch(_docs(spark, BATCH_A), c1, d1, 0)
    curate_batch(_docs(spark, BATCH_B), c1, d1, 1)
    assert sorted(r["doc_id"] for r in spark.table(c1).collect()) == [1, 2, 12]


def test_curation_replay_keeps_corpus_duplicate_free(spark):
    ensure_schemas(spark)
    c, d = "gold.cur_replay_corpus", "gold.cur_replay_dec"
    for t in (c, d):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    curate_batch(_docs(spark, BATCH_A), c, d, 0)
    # at-least-once: the same micro-batch is delivered again
    curate_batch(_docs(spark, BATCH_A), c, d, 0)
    ids = [r["doc_id"] for r in spark.table(c).collect()]
    assert sorted(ids) == [1, 2]  # no duplicate admissions
