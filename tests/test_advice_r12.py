"""Regression tests for the four r11 ADVICE findings.

1. (medium) shared_lsh_pairs must unpersist the evicted candidate frame —
   Spark's CacheManager pins an InMemoryRelation until explicitly
   unpersisted, so clear() alone leaked executor storage on every
   (sf_dir, threshold) rotation.
2. (low) the scale probe must bypass the session-shared caches for their
   consumer ops so timed runs measure operator compute, not cached reads.
3. (low) scale_curve must record failed ops IN the artifact (and drop
   their stale rows) instead of only signalling via exit code.
4. (low) shared_bpe_merges holds several corpora (the merge table is a
   tiny driver-side list) so base/big-alternating sessions don't retrain
   on every dir flip; a FIFO cap bounds pathological many-dir sessions.
"""

from __future__ import annotations

import sys
from pathlib import Path

from faers_datalakehouse_spark.operators import bpe as bpe_mod
from faers_datalakehouse_spark.operators import dedup as dedup_mod

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import scale_curve  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


def test_shared_lsh_evict_unpersists(spark):
    dedup_mod.reset_shared_pairs()
    df1 = dedup_mod.shared_lsh_pairs(spark, SF0001, 0.4)
    assert df1.storageLevel.useMemory or df1.storageLevel.useDisk
    # rotating the key must unpersist the evicted frame, not just drop it
    df2 = dedup_mod.shared_lsh_pairs(spark, SF0001, 0.5)
    assert not (df1.storageLevel.useMemory or df1.storageLevel.useDisk)
    assert df2.storageLevel.useMemory or df2.storageLevel.useDisk
    dedup_mod.reset_shared_pairs()
    assert not (df2.storageLevel.useMemory or df2.storageLevel.useDisk)
    assert dedup_mod._SHARED_PAIRS == {}


def test_bpe_merges_survive_dir_alternation(spark, monkeypatch):
    bpe_mod.reset_shared_merges()
    calls = []

    def fake_train(docs, n_merges=10):
        calls.append(n_merges)
        return [("a", "b")] * n_merges

    monkeypatch.setattr(bpe_mod, "train_bpe_merges", fake_train)
    # the scale-probe pattern: base, base, big, big, back to base
    for sf_dir in (SF0001, SF0001, SF001, SF001, SF0001):
        bpe_mod.shared_bpe_merges(spark, sf_dir, n_merges=3)
    assert len(calls) == 2  # one training per corpus, no flip retrain
    bpe_mod.reset_shared_merges()


def test_bpe_merges_cap(spark, monkeypatch):
    bpe_mod.reset_shared_merges()
    monkeypatch.setattr(
        bpe_mod, "train_bpe_merges", lambda docs, n_merges=10: []
    )
    for n in range(1, bpe_mod._SHARED_MERGES_CAP + 3):
        bpe_mod.shared_bpe_merges(spark, SF0001, n_merges=n)
        assert len(bpe_mod._SHARED_MERGES) <= bpe_mod._SHARED_MERGES_CAP
    bpe_mod.reset_shared_merges()


def test_scale_probe_bypasses_shared_caches():
    # every shared-cache consumer entry is registered for cold-run resets
    assert scale_curve.SHARED_CACHE_OPS == {
        "minhash_lsh",
        "curation_pipeline",
        "neardup_clusters",
        "neardup_clusters_star",
        "dedup_keep_best",
        "bpe_merges",
        "bpe_encode",
        "bpe_fertility",
    }
    assert scale_curve.SHARED_CACHE_OPS <= set(scale_curve.OPS)
    # the reset hook clears both cache maps
    dedup_mod._SHARED_PAIRS["sentinel"] = None
    bpe_mod._SHARED_MERGES["sentinel"] = []
    scale_curve._reset_shared_caches()
    assert dedup_mod._SHARED_PAIRS == {}
    assert bpe_mod._SHARED_MERGES == {}


def test_build_artifact_records_failures():
    results = {
        "good": {"t_base_sec": 1.0},
        "stale_failed": {"t_base_sec": 9.9},
    }
    out = scale_curve.build_artifact(results, ["stale_failed"], 5, 3)
    assert out["failed"] == ["stale_failed"]
    assert "stale_failed" not in out["ops"]  # stale row dropped
    assert out["ops"]["good"] == {"t_base_sec": 1.0}
    # a clean run records an (empty) failed list, so consumers can rely
    # on the key's presence
    assert scale_curve.build_artifact({}, [], 5, 3)["failed"] == []
