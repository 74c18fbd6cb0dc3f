"""Physical-plan invariants over the ENTIRE driver query surface.

Every queries() entry is planned (not executed) at sf0.001 and checked for
scale-killers: accidental cartesian products / nested-loop joins outside the
explicitly-quadratic verify kernels, and missing parquet filter pushdown
where a query filters a scanned table. This encodes the ".explain and
iterate" discipline as a regression gate, so a future edit that degrades a
plan fails loudly instead of silently shipping an O(n²) join.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Intentionally non-equi / all-pairs paths (documented verify kernels or
# broadcast-query scans where a nested-loop against a tiny broadcast side is
# the RIGHT plan):
ALLOWED_NESTED_LOOP = {
    "ann_topk",          # broadcast query set x corpus scan — exact baseline
    "ann_recall",        # recall harness embeds the exact baseline side
    "pq_recall",         # same: 8-query broadcast x corpus exact side
    "cosine_neardup",    # all-pairs verify kernel (docstring-scoped)
    "ngram_jaccard",     # blocked self-join uses non-equi len-band residual
    "surprisal_scores",  # 1-row corpus-total broadcast onto the vocabulary
    "bm25_topk",         # 1-row (n_docs, sum_dl) broadcast onto candidates
    "dsir_weights",      # 1-row smoothed-totals broadcast onto the stream
    "histogram_quantiles",  # |probs|-row (3) broadcast fan-out onto the sketch
    "dsir_select",       # same totals broadcast via dsir_weights
    "value_histogram",   # 1-row min/max bounds broadcast onto the scan
    "allpairs_tfidf",    # 1-row global-N broadcast onto the postings
    "key_skew_profile",  # 1-row grand-total broadcast onto the top-N frame
    "basket_pairs",      # 1-row n_baskets broadcast onto the pair frame
    "source_minhash",    # |sources|-row signature frame self-pairing
    "pmi_collocations",  # 1-row bigram-total broadcast onto the pair counts
    "ks_drift",          # |slices| x |value domain| CDF grid expansion —
                         # both sides aggregates, bounded by construction
    "decayed_activity",  # 1-row max-day anchor broadcast onto the scan
    "heavy_hitters",     # 1-row n_tokens total broadcast onto candidates
    "rrf_fusion",        # full-outer fuse of two LIMIT-bounded top-N rank
                         # lists (<= 2N rows total) — BNLJ is the right plan
    "doc_keywords",      # 1-row n_docs broadcast onto the df frame (idf)
    "mmr_diversify",     # pool is a LIMIT-bounded top-N per query
    "t_closeness",       # |classes| x |sensitive domain| grid — both sides
                         # aggregate outputs, bounded by construction
    "mutual_information",  # 1-row grand-total broadcast onto the cells
    "ams_f2",            # 1-row exact-F2 broadcast onto the 1-row sketch
    "rfm_segments",      # 1-row anchor-date broadcast onto the customers
    "survival_hazard",   # 1-row corpus-end-day broadcast onto the users
    "shape_profile",     # 1-row total broadcast onto the shape census
    "abc_classes",       # 1-row grand-total broadcast onto the item frame
                         # (replaced the r9 unpartitioned window — ADVICE)
    "theils_u",          # 1-row total + 1-row H(x) broadcasts onto the cells
    "source_xentropy",   # |sources|-row totals frame self-pairing (bounded
                         # by the source domain, like source_minhash)
}


@pytest.fixture(scope="module")
def jplans(spark, sf_dir):
    out = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan()
    return out


@pytest.fixture(scope="module")
def plans(jplans):
    return {name: jp.toString() for name, jp in jplans.items()}


def test_no_unbounded_single_partition_exchange(jplans, spark, sf_dir):
    """No query may force a table-proportional frame into one task (the r7
    blind spot: interleave_sources/pareto_front passed every other plan
    check while single-partitioning the whole corpus). Bounded
    SinglePartition frames (over aggregates / TakeOrdered / limits — the
    two-phase prefix-scan idiom) are allowed; table-sized ones are not."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import SP_WHITELIST, single_partition_audit

    # the detector must still catch the offending shape itself
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = docs.select(
        "doc_id", F.row_number().over(Window.orderBy("doc_id")).alias("pos")
    )
    _, unbounded = single_partition_audit(
        bad._jdf.queryExecution().executedPlan()
    )
    assert unbounded == 1, "detector lost the r7 offender shape"

    # r8 ADVICE false-negative class: a single-partition window over
    # join(full scan, broadcast AGGREGATED dim) — the HashAggregate lives
    # in the sibling broadcast branch, not on the scan path, so a
    # substring check passes it. The structural path walk must flag it.
    agg = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    bad2 = docs.join(F.broadcast(agg), "source").select(
        "doc_id", F.row_number().over(Window.orderBy("doc_id")).alias("pos")
    )
    _, unbounded2 = single_partition_audit(
        bad2._jdf.queryExecution().executedPlan()
    )
    assert unbounded2 == 1, "detector misses scan joined to broadcast agg"

    offenders = {}
    for name, jp in jplans.items():
        if name in SP_WHITELIST:
            continue
        _, unbounded = single_partition_audit(jp)
        if unbounded:
            offenders[name] = unbounded
    assert not offenders, (
        f"table-proportional SinglePartition exchange in: {offenders}"
    )


def test_no_accidental_cross_products(plans):
    bad = []
    for name, plan in plans.items():
        if name in ALLOWED_NESTED_LOOP:
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"unexpected cross/nested-loop join in: {bad}"


def test_filter_pushdown_reaches_scans(plans):
    # Queries with selective scan-level predicates must show PushedFilters.
    expect_pushdown = ["shipping_priority"]
    for name in expect_pushdown:
        plan = plans[name]
        assert "PushedFilters: [" in plan, name
        pushed = [
            ln for ln in plan.splitlines()
            if "PushedFilters" in ln and "PushedFilters: []" not in ln
        ]
        assert pushed, f"{name}: no non-empty PushedFilters in scan"


def test_column_pruning_on_wide_scans(plans):
    # topk_parts aggregates 4 lineitem columns — the scan must not read all 16.
    import re

    plan = plans["topk_parts"]
    scans = [
        re.search(r"FileScan parquet \[([^\]]*)\]", ln).group(1)
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "lineitem" in ln
    ]
    assert scans
    for cols in scans:
        names = [c for c in cols.split(",") if c.strip()]
        assert len(names) <= 4, f"lineitem scan reads too many columns: {cols}"
