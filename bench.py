"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query executes to completion with a count-style action (write-less but
full-plan: aggregates collect, wide facts are counted) after a warm-up of the
session itself. Per-query time is the MEDIAN of $SPARK_GRAFT_BENCH_RUNS
(default 3) runs — a single run is dominated by JIT/occupancy noise; medians
make round-over-round comparison meaningful. The reported total is the sum of
medians; per-query spread (max-min) is included for variance visibility.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from faers_datalakehouse_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# 3 runs, matching the round-2 anchor's measurement conditions. This sandbox
# is CPU-throttled by its host under *sustained* load (intermittent 3-10x
# wall spikes; stalled tasks show cpu << elapsed with idle cores and zero GC
# — classic steal; see PERF.md round-4 notes), so MORE runs per query
# lengthens the sustained-load window and makes medians worse, not better.
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Headline set: the operator families that dominate 100 TB workloads.
# Collect small results; count wide ones (avoids driver-side transfer noise).
BENCH_QUERIES = {
    "q1_pricing_summary": ("collect", "pricing_summary"),
    "q2_topk_parts": ("collect", "topk_parts"),
    "q3_fact_sales": ("count", "fact_sales"),
    "q4_date_dim": ("count", "date_dim"),
    "q5_scd2_merge": ("count", "scd2_merge"),
    "q6_sessionize": ("count", "sessionize"),
    "q7_dedup_exact": ("count", "dedup_exact"),
    "q8_minhash_lsh": ("count", "minhash_lsh"),
    "q9_ann_topk": ("count", "ann_topk"),
    "q10_text_quality": ("count", "text_quality"),
    "q11_shipping_priority": ("collect", "shipping_priority"),
    "q12_asof_join": ("count", "asof_join"),
    "q13_lsh_neardup": ("count", "lsh_neardup"),
    "q14_corpus_curation": ("collect", "corpus_curation"),
    "q15_range_join": ("count", "range_join"),
    # Round-3 additions: the LLM-pipeline operators a 100 TB curation run
    # spends its time in (iterative clustering, semantic near-dup,
    # benchmark decontamination, substring dedup, classifier inference,
    # vocab induction). Keys q1-q15 are unchanged for round-over-round
    # comparison; the suite total is NOT comparable to rounds 1-2.
    "q16_kmeans": ("count", "kmeans_clusters"),
    "q17_semantic_neardup": ("count", "semantic_neardup"),
    "q18_contamination": ("count", "contamination_check"),
    "q19_dup_spans": ("count", "dup_spans"),
    "q20_quality_classifier": ("count", "quality_classifier"),
    "q21_vocab_stats": ("count", "vocab_stats"),
    # Round-4 additions: sequence packing (window prefix-sums + shard
    # assignment), unigram-LM surprisal (token explode + vocab broadcast),
    # and the sequential conversion funnel (stacked window-mins).
    "q22_pack_sequences": ("count", "pack_sequences"),
    "q23_surprisal": ("count", "surprisal_scores"),
    "q24_funnel": ("collect", "funnel_steps"),
}


def _run_once(spark, queries, key: str, action: str) -> float:
    fn = queries[key]
    t0 = time.time()
    df = fn(spark, SF_DIR)
    if action == "collect":
        df.collect()
    else:
        df.count()
    elapsed = time.time() - t0
    # Operators that persist intermediates (MinHash's shingle frame) would
    # otherwise re-register the same plan against a warming/evicting cache on
    # every run — the q8 run-to-run spread in round 2 was cache churn, not
    # plan noise. Clearing makes every run measure the operator cold.
    spark.catalog.clearCache()
    return elapsed


def main() -> None:
    spark = get_spark("bench")
    queries = entrymod.queries()
    # Warm-up: JIT the common codepaths (parquet scan, hash join, hash agg,
    # exchange) so per-query numbers reflect steady state, not first-call
    # JVM compilation.
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    region = spark.read.parquet(f"{SF_DIR}/region.parquet")
    (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("n_name").alias("d"))
        .orderBy("r_name")
        .collect()
    )

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    for label, (action, key) in BENCH_QUERIES.items():
        # One untimed warm-up per query: the first execution of a plan pays
        # whole-stage-codegen compilation + JIT (seconds for the widest
        # generated code, e.g. 64 MinHash permutation expressions) that a
        # steady-state measurement shouldn't include. Data cache is cleared
        # inside _run_once, so only code warmth carries over.
        _run_once(spark, queries, key, action)
        runs = [_run_once(spark, queries, key, action) for _ in range(N_RUNS)]
        med = statistics.median(runs)
        timings[label] = round(med, 3)
        spread[label] = round(max(runs) - min(runs), 3)
        total += med

    m = re.search(r"sf([0-9.]+)/?$", SF_DIR)
    sf = float(m.group(1)) if m else 0.0
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs_per_query": N_RUNS,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
