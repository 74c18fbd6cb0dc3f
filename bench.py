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
import subprocess
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
    # Round-5 additions: corpus search (inverted-index stats + integer
    # BM25), DSIR selection, winnowing fingerprints, bigram conditional
    # surprisal, and time-series gap fill. Keys q1-q24 unchanged for
    # round-over-round comparison.
    "q25_bm25_topk": ("collect", "bm25_topk"),
    "q26_dsir_select": ("collect", "dsir_select"),
    "q27_winnowing": ("count", "winnowing_fingerprints"),
    "q28_bigram_surprisal": ("count", "bigram_surprisal"),
    "q29_gap_fill": ("count", "gap_fill_daily"),
    "q30_pagerank": ("count", "pagerank"),
    "q31_attribution": ("collect", "attribution"),
    "q32_histogram": ("collect", "value_histogram"),
    # Round-5 late additions: lakehouse change feed + incremental view
    # maintenance, deterministic sketches, bloom semi-join reduction.
    # These are write-inclusive (the versioned/matview entries commit
    # real snapshots under /tmp), so they measure the maintenance path,
    # not just a read. Keys q1-q32 unchanged; q33/q34 left unused so no
    # number is ever reused across recorded artifacts.
    "q35_versioned_cdf": ("count", "versioned_changes"),
    "q36_incremental_matview": ("collect", "incremental_matview"),
    "q37_hll_registers": ("count", "hll_registers"),
    "q38_bloom_prefilter": ("collect", "bloom_prefilter"),
    # Round-7 additions: triangle counting (degree-ordered orientation —
    # the bounded-wedge join), the distributed exact prefix-sum sampler,
    # and the one-scan expectations audit. Keys q1-q38 unchanged.
    "q39_triangles": ("count", "triangle_counts"),
    "q40_systematic_sample": ("count", "systematic_sample"),
    "q41_expectations_audit": ("collect", "expectations_audit"),
    "q42_snm_neardup": ("count", "snm_neardup"),
    "q43_allpairs_tfidf": ("count", "allpairs_tfidf"),
    "q44_pq_encode": ("count", "pq_encode"),
    # Round-7 late: partitioned versioned table (partitionBy write +
    # dynamic partition overwrite + three manifest-pruned reads) —
    # write-inclusive like q35.
    "q45_versioned_partition": ("count", "versioned_partition_ops"),
    # Round-7 batch 2: entity resolution, sketch quantiles, privacy,
    # mixing, and the three new windowed analytics. Keys stable.
    "q46_levenshtein": ("count", "levenshtein_pairs"),
    "q47_hist_quantiles": ("collect", "histogram_quantiles"),
    "q48_k_anonymity": ("count", "k_anonymity_audit"),
    "q49_interleave": ("count", "interleave_sources"),
    "q50_anomaly_days": ("count", "anomaly_days"),
    "q51_pareto_front": ("collect", "pareto_front"),
    "q52_ewma": ("count", "ewma_daily"),
    "q53_comoment": ("collect", "comoment_matrix"),
    "q54_mor_delete": ("count", "versioned_mor_delete"),
    # Round-7 batch 3: graph reachability, market-basket mining, and the
    # full-outer snapshot reconciliation diff. Keys stable.
    "q55_bfs": ("count", "bfs_distances"),
    "q56_basket_pairs": ("collect", "basket_pairs"),
    "q57_table_diff": ("collect", "table_diff"),
    # Round-7 batch 4: grid-bucketed spatial join, bitmap exact
    # distinct, distributed global ntile, FK orphan audit, and the
    # Python DataSource pushdown roundtrip (write-inclusive like q35).
    "q58_spatial_join": ("count", "spatial_radius_join"),
    "q59_bitmap_distinct": ("collect", "bitmap_distinct"),
    "q60_quantile_binning": ("collect", "quantile_binning"),
    "q61_referential_audit": ("collect", "referential_audit"),
    "q62_pyds_roundtrip": ("count", "pyds_pushdown_read"),
    # Round-7 batch 5: interval-overlap join, rolling-distinct fan-out,
    # nucleus filter, OOF target encoding, priority sampling, group OLS.
    # (streaming_join is driver-gated but excluded here like the other
    # streaming entries: fixed stream-startup overhead dominates at sf0.1
    # and would measure the harness, not the operator.)
    "q63_interval_overlap": ("count", "interval_overlap"),
    "q64_rolling_distinct": ("collect", "rolling_distinct"),
    "q65_top_p_sources": ("count", "top_p_sources"),
    "q66_target_encode": ("collect", "target_encode"),
    "q67_priority_sample": ("collect", "priority_sample"),
    "q68_group_ols": ("collect", "group_ols_trend"),
    "q69_source_overlap": ("collect", "source_overlap"),
    "q70_asof_nearest": ("count", "asof_nearest"),
    # Round-7 batch 6: sequence funnel, sketch similarity, partition
    # evolution (write-inclusive like q45), irregular-sample bars.
    "q71_seq_match": ("count", "seq_match"),
    "q72_source_minhash": ("collect", "source_minhash"),
    "q73_versioned_evolve": ("count", "versioned_evolve"),
    "q74_twap": ("collect", "twap_daily"),
    "q75_ohlc": ("collect", "ohlc_bars"),
    # Round-7 batch 7: time-bounded funnel, log-odds keywords, rolling
    # sketches, temporal SCD2 enrichment, weighted quantiles, and the
    # sequenced CDC apply (write-inclusive like q45/q73).
    "q76_window_funnel": ("count", "window_funnel"),
    "q77_distinctive_terms": ("collect", "distinctive_terms"),
    "q78_rolling_hll": ("count", "rolling_hll"),
    "q79_scd2_event_enrich": ("collect", "scd2_event_enrich"),
    "q80_weighted_quantiles": ("collect", "weighted_quantiles"),
    "q81_cdc_apply_seq": ("count", "cdc_apply_seq"),
    "q82_incr_sessionize": ("count", "incremental_sessionize"),
    # Round-8 additions: collocation mining, exact stratified split,
    # vocab OOV audit, CUSUM changepoints, fingerprint containment,
    # winsorized robust stats, and the two Spark-4 SQL surfaces
    # (recursive CTE, pipe syntax). Keys q1-q82 unchanged.
    "q83_pmi_collocations": ("collect", "pmi_collocations"),
    "q84_proportional_split": ("count", "proportional_split"),
    "q85_vocab_coverage": ("collect", "vocab_coverage"),
    "q86_cusum": ("count", "cusum_changepoint"),
    "q87_fp_containment": ("count", "fingerprint_containment"),
    "q88_winsorized": ("collect", "winsorized_stats"),
    "q89_recursive_reach": ("collect", "recursive_cte_reach"),
    "q90_pipe_trend": ("collect", "pipe_syntax_trend"),
    "q91_sssp": ("count", "sssp_weighted"),
    "q92_ks_drift": ("collect", "ks_drift"),
    "q93_kcenter": ("collect", "kcenter_coreset"),
    "q94_minhash_est": ("collect", "minhash_est_error"),
    # round-9 entries
    "q95_bpe_merges": ("collect", "bpe_merges"),
    "q96_embedding_qc": ("collect", "embedding_qc"),
    # collect, not count: a count() over these groupBys lets Catalyst
    # prune the scoring aggregates and with them the operator's cost
    # (the round-7 source_minhash probe lesson); outputs are small
    "q97_decayed_activity": ("collect", "decayed_activity"),
    "q98_ngram_novelty": ("collect", "ngram_novelty"),
    "q99_linear_interp": ("collect", "linear_interpolate"),
    # collect: count() of a pure projection prunes the struct-max entirely
    "q100_rendezvous": ("collect", "rendezvous_shards"),
    "q101_benford": ("collect", "benford_audit"),
    "q102_gini": ("collect", "gini_segment"),
    "q103_rrf_fusion": ("collect", "rrf_fusion"),
    "q104_source_entropy": ("collect", "source_entropy"),
    "q105_cdc_dedup": ("count", "cdc_dedup"),
    "q106_temperature_mix": ("collect", "temperature_mix"),
    "q107_pct_normalize": ("count", "percentile_normalize"),
    "q108_kcore": ("collect", "kcore_nodes"),
    "q109_heavy_hitters": ("collect", "heavy_hitters"),
    "q110_clustering_coeff": ("collect", "clustering_coeff"),
    "q111_ra_linkpred": ("count", "ra_linkpred"),
    "q112_l_diversity": ("collect", "l_diversity"),
    "q113_spearman": ("collect", "spearman_corr"),
    "q114_kmv_distinct": ("collect", "kmv_distinct"),
    "q115_feature_hash": ("collect", "feature_hash"),
    "q116_holt_smooth": ("collect", "holt_smooth"),
    "q117_lateral_topk": ("collect", "lateral_topk"),
    "q118_doc_keywords": ("count", "doc_keywords"),
    "q119_mmr_diversify": ("collect", "mmr_diversify"),
    "q120_mann_whitney": ("collect", "mann_whitney"),
    "q121_welch_ttest": ("collect", "welch_ttest"),
    "q122_max_drawdown": ("collect", "max_drawdown"),
    "q123_seasonal": ("collect", "seasonal_decompose"),
    "q124_t_closeness": ("collect", "t_closeness"),
    "q125_mutual_info": ("collect", "mutual_information"),
    "q126_ams_f2": ("collect", "ams_f2"),
    "q127_theil_sen": ("collect", "theil_sen"),
    "q128_rfm": ("collect", "rfm_segments"),
    "q129_subsample_ci": ("collect", "subsample_ci"),
    "q130_neyman": ("collect", "neyman_allocation"),
    "q131_burstiness": ("collect", "burstiness"),
    "q132_interarrival": ("collect", "interarrival"),
    "q133_abc": ("collect", "abc_classes"),
    "q134_survival": ("collect", "survival_hazard"),
    "q135_shape_profile": ("collect", "shape_profile"),
    "q136_odds_ratio": ("collect", "odds_ratio"),
    "q137_runs_test": ("collect", "runs_test"),
    "q138_hodges_lehmann": ("collect", "hodges_lehmann"),
    "q139_kruskal_wallis": ("collect", "kruskal_wallis"),
    "q140_kendall_tau": ("collect", "kendall_tau"),
    "q141_theils_u": ("collect", "theils_u"),
    "q142_source_xentropy": ("collect", "source_xentropy"),
    "q143_zipf_slope": ("collect", "zipf_slope"),
    "q144_peak_concurrency": ("collect", "peak_concurrency"),
    "q145_cochran_armitage": ("collect", "cochran_armitage"),
    "q146_brown_forsythe": ("collect", "brown_forsythe"),
    "q147_gumbel_fit": ("collect", "gumbel_fit"),
    "q148_record_days": ("collect", "record_days"),
    "q149_cond_entropy": ("collect", "cond_entropy_rate"),
    "q150_phi_coefficient": ("collect", "phi_coefficient"),
    "q151_ljung_box": ("collect", "ljung_box"),
    "q152_adf_test": ("collect", "adf_test"),
    "q153_perm_entropy": ("collect", "permutation_entropy"),
    "q154_dedup_keep_best": ("collect", "dedup_keep_best"),
    "q155_pii_density": ("collect", "pii_density"),
    "q156_water_filling": ("collect", "water_filling"),
    "q157_bpe_fertility": ("collect", "bpe_fertility"),
    "q158_anova_f": ("collect", "anova_f"),
    "q159_wilcoxon_sr": ("collect", "wilcoxon_signed_rank"),
    "q160_cox_stuart": ("collect", "cox_stuart"),
    "q161_mcnemar": ("collect", "mcnemar_switching"),
    "q162_jonckheere": ("collect", "jonckheere_trend"),
    "q163_cvm_drift": ("collect", "cvm_drift"),
    "q164_friedman": ("collect", "friedman_test"),
    "q165_binseg": ("collect", "binseg_changepoint"),
    "q166_hhi": ("collect", "hhi_concentration"),
    "q167_readability": ("collect", "readability_fk"),
    "q168_curation_pipeline": ("collect", "curation_pipeline"),
}


def _proc_stat() -> tuple[int, int]:
    """(steal_ticks, busy_ticks) from the aggregate cpu line of /proc/stat.

    Fields: user nice system idle iowait irq softirq steal guest guest_nice.
    Steal is time the hypervisor ran someone else while this VM was runnable
    — the direct signature of the burstable-credit throttling documented in
    PERF.md. Recording the per-query delta makes a throttled measurement
    machine-detectable inside the bench artifact itself.
    """
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
        return steal, busy
    except (OSError, ValueError, IndexError):
        return 0, 0


def _run_once(spark, queries, key: str, action: str) -> tuple[float, int, int]:
    fn = queries[key]
    steal0, busy0 = _proc_stat()
    t0 = time.time()
    df = fn(spark, SF_DIR)
    if action == "collect":
        df.collect()
    else:
        df.count()
    elapsed = time.time() - t0
    steal1, busy1 = _proc_stat()
    # Operators that persist intermediates (MinHash's shingle frame) would
    # otherwise re-register the same plan against a warming/evicting cache on
    # every run — the q8 run-to-run spread in round 2 was cache churn, not
    # plan noise. Clearing makes every run measure the operator cold.
    spark.catalog.clearCache()
    return elapsed, steal1 - steal0, busy1 - busy0


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
    best: dict[str, float] = {}
    steal: dict[str, int] = {}
    run_detail: dict[str, list[float]] = {}
    cores_used: dict[str, list[float]] = {}
    total = 0.0
    for label, (action, key) in BENCH_QUERIES.items():
        # One untimed warm-up per query: the first execution of a plan pays
        # whole-stage-codegen compilation + JIT (seconds for the widest
        # generated code, e.g. 64 MinHash permutation expressions) that a
        # steady-state measurement shouldn't include. Data cache is cleared
        # inside _run_once, so only code warmth carries over.
        _run_once(spark, queries, key, action)
        results = [_run_once(spark, queries, key, action) for _ in range(N_RUNS)]
        runs = [r[0] for r in results]
        # Adaptive outlier defense: the sandbox host intermittently stalls
        # one run 2-4x (PERF.md: steal/burstable-credit behavior). If the
        # spread exceeds the median itself (and 1 s), the sample is
        # contaminated — take 2 more runs so the median is over 5 and a
        # single stalled run can no longer drag it.
        if max(runs) - min(runs) > max(1.0, statistics.median(runs)):
            extra = [_run_once(spark, queries, key, action) for _ in range(2)]
            results += extra
            runs += [r[0] for r in extra]
        med = statistics.median(runs)
        timings[label] = round(med, 3)
        spread[label] = round(max(runs) - min(runs), 3)
        # min is the throttle-insensitive statistic: host steal only ever
        # ADDS wall time, so the fastest run is the closest observable to the
        # unthrottled cost of the plan.
        best[label] = round(min(runs), 3)
        # steal ticks (USER_HZ=100/s, whole machine) accumulated during the
        # MEDIAN-adjacent runs; >~100 ticks during a 1 s query means the
        # host was running someone else and the median is contaminated.
        steal[label] = sum(r[1] for r in results)
        run_detail[label] = [round(r, 3) for r in runs]
        # Effective cores per run: machine-wide busy ticks (USER_HZ=100)
        # over wall time. These queries are CPU-bound on local[32]; a run
        # whose wall time doubles while effective cores COLLAPSE is the
        # host throttling this VM (the credits show neither in steal nor
        # cgroup counters here), whereas honest slowness keeps cores high.
        cores_used[label] = [
            round((r[2] / 100.0) / r[0], 1) if r[0] > 0 else 0.0
            for r in results
        ]
        total += med

    m = re.search(r"sf([0-9.]+)/?$", SF_DIR)
    sf = float(m.group(1)) if m else 0.0
    # measured-at provenance: which commit this number is evidence about.
    # File mtimes lie in CI (actions/checkout stamps everything with
    # checkout time), so the freshness gate reads these fields instead.
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=Path(__file__).resolve().parent,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "status", "--porcelain", "--untracked-files=no"],
                cwd=Path(__file__).resolve().parent,
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()
        )
    except (OSError, subprocess.CalledProcessError):
        head, dirty = None, None
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "measured_at_commit": head,
                "measured_at_dirty": dirty,
                "queries": timings,
                "spread": spread,
                "best": best,
                "steal_ticks": steal,
                "runs": run_detail,
                "cores_used": cores_used,
                "runs_per_query": N_RUNS,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
