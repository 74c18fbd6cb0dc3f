"""Scale-curve probe for the dedup/similarity stack: measure wall time at
sf0.1 vs a generated 5x corpus and report the scaling exponent per
operator (exponent = log(t_5x/t_1x)/log(5); ~1.0 = linear).

The 5x corpus is sf0.1's documents/embeddings replicated 5 times with
**re-keyed ids and per-copy perturbation** — text copies get a distinct
prefix (shifts every shingle) and embedding copies get a cyclic rotation
(preserves norms, decorrelates cross-copy cosines). Perturbation matters:
verbatim duplication would multiply the corpus 5x but the near-duplicate
PAIR count ~25x for the duplicated groups, turning a linearity probe into
a join-output-size test. With perturbation the duplicate-rate stays
constant, so a linear operator should land near exponent 1.0.

Timing is MIN of N runs — the throttle-insensitive statistic on this
sandbox (PERF.md round 5: the host adds wall time intermittently; it
never subtracts).

Usage: python tools/scale_curve.py [--runs N] [--factor K]
Writes SCALE_CURVE.json to the repo root.
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from faers_datalakehouse_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OPS = [
    "minhash_lsh",
    "neardup_clusters_star",
    "semantic_neardup",
    "dup_spans",
    # round-5 batch-3 operators: each is linear by plan shape (groupBy
    # with map-side combine / scan-stage filter / file-diff-proportional
    # read) — the curve is the measured check on that claim
    "hll_registers",
    "bloom_prefilter",
    "incremental_matview",
    "versioned_changes",
    # round-7 operators: triangle counting (wedge join must stay bounded
    # — the generator shifts supplier/customer keys per copy so the graph
    # grows as disjoint copies, triangles 5x, instead of collapsing into
    # 5x multi-edges over the same nodes), bigram surprisal (tokenize +
    # two vocab-keyed shuffles), the prefix-sum sampler (bucketed scan,
    # no global window), and the one-scan expectations audit
    "triangle_counts",
    "bigram_surprisal",
    "systematic_sample",
    "expectations_audit",
    # round-7 session-2 operators: entity resolution (value-domain
    # candidate set is quadratic-in-vocab within length bands — the row
    # domain collapse stays linear; the generator grows the NAME vocab
    # x factor so the probe stresses both), the mergeable histogram
    # sketch, the k-anonymity census, the three windowed analytics, PQ
    # encode (train + one-projection codes), and the merge-on-read
    # delete (build + tombstone commit + filtered read)
    "levenshtein_pairs",
    "histogram_quantiles",
    "k_anonymity_audit",
    "anomaly_days",
    "pareto_front",
    "ewma_daily",
    "pq_encode",
    "versioned_mor_delete",
    # round-7 session-4 operators: interval-overlap join (grid-cell
    # replication, broadcast calendar), rolling-distinct fan-out (xW
    # explode + two-phase distinct), top-p (bucket histogram + boundary
    # window), source overlap (vocab-sized set aggregation), OOF target
    # encoding (category x fold frame), priority sampling (TakeOrdered),
    # per-group OLS (day-spine moments), nearest as-of (keyed window)
    "interval_overlap",
    "rolling_distinct",
    "top_p_sources",
    "source_overlap",
    "target_encode",
    "priority_sample",
    "group_ols_trend",
    "asof_nearest",
    # round-7 session-4 late: sequence funnels (keyed min-joins /
    # forward as-of chains), irregular-sample bars, source-pair sketch,
    # and the log-odds keyword ranking (vocab-bounded windows)
    "seq_match",
    "window_funnel",
    "ohlc_bars",
    "twap_daily",
    "source_minhash",
    "distinctive_terms",
    # round-8 operators: collocation mining (bigram/unigram count
    # shuffles + vocab joins), fingerprint containment (df-capped
    # fingerprint equi-join), exact stratified split (keyed windows),
    # vocab OOV audit (bounded vocab broadcast), CUSUM (keyed windows
    # over day series), winsorize (keyed window + bounds broadcast),
    # KS drift (grid-bounded CDF windows). The documents generator
    # perturbs text per copy, so fingerprint/bigram vocab grows with
    # the corpus and the probes stress real growth.
    "pmi_collocations",
    "fingerprint_containment",
    "proportional_split",
    "vocab_coverage",
    "cusum_changepoint",
    "winsorized_stats",
    "ks_drift",
    # round-9: the ITERATIVE family (VERDICT r8 item 4) — per-round cost
    # is one keyed join/groupBy (bfs, sssp) or one corpus projection +
    # TakeOrdered (kcenter), with a FIXED round count, so the curve
    # should be ~linear; recursive_cte_reach's recursion runs over a
    # nation-domain-bounded edge list (<= 50 rows at ANY corpus scale),
    # so its exponent isolates the UnionLoop fixed cost + the linear
    # edge-derivation join — confirming round count, not data volume,
    # drives these ops (the PERF.md UnionLoop analysis, now measured)
    "bfs_distances",
    "sssp_weighted",
    "recursive_cte_reach",
    "kcenter_coreset",
    # round-9 session-2 operators: the two-phase prefix-rank pair (gini,
    # percentile-normalize — the probe checks the bucketed rank stays
    # linear where a per-group global window would serialize), CDC
    # chunking (per-doc windows + chunk-table groupBys), source entropy
    # and the temperature mix (tokenize + vocab-keyed aggregates), and
    # the CDC-adjacent RRF fusion is excluded (top-N bounded by
    # construction — nothing to scale)
    "gini_segment",
    "percentile_normalize",
    "cdc_dedup",
    "source_entropy",
    "temperature_mix",
    # k-core joins the iterative family: fixed rounds, per-round one
    # degree groupBy + two keyed joins — linear by shape
    "kcore_nodes",
    # heavy hitters: pass 1 is a map-side Arrow MG fold (no shuffle),
    # pass 2 shuffles only candidate-matching tokens — linear by shape
    "heavy_hitters",
    # round-9 session-3 operators: all single-aggregate or
    # aggregate-then-bounded-frame shapes, so each should sit at ~1.0 —
    # mann_whitney's prefix window runs over per-(group,value) rows
    # (value domain is bounded, so the window frame stays ~constant as
    # rows grow); max_drawdown's two windows partition by user (users
    # grow 5x, per-user series constant); rfm's bucketed ranks are the
    # two-phase scan; ams/subsample/welch/t_closeness/MI/neyman are one
    # map-side aggregate each; theil_sen/seasonal run on the day grain
    # (constant frame, linear collapse)
    "mann_whitney",
    "welch_ttest",
    "max_drawdown",
    "seasonal_decompose",
    "t_closeness",
    "mutual_information",
    "ams_f2",
    "theil_sen",
    "rfm_segments",
    "subsample_ci",
    "neyman_allocation",
    # late session-3: exact bucketed cumsum census, survival table,
    # shape census, 2x2 odds — aggregate/bounded-frame shapes
    "abc_classes",
    "survival_hazard",
    "shape_profile",
    "odds_ratio",
    # --- round-10 extension (VERDICT r9 item 3: push the curve past
    # 100 ops; ANSI mode doubles it as an int64-overflow detector) ---
    # shuffle-heavy text/retrieval shapes named in the brief
    "allpairs_tfidf",
    "pq_topk",
    "bm25_topk",
    "inverted_index",
    "doc_keywords",
    # corpus text scans (tokenize-dominated, should be ~1.0)
    "token_count",
    "text_quality",
    "lang_id",
    "chunk_documents",
    # dedup family originals not yet on the curve
    "dedup_exact",
    "fingerprint_dedup",
    "simhash_neardup",
    "snm_neardup",
    "ngram_jaccard",
    "winnowing_fingerprints",
    "minhash_est_error",
    # ANN / embedding kernels
    "ann_lsh_topk",
    "ann_ivf_topk_nprobe2",
    "kmeans_clusters",
    "embedding_qc",
    # event-stream shapes: keyed sessionization windows, path mining,
    # retention cohort joins
    "sessionize",
    "sessionize_skew",
    "markov_transitions",
    "top_event_paths",
    "cohort_retention",
    "funnel_steps",
    # integer-micro statistics (the r10 overflow-audit targets — the 5x
    # ANSI run is the overflow detector for exactly these)
    "crosstab_chi2",
    "lag_autocorr",
    "spearman_corr",
    "comoment_matrix",
    "burstiness",
    "interarrival",
    "runs_test",
    "hodges_lehmann",
    "benford_audit",
    # relational agg/join shapes
    "pricing_summary",
    "quantiles_by_group",
    "weighted_quantiles",
    "salted_join",
    "range_join",
    # sketch family
    "kmv_distinct",
    "hll_by_group",
    "cms_counts",
    "bitmap_distinct",
    # round-10 operators: the concurrency sweep line (two-phase
    # bucketed prefix over boundary deltas), the cross-source
    # divergence pair (vocab-keyed joins), and the new rank/trend
    # statistics (per-value aggregates + bounded windows)
    "peak_concurrency",
    "source_xentropy",
    "zipf_slope",
    "kruskal_wallis",
    "kendall_tau",
    "theils_u",
    "cochran_armitage",
    "brown_forsythe",
    "gumbel_fit",
    "record_days",
    "cond_entropy_rate",
    "phi_coefficient",
    "ljung_box",
    "adf_test",
    "permutation_entropy",
    "dedup_keep_best",
    "pii_density",
    "water_filling",
    "bpe_fertility",
    # round-11 operators: paired/ordered/blocked statistics, the
    # changepoint locator, and the corpus concentration/readability
    # screens (per-value aggregates + calendar-bounded windows)
    "anova_f",
    "wilcoxon_signed_rank",
    "cox_stuart",
    "mcnemar_switching",
    "jonckheere_trend",
    "cvm_drift",
    "friedman_test",
    "binseg_changepoint",
    # round-11 tail: the final unmeasured cohort — every map entry is
    # now on the curve (UDTF/pandas-API/datasource micro-surfaces, the
    # documented-quadratic cosine verify kernel, encode/standardize
    # projections, and the remaining joins/aggregates).
    "ab_test",
    "attribution",
    "basket_pairs",
    "bpe_encode",
    "bpe_merges",
    "bpe_pair_counts",
    "bucketed_join",
    "categorical_encode",
    "cogroup_reconcile",
    "cosine_neardup",
    "customer_retention_setops",
    "date_dim",
    "date_standardize",
    "decode_ladders",
    "distinct_profile",
    "dsir_select",
    "dsir_weights",
    "feature_hash",
    "hll_set_algebra",
    "incremental_dedup",
    "interleave_sources",
    "json_extract_agg",
    "k_suppress",
    "key_skew_profile",
    "l_diversity",
    "latest_day_activity",
    "linkage_scores",
    "mad_outliers",
    "multimodal_decode",
    "neardup_clusters",
    "ngram_novelty",
    "numeric_standardize",
    "observed_quality",
    "pandas_api",
    "pct_of_total",
    "pq_recall",
    "prefix_filter_pairs",
    "profile_columns",
    "pyds_pushdown_read",
    "pyds_stream_tail",
    "pyds_write_read",
    "quantile_binning",
    "quarantine_rows",
    "referential_audit",
    "regional_volume",
    "rendezvous_shards",
    "rrf_fusion",
    "shipping_priority",
    "spatial_radius_join",
    "split_assign",
    "sql_scripting",
    "sql_variables",
    "surprisal_scores",
    "topk_by_group",
    "topk_parts",
    "udtf_chunks",
    "udtf_dateparts",
    "value_histogram",
    "variant_extract",
    "vocab_stats",
    "zorder_curve",
    "hhi_concentration",
    "readability_fk",
    # round-11 backlog extension (VERDICT r10 item 5): the streaming
    # batch-twins, the versioned-table lifecycle, the window/sessionize
    # family, pivot/SQL-feature shapes, merge/CDC, retrieval/graph, and
    # the remaining curation composites — the cohorts the curve had
    # never probed (several are window-heavy shapes for the ANSI
    # overflow detector).
    "streaming_dedup",
    "streaming_enrich",
    "streaming_join",
    "streaming_scd2",
    "streaming_sessionize",
    "streaming_stateful_totals",
    "streaming_topk",
    "streaming_attribution",
    "streaming_versioned_ingest",
    "versioned_read",
    "versioned_delete",
    "versioned_merge",
    "versioned_evolve",
    "versioned_restore",
    "versioned_bloom_read",
    "versioned_partition_ops",
    "versioned_rename_read",
    "versioned_skip_read",
    "versioned_zorder_read",
    "window_suite",
    "rolling_range_frame",
    "rolling_hll",
    "moving_average",
    "decayed_activity",
    "gap_fill_daily",
    "linear_interpolate",
    "holt_smooth",
    "temporal_trend",
    "period_over_period",
    "incremental_sessionize",
    "grouping_sets_volume",
    "rollup_volume",
    "cube_volume",
    "unpivot_measures",
    "segment_status_pivot",
    "lateral_topk",
    "sql_api_trend",
    "pipe_syntax_trend",
    "fact_sales",
    "scd2_merge",
    "scd2_event_enrich",
    "cdc_apply_seq",
    "asof_join",
    "table_diff",
    "ann_topk",
    "ann_recall",
    "ann_ivf_topk",
    "lsh_neardup",
    "mmr_diversify",
    "pagerank",
    "clustering_coeff",
    "ra_linkpred",
    "quality_classifier",
    "redact_pii",
    "repetition_filter",
    "corpus_curation",
    "stratified_cap",
    "mixture_weights",
    "shard_manifest",
    "contamination_check",
    "pack_sequences",
    "global_summary",
    # r12: the composed curation chain (shared_lsh_pairs consumer)
    "curation_pipeline",
]


def generate(spark, out_dir: str, factor: int) -> None:
    """Write a ``factor``x corpus. IMPORTANT: the 1x BASE must be generated
    through this same writer (factor=1) — measuring against the driver's
    own sf0.1 files confounds the curve with file-layout differences
    (number/size of parquet files sets scan parallelism; the first probe
    of this tool measured a NEGATIVE exponent for dup_spans purely
    because the 5x corpus had 32 well-sized files and the base did not).
    """
    out = Path(out_dir)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_id))
        .withColumn(
            "text",
            F.concat(F.lit(f"copyset{i} shard{i} "), F.col("text"))
            if i
            else F.col("text"),
        )
        for i in range(factor)
    ]
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(32).write.parquet(str(out / "documents.parquet"))

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    max_vid = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    ecopies = []
    for i in range(factor):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * max_vid))
        if i:
            # cyclic rotation by i: same norms, decorrelated cosines
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", i + 1, 64 - i),
                    F.slice("embedding", 1, i),
                ),
            )
        ecopies.append(c)
    eu = ecopies[0]
    for c in ecopies[1:]:
        eu = eu.unionByName(c)
    eu.repartition(32).write.parquet(str(out / "embeddings.parquet"))

    # relational tables for the sketch/bloom/matview/CDF probes: replicate
    # with re-keyed order keys (same key-collision profile per copy; the
    # orders<->lineitem FK is preserved because both sides shift by the
    # same stride)
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    # shift the graph endpoints (supplier/customer keys) by the same
    # per-copy stride too: the triangle probe's graph then grows as
    # `factor` DISJOINT copies (triangles x factor, per-node degrees
    # unchanged) instead of stacking multi-edges on the same node set,
    # which the distinct() would collapse into a no-growth workload
    # stride from the CUSTOMER key domain (a superset of the custkeys
    # orders reference), so customer copies re-keyed by the same stride
    # stay disjoint and the orders<->customer FK holds per copy — the
    # recursive-reach probe joins through customer AND supplier
    cust = spark.read.parquet(f"{BASE}/customer.parquet")
    max_cck = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    max_sk = li.agg(F.max("l_suppkey")).collect()[0][0] + 1
    stride_nodes = max(max_cck, max_sk)
    ou = orders
    lu = li
    for i in range(1, factor):
        ou = ou.unionByName(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * max_ok)
            ).withColumn(
                "o_custkey", F.col("o_custkey") + F.lit(i * stride_nodes)
            )
        )
        lu = lu.unionByName(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * max_ok)
            ).withColumn(
                "l_suppkey", F.col("l_suppkey") + F.lit(i * stride_nodes)
            )
        )
    ou.repartition(16).write.parquet(str(out / "orders.parquet"))
    lu.repartition(32).write.parquet(str(out / "lineitem.parquet"))

    # part for the entity-resolution probe: re-keyed, and the NAME VALUE
    # DOMAIN grows x factor too (per-copy prefix), so the blocked
    # pair-candidate set scales — without it the distinct-name collapse
    # makes every copy a duplicate and the probe measures only the scan
    part = spark.read.parquet(f"{BASE}/part.parquet")
    max_pk = part.agg(F.max("p_partkey")).collect()[0][0] + 1
    pu = part
    for i in range(1, factor):
        pu = pu.unionByName(
            part.withColumn(
                "p_partkey", F.col("p_partkey") + F.lit(i * max_pk)
            ).withColumn(
                "p_name", F.concat(F.lit(f"c{i} "), F.col("p_name"))
            )
        )
    pu.repartition(8).write.parquet(str(out / "part.parquet"))

    # customer for the k-anonymity + recursive-reach probes: re-keyed by
    # the SAME stride orders' o_custkey uses (FK-consistent copies);
    # quasi-identifier domain (segment x nation) fixed, so class COUNT
    # is constant and class sizes grow — the shape k-anonymity audits at
    # scale, and nation-level edges stay a bounded domain
    cu = cust
    for i in range(1, factor):
        cu = cu.unionByName(
            cust.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(i * stride_nodes)
            )
        )
    cu.repartition(8).write.parquet(str(out / "customer.parquet"))

    # supplier for the recursive-reach probe: re-keyed by the lineitem
    # suppkey stride; s_nationkey unchanged (nation domain is fixed, so
    # the aggregated nation-level edge list stays <= 625 rows at any
    # factor — exactly the bounded-recursion property the probe records)
    supp = spark.read.parquet(f"{BASE}/supplier.parquet")
    su = supp
    for i in range(1, factor):
        su = su.unionByName(
            supp.withColumn(
                "s_suppkey", F.col("s_suppkey") + F.lit(i * stride_nodes)
            )
        )
    su.repartition(4).write.parquet(str(out / "supplier.parquet"))

    # region/nation: fixed domains (like the calendar) — copied
    # verbatim so dimension-joining probes run at both scales
    for fixed in ("region", "nation"):
        spark.read.parquet(f"{BASE}/{fixed}.parquet").coalesce(1).write.parquet(
            str(out / f"{fixed}.parquet")
        )

    # events: shift event ids AND user ids per copy (distinct-user counts
    # must grow with the corpus, not collapse into 5x traffic from the
    # same users); timestamps stay — the day span is a fixed domain like
    # the calendar, so per-day volume scales linearly, the correct
    # regime for the rolling/OLS/as-of probes
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    max_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    max_u = ev.agg(F.max("user_id")).collect()[0][0] + 1
    vu = ev
    for i in range(1, factor):
        vu = vu.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * max_ev))
            .withColumn("user_id", F.col("user_id") + F.lit(i * max_u))
        )
    vu.repartition(16).write.parquet(str(out / "events.parquet"))


# count() lets Catalyst PRUNE output columns the count doesn't need —
# for ops whose cost lives in pruned aggregates (source_minhash's 16
# signature mins) the probe under-measured 8x (round-7 post-mortem in
# PERF.md). Small-output ops measure with collect() instead; big-output
# ops keep count() so driver transfer doesn't dominate the timing.
COLLECT_OPS = {
    "source_minhash",
    "distinctive_terms",
    "histogram_quantiles",
    "expectations_audit",
    "group_ols_trend",
    "target_encode",
    "priority_sample",
    "twap_daily",
    "ohlc_bars",
    # small-output r8 ops: count() would let Catalyst prune the scoring
    # columns and with them the operator's whole cost (the round-7
    # source_minhash lesson)
    "pmi_collocations",
    "vocab_coverage",
    "winsorized_stats",
    "ks_drift",
    # iterative family: outputs are tiny (<= a few thousand rows) and a
    # count() would prune the distance/hop aggregate expressions
    "bfs_distances",
    "sssp_weighted",
    "recursive_cte_reach",
    "kcenter_coreset",
    # r9 session-2 small-output ops: gini's rank-weighted sums, the
    # entropy/mix aggregates, and the percentile window would all be
    # pruned under count() (percentile_normalize's output is corpus-
    # sized but the rows are 6 narrow ints — collect stays cheap)
    "gini_segment",
    "source_entropy",
    "temperature_mix",
    "percentile_normalize",
    "kcore_nodes",
    "heavy_hitters",
    # r9 session-3: every op below emits <= a few hundred rows and its
    # cost lives in aggregate expressions count() would prune
    "mann_whitney",
    "welch_ttest",
    "max_drawdown",
    "seasonal_decompose",
    "t_closeness",
    "mutual_information",
    "ams_f2",
    "theil_sen",
    "rfm_segments",
    "subsample_ci",
    "neyman_allocation",
    "abc_classes",
    "survival_hazard",
    "shape_profile",
    "odds_ratio",
    # r10 additions with small outputs whose cost lives in expressions
    # count() would prune (scores, moments, registers, centroids)
    "bm25_topk",
    "doc_keywords",
    "pq_topk",
    "ann_lsh_topk",
    "ann_ivf_topk_nprobe2",
    "kmeans_clusters",
    "embedding_qc",
    "minhash_est_error",
    "crosstab_chi2",
    "lag_autocorr",
    "spearman_corr",
    "comoment_matrix",
    "burstiness",
    "interarrival",
    "runs_test",
    "hodges_lehmann",
    "benford_audit",
    "pricing_summary",
    "quantiles_by_group",
    "weighted_quantiles",
    "kmv_distinct",
    "hll_by_group",
    "cms_counts",
    "bitmap_distinct",
    "markov_transitions",
    "cohort_retention",
    "funnel_steps",
    # r10 operators: small outputs, cost in aggregate expressions
    "peak_concurrency",
    "source_xentropy",
    "zipf_slope",
    "kruskal_wallis",
    "kendall_tau",
    "theils_u",
    "cochran_armitage",
    "brown_forsythe",
    "gumbel_fit",
    "record_days",
    "cond_entropy_rate",
    "phi_coefficient",
    "ljung_box",
    "adf_test",
    "permutation_entropy",
    "dedup_keep_best",
    "pii_density",
    "water_filling",
    "bpe_fertility",
    # r11 operators: small outputs, cost in aggregate expressions
    "anova_f",
    "wilcoxon_signed_rank",
    "cox_stuart",
    "mcnemar_switching",
    "jonckheere_trend",
    "cvm_drift",
    "friedman_test",
    "binseg_changepoint",
    "hhi_concentration",
    "readability_fk",
    # r11 backlog small-output ops: aggregates/day-grain/top-k frames
    # whose cost count() would prune
    "grouping_sets_volume",
    "rollup_volume",
    "cube_volume",
    "moving_average",
    "holt_smooth",
    "temporal_trend",
    "period_over_period",
    "gap_fill_daily",
    "linear_interpolate",
    "decayed_activity",
    "rolling_hll",
    "mixture_weights",
    "shard_manifest",
    "contamination_check",
    "corpus_curation",
    "ann_topk",
    "ann_recall",
    "ann_ivf_topk",
    "mmr_diversify",
    "pagerank",
    "clustering_coeff",
    "ra_linkpred",
    "table_diff",
    "global_summary",
    # r11 tail small-output ops
    "ab_test",
    "bpe_merges",
    "bpe_pair_counts",
    "customer_retention_setops",
    "dsir_weights",
    "hll_set_algebra",
    "key_skew_profile",
    "latest_day_activity",
    "observed_quality",
    "pct_of_total",
    "profile_columns",
    "referential_audit",
    "regional_volume",
    "rrf_fusion",
    "topk_parts",
    "topk_by_group",
    "value_histogram",
    "vocab_stats",
    "json_extract_agg",
    "l_diversity",
    "distinct_profile",
    "pq_recall",
    "shipping_priority",
    "sql_scripting",
    "sql_variables",
    # r12: the composed curation chain — ≤24 manifest rows, cost in the
    # components/window/aggregate stages count() would partially prune
    "curation_pipeline",
}


# Corpus-size-output ops whose cost is a PROJECTION or row-preserving
# WINDOW: count() lets Catalyst prune the entire operator (the round-7
# source_minhash lesson applied to row-preserving shapes — window_suite
# probed at 0.16 s under count() because an unused window column is
# simply dropped), while collect() would ship the whole corpus to the
# driver. A bit_xor(xxhash64(all columns)) aggregate forces every
# output column to be computed and returns one row — and bit_xor cannot
# overflow under ANSI where sum(hash) would.
CHECKSUM_OPS = {
    "window_suite",
    "rolling_range_frame",
    "pack_sequences",
    "incremental_sessionize",
    "quality_classifier",
    "redact_pii",
    "unpivot_measures",
    "segment_status_pivot",
    "asof_join",
    "fact_sales",
    "scd2_event_enrich",
    "scd2_merge",
    # r11 tail row-preserving projections (count() would prune them)
    "surprisal_scores",
    "ngram_novelty",
    "zorder_curve",
    "numeric_standardize",
    "date_standardize",
    "decode_ladders",
    "categorical_encode",
    "feature_hash",
    "variant_extract",
    "split_assign",
    "rendezvous_shards",
    "interleave_sources",
    "bpe_encode",
}


def _checksum(df) -> None:
    cols = ", ".join(f"`{c}`" for c in df.columns)
    df.selectExpr(f"bit_xor(xxhash64({cols})) AS chk").collect()


# Entries that consume a session-shared frame/table (shared_lsh_pairs /
# shared_bpe_merges). Without a reset, the warm-up builds the shared
# artifact and the timed runs measure cached reads — understating the
# true scale behavior (ADVICE r11). The probe clears the caches before
# EVERY invocation of these ops so each timed run pays the full build.
SHARED_CACHE_OPS = {
    "minhash_lsh",
    "curation_pipeline",
    "neardup_clusters",
    "neardup_clusters_star",
    "dedup_keep_best",
    "bpe_merges",
    "bpe_encode",
    "bpe_fertility",
}


def _reset_shared_caches() -> None:
    from faers_datalakehouse_spark.operators.bpe import reset_shared_merges
    from faers_datalakehouse_spark.operators.dedup import reset_shared_pairs

    reset_shared_pairs()
    reset_shared_merges()


def time_op(spark, queries, name: str, sf_dir: str, runs: int) -> float:
    fn = queries[name]
    best = math.inf
    for _ in range(runs):
        if name in SHARED_CACHE_OPS:
            _reset_shared_caches()
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name in COLLECT_OPS:
            df.collect()
        elif name in CHECKSUM_OPS:
            _checksum(df)
        else:
            df.count()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best


def build_artifact(results: dict, failed: list[str], factor: int, runs: int) -> dict:
    """Assemble the SCALE_CURVE.json payload.

    Failures are recorded IN the artifact (ADVICE r11): under --only a
    failed op would otherwise silently keep its stale row, and in a full
    run it would silently vanish — either way invisible without the run
    log. A failed op's stale row is dropped so `ops` only ever holds
    measurements the probe actually produced.
    """
    for name in failed:
        results.pop(name, None)
    return {
        "base": BASE,
        "factor": factor,
        "runs_per_point": runs,
        "statistic": "min",
        "ops": results,
        "failed": sorted(failed),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument(
        "--no-warmup",
        action="store_true",
        help="skip the per-scale warm-up invocation — for multi-minute "
        "ops (the quadratic-output verify kernels) JIT/codegen warm-up "
        "noise is irrelevant next to the op cost and the extra "
        "invocation doubles a very long probe",
    )
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="measure only these ops and MERGE into the existing "
        "SCALE_CURVE.json (incremental top-up for newly added ops; a "
        "full run still refreshes every point)",
    )
    args = ap.parse_args()

    spark = get_spark("scale_curve")
    base_dir = "/tmp/spark_graft_sf_x1"
    big_dir = f"/tmp/spark_graft_sf_x{args.factor}"
    print(f"generating 1x corpus at {base_dir} (identical layout) ...")
    generate(spark, base_dir, 1)
    print(f"generating {args.factor}x corpus at {big_dir} ...")
    generate(spark, big_dir, args.factor)

    queries = entrymod.queries()
    results = {}
    artifact = Path(__file__).resolve().parent.parent / "SCALE_CURVE.json"
    roster = OPS
    if args.only is not None:
        unknown = [n for n in args.only if n not in OPS]
        if unknown:
            raise SystemExit(f"--only names not in OPS roster: {unknown}")
        roster = list(args.only)
        try:
            results = json.loads(artifact.read_text())["ops"]
        except (OSError, ValueError, KeyError):
            results = {}
    failed: list[str] = []
    for name in roster:
        # warm-up both scales (codegen/JIT), then interleave measurements.
        # A single op failure (e.g. a managed-table collision on the probe
        # corpus) must not void the remaining roster — record and continue.
        try:
            if not args.no_warmup:
                time_op(spark, queries, name, base_dir, 1)
            t1 = time_op(spark, queries, name, base_dir, args.runs)
            if not args.no_warmup:
                time_op(spark, queries, name, big_dir, 1)
            t5 = time_op(spark, queries, name, big_dir, args.runs)
        except Exception as exc:  # noqa: BLE001 — probe isolation
            failed.append(name)
            print(f"{name:24s} FAILED on probe corpus: {exc}")
            continue
        exp = math.log(t5 / t1) / math.log(args.factor)
        results[name] = {
            "t_base_sec": round(t1, 3),
            "t_big_sec": round(t5, 3),
            "ratio": round(t5 / t1, 2),
            "exponent": round(exp, 2),
        }
        print(f"{name:24s} {t1:7.3f}s -> {t5:7.3f}s  ratio {t5 / t1:5.2f}x  exp {exp:4.2f}")

    out = build_artifact(results, failed, args.factor, args.runs)
    artifact.write_text(json.dumps(out, indent=1))
    print(f"-> {artifact}")
    if failed:
        print(f"FAILED ops (not merged): {failed}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
