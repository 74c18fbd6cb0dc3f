"""Unit tests for the round-7 batch: Levenshtein entity resolution,
k-anonymity audit/suppression, histogram-quantile sketch, and the
weighted source interleave."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.entity import levenshtein_pairs
from faers_datalakehouse_spark.operators.privacy import (
    k_anonymity_audit,
    k_suppress,
)
from faers_datalakehouse_spark.operators.quantile_sketch import (
    histogram_quantiles,
    histogram_sketch,
)
from faers_datalakehouse_spark.plans.training_prep import (
    interleave_sources_query,
)


# ---------------------------------------------------------------- entity


def test_levenshtein_pairs_basic(spark):
    df = spark.createDataFrame(
        [("small ring",), ("smal ring",), ("small ring",), ("big hammer",)],
        ["name"],
    )
    out = levenshtein_pairs(df, "name", max_dist=2, band_width=2).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.name1, row.name2) == ("smal ring", "small ring")
    assert row.dist == 1
    # n carries the row multiplicity of each distinct value
    assert {row.n1, row.n2} == {1, 2}


def test_levenshtein_pairs_recall_across_bands(spark):
    # lengths 4 and 6 land in different bands (w=2: bands 2 and 3) —
    # the double-emit blocking must still pair them (dist 2 <= max 2)
    df = spark.createDataFrame([("abcd",), ("abcdef",)], ["name"])
    out = levenshtein_pairs(df, "name", max_dist=2, band_width=2).collect()
    assert len(out) == 1 and out[0].dist == 2


def test_levenshtein_pairs_no_duplicate_candidates(spark):
    # equal-band values share BOTH emitted keys; distinct() must dedupe
    df = spark.createDataFrame([("aaaa",), ("aaab",), ("aabb",)], ["name"])
    out = levenshtein_pairs(df, "name", max_dist=2, band_width=4)
    rows = [(r.name1, r.name2) for r in out.collect()]
    assert len(rows) == len(set(rows)) == 3


def test_levenshtein_pairs_rejects_narrow_band(spark):
    df = spark.createDataFrame([("x",)], ["name"])
    with pytest.raises(ValueError, match="loses recall"):
        levenshtein_pairs(df, "name", max_dist=3, band_width=2)


# --------------------------------------------------------------- privacy


@pytest.fixture()
def people(spark):
    rows = [
        # (id, zip, age_band) — zip/age are the quasi identifiers
        (1, "02139", "30s"),
        (2, "02139", "30s"),
        (3, "02139", "30s"),
        (4, "94110", "40s"),  # unique class -> violating at k=2
        (5, None, "40s"),
        (6, None, "40s"),  # NULL zip class of size 2
    ]
    return spark.createDataFrame(rows, ["id", "zip", "age_band"])


def test_k_anonymity_audit(people):
    out = {
        (r.zip, r.age_band): (r.n, r.anonymous)
        for r in k_anonymity_audit(people, ["zip", "age_band"], k=2).collect()
    }
    assert out[("02139", "30s")] == (3, True)
    assert out[("94110", "40s")] == (1, False)
    # NULL quasi values form their own (countable) class
    assert out[(None, "40s")] == (2, True)


def test_k_suppress_nulls_only_violating_rows(people):
    out = k_suppress(people, ["zip", "age_band"], k=2)
    assert out.columns == people.columns
    rows = {r.id: (r.zip, r.age_band) for r in out.collect()}
    assert rows[1] == ("02139", "30s")  # untouched
    assert rows[4] == (None, None)  # suppressed
    assert rows[5] == (None, "40s")  # NULL class of size 2 kept


def test_k_suppress_all_pass_is_identity(people):
    out = k_suppress(people, ["zip", "age_band"], k=1)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, people.collect())
    )


def test_k_anonymity_validates_args(people):
    with pytest.raises(ValueError):
        k_anonymity_audit(people, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_audit(people, ["zip"], k=0)


# ----------------------------------------------------- quantile sketch


def test_histogram_sketch_state_bounded(spark):
    df = spark.createDataFrame(
        [(g, float(v)) for g in ("a", "b") for v in range(100)],
        ["g", "v"],
    )
    sketch, lo, hi = histogram_sketch(df, "v", ["g"], bins=8, scale=1)
    assert (lo, hi) == (0, 99)
    rows = sketch.collect()
    assert len(rows) <= 2 * 8  # |groups| * bins bound
    assert sum(r.n for r in rows) == 200
    assert all(0 <= r.bin < 8 for r in rows)


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    vals = [float(v) for v in range(1, 1001)]  # 1..1000, uniform
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = {
        r.p_milli: r.approx_q_units
        for r in histogram_quantiles(
            df, "v", ["g"], probs_milli=[500, 950], bins=100, scale=1
        ).collect()
    }
    # bin width is 10 quantized units; estimate = upper edge of hit bin
    assert abs(out[500] - 500) <= 10
    assert abs(out[950] - 950) <= 10


def test_histogram_quantiles_single_value_degenerate(spark):
    df = spark.createDataFrame([("g", 5.0)] * 4, ["g", "v"])
    out = histogram_quantiles(
        df, "v", ["g"], probs_milli=[500], bins=16, scale=100
    ).collect()
    assert len(out) == 1 and out[0].approx_q_units == 500  # 5.0 * 100


def test_histogram_sketch_raises_on_all_null(spark):
    df = spark.createDataFrame([("g", None)], "g string, v double")
    with pytest.raises(ValueError, match="no non-null"):
        histogram_sketch(df, "v", ["g"])


# ------------------------------------------------------------ interleave


def test_interleave_rate_proportional_prefix(spark, sf_dir):
    out = interleave_sources_query(spark, sf_dir).collect()
    assert [r.pos for r in out] == list(range(1, len(out) + 1))
    # weight-5 src0 must appear ~5x as often as weight-1 src3 in any
    # reasonable prefix; check the first 36 virtual-time slots
    prefix = [r.source for r in out[:36]]
    n0, n3 = prefix.count("src0"), prefix.count("src3")
    assert n0 >= 4 * max(n3, 1) - 2
    # deterministic: second run identical
    again = interleave_sources_query(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


# ------------------------------------------- anomaly / pareto / ewma


def test_anomaly_days_flags_outlier(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import anomaly_days

    out = anomaly_days(spark, sf_dir)
    rows = out.collect()
    assert set(out.columns) == {"status", "day", "x", "is_anomaly"}
    assert len(rows) > 0
    # sanity: flags are booleans and not everything is anomalous
    flagged = [r for r in rows if r.is_anomaly]
    assert len(flagged) < len(rows)


def test_pareto_front_small(spark):
    from faers_datalakehouse_spark.plans.analytics import PARETO_FRONT_SQL  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    # direct mini skyline: (price, size); minimize price, maximize size
    pts = spark.createDataFrame(
        [
            (1, 100, 5),
            (2, 100, 9),   # dominates id=1 (same price, bigger)
            (3, 200, 9),   # dominated by id=2 (pricier, same size)
            (4, 200, 12),  # frontier
            (5, 50, 2),    # frontier (cheapest)
            (6, 50, 2),    # duplicate point -> also survives
        ],
        ["p_partkey", "price_c", "size"],
    )
    w_lt = Window.orderBy("price_c").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_eq = Window.partitionBy("price_c")
    scored = pts.select(
        "p_partkey",
        "price_c",
        "size",
        F.max("size").over(w_lt).alias("bb"),
        F.max("size").over(w_eq).alias("ba"),
    )
    out = scored.where(
        (F.col("bb").isNull() | (F.col("size") > F.col("bb")))
        & (F.col("size") == F.col("ba"))
    )
    ids = sorted(r.p_partkey for r in out.collect())
    assert ids == [2, 4, 5, 6]


def test_ewma_daily_warmup_and_weights(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import ewma_daily

    rows = ewma_daily(spark, sf_dir, window=8).collect()
    # first window-1 rows have incomplete lag ladders -> NULL ewma
    assert all(r.ewma_c is None for r in rows[:7])
    assert all(r.ewma_c is not None for r in rows[7:])
    # weights sum to 2^w - 1, so a constant series maps to itself:
    # check on row 8+ that ewma is within the min/max of its window
    xs = [r.x for r in rows]
    for i in range(7, min(len(rows), 40)):
        lo, hi = min(xs[i - 7 : i + 1]), max(xs[i - 7 : i + 1])
        assert lo <= rows[i].ewma_c <= hi


# ---------------------------------------- comoment / categorical


def test_comoment_state_merges(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import comoment_matrix

    rows = {(r.col_a, r.col_b): r for r in
            comoment_matrix(spark, sf_dir).collect()}
    assert len(rows) == 6  # 3 cols -> 6 unordered pairs incl. diagonal
    qq = rows[("qty", "qty")]
    # diagonal pair is internally consistent
    assert qq.sum_a == qq.sum_b and qq.sum_aa == qq.sum_ab
    # derived covariance is finite and variance is non-negative
    for r in rows.values():
        var_a = r.n * r.sum_aa - r.sum_a * r.sum_a
        assert var_a >= 0


def test_categorical_encode_dense_frequency_major(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import categorical_encode

    out = categorical_encode(spark, sf_dir).collect()
    codes = [r.code for r in out]
    assert codes == list(range(len(out)))  # dense from 0
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)  # frequency-major


def test_ab_test_counts_and_verdict(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import ab_test

    row = ab_test(spark, sf_dir).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0 <= row.c_a <= row.n_a and 0 <= row.c_b <= row.n_b
    assert row.z2 >= 0.0
    assert row.significant_95 == (row.z2 > 3.8416)


def test_markov_transitions_rows_sum_to_milli(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import markov_transitions

    out = markov_transitions(spark, sf_dir).collect()
    assert len(out) > 0
    by_src = {}
    for r in out:
        assert 0 <= r.prob_milli <= 1000
        by_src.setdefault(r.src_event, []).append(r.prob_milli)
    # truncating div: each row sums to <= 1000, > 1000 - n_dst
    for src, probs in by_src.items():
        assert 1000 - len(probs) < sum(probs) <= 1000


def test_top_event_paths_counts(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import top_event_paths

    out = top_event_paths(spark, sf_dir, top_n=10).collect()
    assert 0 < len(out) <= 10
    ns = [r.n_users for r in out]
    assert ns == sorted(ns, reverse=True)
    assert all(len(r.path.split(" > ")) == 3 for r in out)


def test_mad_outliers_basic(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import mad_outliers

    out = mad_outliers(spark, sf_dir).collect()
    assert len(out) == 5  # one row per event type
    for r in out:
        assert r.n > 0 and r.mad_value >= 0.0
        assert 0 <= r.n_outliers < r.n  # robust screen can't flag everything


def test_quantile_binning_equal_frequency(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import quantile_binning

    out = quantile_binning(spark, sf_dir, n_bins=10).collect()
    assert [r.bin for r in out] == list(range(1, 11))
    ns = [r.n_rows for r in out]
    assert max(ns) - min(ns) <= 1  # ntile leaves at most 1-row imbalance
    los = [r.lo_cents for r in out]
    his = [r.hi_cents for r in out]
    assert all(lo <= hi for lo, hi in zip(los, his))
    assert all(his[i] <= los[i + 1] for i in range(9))  # ordered bins


def test_crosstab_chi2_marginals(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import crosstab_chi2

    out = crosstab_chi2(spark, sf_dir).collect()
    assert len(out) == 20  # 5 event types x 4 segments
    n = sum(r.observed for r in out)
    exp_sum = sum(r.expected for r in out)
    assert abs(exp_sum - n) < 1e-6  # expected counts sum to n
    assert all(r.chi2_contrib >= 0.0 for r in out)


def test_rolling_range_frame_gap_correct(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import rolling_range_frame

    out = rolling_range_frame(spark, sf_dir).collect()
    by_p = {}
    for r in out:
        by_p.setdefault(r.priority, []).append(r)
    for rs in by_p.values():
        rs.sort(key=lambda r: r.epoch_day)
        days = {r.epoch_day: r.rev_c for r in rs}
        for r in rs:
            window = [
                days[d]
                for d in range(r.epoch_day - 6, r.epoch_day + 1)
                if d in days
            ]
            assert r.rev_7d_c == sum(window)
            assert r.days_in_window == len(window)


def test_key_skew_profile_shares(spark, sf_dir):
    from faers_datalakehouse_spark.plans.analytics import key_skew_profile

    out = key_skew_profile(spark, sf_dir, top_n=10).collect()
    assert [r.rank for r in out] == list(range(1, 11))
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)
    assert all(0 < r.share <= 1 for r in out)
    cum = [r.cum_share for r in out]
    assert all(cum[i] < cum[i + 1] for i in range(len(cum) - 1))
    assert cum[-1] <= 1.0 + 1e-12
