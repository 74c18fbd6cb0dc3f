"""Round-9 third-session additions: two-sample hypothesis tests."""

from __future__ import annotations

import math


def test_mann_whitney_separated_groups(spark):
    """Cohort 1 = {1,2,3}, cohort 0 = {4,5,6}: U1 = 0 (every cohort-1
    value below every cohort-0 value), no ties, z < 0."""
    from faers_datalakehouse_spark.operators.stattests import (
        mann_whitney_by_group,
    )

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 1),
         ("g", 4, 0), ("g", 5, 0), ("g", 6, 0)],
        "grp string, v long, c int",
    )
    got = mann_whitney_by_group(df, "grp", "v", "c").collect()[0]
    assert (got["n1"], got["n2"]) == (3, 3)
    assert got["u2"] == 0
    assert got["ties_milli"] == 0
    # z = (U - n1n2/2)/sqrt(n1n2(n+1)/12) = -4.5/sqrt(9*7/12)
    assert got["z_milli"] == math.floor(-4.5 / math.sqrt(5.25) * 1000)


def test_mann_whitney_identical_distributions(spark):
    """Interleaved identical samples: U = n1*n2/2, z = 0."""
    from faers_datalakehouse_spark.operators.stattests import (
        mann_whitney_by_group,
    )

    rows = [("g", v, 1) for v in (1, 3, 5, 7)] + [
        ("g", v, 0) for v in (1, 3, 5, 7)
    ]
    df = spark.createDataFrame(rows, "grp string, v long, c int")
    got = mann_whitney_by_group(df, "grp", "v", "c").collect()[0]
    assert got["u2"] == got["n1"] * got["n2"]  # doubled U == 2 * n1n2/2
    # four tie groups of 2: T = 4*(2^3-2) = 24; max = 8*7*9 = 504
    assert got["ties_milli"] == 24 * 1000 // 504
    assert got["z_milli"] == 0


def test_mann_whitney_giant_tie_cell_no_ansi_overflow(spark):
    """ADVICE r9 regression: a single (group, value) cell of 2.5M rows
    makes c^3 = 1.56e19 > int64 — the old BIGINT tie sum raised under
    ANSI. The DECIMAL(38,0) sum and pre-scaled ties_milli survive."""
    from pyspark.sql import functions as F

    from faers_datalakehouse_spark.operators.stattests import (
        mann_whitney_by_group,
    )

    df = spark.range(2_500_000).select(
        F.lit("g").alias("grp"),
        F.lit(1).cast("long").alias("v"),
        (F.col("id") % 2 == 0).cast("int").alias("c"),
    )
    got = mann_whitney_by_group(df, "grp", "v", "c").collect()[0]
    n = 2_500_000
    assert (got["n1"], got["n2"]) == (n // 2, n // 2)
    # every row ties: T = n^3 - n, so ties_milli = 1000 exactly
    assert got["ties_milli"] == 1000
    # tie-corrected variance is zero -> z undefined
    assert got["z_milli"] is None


def test_mann_whitney_empty_cohort_is_null(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        mann_whitney_by_group,
    )

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1)], "grp string, v long, c int"
    )
    got = mann_whitney_by_group(df, "grp", "v", "c").collect()[0]
    assert got["n2"] == 0 and got["z_milli"] is None


def test_welch_known_example(spark):
    """Cohort 1 = {10,12,14}, cohort 0 = {20,24,28}: means 12 vs 24,
    s1^2 = 4, s2^2 = 16, t = -12/sqrt(4/3 + 16/3)."""
    from faers_datalakehouse_spark.operators.stattests import (
        welch_ttest_by_group,
    )

    df = spark.createDataFrame(
        [("g", 10, 1), ("g", 12, 1), ("g", 14, 1),
         ("g", 20, 0), ("g", 24, 0), ("g", 28, 0)],
        "grp string, v long, c int",
    )
    got = welch_ttest_by_group(df, "grp", "v", "c").collect()[0]
    assert (got["mean1_milli"], got["mean2_milli"]) == (12_000, 24_000)
    expect = math.floor(-12.0 / math.sqrt(4.0 / 3 + 16.0 / 3) * 1000)
    assert got["t_milli"] == expect


def test_welch_zero_variance_both_null(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        welch_ttest_by_group,
    )

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 1), ("g", 5, 0), ("g", 5, 0)],
        "grp string, v long, c int",
    )
    got = welch_ttest_by_group(df, "grp", "v", "c").collect()[0]
    assert got["t_milli"] is None


def test_welch_single_row_cohort_is_null(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        welch_ttest_by_group,
    )

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 7, 0), ("g", 9, 0)],
        "grp string, v long, c int",
    )
    got = welch_ttest_by_group(df, "grp", "v", "c").collect()[0]
    assert got["t_milli"] is None and got["mean1_milli"] == 5_000


def test_max_drawdown_known_series(spark):
    """Balance path 10, 30, 5, 20: peak 30, trough 5 -> drawdown 25."""
    from faers_datalakehouse_spark.operators.drawdown import (
        max_drawdown_by_series,
    )

    rows = [(1, t, t, v) for t, v in enumerate([10, 20, -25, 15])]
    df = spark.createDataFrame(
        rows, "uid long, ts long, eid long, v long"
    )
    got = max_drawdown_by_series(df, "uid", "ts", "eid", "v").collect()[0]
    assert got["final_balance_c"] == 20
    assert got["peak_balance_c"] == 30
    assert got["max_drawdown_c"] == 25


def test_max_drawdown_monotone_rise_is_zero(spark):
    from faers_datalakehouse_spark.operators.drawdown import (
        max_drawdown_by_series,
    )

    rows = [(1, t, t, 5) for t in range(4)]
    df = spark.createDataFrame(
        rows, "uid long, ts long, eid long, v long"
    )
    got = max_drawdown_by_series(df, "uid", "ts", "eid", "v").collect()[0]
    assert got["max_drawdown_c"] == 0 and got["peak_balance_c"] == 20


def test_max_drawdown_topk_tiebreak(spark):
    """Equal drawdowns break ties by series key ascending."""
    from faers_datalakehouse_spark.operators.drawdown import (
        max_drawdown_by_series,
    )

    rows = []
    for uid in (3, 1, 2):
        rows += [(uid, 0, 0, 10), (uid, 1, 1, -10)]
    df = spark.createDataFrame(
        rows, "uid long, ts long, eid long, v long"
    )
    got = max_drawdown_by_series(
        df, "uid", "ts", "eid", "v", top_k=2
    ).collect()
    assert [r["uid"] for r in got] == [1, 2]


def test_seasonal_decompose_flat_plus_weekly(spark):
    """A pure weekly pattern over 21 consecutive days: residuals are 0
    wherever trend is defined, and seasonal means reproduce the DOW
    offsets (trend = weekly mean = 100 everywhere)."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.seasonal import (
        seasonal_decompose_daily,
    )

    offsets = [21, -7, 0, 14, -14, -7, -7]  # sums to 0 over a week
    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), 100 + offsets[i % 7])
        for i in range(21)
    ]
    daily = spark.createDataFrame(rows, "day date, cnt long")
    got = seasonal_decompose_daily(daily).collect()
    by_day = {r["day"].isoformat(): r for r in got}
    assert by_day["2024-01-01"]["trend_milli"] is None  # edge
    mid = by_day["2024-01-10"]
    assert mid["trend_milli"] == 100_000
    # 2024-01-10 is a Wednesday -> dow 2 -> offset 0
    assert mid["dow"] == 2 and mid["seasonal_milli"] == 0
    assert all(
        r["resid_milli"] == 0
        for r in got
        if r["trend_milli"] is not None
    )


def test_seasonal_decompose_gap_voids_trend(spark):
    """A missing day voids the trend for every window that spans it."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.seasonal import (
        seasonal_decompose_daily,
    )

    days = [i for i in range(15) if i != 7]
    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), 10) for i in days
    ]
    daily = spark.createDataFrame(rows, "day date, cnt long")
    got = {
        r["day"].isoformat(): r["trend_milli"]
        for r in seasonal_decompose_daily(daily).collect()
    }
    assert got["2024-01-05"] is None  # window spans the Jan-8 gap
    assert got["2024-01-12"] == 10_000  # fully inside the second run


def test_t_closeness_identical_distribution_is_zero(spark):
    """Every class mirrors the global mix -> EMD 0, close."""
    from faers_datalakehouse_spark.operators.tcloseness import (
        t_closeness_audit,
    )

    rows = [
        (q, s) for q in ("a", "b") for s in (1, 1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "q string, s long")
    got = t_closeness_audit(df, ["q"], "s").collect()
    assert all(r["emd_ppm"] == 0 and r["close"] for r in got)
    assert all(r["m"] == 3 for r in got)


def test_t_closeness_concentrated_class(spark):
    """Class a = all 1s, class b = all 3s, global = half/half over an
    ordered domain {1,3}: EMD = (1/(2-1)) * |1 - 0.5| = 0.5 for both."""
    from faers_datalakehouse_spark.operators.tcloseness import (
        t_closeness_audit,
    )

    rows = [("a", 1)] * 4 + [("b", 3)] * 4
    df = spark.createDataFrame(rows, "q string, s long")
    got = {r["q"]: r for r in t_closeness_audit(df, ["q"], "s").collect()}
    assert got["a"]["emd_ppm"] == 500_000 and not got["a"]["close"]
    assert got["b"]["emd_ppm"] == 500_000
    # a's cum at value 1 is 1.0 vs global 0.5; b's is 0.0 vs 0.5


def test_t_closeness_ordered_distance_matters(spark):
    """Mass moved two steps costs twice one step: class a = all 1s vs
    uniform{1,2,3} global baseline built from b,c."""
    from faers_datalakehouse_spark.operators.tcloseness import (
        t_closeness_audit,
    )

    # classes: a = {1,1,1}, b = {2,2,2}, c = {3,3,3} -> global uniform
    rows = [("a", 1)] * 3 + [("b", 2)] * 3 + [("c", 3)] * 3
    df = spark.createDataFrame(rows, "q string, s long")
    got = {r["q"]: r["emd_ppm"] for r in
           t_closeness_audit(df, ["q"], "s").collect()}
    # a: cum diffs |1-1/3| + |1-2/3| = 1 -> /(m-1)=2 -> 0.5
    # b: |0-1/3| + |1-2/3| = 2/3 -> /2 = 1/3
    assert got["a"] == 500_000
    assert got["b"] == 333_333
    assert got["c"] == 500_000


def test_mutual_information_independent_vs_dependent(spark):
    from faers_datalakehouse_spark.operators.entropy import (
        mutual_information,
    )

    # perfectly dependent: y == x over 2 symbols, 8 rows
    dep = spark.createDataFrame(
        [("a", "a")] * 4 + [("b", "b")] * 4, "x string, y string"
    )
    got = mutual_information(dep, "x", "y").collect()[0]
    # each cell: c=4, n=8, cx=cy=4 -> bits(32) - bits(16) = 5-4 = 1
    assert got["mi_bits_num"] == 8 and got["mi_milli_bits"] == 1000
    assert (got["n_x"], got["n_y"]) == (2, 2)

    # independent uniform: every cell c=2, cx=cy=4, n=8
    ind_rows = [(x, y) for x in "ab" for y in "cd" for _ in range(2)]
    ind = spark.createDataFrame(ind_rows, "x string, y string")
    got2 = mutual_information(ind, "x", "y").collect()[0]
    # bits(2*8)=4, bits(4*4)=4 -> every term 0
    assert got2["mi_bits_num"] == 0 and got2["mi_milli_bits"] == 0


def test_ams_f2_exact_on_distinct_rows(spark):
    """All-distinct values: F2 = n; the estimator is unbiased and on a
    tiny input we just assert the exact side + estimator sanity."""
    from faers_datalakehouse_spark.operators.ams import ams_f2

    df = spark.createDataFrame([(i,) for i in range(64)], "v long")
    got = ams_f2(df, "v").collect()[0]
    assert got["n_rows"] == 64 and got["f2_exact"] == 64
    assert got["f2_est"] >= 0  # squared sums are nonnegative


def test_ams_f2_heavy_key_dominates(spark):
    """One key with frequency 100 + 10 singletons: exact F2 = 10010 and
    the median-of-means estimate lands within a factor ~3 (tug-of-war
    variance bound 2*F2^2/k on group means; generous deterministic
    envelope for the fixed hash family)."""
    from faers_datalakehouse_spark.operators.ams import ams_f2

    rows = [(0,)] * 100 + [(i,) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "v long")
    got = ams_f2(df, "v").collect()[0]
    assert got["f2_exact"] == 100 * 100 + 10
    assert got["f2_est"] > got["f2_exact"] // 3
    assert got["f2_est"] < got["f2_exact"] * 3
    # Spark `div` truncates toward zero (NOT Python's floor //)
    diff = (got["f2_est"] - got["f2_exact"]) * 1_000_000
    assert got["err_ppm"] == int(diff / got["f2_exact"])


def test_theil_sen_exact_line(spark):
    """y = 3x + noise-free: every pairwise slope is 3000 milli."""
    from faers_datalakehouse_spark.operators.theilsen import (
        theil_sen_trend,
    )

    rows = [("a", x, 3 * x) for x in range(6)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = theil_sen_trend(df).collect()[0]
    assert got["slope_milli"] == 3000
    assert got["n_points"] == 6 and got["n_pairs"] == 15


def test_theil_sen_resists_outlier(spark):
    """One wild point barely moves the median slope (OLS would swing)."""
    from faers_datalakehouse_spark.operators.theilsen import (
        theil_sen_trend,
    )

    rows = [("a", x, 2 * x) for x in range(9)] + [("a", 9, 1000)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = theil_sen_trend(df).collect()[0]
    assert got["slope_milli"] == 2000  # median unaffected


def test_theil_sen_single_point_null(spark):
    from faers_datalakehouse_spark.operators.theilsen import (
        theil_sen_trend,
    )

    df = spark.createDataFrame(
        [("a", 1, 5), ("b", 1, 1), ("b", 2, 4)],
        "series string, x long, y long",
    )
    got = {r["series"]: r for r in theil_sen_trend(df).collect()}
    assert got["a"]["slope_milli"] is None and got["a"]["n_pairs"] == 0
    assert got["b"]["slope_milli"] == 3000


def test_rfm_scores_quintile_bounds_and_inversion(spark):
    """10 customers with monotone everything: most recent/most valuable
    customer scores 555, the stalest/cheapest scores 1 on each axis."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.rfm import rfm_scores

    rows = []
    for c in range(10):
        # customer c ordered (c+1) times, last order c days ago,
        # each order worth (c+1)*10
        for k in range(c + 1):
            rows.append(
                (
                    c,
                    dt.date(2024, 3, 1) - dt.timedelta(days=c + k),
                    (c + 1) * 10.0,
                )
            )
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    got = {r["custkey"]: r for r in rfm_scores(df).collect()}
    assert got[0]["recency_days"] == 0 and got[0]["r_score"] == 5
    assert got[9]["recency_days"] == 9 and got[9]["r_score"] == 1
    assert got[9]["f_score"] == 5 and got[9]["m_score"] == 5
    assert got[0]["f_score"] == 1 and got[0]["m_score"] == 1
    for r in got.values():
        for k in ("r_score", "f_score", "m_score"):
            assert 1 <= r[k] <= 5


def test_rfm_quintiles_are_balanced(spark):
    """n divisible by 5 -> exactly n/5 customers per quintile."""
    import datetime as dt
    from collections import Counter

    from faers_datalakehouse_spark.operators.rfm import rfm_scores

    rows = [
        (c, dt.date(2024, 1, 1) + dt.timedelta(days=c), float(c + 1))
        for c in range(25)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    got = rfm_scores(df).collect()
    counts = Counter(r["m_score"] for r in got)
    assert counts == {s: 5 for s in (1, 2, 3, 4, 5)}


def test_subsample_band_constant_values_is_zero(spark):
    """Constant values: every half-sample mean equals the value, band 0."""
    from faers_datalakehouse_spark.operators.subsample import (
        subsample_mean_band,
    )

    df = spark.createDataFrame(
        [("g", i, 7) for i in range(200)], "grp string, id long, v long"
    )
    got = subsample_mean_band(df, "grp", "id", "v").collect()[0]
    assert got["mean_milli"] == 7000
    assert got["lo_milli"] == 7000 and got["hi_milli"] == 7000
    assert got["band_milli"] == 0


def test_subsample_band_orders_and_brackets_mean(spark):
    """Mixed values: lo <= mean <= hi and the band is positive."""
    from faers_datalakehouse_spark.operators.subsample import (
        subsample_mean_band,
    )

    df = spark.createDataFrame(
        [("g", i, (i * 37) % 100) for i in range(500)],
        "grp string, id long, v long",
    )
    got = subsample_mean_band(df, "grp", "id", "v").collect()[0]
    assert got["lo_milli"] <= got["mean_milli"] <= got["hi_milli"]
    assert got["band_milli"] == got["hi_milli"] - got["lo_milli"]
    assert got["band_milli"] > 0


def test_subsample_band_tiny_group_null_band(spark):
    """A 1-row group leaves ~half the subsamples empty -> NULL band,
    but the full mean still reports."""
    from faers_datalakehouse_spark.operators.subsample import (
        subsample_mean_band,
    )

    df = spark.createDataFrame(
        [("g", 1, 42)], "grp string, id long, v long"
    )
    got = subsample_mean_band(df, "grp", "id", "v").collect()[0]
    assert got["mean_milli"] == 42_000
    assert got["band_milli"] is None


def test_neyman_allocation_sums_to_budget(spark):
    from faers_datalakehouse_spark.operators.allocation import (
        neyman_allocation,
    )

    # strata: a spread, b wider spread, c constant
    rows = (
        [("a", i % 50) for i in range(300)]
        + [("b", (i * 7) % 200) for i in range(100)]
        + [("c", 5) for _ in range(50)]
    )
    df = spark.createDataFrame(rows, "s string, v long")
    got = neyman_allocation(df, "s", "v", 100).collect()
    assert sum(r["alloc"] for r in got) == 100
    by = {r["s"]: r for r in got}
    assert by["c"]["sd_milli"] == 0 and by["c"]["alloc"] == 0
    # b has 4x the spread of a but 1/3 the rows; both get real mass
    assert by["a"]["alloc"] > 0 and by["b"]["alloc"] > 0


def test_neyman_proportional_when_equal_sd(spark):
    """Equal spreads -> allocation proportional to stratum size."""
    from faers_datalakehouse_spark.operators.allocation import (
        neyman_allocation,
    )

    rows = [("big", i % 10) for i in range(400)] + [
        ("small", i % 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "s string, v long")
    got = {r["s"]: r["alloc"] for r in
           neyman_allocation(df, "s", "v", 100).collect()}
    assert got["big"] == 80 and got["small"] == 20


def test_neyman_single_row_stratum_gets_zero_weight(spark):
    from faers_datalakehouse_spark.operators.allocation import (
        neyman_allocation,
    )

    rows = [("a", i) for i in range(100)] + [("lone", 999)]
    df = spark.createDataFrame(rows, "s string, v long")
    got = {r["s"]: r for r in
           neyman_allocation(df, "s", "v", 10).collect()}
    assert got["lone"]["sd_milli"] == 0 and got["lone"]["weight"] == 0
    assert got["a"]["alloc"] == 10


def test_fano_poissonish_constant_series(spark):
    """Constant daily counts: variance 0 -> Fano 0; a 2x-alternating
    series has Var=mean for mean 2 -> check the exact ratio."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.temporal_stats import (
        fano_factor_daily,
    )

    rows = []
    for d in range(4):
        day = dt.datetime(2024, 1, 1 + d)
        rows += [("flat", day)] * 3  # 3 events every day
        # bursty: 1,3,1,3 -> mean 2, sample var 4/3 -> fano 2/3
        rows += [("burst", day)] * (1 if d % 2 == 0 else 3)
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: r for r in
           fano_factor_daily(df, "event_type").collect()}
    assert got["flat"]["fano_milli"] == 0
    assert got["burst"]["n_days"] == 4 and got["burst"]["n_events"] == 8
    # 1000 * (4*20 - 64) / (8*3) = 1000*16/24 = 666
    assert got["burst"]["fano_milli"] == 666


def test_interarrival_positional_quantiles(spark):
    """One user, gaps 10,20,...,100 seconds: lower p50 = 50, p90 = 90."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.temporal_stats import (
        interarrival_quantiles,
    )

    t = dt.datetime(2024, 1, 1)
    rows, cur = [], t
    rows.append(("e", 1, cur, 0))
    for i, gap in enumerate([10 * (k + 1) for k in range(10)]):
        cur = cur + dt.timedelta(seconds=gap)
        rows.append(("e", 1, cur, i + 1))
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts timestamp, event_id long"
    )
    got = interarrival_quantiles(
        df, "event_type", "user_id", "ts", "event_id"
    ).collect()[0]
    assert got["n_gaps"] == 10
    assert got["p50_gap_s"] == 50 and got["p90_gap_s"] == 90


def test_interarrival_gaps_are_per_actor(spark):
    """Two users interleaved in time: gaps never cross users."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.temporal_stats import (
        interarrival_quantiles,
    )

    t = dt.datetime(2024, 1, 1)
    rows = []
    for k in range(5):
        rows.append(("e", 1, t + dt.timedelta(seconds=100 * k), 2 * k))
        rows.append(
            ("e", 2, t + dt.timedelta(seconds=100 * k + 50), 2 * k + 1)
        )
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts timestamp, event_id long"
    )
    got = interarrival_quantiles(
        df, "event_type", "user_id", "ts", "event_id"
    ).collect()[0]
    assert got["n_gaps"] == 8  # 4 per user, never the 50s cross-gaps
    assert got["p50_gap_s"] == 100 and got["p90_gap_s"] == 100


def test_cumulative_by_rank_matches_global_window(spark):
    """Two-phase bucketed cumsum == the single-window reference on a
    value set engineered to straddle bucket boundaries."""
    from faers_datalakehouse_spark.operators.abc import (
        cumulative_by_rank,
    )

    rows = [(i, v) for i, v in enumerate([5, 900, 17, 900, 0, 1 << 21])]
    df = spark.createDataFrame(rows, "item long, v long")
    got = {
        r["item"]: (r["rnk"], int(r["cum_v"]))
        for r in cumulative_by_rank(df, "v", "item").collect()
    }
    # expected order: 2^21 (item 5), 900 (1), 900 (3), 17 (2), 5 (0), 0 (4)
    big = 1 << 21
    assert got[5] == (1, big)
    assert got[1] == (2, big + 900)
    assert got[3] == (3, big + 1800)
    assert got[2] == (4, big + 1817)
    assert got[0] == (5, big + 1822)
    assert got[4] == (6, big + 1822)


def test_abc_classes_census(spark):
    """One dominant item (84%), one mid (12%), tail: A=1 item, B=1,
    C rest; shares sum to ~1000 milli."""
    from faers_datalakehouse_spark.operators.abc import abc_classes

    rows = [(1, 8400), (2, 1200), (3, 200), (4, 150), (5, 50)]
    df = spark.createDataFrame(rows, "item long, c long")
    got = {r["abc_class"]: r for r in
           abc_classes(df, "item", "c").collect()}
    assert got["A"]["n_items"] == 1 and got["A"]["class_c"] == 8400
    assert got["B"]["n_items"] == 1 and got["B"]["class_c"] == 1200
    assert got["C"]["n_items"] == 3
    assert sum(r["share_milli"] for r in got.values()) in (999, 1000)


def test_survival_table_censoring_and_risk_sets(spark):
    """3 users: A active day0-2 (last == corpus end -> censored), B
    churns after 1 day of tenure, C churns same-day (tenure 0)."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.survival import (
        survival_table,
    )

    d = lambda i: dt.datetime(2024, 1, 1 + i)  # noqa: E731
    rows = [
        ("A", d(0)), ("A", d(2)),      # tenure 2, censored (end day)
        ("B", d(0)), ("B", d(1)),      # tenure 1, churned
        ("C", d(0)),                   # tenure 0, churned
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["tenure_days"]: r for r in
           survival_table(df, "user_id").collect()}
    assert got[0]["n_at_risk"] == 3
    assert got[0]["n_churned"] == 1 and got[0]["n_censored"] == 0
    assert got[0]["hazard_ppm"] == 333_333
    assert got[1]["n_at_risk"] == 2 and got[1]["n_churned"] == 1
    assert got[1]["hazard_ppm"] == 500_000
    assert got[2]["n_at_risk"] == 1 and got[2]["n_churned"] == 0
    assert got[2]["n_censored"] == 1 and got[2]["hazard_ppm"] == 0


def test_survival_all_censored_zero_hazard(spark):
    """Everyone still active on the final day: hazard 0 everywhere."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.survival import (
        survival_table,
    )

    end = dt.datetime(2024, 1, 9)
    rows = []
    for u in range(4):
        rows.append((f"u{u}", dt.datetime(2024, 1, 1 + u)))
        rows.append((f"u{u}", end))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = survival_table(df, "user_id").collect()
    assert all(r["hazard_ppm"] == 0 for r in got)
    assert sum(r["n_censored"] for r in got) == 4


def test_shape_of_classes_and_runs(spark):
    from faers_datalakehouse_spark.operators.shapes import shape_of
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("Customer#000000042",), ("abc-1",), ("X",), ("a1B2",)],
        "v string",
    )
    got = [r[0] for r in df.select(shape_of(F.col("v"))).collect()]
    assert got == ["Aa+#9+", "a+-9", "A", "a9A9"]


def test_shape_profile_census_and_shares(spark):
    from faers_datalakehouse_spark.operators.shapes import shape_profile

    rows = [(f"User#{i:04d}",) for i in range(8)] + [("drifted@x",) * 1] * 2
    df = spark.createDataFrame(rows, "v string")
    got = {r["shape"]: r for r in shape_profile(df, "v").collect()}
    assert got["Aa+#9+"]["n"] == 8 and got["Aa+#9+"]["share_milli"] == 800
    assert got["a+@a"]["n"] == 2


def test_odds_ratio_known_table(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        odds_ratio_by_group,
    )

    # a=20, b=10, c=5, d=10 -> OR = 200/50 = 4.0
    rows = (
        [("g", 1, 1)] * 20 + [("g", 1, 0)] * 10
        + [("g", 0, 1)] * 5 + [("g", 0, 0)] * 10
    )
    df = spark.createDataFrame(rows, "grp string, e int, o int")
    got = odds_ratio_by_group(df, "grp", "e", "o").collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (20, 10, 5, 10)
    assert got["or_milli"] == 4000


def test_odds_ratio_empty_cell_null(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        odds_ratio_by_group,
    )

    rows = [("g", 1, 1)] * 3 + [("g", 0, 0)] * 3  # b = c = 0
    df = spark.createDataFrame(rows, "grp string, e int, o int")
    got = odds_ratio_by_group(df, "grp", "e", "o").collect()[0]
    assert got["or_milli"] is None


def test_runs_test_alternating_series(spark):
    """Perfectly alternating ups/downs: every move starts a new run ->
    z > 0 (too many runs)."""
    from faers_datalakehouse_spark.operators.stattests import (
        runs_test_by_series,
    )

    ys = [10, 20, 10, 20, 10, 20, 10, 20]
    rows = [("s", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = runs_test_by_series(df, "grp", "x", "y").collect()[0]
    assert got["n_up"] == 4 and got["n_down"] == 3
    assert got["n_runs"] == 7  # every move flips direction
    assert got["z_milli"] > 0


def test_runs_test_trending_series(spark):
    """Monotone rise then monotone fall: exactly 2 runs -> z < 0."""
    from faers_datalakehouse_spark.operators.stattests import (
        runs_test_by_series,
    )

    ys = [1, 2, 3, 4, 5, 4, 3, 2, 1]
    rows = [("s", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = runs_test_by_series(df, "grp", "x", "y").collect()[0]
    assert got["n_runs"] == 2 and got["z_milli"] < 0


def test_runs_test_drops_ties(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        runs_test_by_series,
    )

    ys = [5, 5, 6, 6, 7]  # two ties dropped -> moves: up, up
    rows = [("s", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = runs_test_by_series(df, "grp", "x", "y").collect()[0]
    assert got["n_up"] == 2 and got["n_down"] == 0
    assert got["n_runs"] == 1 and got["z_milli"] is None


def test_hodges_lehmann_symmetric_series(spark):
    """Symmetric values around 10: pseudomedian == 10 exactly."""
    from faers_datalakehouse_spark.operators.theilsen import (
        hodges_lehmann_by_series,
    )

    rows = [("s", x, y) for x, y in enumerate([6, 8, 10, 12, 14])]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = hodges_lehmann_by_series(df).collect()[0]
    assert got["n_points"] == 5 and got["n_pairs"] == 15
    assert got["hl_milli"] == 10_000


def test_hodges_lehmann_resists_outlier(spark):
    """One wild value moves the mean a lot, the pseudomedian a little."""
    from faers_datalakehouse_spark.operators.theilsen import (
        hodges_lehmann_by_series,
    )

    ys = [10] * 9 + [1000]
    rows = [("s", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = hodges_lehmann_by_series(df).collect()[0]
    assert got["hl_milli"] == 10_000  # median Walsh average unmoved


def test_bits_big_sql_matches_python_bit_length(spark):
    """The shift-safe floor(log2) helper is exact across all three
    branches, including the 2^62 / 2^93 boundaries (ADVICE r9: MI's
    bit-length arguments are count products that exceed int64)."""
    from pyspark.sql import functions as F

    from faers_datalakehouse_spark.operators.entropy import _bits_big_sql

    vals = [
        1, 2, 3, 7, 1 << 40,
        (1 << 62) - 1, 1 << 62, (1 << 62) + 1,
        (1 << 93) - 1, 1 << 93, (1 << 93) + 1,
        (1 << 124) - 1,
    ]
    df = spark.createDataFrame(
        [(str(v),) for v in vals], "s string"
    ).select(F.col("s").cast("decimal(38,0)").alias("v"))
    got = [
        r["b"]
        for r in df.select(F.expr(_bits_big_sql("v")).alias("b"))
        .collect()
    ]
    assert got == [v.bit_length() - 1 for v in vals]
