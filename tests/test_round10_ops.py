"""Round-10 additions: k-sample/pairwise rank tests, categorical
association, cross-source divergence, the concurrency sweep line, and
the ordered trend test — known-value cases plus the degenerate guards."""

from __future__ import annotations


def test_kruskal_wallis_known_separated(spark):
    """Cohorts {1,2}, {3,4}, {5,6}: no ties, doubled rank sums 6/14/22,
    H = 358/14 - 21 = 4.5714... -> 4571 milli."""
    from faers_datalakehouse_spark.operators.ranktests import (
        kruskal_wallis_by_group,
    )

    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 1),
            ("g", 4, 1), ("g", 5, 2), ("g", 6, 2)]
    df = spark.createDataFrame(rows, "grp string, v long, s int")
    got = kruskal_wallis_by_group(df, "grp", "v", "s", [0, 1, 2]).collect()[0]
    assert (got["n"], got["n_0"], got["n_1"], got["n_2"]) == (6, 2, 2, 2)
    assert got["h_milli"] == 4571


def test_kruskal_wallis_all_tied_is_null(spark):
    from faers_datalakehouse_spark.operators.ranktests import (
        kruskal_wallis_by_group,
    )

    rows = [("g", 7, s) for s in (0, 0, 1, 1, 2, 2)]
    df = spark.createDataFrame(rows, "grp string, v long, s int")
    got = kruskal_wallis_by_group(df, "grp", "v", "s", [0, 1, 2]).collect()[0]
    assert got["h_milli"] is None


def test_kruskal_wallis_empty_cohort_is_null(spark):
    from faers_datalakehouse_spark.operators.ranktests import (
        kruskal_wallis_by_group,
    )

    rows = [("g", 1, 0), ("g", 2, 0), ("g", 3, 1), ("g", 4, 1)]
    df = spark.createDataFrame(rows, "grp string, v long, s int")
    got = kruskal_wallis_by_group(df, "grp", "v", "s", [0, 1, 2]).collect()[0]
    assert got["n_2"] == 0 and got["h_milli"] is None


def test_kendall_tau_perfect_concordance(spark):
    from faers_datalakehouse_spark.operators.ranktests import (
        kendall_tau_by_series,
    )

    rows = [("s", x, 10 * x) for x in range(1, 6)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = kendall_tau_by_series(df, "series", "x", "y").collect()[0]
    assert got["nc"] == 10 and got["nd"] == 0 and got["ty_pairs"] == 0
    assert got["tau_milli"] == 1000


def test_kendall_tau_perfect_discordance(spark):
    from faers_datalakehouse_spark.operators.ranktests import (
        kendall_tau_by_series,
    )

    rows = [("s", x, -x) for x in range(1, 6)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = kendall_tau_by_series(df, "series", "x", "y").collect()[0]
    assert got["tau_milli"] == -1000


def test_kendall_tau_constant_y_is_null(spark):
    from faers_datalakehouse_spark.operators.ranktests import (
        kendall_tau_by_series,
    )

    rows = [("s", x, 5) for x in range(4)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = kendall_tau_by_series(df, "series", "x", "y").collect()[0]
    assert got["ty_pairs"] == 6 and got["tau_milli"] is None


def test_theils_u_functional_dependence(spark):
    """x = f(y): H(x|y) = 0, so U = 1000 exactly."""
    from faers_datalakehouse_spark.operators.assoc import theils_u

    rows = [(f"x{i % 3}", f"y{i % 3}") for i in range(12)]
    df = spark.createDataFrame(rows, "x string, y string")
    got = theils_u(df, "x", "y").collect()[0]
    assert got["hxy_bits_num"] == 0
    assert got["u_milli"] == 1000


def test_theils_u_constant_x_is_null(spark):
    from faers_datalakehouse_spark.operators.assoc import theils_u

    rows = [("only", f"y{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "x string, y string")
    got = theils_u(df, "x", "y").collect()[0]
    assert got["hx_bits_num"] == 0 and got["u_milli"] is None


def test_source_xentropy_identical_and_disjoint(spark):
    """Identical sources: xent = 0. Disjoint vocab: every token pays
    bits(n_b + V) with no shared discount."""
    from faers_datalakehouse_spark.operators.divergence import (
        source_xentropy,
    )

    docs = spark.createDataFrame(
        [("a", 1, "w w"), ("b", 2, "w w"), ("c", 3, "zz zz")],
        "source string, doc_id long, text string",
    )
    got = {
        (r["src_a"], r["src_b"]): r
        for r in source_xentropy(docs).collect()
    }
    # a vs b: V=2 (w, zz); n_b=2; bits(2+2)=2; shared term: 2*bits(2+1)=2
    r = got[("a", "b")]
    assert r["shared_types"] == 1
    assert r["xent_bits_num"] == 2 * 2 - 2 * 1
    # a vs c: no shared words -> 2 * bits(4) = 4, milli = 2000
    r = got[("a", "c")]
    assert r["shared_types"] == 0 and r["xent_bits_num"] == 4
    assert r["xent_milli_bits"] == 2000


def test_zipf_slope_known_powers_of_two(spark):
    """Freqs 8,4,2,1 at ranks 1..4: bits points (0,3),(1,2),(1,1),
    (2,0) -> OLS slope -12/8 = -1500 milli."""
    from faers_datalakehouse_spark.operators.divergence import zipf_slope

    text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    docs = spark.createDataFrame(
        [("s", 1, text)], "source string, doc_id long, text string"
    )
    got = zipf_slope(docs).collect()[0]
    assert got["n_types"] == 4 and got["n_tokens"] == 15
    assert got["slope_milli"] == -1500


def test_peak_concurrency_within_day(spark):
    """Starts at 00:00, 00:10, 00:40 with 30-min windows: the first two
    overlap (peak 2); the 00:40 start coincides with the 00:10 end
    (net 0 at that instant), so the peak stays 2."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.concurrency import (
        peak_concurrency,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [(base,), (base + dt.timedelta(minutes=10),),
            (base + dt.timedelta(minutes=40),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = peak_concurrency(df).collect()
    assert len(got) == 1
    assert got[0]["n_starts"] == 3 and got[0]["peak_concurrency"] == 2


def test_peak_concurrency_carries_across_days(spark):
    """A 23:50 start stays open into the next day: the day-2 running
    sum begins at 1, so a single day-2 start peaks at 2 — exercises the
    cross-bucket offset stitching."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.concurrency import (
        peak_concurrency,
    )

    rows = [(dt.datetime(2024, 3, 1, 23, 50),),
            (dt.datetime(2024, 3, 2, 0, 0),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r["day"].isoformat(): r for r in peak_concurrency(df).collect()}
    assert got["2024-03-01"]["peak_concurrency"] == 1
    assert got["2024-03-02"]["peak_concurrency"] == 2
    assert got["2024-03-02"]["n_starts"] == 1


def test_cochran_armitage_perfect_trend(spark):
    """Doses 1,2,3 with event rates 0, 1/2, 1: z = 12/6 = 2.0 exactly."""
    from faers_datalakehouse_spark.operators.trendtest import (
        cochran_armitage_by_group,
    )

    rows = [("g", 1, 0), ("g", 1, 0), ("g", 2, 0),
            ("g", 2, 1), ("g", 3, 1), ("g", 3, 1)]
    df = spark.createDataFrame(rows, "grp string, dose long, o int")
    got = cochran_armitage_by_group(df, "grp", "dose", "o").collect()[0]
    assert (got["n"], got["r_events"]) == (6, 3)
    assert got["z_milli"] == 2000


def test_cochran_armitage_constant_outcome_is_null(spark):
    from faers_datalakehouse_spark.operators.trendtest import (
        cochran_armitage_by_group,
    )

    rows = [("g", d, 1) for d in (1, 2, 3, 1, 2, 3)]
    df = spark.createDataFrame(rows, "grp string, dose long, o int")
    got = cochran_armitage_by_group(df, "grp", "dose", "o").collect()[0]
    assert got["z_milli"] is None


def test_brown_forsythe_known_spreads(spark):
    """Cohorts {0,10}, {5,5}, {0,20}: |x-med| gives S=[10,0,20],
    Q=[100,0,400] -> SSB=100, SSW=250, F=(100/2)/(250/3)=0.6."""
    from faers_datalakehouse_spark.operators.grouptests import (
        brown_forsythe_by_group,
    )

    rows = [("g", 0, 0), ("g", 10, 0), ("g", 5, 1),
            ("g", 5, 1), ("g", 0, 2), ("g", 20, 2)]
    df = spark.createDataFrame(rows, "grp string, v long, s int")
    got = brown_forsythe_by_group(df, "grp", "v", "s", [0, 1, 2]).collect()[0]
    assert (got["n"], got["n_0"], got["n_1"], got["n_2"]) == (6, 2, 2, 2)
    assert got["f_milli"] == 600


def test_brown_forsythe_zero_deviation_is_null(spark):
    from faers_datalakehouse_spark.operators.grouptests import (
        brown_forsythe_by_group,
    )

    rows = [("g", 5, s) for s in (0, 0, 1, 1, 2, 2)]
    df = spark.createDataFrame(rows, "grp string, v long, s int")
    got = brown_forsythe_by_group(df, "grp", "v", "s", [0, 1, 2]).collect()[0]
    assert got["f_milli"] is None


def test_group_medians_lower_median(spark):
    """Even-sized group takes the LOWER middle value exactly."""
    from faers_datalakehouse_spark.operators.grouptests import group_medians

    df = spark.createDataFrame(
        [("g", v) for v in (1, 3, 7, 9)], "k string, v long"
    )
    got = group_medians(df, ["k"], "v").collect()[0]
    assert got["med"] == 3


def test_gumbel_fit_two_blocks(spark):
    """Block maxima 10 and 20: closed-form MoM beta and mu."""
    import datetime as dt
    import math

    from faers_datalakehouse_spark.operators.extremes import (
        gumbel_fit_by_series,
    )

    rows = [("s", dt.date(2024, 1, 1), 10), ("s", dt.date(2024, 2, 1), 20)]
    daily = spark.createDataFrame(rows, "series string, month date, y long")
    got = gumbel_fit_by_series(daily, "series", "y").collect()[0]
    sd = math.sqrt((2 * 500 - 900) / (2 * 1))
    beta = sd * math.sqrt(6.0) / 3.141592653589793
    assert got["beta_milli"] == math.floor(beta * 1000)
    assert got["mu_milli"] == math.floor(
        (15.0 - 0.5772156649015329 * beta) * 1000
    )
    assert got["max_block"] == 20


def test_record_days_known_series(spark):
    """Counts 1,3,2,5 by day: records on days 1, 2, 4."""
    import datetime as dt

    from faers_datalakehouse_spark.operators.extremes import (
        record_days_by_series,
    )

    rows = [
        ("s", dt.date(2024, 1, d + 1), c)
        for d, c in enumerate([1, 3, 2, 5])
    ]
    daily = spark.createDataFrame(rows, "series string, day date, y long")
    got = record_days_by_series(daily, "series", "day", "y").collect()[0]
    assert got["n_days"] == 4 and got["n_records"] == 3
    assert got["last_record_day"].isoformat() == "2024-01-04"


def test_cond_entropy_rate_deterministic_vs_branching(spark):
    """'a b a b a' has fully deterministic transitions (H=0);
    'a a a b' branches once: num = 1 bit over 3 bigrams."""
    from faers_datalakehouse_spark.operators.divergence import (
        cond_entropy_rate,
    )

    docs = spark.createDataFrame(
        [("det", 1, "a b a b a"), ("br", 2, "a a a b")],
        "source string, doc_id long, text string",
    )
    got = {r["source"]: r for r in cond_entropy_rate(docs).collect()}
    assert got["det"]["h2_bits_num"] == 0
    assert got["br"]["n_bigrams"] == 3
    assert got["br"]["h2_bits_num"] == 1
    assert got["br"]["h2_milli_bits"] == 333


def test_phi_coefficient_perfect_and_independent(spark):
    from faers_datalakehouse_spark.operators.stattests import (
        phi_coefficient_by_group,
    )

    perfect = [("p", 1, 1), ("p", 1, 1), ("p", 0, 0), ("p", 0, 0)]
    indep = [("i", e, o) for e in (0, 1) for o in (0, 1)]
    df = spark.createDataFrame(
        perfect + indep, "grp string, e int, o int"
    )
    got = {
        r["grp"]: r
        for r in phi_coefficient_by_group(df, "grp", "e", "o").collect()
    }
    assert got["p"]["phi_milli"] == 1000
    assert got["i"]["phi_milli"] == 0


def test_ljung_box_monotone_is_large_constant_is_null(spark):
    """A strongly trending series has huge positive Q; a constant
    series has zero variance -> NULL."""
    from faers_datalakehouse_spark.operators.tstests import (
        ljung_box_by_series,
    )

    rows = [("up", x, 10 * x) for x in range(12)] + [
        ("flat", x, 7) for x in range(12)
    ]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = {r["series"]: r for r in
           ljung_box_by_series(df, "series", "x", "y").collect()}
    assert got["flat"]["q_milli"] is None
    assert got["up"]["q_milli"] > 10_000  # >> any white-noise Q


def test_ljung_box_too_short_is_null(spark):
    from faers_datalakehouse_spark.operators.tstests import (
        ljung_box_by_series,
    )

    rows = [("s", x, x * x) for x in range(5)]  # n=5 <= m+1
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = ljung_box_by_series(df, "series", "x", "y").collect()[0]
    assert got["q_milli"] is None


def test_adf_t_known_small_series(spark):
    """y = 5,1,4,2,3: centered moments 40/116/-68, det 16 ->
    t = -68*sqrt(2)/4 = -24.0416 -> floor -24042 milli."""
    from faers_datalakehouse_spark.operators.tstests import (
        adf_t_by_series,
    )

    ys = [5, 1, 4, 2, 3]
    rows = [("s", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = adf_t_by_series(df, "series", "x", "y").collect()[0]
    assert got["n_pairs"] == 4
    assert got["t_milli"] == -24042


def test_adf_t_perfect_correlation_is_null(spark):
    """Perfectly alternating series: |r| = 1, determinant 0 -> NULL
    (the statistic is undefined, not infinite)."""
    from faers_datalakehouse_spark.operators.tstests import (
        adf_t_by_series,
    )

    ys = [10, 0, 10, 0, 10]
    rows = [("s", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = adf_t_by_series(df, "series", "x", "y").collect()[0]
    assert got["t_milli"] is None


def test_permutation_entropy_monotone_and_zigzag(spark):
    """Monotone: one ordinal pattern -> 0 bits. Perfect zigzag: two
    patterns at equal frequency -> exactly 1 bit (1000 milli)."""
    from faers_datalakehouse_spark.operators.tstests import (
        permutation_entropy_by_series,
    )

    mono = [("mono", x, x) for x in range(6)]
    zig = [("zig", x, [1, 2][x % 2]) for x in range(6)]
    df = spark.createDataFrame(
        mono + zig, "series string, x long, y long"
    )
    got = {r["series"]: r for r in
           permutation_entropy_by_series(df, "series", "x", "y").collect()}
    assert got["mono"]["pe_bits_num"] == 0
    assert got["zig"]["n_windows"] == 4
    assert got["zig"]["pe_milli_bits"] == 1000


def test_permutation_entropy_skips_gapped_triples(spark):
    """A missing day voids every triple that spans it."""
    from faers_datalakehouse_spark.operators.tstests import (
        permutation_entropy_by_series,
    )

    xs = [0, 1, 2, 3, 5, 6, 7]  # gap at 4
    rows = [("s", x, x * 3 % 7) for x in xs]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = permutation_entropy_by_series(df, "series", "x", "y").collect()[0]
    # triples starting at 0,1 and 5 only (2,3 span the gap)
    assert got["n_windows"] == 3


def test_water_filling_partial_budget(spark):
    """Sizes 10/20/70, budget = half of 100: the two small sources are
    fully funded (10+20 plus level 20 for the big one = 50)."""
    from faers_datalakehouse_spark.operators.curation import water_filling

    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 70)], "source string, n_tokens long"
    )
    got = {r["source"]: r for r in water_filling(df).collect()}
    assert got["a"]["alloc_tokens"] == 10 and not got["a"]["capped"]
    assert got["b"]["alloc_tokens"] == 20 and not got["b"]["capped"]
    assert got["c"]["alloc_tokens"] == 20 and got["c"]["capped"]
    assert sum(r["alloc_tokens"] for r in got.values()) == 50


def test_water_filling_hamilton_remainder(spark):
    """Equal sources, budget 7 of 15: level 2, remainder 1 goes to the
    first source in (size, name) order -> 3/2/2."""
    from faers_datalakehouse_spark.operators.curation import water_filling

    df = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "source string, n_tokens long"
    )
    got = {
        r["source"]: r["alloc_tokens"]
        for r in water_filling(df, budget_num=7, budget_den=15).collect()
    }
    assert got == {"a": 3, "b": 2, "c": 2}


def test_water_filling_budget_covers_all(spark):
    from faers_datalakehouse_spark.operators.curation import water_filling

    df = spark.createDataFrame(
        [("a", 3), ("b", 4)], "source string, n_tokens long"
    )
    got = {r["source"]: r for r in
           water_filling(df, budget_num=1, budget_den=1).collect()}
    assert all(not r["capped"] for r in got.values())
    assert got["a"]["alloc_tokens"] == 3 and got["b"]["alloc_tokens"] == 4


def test_pii_density_counts_patterns(spark):
    from faers_datalakehouse_spark.operators.curation import pii_density

    docs = spark.createDataFrame(
        [("s", 1, "contact a@b.com or 555-123-4567; ssn 123-45-6789"),
         ("s", 2, "clean text with no identifiers at all")],
        "source string, doc_id long, text string",
    )
    got = pii_density(docs).collect()[0]
    assert (got["n_emails"], got["n_phones"], got["n_ssns"]) == (1, 1, 1)
    assert got["n_docs"] == 2
    assert got["pii_ppm"] == 3_000_000 // got["n_chars"]


def test_dedup_keep_best_longest_wins_tie_min_id(spark):
    from faers_datalakehouse_spark.operators.curation import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, "short"), (2, "long long"), (3, "also long"), (9, "lonely")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    got = dedup_keep_best(docs, pairs).collect()
    assert len(got) == 1  # singletons are not clusters
    r = got[0]
    # lens: 5, 9, 9 -> longest tie between 2 and 3 -> keep 2
    assert r["cluster_id"] == 1 and r["kept_id"] == 2
    assert r["n_members"] == 3 and r["kept_len"] == 9
    assert r["chars_dropped"] == 5 + 9


def test_bpe_fertility_invariants(spark):
    """Tokens >= words (fertility >= 1000) and chars equal the sum of
    the normalized word lengths."""
    from faers_datalakehouse_spark.operators.bpe import (
        bpe_fertility,
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [("s", 1, "aa aa bb"), ("t", 2, "xyz xyz")],
        "source string, doc_id long, text string",
    )
    merges = train_bpe_merges(docs, n_merges=3)
    got = {r["source"]: r for r in bpe_fertility(docs, merges).collect()}
    assert got["s"]["n_words"] == 3 and got["s"]["n_chars"] == 6
    assert got["t"]["n_words"] == 2 and got["t"]["n_chars"] == 6
    for r in got.values():
        assert r["fertility_milli"] >= 1000
        assert r["n_tokens"] >= r["n_words"]
