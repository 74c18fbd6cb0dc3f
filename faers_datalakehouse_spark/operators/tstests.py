"""Time-series diagnostics on the daily grain — Ljung-Box portmanteau
(is there ANY autocorrelation in the first m lags? the standard
"is this residual series white noise" gate), the Dickey-Fuller t
statistic (unit root / mean reversion: does the series drift like a
random walk or revert?), and permutation entropy (ordinal-pattern
complexity: periodic/templated series score low, noisy series high —
Bandt & Pompe 2002).

Exactness discipline: every sufficient statistic is an exact integer
(daily counts, their lagged products in DECIMAL(38,0) — overflow-audit
rule) and each headline is ONE fixed IEEE expression tree over them.
Ljung-Box sums over a FIXED lag count m, so the per-lag terms are
pivoted into columns and the Q sum is a literal m-term expression —
never a float SUM over rows, whose accumulation order DuckDB and Spark
would not replay identically. The autocorrelations use the full-series
mean in the exact n²-scaled form ``C_k*n² = n²*S'xy - n*S*(S'x+S'y) +
(n-k)*S²`` so no rational ever forms before the final double.
Permutation entropy uses the bit-length idiom over ordinal-pattern
counts (ties broken toward "later is greater" — deterministic in both
engines).

Scale shape (100 TB): the daily rollup is the only full-size shuffle;
lag pairing is an equi-join of the day-grain frame against itself
(calendar-bounded), patterns come from two keyed lead windows over the
same frame.

No counterpart in the reference repo (time-series extension surface,
alongside ``lag_autocorr`` / ``cusum_changepoint`` / ``runs_test``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LB_LAGS = 5


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from faers_datalakehouse_spark.sources.tables import read_events

    events = read_events(spark, sf_dir)
    return (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .select(
            "event_type",
            F.datediff("day", F.to_date(F.lit("1970-01-01")))
            .cast("long")
            .alias("x"),
            "y",
        )
    )


def ljung_box_by_series(
    daily: DataFrame,
    series_col: str,
    x_col: str,
    y_col: str,
    m: int = LB_LAGS,
) -> DataFrame:
    """``(series_col, n, q_milli)`` — the Ljung-Box Q over lags 1..m
    on a REGULAR series (consecutive integer x; the query feeds days).
    ``Q = n(n+2) * sum_k r_k² / (n-k)`` with r_k from full-series-mean
    autocovariances. NULL when n <= m+1 or the series is constant."""
    base = daily.select(
        series_col, F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    )
    tot = base.groupBy(series_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("_y").cast("decimal(38,0)") * F.col("_y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    lags = base.select(
        series_col,
        "_x",
        F.col("_y").alias("_ya"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, m + 1)])
        ).alias("lag"),
    ).withColumn("_xb", F.col("_x") + F.col("lag"))
    paired = lags.join(
        base.select(
            series_col,
            F.col("_x").alias("_xb"),
            F.col("_y").alias("_yb"),
        ),
        [series_col, "_xb"],
    )
    per_lag = paired.groupBy(series_col, "lag").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("_ya").cast("decimal(38,0)").alias("sa"),
        F.sum("_yb").cast("decimal(38,0)").alias("sb"),
        F.sum(F.col("_ya").cast("decimal(38,0)") * F.col("_yb"))
        .cast("decimal(38,0)")
        .alias("sab"),
    )
    # pivot the m lag rows into fixed columns so Q is a literal tree
    pivots = []
    for k in range(1, m + 1):
        for c in ("np", "sa", "sb", "sab"):
            pivots.append(
                F.sum(
                    F.when(F.col("lag") == k, F.col(c)).otherwise(
                        F.lit(0)
                    )
                ).alias(f"{c}_{k}")
            )
    wide = per_lag.groupBy(series_col).agg(*pivots)
    # LEFT join: a series with zero lag pairs anywhere (all gaps > m
    # days) still emits (series, n, NULL) like the other degenerate
    # guards — the np_k > 0 conjunction sees NULL and yields NULL.
    g = tot.join(wide, series_col, "left")
    # C_k * n² = n²*sab - n*s*(sa+sb) + np_k*s² (np_k = actual pair
    # count — exact even when the calendar has gaps); C_0*n = n*syy - s²
    c0 = (
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
    )
    terms = []
    for k in range(1, m + 1):
        ck = (
            f"(CAST(n AS DOUBLE) * n * CAST(sab_{k} AS DOUBLE)"
            f" - CAST(n AS DOUBLE) * CAST(s AS DOUBLE)"
            f"   * (CAST(sa_{k} AS DOUBLE) + CAST(sb_{k} AS DOUBLE))"
            f" + CAST(np_{k} AS DOUBLE)"
            f"   * CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        )
        rk = f"({ck} / (CAST(n AS DOUBLE) * {c0}))"
        terms.append(f"{rk} * {rk} / CAST(np_{k} AS DOUBLE)")
    q_expr = (
        f"CAST(n AS DOUBLE) * (n + 2.0) * ({' + '.join(terms)})"
    )
    nonempty = " AND ".join(f"np_{k} > 0" for k in range(1, m + 1))
    return (
        g.withColumn(
            "q_milli",
            F.expr(
                f"CASE WHEN n > {m + 1} AND {nonempty} AND {c0} > 0 "
                f"THEN CAST(floor(({q_expr}) * 1000.0) AS BIGINT) END"
            ),
        )
        .select(series_col, "n", "q_milli")
        .orderBy(series_col)
    )


def ljung_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each event type's daily volume white noise over the first
    5 lags, or serially dependent?"""
    return ljung_box_by_series(
        _daily(spark, sf_dir), "event_type", "x", "y"
    )


def ljung_box_oracle_sql(m: int = LB_LAGS) -> str:
    pivots = ",\n         ".join(
        f"CAST(sum(CASE WHEN lag = {k} THEN {c} ELSE 0 END)"
        f" AS HUGEINT) AS {c}_{k}"
        for k in range(1, m + 1)
        for c in ("np", "sa", "sb", "sab")
    )
    c0 = (
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
    )
    terms = []
    for k in range(1, m + 1):
        ck = (
            f"(CAST(n AS DOUBLE) * n * CAST(sab_{k} AS DOUBLE)"
            f" - CAST(n AS DOUBLE) * CAST(s AS DOUBLE)"
            f"   * (CAST(sa_{k} AS DOUBLE) + CAST(sb_{k} AS DOUBLE))"
            f" + CAST(np_{k} AS DOUBLE)"
            f"   * CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        )
        rk = f"({ck} / (CAST(n AS DOUBLE) * {c0}))"
        terms.append(f"{rk} * {rk} / CAST(np_{k} AS DOUBLE)")
    q_expr = f"CAST(n AS DOUBLE) * (n + 2.0) * ({' + '.join(terms)})"
    nonempty = " AND ".join(f"np_{k} > 0" for k in range(1, m + 1))
    return f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS HUGEINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM daily GROUP BY 1
),
lags AS (SELECT unnest(range(1, {m + 1})) AS lag),
per_lag AS (
  SELECT a.event_type, l.lag,
         CAST(count(*) AS BIGINT) AS np,
         CAST(sum(a.y) AS HUGEINT) AS sa,
         CAST(sum(b.y) AS HUGEINT) AS sb,
         CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS sab
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.event_type = a.event_type
              AND b.x = a.x + CAST(l.lag AS BIGINT)
  GROUP BY 1, 2
),
wide AS (
  SELECT event_type,
         {pivots}
  FROM per_lag GROUP BY 1
),
g AS (SELECT * FROM tot LEFT JOIN wide USING (event_type))
SELECT event_type, n,
       CASE WHEN n > {m + 1} AND {nonempty} AND {c0} > 0 THEN
         CAST(floor(({q_expr}) * 1000.0) AS BIGINT) END AS q_milli
FROM g
ORDER BY event_type
"""


def adf_t_by_series(
    daily: DataFrame, series_col: str, x_col: str, y_col: str
) -> DataFrame:
    """``(series_col, n_pairs, t_milli)`` — the Dickey-Fuller t
    statistic of the lag-1 regression ``Δy_t = α + ρ·y_{t-1}`` over
    consecutive-day pairs. Strongly negative = mean-reverting
    (stationary); near 0 = random-walk-like. Computed as the
    correlation-form t: ``t = Sxd · sqrt(n-2) / sqrt(Sxx·Sdd - Sxd²)``
    over centered decimal moments. NULL when n < 3 or degenerate."""
    base = daily.select(
        series_col, F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    )
    nxt = base.select(
        series_col,
        (F.col("_x") - 1).alias("_x"),
        F.col("_y").alias("_y1"),
    )
    pairs = base.join(nxt, [series_col, "_x"]).select(
        series_col,
        F.col("_y").alias("_lag"),
        (F.col("_y1") - F.col("_y")).alias("_d"),
    )
    g = pairs.groupBy(series_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_lag").cast("decimal(38,0)").alias("sx"),
        F.sum("_d").cast("decimal(38,0)").alias("sd"),
        F.sum(F.col("_lag").cast("decimal(38,0)") * F.col("_lag"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("_lag").cast("decimal(38,0)") * F.col("_d"))
        .cast("decimal(38,0)")
        .alias("sxd"),
        F.sum(F.col("_d").cast("decimal(38,0)") * F.col("_d"))
        .cast("decimal(38,0)")
        .alias("sdd"),
    )
    sxx_c = (
        "(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    sxd_c = (
        "(CAST(n_pairs AS DOUBLE) * CAST(sxd AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE))"
    )
    sdd_c = (
        "(CAST(n_pairs AS DOUBLE) * CAST(sdd AS DOUBLE)"
        " - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))"
    )
    return (
        g.withColumn(
            "t_milli",
            F.expr(
                f"CASE WHEN n_pairs >= 3 AND "
                f"{sxx_c} * {sdd_c} - {sxd_c} * {sxd_c} > 0 THEN "
                f"CAST(floor({sxd_c} * sqrt(n_pairs - 2.0) * 1000.0"
                f" / sqrt({sxx_c} * {sdd_c} - {sxd_c} * {sxd_c}))"
                " AS BIGINT) END"
            ),
        )
        .select(series_col, "n_pairs", "t_milli")
        .orderBy(series_col)
    )


def adf_t_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does each event type's daily volume mean-revert or wander?"""
    return adf_t_by_series(_daily(spark, sf_dir), "event_type", "x", "y")


ADF_T_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.y AS lag_y, b.y - a.y AS d
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.x = a.x + 1
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(lag_y) AS HUGEINT) AS sx,
         CAST(sum(d) AS HUGEINT) AS sd,
         CAST(sum(CAST(lag_y AS HUGEINT) * lag_y) AS HUGEINT) AS sxx,
         CAST(sum(CAST(lag_y AS HUGEINT) * d) AS HUGEINT) AS sxd,
         CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd
  FROM pairs GROUP BY 1
)
SELECT event_type, n_pairs,
       CASE WHEN n_pairs >= 3 AND
         (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         * (CAST(n_pairs AS DOUBLE) * CAST(sdd AS DOUBLE)
            - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
         - (CAST(n_pairs AS DOUBLE) * CAST(sxd AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE))
           * (CAST(n_pairs AS DOUBLE) * CAST(sxd AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE)) > 0
       THEN CAST(floor(
         (CAST(n_pairs AS DOUBLE) * CAST(sxd AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE))
         * sqrt(n_pairs - 2.0) * 1000.0
         / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n_pairs AS DOUBLE) * CAST(sdd AS DOUBLE)
                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                - (CAST(n_pairs AS DOUBLE) * CAST(sxd AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE))
                  * (CAST(n_pairs AS DOUBLE) * CAST(sxd AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE))))
         AS BIGINT) END AS t_milli
FROM g
ORDER BY event_type
"""


def permutation_entropy_by_series(
    daily: DataFrame, series_col: str, x_col: str, y_col: str
) -> DataFrame:
    """``(series_col, n_windows, pe_bits_num, pe_milli_bits)`` —
    order-3 permutation entropy of the series (ordinal patterns of
    consecutive CALENDAR-consecutive triples; ties resolved as "later
    is greater"). ``pe_milli_bits = 1000 * pe_bits_num div n_windows``,
    with the bit-length entropy numerator ``sum_p c_p * (bits(N) -
    bits(c_p))`` — 0 for perfectly periodic/monotone series, up to
    ~log2(6) ≈ 2.58 bits for white noise."""
    from faers_datalakehouse_spark.operators.entropy import _bits

    w = Window.partitionBy(series_col).orderBy("_x")
    tri = (
        daily.select(
            series_col,
            F.col(x_col).alias("_x"),
            F.col(y_col).alias("_y0"),
        )
        .withColumn("_y1", F.lead("_y0", 1).over(w))
        .withColumn("_y2", F.lead("_y0", 2).over(w))
        .withColumn("_x1", F.lead("_x", 1).over(w))
        .withColumn("_x2", F.lead("_x", 2).over(w))
        .where(
            (F.col("_x1") == F.col("_x") + 1)
            & (F.col("_x2") == F.col("_x") + 2)
        )
        .select(
            series_col,
            (
                (F.col("_y1") >= F.col("_y0")).cast("int") * 4
                + (F.col("_y2") >= F.col("_y0")).cast("int") * 2
                + (F.col("_y2") >= F.col("_y1")).cast("int")
            ).alias("pat"),
        )
    )
    counts = tri.groupBy(series_col, "pat").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy(series_col)
        .agg(
            F.sum("c").cast("long").alias("n_windows"),
            F.sum(F.col("c") * _bits(F.col("c"))).alias("_cb"),
        )
        .select(
            series_col,
            "n_windows",
            (
                F.col("n_windows") * _bits(F.col("n_windows"))
                - F.col("_cb")
            )
            .cast("long")
            .alias("pe_bits_num"),
        )
        .withColumn(
            "pe_milli_bits",
            F.expr("(1000 * pe_bits_num) div n_windows"),
        )
        .orderBy(series_col)
    )


def permutation_entropy_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ordinal-pattern complexity of each event type's daily series —
    periodic/templated load scores low, noisy load high."""
    return permutation_entropy_by_series(
        _daily(spark, sf_dir), "event_type", "x", "y"
    )


PERMUTATION_ENTROPY_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
tri AS (
  SELECT event_type, x, y AS y0,
         lead(y, 1) OVER (PARTITION BY event_type ORDER BY x) AS y1,
         lead(y, 2) OVER (PARTITION BY event_type ORDER BY x) AS y2,
         lead(x, 1) OVER (PARTITION BY event_type ORDER BY x) AS x1,
         lead(x, 2) OVER (PARTITION BY event_type ORDER BY x) AS x2
  FROM daily
),
pats AS (
  SELECT event_type,
         (CASE WHEN y1 >= y0 THEN 4 ELSE 0 END
          + CASE WHEN y2 >= y0 THEN 2 ELSE 0 END
          + CASE WHEN y2 >= y1 THEN 1 ELSE 0 END) AS pat
  FROM tri
  WHERE x1 = x + 1 AND x2 = x + 2
),
counts AS (
  SELECT event_type, pat, count(*) AS c
  FROM pats GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n_windows,
         CAST(sum(c * (length(bin(c)) - 1)) AS BIGINT) AS cb
  FROM counts GROUP BY 1
)
SELECT event_type, n_windows,
       CAST(n_windows * (length(bin(n_windows)) - 1) - cb AS BIGINT)
         AS pe_bits_num,
       (1000 * CAST(n_windows * (length(bin(n_windows)) - 1) - cb
                    AS BIGINT)) // n_windows AS pe_milli_bits
FROM g
ORDER BY event_type
"""
