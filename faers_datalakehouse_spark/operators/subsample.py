"""Half-sample subsampling spread — a deterministic, collect-free
uncertainty band for grouped means (Politis, Romano & Wolf,
"Subsampling", Springer 1999: statistic recomputed on many
without-replacement subsamples; the hash-split special case is the
classic half-sample method of McCarthy 1969).

For each group, B deterministic half-samples are drawn from ONE md5
per row (membership in sample b = parity of the digest's hex digit b —
32 independent bits per digest), the mean is recomputed per half-sample, and the band is the
lower/upper decile of those B means (positional picks from the sorted
list — deterministic). A wide band = the group's mean is driven by few
rows; curation dashboards use it to rank which segments' aggregates to
trust. Exact integers end-to-end (milli-cent means, integer division).

Scale shape (100 TB): ONE map-side-combinable aggregate computes all
2B conditional sums per group (each row contributes B membership bits
computed map-side) — no row explosion, no shuffle wider than 2B
columns, no second scan. The sort-and-pick runs on a B-element array
per group (array_sort on 32 longs).

No counterpart in the reference repo (statistics extension surface,
alongside ``mann_whitney`` / ``welch_ttest`` / ``winsorized_stats``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


N_SUBSAMPLES = 32


def subsample_mean_band(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """``(group_col, n, mean_milli, lo_milli, hi_milli, band_milli)``
    per group: full-sample mean plus the lower/upper-decile half-sample
    means (positions 4 and 29 of the 32 sorted means, 1-based). Groups
    where some half-sample is empty emit NULL band."""
    # ONE md5 per row; membership in half-sample b is the parity of
    # hex digit b (md5 yields exactly 32 hex digits = 32 independent
    # bits). 32 separate seeded md5s benched 6.4 s at sf0.1 — hashing
    # dominates, so sharing the digest is the whole win.
    h = F.md5(F.col(id_col).cast("string"))
    # r12: the 32 per-digit ``conv(substring(h, b, 1))`` string
    # conversions are folded into FOUR 8-digit ``conv`` words + integer
    # shift/mask parity extraction — hex digit b of the digest is
    # nibble (7 - b%8) of word b//8 (the ams_f2 fix; guide §2.3 cheaper
    # per-row expressions). Identical parities, identical sums.
    words = [
        F.conv(F.substring(h, 8 * w + 1, 8), 16, 10).cast("long")
        for w in range(N_SUBSAMPLES // 8)
    ]
    bits = [
        (
            F.shiftright(words[b // 8], 4 * (7 - b % 8)).bitwiseAND(
                F.lit(1)
            )
            == 0
        )
        .cast("long")
        .alias(f"in{b}")
        for b in range(N_SUBSAMPLES)
    ]
    base = df.select(
        group_col, F.col(value_col).alias("_v"), *bits
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_v").cast("long").alias("_sv"),
    ]
    for b in range(N_SUBSAMPLES):
        aggs.append(
            F.sum(F.col(f"in{b}") * F.col("_v"))
            .cast("long")
            .alias(f"_s{b}")
        )
        aggs.append(
            F.sum(f"in{b}").cast("long").alias(f"_c{b}")
        )
    g = base.groupBy(group_col).agg(*aggs)
    mean_exprs = ", ".join(
        f"CASE WHEN _c{b} > 0 THEN CAST(_s{b} * 1000 div _c{b} "
        "AS BIGINT) END"
        for b in range(N_SUBSAMPLES)
    )
    lo_idx = N_SUBSAMPLES // 10 + 1  # 4 for B=32
    hi_idx = N_SUBSAMPLES - N_SUBSAMPLES // 10  # 29 for B=32
    return (
        g.withColumn(
            "_means", F.expr(f"array_sort(array({mean_exprs}))")
        )
        .select(
            group_col,
            "n",
            F.expr("CAST(_sv * 1000 div n AS BIGINT)").alias(
                "mean_milli"
            ),
            F.expr(
                f"CASE WHEN NOT array_contains("
                f"transform(_means, x -> x IS NULL), TRUE) "
                f"THEN element_at(_means, {lo_idx}) END"
            ).alias("lo_milli"),
            F.expr(
                f"CASE WHEN NOT array_contains("
                f"transform(_means, x -> x IS NULL), TRUE) "
                f"THEN element_at(_means, {hi_idx}) END"
            ).alias("hi_milli"),
        )
        .withColumn(
            "band_milli", F.col("hi_milli") - F.col("lo_milli")
        )
        .orderBy(group_col)
    )


def subsample_ci_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How trustworthy is each event type's mean value? 32 half-sample
    means, decile band in exact milli-cents."""
    from faers_datalakehouse_spark.sources.tables import read_events

    # read_events, not raw parquet: the driver testdata's ts encoding
    # has drifted across regenerations (ADVICE r9 item 4)
    events = read_events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    return subsample_mean_band(
        events, "event_type", "event_id", "v_cents"
    )


def subsample_ci_oracle_sql() -> str:
    sign = (
        "((('0x' || substr(md5(CAST(event_id AS VARCHAR)), "
        "{b1}, 1))::BIGINT) % 2 = 0)"
    )
    sums = ",\n         ".join(
        f"CAST(sum(CASE WHEN {sign.format(b1=b + 1)} THEN v_cents "
        f"ELSE 0 END) AS BIGINT) AS s{b},\n         "
        f"CAST(sum(CASE WHEN {sign.format(b1=b + 1)} THEN 1 "
        f"ELSE 0 END) AS BIGINT) AS c{b}"
        for b in range(N_SUBSAMPLES)
    )
    means = ", ".join(
        f"CASE WHEN c{b} > 0 THEN CAST(s{b} * 1000 // c{b} "
        "AS BIGINT) END"
        for b in range(N_SUBSAMPLES)
    )
    lo_idx = N_SUBSAMPLES // 10 + 1
    hi_idx = N_SUBSAMPLES - N_SUBSAMPLES // 10
    return f"""
WITH base AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v_cents) AS BIGINT) AS sv,
         {sums}
  FROM base GROUP BY event_type
),
m AS (
  SELECT event_type, n, sv,
         list_sort([{means}]) AS means
  FROM g
)
SELECT event_type, n,
       CAST(sv * 1000 // n AS BIGINT) AS mean_milli,
       CASE WHEN len(list_filter(means, x -> x IS NULL)) = 0
            THEN means[{lo_idx}] END AS lo_milli,
       CASE WHEN len(list_filter(means, x -> x IS NULL)) = 0
            THEN means[{hi_idx}] END AS hi_milli,
       CASE WHEN len(list_filter(means, x -> x IS NULL)) = 0
            THEN means[{hi_idx}] - means[{lo_idx}] END AS band_milli
FROM m
ORDER BY event_type
"""
