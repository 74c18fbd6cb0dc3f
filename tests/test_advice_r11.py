"""Regression tests for the round-10 ADVICE findings (fixed in r11).

1. ``kendall_tau_by_series`` with tied x: the ``_xa < _xb`` join drops
   x-tied pairs, so the tau denominator must be derived from the pairs
   actually compared (``n0 = nc + nd + ty_pairs``), not ``n(n-1)/2``
   (which silently deflated tau).
2. ``ljung_box_by_series`` with zero lag pairs anywhere (all gaps > m
   days): the series must still emit ``(series, n, NULL)`` like the
   other degenerate guards, not vanish through an inner join.
3. ``water_filling``'s whitespace token count: an empty normalized doc
   is 0 tokens, not 1 (``split('')`` yields ``['']``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_kendall_tau_tied_x_not_deflated(spark):
    """Rows (1,1),(1,2),(2,3),(3,4): the x-tied pair is dropped by the
    strict-order join; all 5 compared pairs are concordant, so tau must
    be exactly 1000 milli — the old n(n-1)/2 denominator gave 833."""
    from faers_datalakehouse_spark.operators.ranktests import (
        kendall_tau_by_series,
    )

    rows = [("s", 1, 1), ("s", 1, 2), ("s", 2, 3), ("s", 3, 4)]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = kendall_tau_by_series(df, "series", "x", "y").collect()[0]
    assert got["nc"] == 5 and got["nd"] == 0 and got["ty_pairs"] == 0
    assert got["tau_milli"] == 1000


def test_kendall_tau_distinct_x_matches_closed_form(spark):
    """With distinct x, n0 = nc+nd+ty = n(n-1)/2 — the fix is a no-op
    on the organic day-grain data the oracle hashes."""
    from faers_datalakehouse_spark.operators.ranktests import (
        kendall_tau_by_series,
    )

    rows = [("s", x, y) for x, y in zip(range(6), [3, 1, 4, 1, 5, 9])]
    df = spark.createDataFrame(rows, "series string, x long, y long")
    got = kendall_tau_by_series(df, "series", "x", "y").collect()[0]
    n0 = 6 * 5 // 2
    assert got["nc"] + got["nd"] + got["ty_pairs"] == n0
    import math

    expect = math.floor(
        (got["nc"] - got["nd"])
        * 1000.0
        / math.sqrt(n0 * (n0 - got["ty_pairs"]))
    )
    assert got["tau_milli"] == expect


def test_ljung_box_all_gaps_exceed_lags_emits_null_row(spark):
    """n=8 > m+1 but every consecutive gap is 10 days > m=5, so no lag
    pair exists at any k; the series must appear with NULL q_milli, not
    be dropped."""
    from faers_datalakehouse_spark.operators.tstests import (
        ljung_box_by_series,
    )

    sparse = [("sparse", 10 * i, (i * 7) % 5 + 1) for i in range(8)]
    dense = [("dense", i, 10 * i) for i in range(12)]
    df = spark.createDataFrame(
        sparse + dense, "series string, x long, y long"
    )
    got = {r["series"]: r for r in
           ljung_box_by_series(df, "series", "x", "y").collect()}
    assert set(got) == {"sparse", "dense"}
    assert got["sparse"]["n"] == 8
    assert got["sparse"]["q_milli"] is None
    assert got["dense"]["q_milli"] > 10_000


def test_water_filling_token_count_empty_doc_is_zero(spark):
    """A doc whose normalized text is empty contributes 0 tokens — and
    the Spark expression agrees with the DuckDB twin's CASE form."""
    import duckdb

    from faers_datalakehouse_spark.operators.curation import _NORM_SQL
    from faers_datalakehouse_spark.operators.dedup import _norm_text

    rows = [("a", "!!! ???"), ("a", "hello,  world."), ("b", "")]
    df = spark.createDataFrame(rows, "source string, text string")
    norm = _norm_text(F.col("text"))
    got = {
        r["source"]: r["n"]
        for r in df.groupBy("source")
        .agg(
            F.sum(
                F.when(norm == "", F.lit(0)).otherwise(
                    F.size(F.split(norm, " "))
                )
            )
            .cast("long")
            .alias("n")
        )
        .collect()
    }
    assert got == {"a": 2, "b": 0}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "('a', '!!! ???'), ('a', 'hello,  world.'), ('b', '')) "
        "AS t(source, text)"
    )
    oracle = dict(
        con.execute(
            f"SELECT source, CAST(sum(CASE WHEN {_NORM_SQL} = '' THEN 0"
            f" ELSE len(string_split({_NORM_SQL}, ' ')) END) AS BIGINT)"
            " FROM documents GROUP BY source"
        ).fetchall()
    )
    assert oracle == got
