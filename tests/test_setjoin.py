"""Prefix-filter exact set-similarity join (operators/setjoin.py)."""

import pytest

from faers_datalakehouse_spark.operators.setjoin import (
    prefix_filter_jaccard_pairs,
)


def test_prefix_filter_exact_pair(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),  # jaccard 3/5 with doc 1
            (3, "zeta eta theta"),            # disjoint
        ],
        ["doc_id", "text"],
    )
    out = prefix_filter_jaccard_pairs(docs, threshold_milli=500).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    r = out[0]
    assert (r.n_inter, r.n_union, r.jaccard_milli) == (3, 5, 600)


def test_prefix_filter_threshold_excludes(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y")],  # jaccard 2/6 = 0.33
        ["doc_id", "text"],
    )
    assert (
        prefix_filter_jaccard_pairs(docs, threshold_milli=500).count() == 0
    )
    assert (
        prefix_filter_jaccard_pairs(docs, threshold_milli=300).count() == 1
    )


def test_prefix_filter_identical_docs(spark):
    docs = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here"), (3, "here words same")],
        ["doc_id", "text"],
    )
    out = prefix_filter_jaccard_pairs(docs, threshold_milli=1000).collect()
    got = {(r.id_a, r.id_b): r.jaccard_milli for r in out}
    # token SETS equal regardless of order -> all three pairs at 1000
    assert got == {(1, 2): 1000, (1, 3): 1000, (2, 3): 1000}


def test_prefix_filter_rejects_bad_threshold(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(docs, threshold_milli=0)


def test_prefix_filter_matches_bruteforce(spark, sf_dir):
    """The prefix filter must lose NO recall vs brute force on real docs."""
    import duckdb

    from faers_datalakehouse_spark.operators.setjoin import (
        prefix_filter_oracle_sql,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(120)
    )
    got = [
        (r.id_a, r.id_b, r.n_inter, r.n_union, r.jaccard_milli)
        for r in prefix_filter_jaccard_pairs(docs, threshold_milli=850)
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id LIMIT 120"
    )
    want = [tuple(r) for r in con.execute(
        prefix_filter_oracle_sql(threshold_milli=850)
    ).fetchall()]
    assert got == want
