"""Driver-contract invariants for __spark_entry__.py: every oracle key pairs
with a query, every query is callable with (spark, sf_dir) and returns a
DataFrame, and entry() produces rows with a stable schema."""

from __future__ import annotations

from pyspark.sql import DataFrame

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs, f"orphan oracle keys: {oracles - qs}"
    # every query — including the probabilistic LSH paths, the Python-kernel
    # SimHash, and the fake-codec multimodal round-trip — carries a full
    # value-hash oracle; rows-only entries are not allowed to reappear
    assert qs == oracles, f"rows-only queries: {qs - oracles}"


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert isinstance(df, DataFrame)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "customer_region", "customer_nation", "order_year",
        "n_lineitems", "total_revenue", "n_orders",
    }


def test_all_queries_return_dataframes_lazily(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert isinstance(df, DataFrame), name
        assert df.columns, name
