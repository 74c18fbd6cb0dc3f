"""Driver-contract invariants for __spark_entry__.py: every oracle key pairs
with a query, every query is callable with (spark, sf_dir) and returns a
DataFrame, and entry() produces rows with a stable schema."""

from __future__ import annotations

from pyspark.sql import DataFrame

import __spark_entry__ as entrymod


# Genuinely non-SQL-expressible ops (the driver contract's rows-only
# clause). Every entry here must carry unit tests pinning its semantics
# in lieu of an oracle; anything NOT on this list must have a full
# value-hash oracle — rows-only may never appear by accident.
# Empty since round 9: bpe_encode — the last rows-only entry — gained a
# full hash oracle (the delimited-string replace twin in operators/bpe.py),
# so every queries() entry now carries a value-hash oracle.
ROWS_ONLY_ALLOWED: set[str] = set()


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs, f"orphan oracle keys: {oracles - qs}"
    # every query — including the probabilistic LSH paths, the Python-kernel
    # SimHash, and the fake-codec multimodal round-trip — carries a full
    # value-hash oracle unless it is on the documented rows-only allowlist
    assert qs - oracles == ROWS_ONLY_ALLOWED, (
        f"unexpected rows-only queries: {qs - oracles - ROWS_ONLY_ALLOWED}"
    )


def test_window_matches_artifact_derivation():
    """The checked-in _WINDOW must equal tools/gen_window.py's derivation
    from the CORRECTNESS_r*.json artifacts (never-green-checked entries
    first, then stalest green round, ties by build position). This pins
    the r7 verdict's rotation policy as code — a hand-edited window that
    drifts from the artifacts fails here, not in the judge's audit."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import gen_window

    names = list(entrymod._all_queries().keys())
    derived = gen_window.recommended_window(
        names, len(entrymod._WINDOW), basis=entrymod._WINDOW_BASIS
    )
    assert entrymod._WINDOW == derived


def test_window_is_queries_prefix():
    assert list(entrymod.queries())[: len(entrymod._WINDOW)] == (
        entrymod._WINDOW
    )
    assert len(entrymod.queries()) == len(entrymod._all_queries())


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


def test_no_complex_columns_in_any_entry(spark, sf_dir):
    """The driver canonicalizes results with pandas sort_values over every
    column, which raises `unhashable type: 'list'` on array/map/struct
    cells (round-5: inverted_index, bpe_encode went driver-red while the
    local sweep stringified lists and stayed green). Driver-facing outputs
    must therefore be flat: serialize arrays losslessly (comma/space join
    of a collision-free token alphabet) or explode them."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, f"complex driver-facing columns: {offenders}"


def test_driver_sim_rejects_complex_columns(spark, sf_dir):
    """The local sim must reproduce the driver's failure mode on array
    output (it masked round-5's two reds by stringifying lists)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import verify_driver_sim as sim

    def bad_query(spark_, sf_dir_):
        from pyspark.sql import functions as F

        return spark_.range(3).select(F.array(F.lit(1), F.lit(2)).alias("a"))

    info = sim.run_one(spark, None, "bad", bad_query, "SELECT 1", sf_dir)
    assert info["status"] == "COMPLEX-COLUMN"
    assert info["cols"] == ["a"]
