"""Driver-hash simulator for the oracle gate.

``tools/verify_local.py`` compares ``collect()`` vs ``fetchall()`` values,
which canonicalizes DuckDB HUGEINT→int and DECIMAL→Decimal the same way
Spark does — so it passed queries the driver hash-failed. The driver compares
through the dataframe path, where dtype encodings differ (DuckDB ``.df()``
lands HUGEINT and DECIMAL as float64 while Spark ``toPandas()`` keeps int64 /
``decimal.Decimal`` objects). This tool reproduces that stricter comparison:
Spark ``toPandas()`` vs DuckDB ``.df()``, columns sorted by name, rows
sorted, each value tagged with its Python type (dates/timestamps normalized
to strings, which the round-1 driver results show compare equal).

Usage: python tools/verify_driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from faers_datalakehouse_spark.session import get_spark  # noqa: E402
from faers_datalakehouse_spark.sources.tables import TPCH_TABLES  # noqa: E402


def norm_value(v):
    if v is pd.NaT:
        return "null"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "null"
    if isinstance(v, dt.datetime):
        # DuckDB .df() lands DATE as midnight datetime64 while Spark keeps
        # datetime.date; the round-1 driver compared DATE columns green
        # (date_dim), so fold midnight timestamps onto the date form.
        v = v.replace(tzinfo=None)
        if v.time() == dt.time(0, 0):
            return "date:" + v.date().isoformat()
        return "ts:" + v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return "date:" + v.isoformat()
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        return f"float:{v!r}"
    if isinstance(v, (list, np.ndarray)):
        return "list:[" + ",".join(norm_value(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def norm_frame(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [
        tuple(norm_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def run_one(spark, con, name, fn, sql, sf_dir):
    res = fn(spark, sf_dir)
    # The REAL driver canonicalizes with pandas sort_values over every
    # column, which raises `unhashable type: 'list'` on array/map/struct
    # cells (round-5 failures: inverted_index, bpe_encode). Stringifying
    # lists here masked that — reproduce the failure mode instead.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in res.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if complex_cols:
        return {
            "name": name,
            "status": "COMPLEX-COLUMN",
            "cols": complex_cols,
        }
    sdf = res.toPandas()
    if sql is None:
        return {"name": name, "status": "rows-only", "rows": len(sdf)}
    ddf = con.execute(sql).df()
    info = {"name": name, "rows": len(sdf), "oracle_rows": len(ddf)}
    if sorted(sdf.columns) != sorted(ddf.columns):
        info["status"] = "SCHEMA-MISMATCH"
        info["spark_cols"] = sorted(sdf.columns)
        info["oracle_cols"] = sorted(ddf.columns)
        return info
    if len(sdf) != len(ddf):
        info["status"] = "ROWCOUNT-MISMATCH"
        return info
    _, ns = norm_frame(sdf)
    _, nd = norm_frame(ddf)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b]
        info["status"] = "HASH-MISMATCH"
        info["n_diff"] = len(diffs)
        info["first_diffs"] = diffs[:2]
        return info
    info["status"] = "OK"
    return info


def main():
    args = list(sys.argv[1:])
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(a for a in args if not a.startswith("/"))

    spark = get_spark("verify_driver_sim")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            info = run_one(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            info = {"name": name, "status": "ERROR", "error": str(e)[:600]}
        status = info.get("status")
        if status not in ("OK", "rows-only"):
            failures += 1
        print(f"[{status:>18}] {name}: "
              + ", ".join(f"{k}={v}" for k, v in info.items()
                          if k not in ("name", "status")))
    print(f"\n{'FAIL' if failures else 'PASS'} ({failures} failing)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
