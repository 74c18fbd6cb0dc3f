"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every ``queries()[name]`` on Spark and, when present, the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then compares
row count, column-name set, and an order-insensitive value comparison
(columns sorted by name, rows sorted, exact equality — floats compared by
repr so any cross-engine drift is surfaced rather than tolerated).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from faers_datalakehouse_spark.session import get_spark  # noqa: E402
from faers_datalakehouse_spark.sources.tables import TPCH_TABLES  # noqa: E402


def norm_value(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v!r}"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    return repr(v)


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def run_one(spark, con, name, fn, sql, sf_dir):
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    spark_s = time.time() - t0
    if sql is None:
        return {
            "name": name, "status": "rows-only", "rows": len(srows),
            "spark_s": round(spark_s, 2),
        }
    t1 = time.time()
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    duck_s = time.time() - t1
    info = {
        "name": name, "rows": len(srows), "oracle_rows": len(drows),
        "spark_s": round(spark_s, 2), "duck_s": round(duck_s, 2),
    }
    if sorted(scols) != sorted(dcols):
        info["status"] = "SCHEMA-MISMATCH"
        info["spark_cols"] = sorted(scols)
        info["oracle_cols"] = sorted(dcols)
        return info
    if len(srows) != len(drows):
        info["status"] = "ROWCOUNT-MISMATCH"
        return info
    _, ns = normalize_rows(scols, srows)
    _, nd = normalize_rows(dcols, drows)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b]
        info["status"] = "VALUE-MISMATCH"
        info["n_diff"] = len(diffs)
        info["first_diffs"] = diffs[:3]
        return info
    info["status"] = "OK"
    return info


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(a for a in args if not a.startswith("/"))

    spark = get_spark("verify_local")
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
            info = {"name": name, "status": "ERROR", "error": str(e)[:800]}
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
