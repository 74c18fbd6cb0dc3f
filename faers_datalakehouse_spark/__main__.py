"""CLI entry point: run the full medallion pipeline over a directory of
FAERS-shaped CSVs.

Usage:
    python -m faers_datalakehouse_spark SRC_DIR \
        [--ingest-ts "2024-04-01 00:00:00"] [--effective-date 2024-04-01] \
        [--warehouse /path/to/warehouse] [--analytics]

SRC_DIR must contain one ``$``-delimited CSV per source table, named
``<table>.csv`` for each of: demographics, drug_details, reactions,
outcomes, indications, reports, therapy_dates. The reference runs each
stage as a separate Databricks job (``src/bronze/...`` → ``src/silver/...``
→ ``src/gold/...``); here the same DAG is one deterministic invocation
under an injected clock, writing managed parquet tables into the session
warehouse.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from .plans.medallion import BRONZE_COLUMNS, run_pipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="faers_datalakehouse_spark")
    ap.add_argument("src_dir", help="directory of <table>.csv source files")
    ap.add_argument("--ingest-ts", default="2024-01-01 00:00:00")
    ap.add_argument("--effective-date", default="2024-01-01")
    ap.add_argument("--warehouse", default=None)
    ap.add_argument(
        "--analytics", action="store_true",
        help="also materialize the gold.analytics_* report suite",
    )
    ap.add_argument(
        "--optimize", action="store_true",
        help="add post-write compaction+ANALYZE tasks per silver table "
        "(the reference's OPTIMIZE-after-write)",
    )
    args = ap.parse_args(argv)

    src = Path(args.src_dir)
    sources = {name: str(src / f"{name}.csv") for name in BRONZE_COLUMNS}
    missing = [p for p in sources.values() if not Path(p).exists()]
    if missing:
        print(f"missing source files: {missing}", file=sys.stderr)
        return 2

    extra = {"spark.sql.warehouse.dir": args.warehouse} if args.warehouse else None
    spark = get_spark("faers_pipeline", extra_conf=extra)
    if args.warehouse:
        # getOrCreate ignores configs when a session already exists (tests,
        # notebooks) — surface that instead of silently writing elsewhere.
        actual = spark.conf.get("spark.sql.warehouse.dir", "")
        if Path(actual.removeprefix("file:")).resolve() != Path(args.warehouse).resolve():
            print(
                f"warning: --warehouse={args.warehouse} ignored; an active "
                f"session already uses {actual}",
                file=sys.stderr,
            )
    run_pipeline(
        spark,
        sources,
        args.ingest_ts,
        args.effective_date,
        optimize=args.optimize,
    )
    if args.analytics:
        from .plans import faers_analytics

        faers_analytics.generate_all(spark)
    n = spark.table("gold.fact_adverse_events").count()
    print(f"pipeline complete: gold.fact_adverse_events has {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
