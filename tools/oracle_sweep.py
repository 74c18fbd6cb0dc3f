"""Full-map oracle sweep: hash-check EVERY ``queries()`` entry (window +
rotation tail) against its DuckDB oracle and record ``SWEEP_latest.json``.

The driver only verifies the first 50 entries per round; the rotation tail
(``__spark_entry__.py``) would otherwise go unverified for a round. This
sweep is the local CI closing that gap — run it before committing a round
so a silent regression in a tail entry (the r3 ``sessionize`` class:
testdata-encoding drift) is caught the same day it appears, not a round
later.

Usage: python tools/oracle_sweep.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from faers_datalakehouse_spark.session import get_spark  # noqa: E402
from faers_datalakehouse_spark.sources.tables import TPCH_TABLES  # noqa: E402
from verify_driver_sim import run_one  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("oracle_sweep")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    failures = 0
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        zone = "window" if i < 50 else "tail"
        try:
            info = run_one(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            info = {"name": name, "status": "ERROR", "error": str(e)[:600]}
        info["zone"] = zone
        if info.get("status") not in ("OK", "rows-only"):
            failures += 1
        results[name] = {k: v for k, v in info.items() if k != "name"}
        print(f"[{info.get('status'):>18}] ({zone}) {name}")

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_failing": failures,
        "elapsed_sec": round(time.time() - t0, 1),
        "results": results,
    }
    artifact = Path(__file__).resolve().parent.parent / "SWEEP_latest.json"
    artifact.write_text(json.dumps(out, indent=1))
    print(f"\n{'FAIL' if failures else 'PASS'} ({failures} failing) -> {artifact}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
