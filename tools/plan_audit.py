"""Physical-plan audit over the whole query surface -> PLAN_AUDIT.json.

For every ``queries()`` entry, builds the DataFrame (no execution beyond
what the entry itself materializes) and records machine-checkable plan
features from the executed-plan string:

- ``exchanges`` / ``broadcasts``: shuffle vs broadcast exchange counts —
  the number that grows 100 TB cost, vs the one that doesn't;
- ``codegen_stages``: WholeStageCodegen span count (JVM-side execution);
- ``has_pushed_filters`` / ``scans``: whether parquet scans carry
  PushedFilters, and how many scans the plan has;
- ``cartesian`` / ``bnlj``: cross-product shapes (the invariant gate in
  ``tests/test_plan_invariants.py`` forbids unexpected ones; this artifact
  makes the census visible round-over-round).

This complements the bench: the bench says how fast a plan ran HERE; the
audit says whether the plan SHAPE is the one that survives a 1000-
executor cluster. Diff PLAN_AUDIT.json across rounds to catch plan
regressions (a new exchange, a lost pushdown) even when wall times are
noisy.

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from faers_datalakehouse_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict:
    shuffles = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)", plan))
    return {
        "exchanges": shuffles,
        "broadcasts": plan.count("BroadcastExchange"),
        # codegen spans surface as "*(n)" operator prefixes; they only
        # appear in a FINAL plan, which is why the audit session runs
        # with AQE off (static plan == final plan, no execution needed)
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": plan.count("FileScan parquet") + plan.count("Scan parquet"),
        "has_pushed_filters": "PushedFilters: [" in plan
        and bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "sorts": plan.count("Sort "),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    # static plans: with AQE on, executedPlan is an unexecuted
    # AdaptiveSparkPlan stub without codegen markers; production keeps
    # AQE ON — this is an inspection-only setting
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = audit_plan(plan)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:300]}
        feats = out[name]
        print(f"{name:28s} {json.dumps(feats)}")
    doc = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "totals": {
            "exchanges": sum(v.get("exchanges", 0) for v in out.values()),
            "broadcasts": sum(v.get("broadcasts", 0) for v in out.values()),
            "cartesian": sum(v.get("cartesian", 0) for v in out.values()),
            "errors": sum(1 for v in out.values() if "error" in v),
        },
        "queries": out,
    }
    Path("PLAN_AUDIT.json").write_text(json.dumps(doc, indent=1))
    print(f"-> PLAN_AUDIT.json ({doc['totals']})")


if __name__ == "__main__":
    main()
