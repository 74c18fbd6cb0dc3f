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
  makes the census visible round-over-round);
- ``single_partition`` / ``unbounded_single_partition``: Exchange
  SinglePartition nodes, and the subset whose input subtree reaches a
  parquet scan WITHOUT passing through an aggregate or limit — i.e. a
  table-proportional frame forced into ONE task. This is the r7 blind
  spot (VERDICT r7 "What's wrong" #3): interleave_sources/pareto_front
  showed an innocuous "exchanges: 1" while moving the whole corpus to a
  single partition. A bounded SinglePartition (over a groupBy result, a
  TakeOrdered frame, or a LocalLimit'd input) is legitimate — the
  two-phase prefix-scan idiom depends on one — and is NOT flagged.

The tool exits nonzero if any query has ``unbounded_single_partition > 0``
(no whitelist entries currently exist; add name -> documented-row-bound
pairs to ``SP_WHITELIST`` only with a docstring-level justification).

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


# queries allowed a table-proportional SinglePartition exchange, with the
# documented reason. Empty by design: the two r7 offenders were fixed
# (TakeOrdered-then-window; bucketed two-phase prefix max) instead of
# whitelisted.
SP_WHITELIST: dict[str, str] = {}

# operators that bound the row count of everything above them: an
# Exchange SinglePartition whose input subtree contains one of these is
# a bounded (KB-sized) frame, not the corpus
_BOUNDING_NODES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def _iter_nodes(jnode):
    stack = [jnode]
    while stack:
        node = stack.pop()
        yield node
        # AdaptiveSparkPlanExec is a leaf wrapper pre-execution; descend
        # into its initial plan so the audit works with AQE on (tests)
        # as well as off (this tool's session)
        if node.nodeName() == "AdaptiveSparkPlan":
            stack.append(node.initialPlan())
            continue
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def _unbounded_scan_path(node) -> bool:
    """True if some path from ``node`` DOWN to a file-scan leaf has no
    bounding aggregate/limit ON THAT PATH.

    Structural, not substring: a bounding node in a SIBLING branch (e.g.
    the HashAggregate inside a broadcast dim of a join whose other side
    is a full fact scan) must not excuse the scan branch — that was the
    false-negative class of the r8 substring check (ADVICE r8 #1).
    """
    name = node.nodeName()
    if any(name.startswith(b) for b in _BOUNDING_NODES):
        return False
    if name == "AdaptiveSparkPlan":
        return _unbounded_scan_path(node.initialPlan())
    children = node.children()
    n = children.size()
    if n == 0:
        head = node.toString().splitlines()[0]
        # LocalTableScan of tiny literal frames doesn't count
        return (
            "FileScan" in head
            or "Scan parquet" in head
            or "BatchScan" in head
        )
    return any(_unbounded_scan_path(children.apply(i)) for i in range(n))


def single_partition_audit(jplan) -> tuple[int, int]:
    """(single_partition_count, unbounded_count) for a JVM SparkPlan.

    Walks the physical tree; for every shuffle Exchange whose first
    toString line says SinglePartition, recursively checks every path
    from the exchange to a file-scan leaf: if any such path carries no
    bounding aggregate/limit operator, the frame being single-partitioned
    is table-proportional — the one plan shape that cannot survive a
    100x scale-up.
    """
    total = 0
    unbounded = 0
    for node in _iter_nodes(jplan):
        if node.nodeName() != "Exchange":
            continue
        head = node.toString().splitlines()[0]
        if "SinglePartition" not in head:
            continue
        total += 1
        children = node.children()
        if any(
            _unbounded_scan_path(children.apply(i))
            for i in range(children.size())
        ):
            unbounded += 1
    return total, unbounded


def audit_plan(plan: str) -> dict:
    shuffles = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)", plan))
    return {
        "exchanges": shuffles,
        "broadcasts": plan.count("BroadcastExchange"),
        # codegen spans surface as "*(n)" operator prefixes; they only
        # appear in a FINAL plan, which is why the audit session runs
        # with AQE off (static plan == final plan, no execution needed)
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        # "Scan parquet" alone would double-count every "FileScan parquet"
        # line (substring); the lookbehind keeps only DSv2-style scans
        "scans": plan.count("FileScan parquet")
        + len(re.findall(r"(?<!File)Scan parquet", plan)),
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
            jplan = df._jdf.queryExecution().executedPlan()
            out[name] = audit_plan(jplan.toString())
            sp_total, sp_unbounded = single_partition_audit(jplan)
            out[name]["single_partition"] = sp_total
            out[name]["unbounded_single_partition"] = sp_unbounded
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:300]}
        feats = out[name]
        print(f"{name:28s} {json.dumps(feats)}")
    offenders = [
        k
        for k, v in out.items()
        if v.get("unbounded_single_partition", 0) > 0
        and k not in SP_WHITELIST
    ]
    doc = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "totals": {
            "exchanges": sum(v.get("exchanges", 0) for v in out.values()),
            "broadcasts": sum(v.get("broadcasts", 0) for v in out.values()),
            "cartesian": sum(v.get("cartesian", 0) for v in out.values()),
            "single_partition": sum(
                v.get("single_partition", 0) for v in out.values()
            ),
            "unbounded_single_partition": sum(
                v.get("unbounded_single_partition", 0) for v in out.values()
            ),
            "errors": sum(1 for v in out.values() if "error" in v),
        },
        "unbounded_single_partition_offenders": offenders,
        "queries": out,
    }
    Path("PLAN_AUDIT.json").write_text(json.dumps(doc, indent=1))
    print(f"-> PLAN_AUDIT.json ({doc['totals']})")
    if offenders:
        print(f"FAIL: table-proportional SinglePartition in: {offenders}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
