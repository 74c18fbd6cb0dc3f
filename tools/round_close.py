"""One-command round-close artifact regeneration (VERDICT r10 item 2).

Runs, sequentially in ONE process chain (two concurrent local[32] JVMs
contend — the round-workflow rule), everything that must be regenerated
at the round's final source commit so no artifact can go stale
individually:

1. ``tools/oracle_sweep.py``  -> SWEEP_latest.json   (the gate of record)
2. ``tools/plan_audit.py``    -> PLAN_AUDIT.json     (plan-shape census,
   fails on any unbounded SinglePartition)
3. ``tools/scale_curve.py --only NEW_OPS`` (optional, ``--scale-ops``)
   -> merged SCALE_CURVE.json rows for this round's operators
4. ``python bench.py > BENCH_local_<tag>.json`` (optional, ``--bench
   TAG``), then ``tools/check_bench_fresh.py``

The r10 post-mortem this encodes: PLAN_AUDIT.json sat at 232 entries
while the map reached 253 because sweep and audit were separate manual
steps. Usage:

    python tools/round_close.py [--sf SF_DIR] [--scale-ops a,b,c]
        [--bench TAG] [--skip-sweep]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], **kw) -> None:
    print(f"[round_close] $ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--scale-ops", default="")
    ap.add_argument("--bench", default="")
    ap.add_argument("--skip-sweep", action="store_true")
    args = ap.parse_args()

    py = sys.executable
    if not args.skip_sweep:
        run([py, "tools/oracle_sweep.py", args.sf])
    run([py, "tools/plan_audit.py", args.sf])
    if args.scale_ops:
        run(
            [py, "tools/scale_curve.py", "--only"]
            + args.scale_ops.split(",")
        )
    if args.bench:
        out = os.path.join(REPO, f"BENCH_local_{args.bench}.json")
        with open(out, "w") as fh:
            run([py, "bench.py"], stdout=fh)
        run([py, "tools/check_bench_fresh.py"])

    # cross-check: every map entry has a SWEEP row and a PLAN_AUDIT row
    entries = json.load(open(os.path.join(REPO, "SWEEP_latest.json")))
    audit = json.load(open(os.path.join(REPO, "PLAN_AUDIT.json")))
    n_sweep = entries["n_queries"]
    n_audit = audit.get("n_queries") or len(audit.get("queries", {}))
    print(
        f"[round_close] sweep entries: {n_sweep}, "
        f"plan-audit entries: {n_audit}"
    )
    if n_sweep != n_audit:
        print("[round_close] MISMATCH — an artifact is stale", flush=True)
        raise SystemExit(1)
    print("[round_close] all artifacts regenerated at head")


if __name__ == "__main__":
    main()
