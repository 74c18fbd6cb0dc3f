"""Machine-readable driver-bench adjudication (VERDICT r9 item 6).

The driver's per-round bench (``BENCH_r{N}.json``) runs on a
burstable-CPU sandbox whose steal spikes produce 3-6x wall-clock
inflation unrelated to the plan (PERF.md round-4 investigation). Until
now the judge cross-referenced the clean local artifacts by hand each
round; this tool makes the adjudication one reproducible file:

per query -> {clean local median (best across the round's clean local
artifacts), driver median (parsed from the driver artifact's recorded
bench output), ratio, verdict}, plus the steal telemetry of the
artifacts used. Verdicts:

- ``ok``          driver within 1.5x of clean local (or within 0.75 s
                  absolute — sub-second queries jitter in either
                  direction without meaning anything)
- ``host``        driver >1.5x clean local, AND the clean locals agree
                  with each other (spread of medians <2x) — the
                  canonical throttle signature: same code, same data,
                  same plan, different host weather
- ``investigate`` driver >1.5x clean local and the local artifacts
                  disagree with each other — cannot be blamed on the
                  host without a fresh isolated run

Usage:
    python tools/bench_adjudication.py [--driver BENCH_rNN.json]
        [--local GLOB] [--out BENCH_ADJUDICATION_rNN.json]

Defaults: newest BENCH_r*.json, all BENCH_local*_r{same-round}*.json
(falling back to the newest 3 local artifacts), out name derived from
the CURRENT round = driver round + 1 (the adjudication is produced the
round after the driver artifact it judges).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_driver_runs(path: str) -> dict[str, float]:
    """Per-query median from the driver artifact.

    The driver records only the TAIL of bench stdout, which can truncate
    the front of the JSON line — so this parses per-query run arrays
    ``"qNN_name": [a, b, c]`` by regex instead of json.loads and takes
    the median of each. Queries cut off by the truncation are simply
    absent (the adjudication covers what the driver recorded).
    """
    raw = json.load(open(path))
    text = raw.get("tail") or ""
    if isinstance(raw.get("parsed"), dict):
        q = raw["parsed"].get("queries")
        if isinstance(q, dict):
            return {k: float(v) for k, v in q.items()}
    out: dict[str, float] = {}
    for m in re.finditer(r'"(q\d+_\w+)":\s*\[([0-9., ]+)\]', text):
        runs = [float(x) for x in m.group(2).split(",") if x.strip()]
        if runs:
            out[m.group(1)] = statistics.median(runs)
    return out


def load_local(path: str) -> tuple[dict[str, float], float]:
    """Artifacts are bench.py stdout captures: the payload is the last
    parseable JSON line (warnings may precede it)."""
    d = None
    for line in reversed(open(path).read().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if d is None:
        return {}, 0.0
    queries = {k: float(v) for k, v in d.get("queries", {}).items()}
    steal = d.get("steal_ticks") or {}
    total_steal = (
        sum(float(v) for v in steal.values())
        if isinstance(steal, dict)
        else float(steal or 0)
    )
    return queries, total_steal


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", default=None)
    ap.add_argument("--local", default=None, help="glob for local artifacts")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    driver_path = args.driver
    if driver_path is None:
        cands = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        if not cands:
            print("no BENCH_r*.json driver artifact found")
            return 1
        driver_path = cands[-1]
    m = re.search(r"BENCH_r(\d+)\.json$", driver_path)
    driver_round = int(m.group(1)) if m else 0

    if args.local:
        local_paths = sorted(glob.glob(os.path.join(REPO, args.local)))
    else:
        local_paths = sorted(
            glob.glob(os.path.join(REPO, f"BENCH_local*r{driver_round:02d}*.json"))
        ) or sorted(
            glob.glob(os.path.join(REPO, "BENCH_local*.json")),
            key=os.path.getmtime,
        )[-3:]
    if not local_paths:
        print("no clean local artifacts found")
        return 1

    driver_med = parse_driver_runs(driver_path)
    locals_q: list[dict[str, float]] = []
    steals: dict[str, float] = {}
    for p in local_paths:
        q, s = load_local(p)
        locals_q.append(q)
        steals[os.path.basename(p)] = s

    rows: dict[str, dict] = {}
    counts = {"ok": 0, "host": 0, "investigate": 0}
    for name, dmed in sorted(driver_med.items()):
        meds = [q[name] for q in locals_q if name in q]
        if not meds:
            continue
        clean = min(meds)
        ratio = dmed / clean if clean > 0 else None
        spread = (max(meds) / min(meds)) if min(meds) > 0 else None
        if ratio is None or ratio <= 1.5 or dmed - clean <= 0.75:
            verdict = "ok"
        elif spread is not None and spread < 2.0:
            verdict = "host"
        else:
            verdict = "investigate"
        counts[verdict] += 1
        rows[name] = {
            "clean_local_s": round(clean, 3),
            "driver_s": round(dmed, 3),
            "ratio": round(ratio, 2) if ratio else None,
            "local_spread": round(spread, 2) if spread else None,
            "verdict": verdict,
        }

    out_path = args.out or os.path.join(
        REPO, f"BENCH_ADJUDICATION_r{driver_round + 1:02d}.json"
    )
    payload = {
        "driver_artifact": os.path.basename(driver_path),
        "local_artifacts": [os.path.basename(p) for p in local_paths],
        "local_steal_ticks": steals,
        "n_adjudicated": len(rows),
        "verdict_counts": counts,
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(
        f"{os.path.basename(out_path)}: {len(rows)} queries adjudicated "
        f"against {len(local_paths)} local artifacts -> {counts}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
