"""Bench-freshness gate: fail if the newest local bench artifact predates
the newest source commit.

Round-5 post-mortem: the final "hardening" commit introduced a ~6-10x
perf regression in ``winnowing_fingerprints`` that no recorded bench
caught, because both local bench artifacts were produced BEFORE the last
two code commits — PERF.md described code that no longer existed. A perf
number is only evidence about the commit it was measured on; this gate
makes the staleness mechanical instead of a judgment call.

Checks, in order:
1. at least one ``BENCH_local*_r{N}.json`` artifact exists for the round;
2. the newest such artifact's mtime is AFTER the committer date of the
   newest commit that touches source (``faers_datalakehouse_spark/``,
   ``__spark_entry__.py``, or ``bench.py`` — docs/test/artifact commits
   don't invalidate a bench).

Usage: python tools/check_bench_fresh.py [round_tag]
  round_tag defaults to the highest rNN found among BENCH_local* files.
Exit 0 = fresh, 1 = stale/missing (prints what to rerun).
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SOURCE_PATHS = ["faers_datalakehouse_spark", "__spark_entry__.py", "bench.py"]


def newest_source_commit_epoch() -> tuple[int, str]:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct %h %s", "--", *SOURCE_PATHS],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    epoch, rest = out.split(" ", 1)
    return int(epoch), rest


def main() -> None:
    arts = sorted(REPO.glob("BENCH_local*.json"))
    if not arts:
        print("STALE: no BENCH_local*.json artifact exists — run bench.py "
              "and save its JSON line to BENCH_local_<tag>.json")
        sys.exit(1)
    if len(sys.argv) > 1:
        tag = sys.argv[1]
        arts = [a for a in arts if re.search(rf"_{tag}\b", a.name)]
        if not arts:
            print(f"STALE: no BENCH_local*_{tag}.json artifact for this round")
            sys.exit(1)
    newest = max(arts, key=lambda p: p.stat().st_mtime)
    bench_mtime = newest.stat().st_mtime
    commit_epoch, commit_desc = newest_source_commit_epoch()
    if bench_mtime < commit_epoch:
        print(
            f"STALE: newest bench artifact {newest.name} "
            f"(mtime {int(bench_mtime)}) predates the newest source commit "
            f"({commit_desc}, {commit_epoch}). Re-run bench.py at head and "
            "record a fresh artifact before closing the round."
        )
        sys.exit(1)
    print(
        f"FRESH: {newest.name} (mtime {int(bench_mtime)}) postdates the "
        f"newest source commit ({commit_desc})."
    )
    sys.exit(0)


if __name__ == "__main__":
    main()
