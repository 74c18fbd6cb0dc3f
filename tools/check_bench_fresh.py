"""Bench-freshness gate: fail if the newest local bench artifact predates
the newest source commit.

Round-5 post-mortem: the final "hardening" commit introduced a ~6-10x
perf regression in ``winnowing_fingerprints`` that no recorded bench
caught, because both local bench artifacts were produced BEFORE the last
two code commits — PERF.md described code that no longer existed. A perf
number is only evidence about the commit it was measured on; this gate
makes the staleness mechanical instead of a judgment call.

Round-6 post-mortem (ADVICE.md): the first version of this gate compared
file MTIMES, which actions/checkout rewrites to checkout time — so in CI
the check could never fail. The gate now prefers PROVENANCE EMBEDDED IN
THE ARTIFACT: bench.py records ``measured_at_commit`` (and a dirty flag),
and freshness means "the newest source commit is an ancestor of — or
equal to — the commit the bench was measured on". Mtime is only the
fallback for pre-provenance artifacts, and for those the artifact's own
git commit date (``git log -1 --format=%ct -- <artifact>``) is used when
the file is tracked and unmodified, so CI checkouts can't fake it.

Checks, in order:
1. at least one ``BENCH_local*.json`` artifact exists (optionally
   filtered to a round tag);
2. the newest such artifact was measured at, or after, the newest commit
   that touches source (``faers_datalakehouse_spark/``,
   ``__spark_entry__.py``, or ``bench.py`` — docs/test/artifact commits
   don't invalidate a bench).

Usage: python tools/check_bench_fresh.py [round_tag]
Exit 0 = fresh, 1 = stale/missing (prints what to rerun).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SOURCE_PATHS = ["faers_datalakehouse_spark", "__spark_entry__.py", "bench.py"]


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True
    )


def newest_source_commit() -> tuple[str, int, str]:
    out = _git(
        "log", "-1", "--format=%H %ct %s", "--", *SOURCE_PATHS
    ).stdout.strip()
    sha, epoch, subject = out.split(" ", 2)
    return sha, int(epoch), subject


def artifact_epoch(path: Path) -> tuple[int, str]:
    """Best available timestamp for a pre-provenance artifact: its own git
    commit date when tracked and unmodified (checkout-proof), else mtime."""
    modified = _git("status", "--porcelain", "--", str(path)).stdout.strip()
    logged = _git("log", "-1", "--format=%ct", "--", str(path)).stdout.strip()
    if logged and not modified:
        return int(logged), "git commit date"
    return int(path.stat().st_mtime), "file mtime"


def main() -> None:
    arts = sorted(REPO.glob("BENCH_local*.json"))
    if len(sys.argv) > 1:
        tag = sys.argv[1]
        arts = [a for a in arts if re.search(rf"_{tag}\b", a.name)]
        if not arts:
            print(f"STALE: no BENCH_local*_{tag}.json artifact for this round")
            sys.exit(1)
    if not arts:
        print(
            "STALE: no BENCH_local*.json artifact exists — run bench.py "
            "and save its JSON line to BENCH_local_<tag>.json"
        )
        sys.exit(1)
    newest = max(arts, key=lambda p: p.stat().st_mtime)
    src_sha, src_epoch, src_desc = newest_source_commit()

    try:
        payload = json.loads(newest.read_text().strip().splitlines()[-1])
    except (ValueError, OSError):
        payload = {}
    measured = payload.get("measured_at_commit")
    if measured:
        # fresh iff the newest source commit is contained in the measured
        # commit's history (equal counts): rc 0 from merge-base.
        rc = _git("merge-base", "--is-ancestor", src_sha, measured).returncode
        if rc == 0:
            dirty = " (dirty tree)" if payload.get("measured_at_dirty") else ""
            print(
                f"FRESH: {newest.name} measured at {measured[:10]}{dirty}, "
                f"which contains the newest source commit "
                f"({src_sha[:10]} {src_desc})."
            )
            sys.exit(0)
        print(
            f"STALE: {newest.name} was measured at {measured[:10]}, which "
            f"predates the newest source commit ({src_sha[:10]} {src_desc}). "
            "Re-run bench.py at head and record a fresh artifact."
        )
        sys.exit(1)

    # pre-provenance artifact: timestamp comparison, checkout-proof where
    # possible
    art_epoch, how = artifact_epoch(newest)
    if art_epoch < src_epoch:
        print(
            f"STALE: newest bench artifact {newest.name} ({how} "
            f"{art_epoch}) predates the newest source commit "
            f"({src_desc}, {src_epoch}). Re-run bench.py at head and "
            "record a fresh artifact before closing the round."
        )
        sys.exit(1)
    print(
        f"FRESH: {newest.name} ({how} {art_epoch}) postdates the "
        f"newest source commit ({src_desc})."
    )
    sys.exit(0)


if __name__ == "__main__":
    main()
