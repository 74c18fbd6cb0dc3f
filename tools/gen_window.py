"""Generate the driver-verification window from CORRECTNESS artifacts.

The driver hash-checks only the FIRST 50 entries of ``queries()``; the rest
form a rotation tail (the strict local sweep still covers everything).
ROTATION POLICY (round-5 formalization, VERDICT r7 item 1):

1. entries NEVER driver-checked enter the window first (oldest position
   first — insertion order approximates build order);
2. then entries whose last driver check is oldest (2+ rounds stale);
3. ties broken by current map position.

This tool derives the recommended window from the recorded artifacts
instead of a hand-maintained narrative comment (which went stale in r7 —
VERDICT r7 "Next round" item 7). Run it after adding operators and paste
the output into ``_WINDOW`` in ``__spark_entry__.py``; a unit test
(tests/test_entry_contract.py) asserts the checked-in window matches this
derivation so the two can never diverge silently.

Usage: python tools/gen_window.py [--size 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_checked(basis: list[str] | None = None) -> dict[str, int]:
    """Map query name -> most recent round with a GREEN driver check.

    A recorded failure (err set, or rows_match falsy) does not count —
    e.g. inverted_index/bpe_encode errored in r5 and must re-enter the
    window as if never checked.

    ``basis`` pins the artifact FILENAMES the derivation may read. The
    checked-in window is generated mid-round, but the driver writes the
    round's own CORRECTNESS file before the judge runs pytest — an
    unpinned derivation would shift under the checked-in list and fail
    the contract test through no code change. ``__spark_entry__``
    records the basis it was generated from (``_WINDOW_BASIS``); the
    next session regenerates window+basis together.
    """
    out: dict[str, int] = {}
    paths = (
        [os.path.join(REPO, name) for name in basis]
        if basis is not None
        else sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    )
    for path in paths:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for key, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("err") is not None or not rec.get("rows_match"):
                continue
            out[key] = max(out.get(key, 0), rnd)
    return out


def recommended_window(
    names: list[str], size: int = 50, basis: list[str] | None = None
) -> list[str]:
    checked = last_checked(basis)
    pos = {k: i for i, k in enumerate(names)}
    # sort key: never-checked first (round 0), then oldest round, then
    # current map position (stable build order)
    ranked = sorted(names, key=lambda k: (checked.get(k, 0), pos[k]))
    return ranked[:size]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=50)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry._all_queries().keys())
    basis = sorted(
        os.path.basename(f)
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    window = recommended_window(names, args.size, basis)
    checked = last_checked(basis)
    print("_WINDOW_BASIS = [")
    for b in basis:
        print(f'    "{b}",')
    print("]")
    print("_WINDOW = [")
    for k in window:
        rnd = checked.get(k)
        tag = f"r{rnd}" if rnd else "never"
        print(f'    "{k}",  # last driver check: {tag}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
