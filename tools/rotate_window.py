#!/usr/bin/env python
"""Rotate the ~50-lane driver verification window for a new round.

Usage:
    python tools/rotate_window.py [--apply] [changed_lane ...]

Computes per-lane driver-evidence freshness from CORRECTNESS_r*.json
(each file is a flat {lane: result} dict) and proposes the next
window: the given NEW/behavior-changed lanes first, then the entire
stalest-evidence block, then fill to 50 from the next-stalest block.
Lanes not yet in any CORRECTNESS file (brand-new) are treated as
must-include.

Dry-run by default (prints the plan). With --apply it rewrites BOTH
places the window lives — the r12 lesson (see memory: the pinned test
fails after any rotation if forgotten):

 1. `_PRIORITY_ORDER` in sf_etl_spark/queries/__init__.py — window
    first (a marker comment separates it), remaining names in their
    prior relative order;
 2. `MUST_BE_IN_WINDOW` in tests/test_registry_order.py — regenerated
    to the new first-50.

After --apply, run:  python -m pytest tests/test_registry_order.py -q
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50
MARKER = "# --- below the driver window (auto-rotated) ---"


def freshness() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            d = json.load(open(f))
        except ValueError:
            continue
        if isinstance(d, dict):
            for name in d:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def propose(changed: list[str]) -> tuple[list[str], list[str]]:
    sys.path.insert(0, REPO)
    from sf_etl_spark.queries import all_queries

    names = list(all_queries())
    latest = freshness()
    unknown = [c for c in changed if c not in names]
    if unknown:
        sys.exit(f"not registered: {unknown}")
    # brand-new lanes (no driver evidence) are changed by definition
    head = list(dict.fromkeys(changed + [n for n in names if n not in latest]))
    rest = sorted(
        (n for n in names if n not in head), key=lambda n: (latest.get(n, 0), n)
    )
    window = (head + rest)[:WINDOW]
    below = [n for n in names if n not in window]
    return window, below


def apply(window: list[str], below: list[str]) -> None:
    reg_path = os.path.join(REPO, "sf_etl_spark", "queries", "__init__.py")
    src = open(reg_path).read()
    m = re.search(r"_PRIORITY_ORDER = \[.*?\n\]", src, re.S)
    body = "".join(f'    "{n}",\n' for n in window)
    body += f"    {MARKER}\n"
    body += "".join(f'    "{n}",\n' for n in below)
    src = src[: m.start()] + "_PRIORITY_ORDER = [\n" + body + "]" + src[m.end():]
    open(reg_path, "w").write(src)

    test_path = os.path.join(REPO, "tests", "test_registry_order.py")
    tsrc = open(test_path).read()
    tm = re.search(r"MUST_BE_IN_WINDOW = \[.*?\n\]", tsrc, re.S)
    tbody = "".join(f'    "{n}",\n' for n in window)
    tsrc = (
        tsrc[: tm.start()] + "MUST_BE_IN_WINDOW = [\n" + tbody + "]" + tsrc[tm.end():]
    )
    open(test_path, "w").write(tsrc)


def main() -> None:
    args = sys.argv[1:]
    do_apply = "--apply" in args
    changed = [a for a in args if a != "--apply"]
    window, below = propose(changed)
    latest = freshness()
    print(f"window ({len(window)}):")
    for n in window:
        tag = "NEW/CHANGED" if n in changed or n not in latest else f"r{latest[n]}"
        print(f"  {n}  [{tag}]")
    stalest = min((latest.get(n, 99) for n in below), default=0)
    print(f"below boundary: {len(below)} lanes, stalest evidence r{stalest}")
    if do_apply:
        apply(window, below)
        print("applied; run: python -m pytest tests/test_registry_order.py -q")


if __name__ == "__main__":
    main()
