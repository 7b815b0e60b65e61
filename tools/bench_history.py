#!/usr/bin/env python
"""Shared loader for the split bench history (r11 verdict task 7).

bench.py keeps a rolling window of the newest entries inline in
BENCH_LOCAL.json (small diffs) and spills older entries to
BENCH_LOCAL_ARCHIVE.json. ``load_history()`` returns the full
archive+inline list in recording order, so index-based and
noted-entry tooling (bench_diff.py) behaves exactly as before the
split.
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history(repo: str = REPO) -> list:
    out, seen = [], set()
    for name in ("BENCH_LOCAL_ARCHIVE.json", "BENCH_LOCAL.json"):
        path = os.path.join(repo, name)
        if os.path.exists(path):
            with open(path) as f:
                for e in json.load(f):
                    # repair layer for a crash between the two spill
                    # writes: an entry archived AND still inline must
                    # count once (recorded_at is second-resolution and
                    # bench runs take minutes — unique per entry)
                    key = e.get("recorded_at")
                    if key in seen:
                        continue
                    seen.add(key)
                    out.append(e)
    return out
