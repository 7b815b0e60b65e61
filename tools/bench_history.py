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

#: the ONE canonical BENCH_LOCAL entry shape (r14 verdict task 6):
#: bench.py's per-invocation append and record_bench_local.py's merged
#: noted entry both build through :func:`entry_dict`, so the two
#: writers can never drift apart again (the r14 "final" entry lacked
#: extended_runs because the merge tool predated the field).
ENTRY_KEYS = (
    "recorded_at",
    "runs",
    "load_1m",
    "contended",
    "note",
    "metric",
    "value",
    "unit",
    "queries",
    "extended",
    "extended_total_sec",
    "extended_runs",
    "loads",
    "excluded",
    "sf",
)


def entry_dict(
    *,
    recorded_at: str,
    runs: int,
    load_1m: float,
    contended: bool,
    note: str,
    metric: str,
    value: float,
    queries: dict,
    extended: dict,
    extended_runs: int,
    loads: dict,
    excluded: dict,
    sf,
) -> dict:
    """Build a BENCH_LOCAL entry with the canonical key set/order.
    ``note`` is "" for unnoted per-invocation appends (spill() keys on
    note truthiness, so "" and absent behave identically). ``runs``
    and ``extended_runs`` both mean the TOTAL repeats the group's
    per-lane minima are over — best-of-N for a single bench.py
    invocation, invocations × N for a merged recording — so
    identically-shaped entries are comparably interpretable."""
    return {
        "recorded_at": recorded_at,
        "runs": runs,
        "load_1m": load_1m,
        "contended": contended,
        "note": note,
        "metric": metric,
        "value": value,
        "unit": "sec",
        "queries": queries,
        "extended": extended,
        "extended_total_sec": round(sum(extended.values()), 3),
        "extended_runs": extended_runs,
        "loads": loads,
        "excluded": excluded,
        "sf": sf,
    }


#: in-run lane loads above this are external contention with certainty:
#: the bench's own local[32] self-load tops out around 7.4 across the
#: noted quiet-host entries (measured over BENCH_LOCAL history), while
#: the r13 contaminated entry carried lane loads up to 15.5. A RELATIVE
#: margin (median+2.5) cannot be the entry-level signal — quiet
#: recordings legitimately spread lane loads 2.7-7.4 by lane type and
#: would flag themselves (caught in the r14 review pass).
IN_RUN_LOAD_CEILING = 10.0


def contended(
    load_1m: float | None,
    lane_loads: dict[str, float],
    load_allowance: float = 2.5,
) -> bool:
    """Entry-level contention verdict (r13 verdict task 7): lift the
    per-lane CONTENDED heuristic bench_diff prints to a flag recorded
    IN the entry, so a noisy recording is excluded from ratio defaults
    by one field instead of a forensic session over its lane loads.

    Two signals, either trips the flag:
      * the launch/record-time ``load_1m`` exceeds *load_allowance*
        (callers pass a higher allowance when the sample is taken
        while the bench itself is loading the host — local[32]
        self-load sits around 4-6);
      * >= max(3, 5%) of lanes finished under a load above the
        ABSOLUTE :data:`IN_RUN_LOAD_CEILING` — a level the bench's own
        self-load never reaches, so it can only be a neighbor.
    """
    if load_1m is not None and load_1m > load_allowance:
        return True
    vals = list(lane_loads.values())
    busy = sum(1 for v in vals if v > IN_RUN_LOAD_CEILING)
    return busy >= max(3, len(vals) // 20)


def split_for_spill(history: list, keep_fallback: int = 12) -> tuple[list, list]:
    """Partition *history* (the inline BENCH_LOCAL list, recording
    order) into ``(to_archive, inline)`` under the r12-verdict-task-7
    policy: everything older than the second-newest NOTED entry spills
    — unnoted per-invocation entries are measurement inputs, not round
    markers, and they were accreting inline between deliberate
    recordings. With fewer than two noted entries, fall back to a
    fixed newest-``keep_fallback`` window so the inline file is
    bounded from the first run.
    """
    noted = [i for i, e in enumerate(history) if e.get("note")]
    if len(noted) >= 2:
        cut = noted[-2]
    else:
        cut = max(0, len(history) - keep_fallback)
    return history[:cut], history[cut:]


def spill(repo: str = REPO) -> None:
    """Apply :func:`split_for_spill` to the on-disk pair. Archive is
    replaced BEFORE the inline file, so a crash in between re-spills
    the same entries next run — deduped by ``recorded_at`` (second
    resolution; runs take minutes)."""
    path = os.path.join(repo, "BENCH_LOCAL.json")
    if not os.path.exists(path):
        return
    try:
        with open(path) as f:
            history = json.load(f)
    except ValueError:
        return
    to_archive, inline = split_for_spill(history)
    if not to_archive:
        return
    apath = os.path.join(repo, "BENCH_LOCAL_ARCHIVE.json")
    archive = []
    if os.path.exists(apath):
        try:
            with open(apath) as f:
                archive = json.load(f)
        except ValueError:
            archive = []
    seen = {e.get("recorded_at") for e in archive}
    archive.extend(e for e in to_archive if e.get("recorded_at") not in seen)
    atmp = apath + ".tmp"
    with open(atmp, "w") as f:
        json.dump(archive, f, indent=1)
    os.replace(atmp, apath)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(inline, f, indent=1)
    os.replace(tmp, path)


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
