"""Incremental (high-watermark) extraction — the standard ETL pattern
the reference's extraction client implies but never implements.

The reference can create/poll/abort a bulk extract job
(``client.rs:215-243``) and forward a SOQL string (``client.rs:199-205``),
so every run re-extracts the full object. Real ETL schedules pull only
records changed since the last run: ``WHERE <watermark_field> >
<last_seen>`` (Salesforce convention: ``SystemModstamp``), then
advance the watermark to the max seen. This module adds that loop on
top of the paginated client, with the watermark persisted as a JSON
state file so runs are resumable and idempotent.

The state advance is TWO-PHASE: ``extract_incremental`` computes the
new watermark but does **not** persist it — the caller durably sinks
the records first, then calls ``result.commit()``. A crash between
extract and sink therefore re-extracts the same delta on the next run
(at-least-once) instead of silently losing it; persisting before the
sink would turn any such crash into permanent data loss.

Correctness properties (tested in tests/test_incremental.py):
- first run = full extract; subsequent runs fetch ONLY the delta;
- the watermark advances (on commit) to the max extracted value,
  never beyond — records modified mid-extract surface in the next
  run, deduplicated downstream by primary key;
- a run with no changes writes nothing and leaves state untouched;
- an uncommitted run leaves state untouched, so the delta is
  re-served.

Scale notes: the delta predicate is evaluated REMOTELY (it rides the
SOQL WHERE), so a daily run moves |changed rows|, not |object|. Batch
files land as parquet parts per run; downstream dedup-by-pk
(``dropDuplicates`` on Id, keep max watermark) reconciles overlap,
mirroring the partition-local upsert lane in streaming/pipelines.py.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from sf_etl_spark.connector.client import SfClient


@dataclass
class IncrementalResult:
    n_rows: int
    watermark: Any  # pending until commit(); None when nothing ever seen
    _state_path: str | None = field(default=None, repr=False)
    committed: bool = field(default=False, repr=False)

    def commit(self) -> None:
        """Persist the advanced watermark — call AFTER the records are
        durably stored downstream. No-op when nothing was fetched."""
        if self._state_path is not None and not self.committed:
            _write_state(self._state_path, self.watermark)
        self.committed = True


def _read_state(state_path: str) -> Any:
    # storage-agnostic (fsutil/pyarrow.fs): the state file lives
    # wherever the pipeline's checkpoints live — object-store paths on
    # a real cluster, not just driver-local POSIX
    from sf_etl_spark.connector.fsutil import read_small_file

    raw = read_small_file(state_path)
    if raw is None:
        return None
    return json.loads(raw.decode("utf-8")).get("watermark")


def _write_state(state_path: str, watermark: Any) -> None:
    # tmp + move: atomic on local/HDFS — a crashed run never corrupts
    # state; overwrite-converged on object stores
    from sf_etl_spark.connector.fsutil import write_small_file_atomic

    write_small_file_atomic(
        state_path, json.dumps({"watermark": watermark}).encode("utf-8")
    )


def extract_incremental(
    client: SfClient,
    object_name: str,
    fields: list[str],
    watermark_field: str,
    state_path: str,
) -> tuple[list[dict], IncrementalResult]:
    """One incremental pull: fetch rows with watermark strictly above
    the persisted value (all rows on the first run) and return the raw
    records plus a result whose ``commit()`` advances the state file.

    The state file is NOT touched here — sink first, then
    ``result.commit()``; see the two-phase note in the module doc.

    The SELECT list always includes the watermark field — advancing
    the state from data we did not fetch would be a correctness bug.
    """
    if watermark_field not in fields:
        fields = [*fields, watermark_field]
    last = _read_state(state_path)
    soql = f"SELECT {', '.join(fields)} FROM {object_name}"
    if last is not None:
        soql += f" WHERE {watermark_field} > {last}"
    records: list[dict] = []
    for page in client.query_pages(soql):
        records.extend(page.records)
    if not records:
        # nothing to sink, nothing to commit — state stays as-is
        return records, IncrementalResult(n_rows=0, watermark=last, committed=True)
    new_mark = max(_coerce(r[watermark_field]) for r in records)
    return records, IncrementalResult(
        n_rows=len(records), watermark=new_mark, _state_path=state_path
    )


def _coerce(v: Any) -> Any:
    """Numeric watermarks arrive as wire strings; compare them as
    numbers (lexicographic '10' < '9' would move the watermark
    BACKWARD and re-extract forever)."""
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v
    return v
