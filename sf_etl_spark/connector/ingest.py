"""Ingest-side result retrieval: failed-row download as a DataFrame.

The reference never ships a load leg at all (its job state machine,
``oxidized-force/src/response.rs:47-54``, covers only query jobs);
this module extends the writer (`datasource.SfIngestWriter`) with the
piece every production load needs: the ``/jobs/ingest/{id}/
failedResults`` download, surfaced as a DataFrame.

Scale shape: one task per ingest job id (``parallelize(ids, n)`` +
``mapPartitions``) — each task logs in and pulls its job's reject CSV
independently, so a 1000-job load (one job per written partition)
drains its failures with cluster parallelism, not a driver loop. The
per-job reject payload is the bounded one (failures are a sliver of a
load, and Salesforce caps job size at 150M records), so rows stay
executor-side until the caller aggregates or writes them.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    MapType,
    StringType,
    StructField,
    StructType,
)

FAILED_RESULTS_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("sf_id", StringType(), True),
        StructField("sf_error", StringType(), True),
        # original row payload as a map — jobs with different written
        # column sets coexist in one stable schema
        StructField("fields", MapType(StringType(), StringType()), True),
    ]
)

SUCCESSFUL_RESULTS_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("sf_id", StringType(), True),
        # true = the row CREATED a record (insert / upsert-miss);
        # false = it updated or deleted an existing one
        StructField("created", BooleanType(), True),
        StructField("fields", MapType(StringType(), StringType()), True),
    ]
)


def _parse_failed_csv(job_id: str, text: str) -> Iterator[tuple]:
    rows = csv.reader(io.StringIO(text))
    header = next(rows, None) or []
    data_cols = [c for c in header if c not in ("sf__Id", "sf__Error")]
    idx = {c: header.index(c) for c in header}
    for row in rows:
        get = lambda c: row[idx[c]] if c in idx and idx[c] < len(row) else None
        yield (
            job_id,
            get("sf__Id") or None,
            get("sf__Error"),
            {c: get(c) for c in data_cols},
        )


def failed_results_df(
    spark: SparkSession,
    options: dict[str, str],
    job_ids: Sequence[str] | None = None,
) -> DataFrame:
    """Rejected rows of the given ingest jobs as a DataFrame.

    ``options`` are the same connector options the ``sfetl`` format
    takes (login_url/client_id/.../object). ``job_ids=None`` sweeps
    every finished ingest job the backend lists (GET /jobs/ingest,
    every page) — the "what failed in last night's load?" call. The
    sweep covers BOTH terminal-with-results states: ``JobComplete``
    (partial row rejects) and ``Failed`` (job-level rejects — those
    jobs still expose retrievable failed records), and is scoped to
    ``options['object']`` when set, so one object's sweep never pulls
    another pipeline's jobs (r11 ADVICE).
    """
    from sf_etl_spark.connector.client import JobState
    from sf_etl_spark.connector.datasource import _client_from_options

    if job_ids is None:
        client = _client_from_options(options)
        obj_name = options.get("object")
        job_ids = [
            j.id
            for j in client.list_ingest_jobs()
            if j.state in (JobState.JOB_COMPLETE, JobState.FAILED)
            and (obj_name is None or j.object == obj_name)
        ]
    ids = [j for j in job_ids if j]
    if not ids:
        return spark.createDataFrame([], FAILED_RESULTS_SCHEMA)
    opts = dict(options)

    def fetch(part: Iterator[str]) -> Iterator[tuple]:
        client = _client_from_options(opts)
        for jid in part:
            yield from _parse_failed_csv(
                jid, client.get_ingest_failed_results(jid)
            )

    rdd = spark.sparkContext.parallelize(ids, len(ids)).mapPartitions(fetch)
    return spark.createDataFrame(rdd, FAILED_RESULTS_SCHEMA)


def _parse_successful_csv(job_id: str, text: str) -> Iterator[tuple]:
    rows = csv.reader(io.StringIO(text))
    header = next(rows, None) or []
    data_cols = [c for c in header if c not in ("sf__Id", "sf__Created")]
    idx = {c: header.index(c) for c in header}
    for row in rows:
        get = lambda c: row[idx[c]] if c in idx and idx[c] < len(row) else None
        created = get("sf__Created")
        yield (
            job_id,
            get("sf__Id") or None,
            None if created is None else created.lower() == "true",
            {c: get(c) for c in data_cols},
        )


def successful_results_df(
    spark: SparkSession,
    options: dict[str, str],
    job_ids: Sequence[str] | None = None,
) -> DataFrame:
    """Applied rows of the given ingest jobs as a DataFrame —
    ``/jobs/ingest/{id}/successfulResults`` (``sf__Id,sf__Created`` +
    the original columns), one download task per job.

    This is the read-back every keyed downstream step builds on: the
    server-assigned Ids of what a load just created (``created=true``)
    vs what it updated (``created=false``). Same sweep semantics as
    :func:`failed_results_df` when ``job_ids`` is None (paginated list,
    JobComplete + Failed, scoped to ``options['object']``).

    Scale note: unlike rejects, successes are the BULK of a load —
    at production volume pass explicit ``job_ids`` and aggregate or
    write the result promptly rather than collecting it.
    """
    from sf_etl_spark.connector.client import JobState
    from sf_etl_spark.connector.datasource import _client_from_options

    if job_ids is None:
        client = _client_from_options(options)
        obj_name = options.get("object")
        job_ids = [
            j.id
            for j in client.list_ingest_jobs()
            if j.state in (JobState.JOB_COMPLETE, JobState.FAILED)
            and (obj_name is None or j.object == obj_name)
        ]
    ids = [j for j in job_ids if j]
    if not ids:
        return spark.createDataFrame([], SUCCESSFUL_RESULTS_SCHEMA)
    opts = dict(options)

    def fetch(part: Iterator[str]) -> Iterator[tuple]:
        client = _client_from_options(opts)
        for jid in part:
            yield from _parse_successful_csv(
                jid, client.get_ingest_successful_results(jid)
            )

    rdd = spark.sparkContext.parallelize(ids, len(ids)).mapPartitions(fetch)
    return spark.createDataFrame(rdd, SUCCESSFUL_RESULTS_SCHEMA)


UNPROCESSED_RECORDS_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("fields", MapType(StringType(), StringType()), True),
    ]
)


def unprocessed_records_df(
    spark: SparkSession,
    options: dict[str, str],
    job_ids: Sequence[str] | None = None,
) -> DataFrame:
    """Rows the backend never ATTEMPTED, as a DataFrame — the retry
    set of a resumable loader (``/jobs/ingest/{id}/unprocessedrecords``:
    job-level failures and aborts leave their whole upload here,
    distinct from ROW rejects). A 3-line resume is
    ``unprocessed_records_df(...)`` → reshape ``fields`` → write back
    through the sink. The ``job_ids=None`` sweep covers Failed and
    Aborted jobs for ``options['object']``."""
    from sf_etl_spark.connector.client import JobState
    from sf_etl_spark.connector.datasource import _client_from_options

    if job_ids is None:
        client = _client_from_options(options)
        obj_name = options.get("object")
        job_ids = [
            j.id
            for j in client.list_ingest_jobs()
            if j.state in (JobState.FAILED, JobState.ABORTED)
            and (obj_name is None or j.object == obj_name)
        ]
    ids = [j for j in job_ids if j]
    if not ids:
        return spark.createDataFrame([], UNPROCESSED_RECORDS_SCHEMA)
    opts = dict(options)

    def fetch(part: Iterator[str]) -> Iterator[tuple]:
        client = _client_from_options(opts)
        for jid in part:
            rows = csv.reader(
                io.StringIO(client.get_ingest_unprocessed_records(jid))
            )
            header = next(rows, None) or []
            for row in rows:
                yield (jid, dict(zip(header, row)))

    rdd = spark.sparkContext.parallelize(ids, len(ids)).mapPartitions(fetch)
    return spark.createDataFrame(rdd, UNPROCESSED_RECORDS_SCHEMA)
