"""End-to-end tests for the ``sf-sql`` CLI (``sf_etl_spark/cli.py``)
against the mock Salesforce server — the reference's only executable
(``sql-builder/src/main.rs:51-82``), which has zero tests upstream."""

from __future__ import annotations

import pytest

from sf_etl_spark.cli import main
from sf_etl_spark.connector.mockserver import MockSalesforce


@pytest.fixture(scope="module")
def sf_url():
    server = MockSalesforce()
    url = server.start()
    yield url
    server.stop()


def run_cli(sf_url, tmp_path, *extra, creds=True):
    out = tmp_path / "out.sql"
    argv = ["-n", "Case", "-o", str(out)]
    if creds:
        argv += ["-c", "app", "-s", "shhh", "-u", "user@test", "-p", "pw"]
    argv += ["-e", sf_url, *extra]
    rc = main(argv)
    return rc, (out.read_text() if out.exists() else None)


def test_cli_writes_pg_ddl(sf_url, tmp_path):
    rc, ddl = run_cli(sf_url, tmp_path)
    assert rc == 0
    assert ddl.startswith('CREATE TABLE "Case"')
    # Id is the PK; Salesforce Id fields are non-nillable → PRIMARY KEY
    assert '"Id" VARCHAR(18) PRIMARY KEY' in ddl
    # DDL must be deterministic run-over-run (reference bug table.rs:11)
    rc2, ddl2 = run_cli(sf_url, tmp_path)
    assert rc2 == 0 and ddl2 == ddl


def test_cli_spark_dialect(sf_url, tmp_path):
    rc, ddl = run_cli(sf_url, tmp_path, "-d", "spark")
    assert rc == 0
    assert ddl.rstrip().endswith("USING parquet;")
    assert "`Id`" in ddl  # Spark dialect backtick-quotes identifiers


def test_cli_env_fallbacks(sf_url, tmp_path, monkeypatch):
    # main.rs:20-48: every credential can come from the environment
    monkeypatch.setenv("SF_CLIENT_ID", "app")
    monkeypatch.setenv("SF_CLIENT_SECRET", "shhh")
    monkeypatch.setenv("SF_USERNAME", "user@test")
    monkeypatch.setenv("SF_PASSWORD", "pw")
    rc, ddl = run_cli(sf_url, tmp_path, creds=False)
    assert rc == 0 and ddl.startswith('CREATE TABLE "Case"')


def test_cli_missing_credentials(sf_url, tmp_path, monkeypatch, capsys):
    for var in ("SF_CLIENT_ID", "SF_CLIENT_SECRET", "SF_USERNAME", "SF_PASSWORD"):
        monkeypatch.delenv(var, raising=False)
    rc, ddl = run_cli(sf_url, tmp_path, creds=False)
    assert rc == 2 and ddl is None
    assert "missing required credentials" in capsys.readouterr().err


def test_cli_bad_secret(sf_url, tmp_path, capsys):
    out = tmp_path / "out.sql"
    rc = main(
        ["-n", "Case", "-o", str(out), "-c", "app", "-s", "WRONG",
         "-u", "user@test", "-p", "pw", "-e", sf_url]
    )
    assert rc == 1 and not out.exists()
    assert "sf-sql:" in capsys.readouterr().err
