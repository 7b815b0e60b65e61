"""``sf-sql``-equivalent CLI: introspect one SObject's schema and write a
``CREATE TABLE`` DDL file.

Reference parity (SURVEY.md §3 E1): reproduces the reference's only
executable, the ``sf-sql`` binary (``sql-builder/src/main.rs:18-82``) —
arg/env-var handling (``main.rs:20-48``: ``SF_CLIENT_ID``,
``SF_CLIENT_SECRET``, ``SF_LOGIN_ENDPOINT``, ``SF_USERNAME``,
``SF_PASSWORD``), login (``main.rs:62``), describe (``main.rs:65``),
field→column mapping (``main.rs:69-75``), DDL render (``main.rs:79``),
file write (``main.rs:77-79``) — with the deliberate fixes the schema
layer already makes: deterministic column order (vs ``table.rs:11``),
``Currency/Percent`` kept as DECIMAL, and a ``--dialect`` switch the
reference hard-codes to Postgres.

No SparkSession is needed: the pipeline is pure metadata
(describe JSON → ``StructType`` → DDL text), so the CLI stays
driver-side and costs no JVM startup.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Sequence

from sf_etl_spark.connector.client import SfClient
from sf_etl_spark.connector.errors import ConnectorError
from sf_etl_spark.schema.ddl import DIALECTS, create_table_ddl


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sf-sql",
        description="Builds SQL for Salesforce objects",  # main.rs:18
    )
    # env-var fallbacks mirror main.rs:20-48; argparse has no native env
    # support, so defaults come from os.environ and required-ness is
    # enforced after parse (so the env can satisfy a "required" arg).
    p.add_argument("-c", "--client-id", default=os.environ.get("SF_CLIENT_ID"))
    p.add_argument("-s", "--client-secret", default=os.environ.get("SF_CLIENT_SECRET"))
    p.add_argument(
        "-e",
        "--login-endpoint",
        default=os.environ.get("SF_LOGIN_ENDPOINT", "https://login.salesforce.com"),
    )
    p.add_argument("-u", "--username", default=os.environ.get("SF_USERNAME"))
    p.add_argument("-p", "--password", default=os.environ.get("SF_PASSWORD"))
    p.add_argument("-n", "--name", required=True, help="SObject name")
    p.add_argument("-o", "--output", required=True, help="Output file path")
    p.add_argument(
        "-d",
        "--dialect",
        choices=sorted(DIALECTS),
        default="postgres",
        help="SQL dialect to render (reference supports postgres only)",
    )
    p.add_argument("--api-version", default=None, help="e.g. v49.0 (reference default)")
    return p


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    missing = [
        flag
        for flag, val in [
            ("--client-id / SF_CLIENT_ID", args.client_id),
            ("--client-secret / SF_CLIENT_SECRET", args.client_secret),
            ("--username / SF_USERNAME", args.username),
            ("--password / SF_PASSWORD", args.password),
        ]
        if not val
    ]
    if missing:
        print(f"sf-sql: missing required credentials: {', '.join(missing)}", file=sys.stderr)
        return 2

    kwargs = {"api_version": args.api_version} if args.api_version else {}
    try:
        # builder validation errors (ClientBuilderError) surface here,
        # like main.rs:55-59 → client.rs:99-135
        client = SfClient(
            client_id=args.client_id,
            client_secret=args.client_secret,
            login_url=args.login_endpoint,
            **kwargs,
        )
        client.login(args.username, args.password)  # main.rs:62
        schema = client.describe(args.name)  # main.rs:65
    except ConnectorError as e:
        print(f"sf-sql: {e}", file=sys.stderr)
        return 1

    ddl = create_table_ddl(args.name, schema.to_struct_type(), dialect=args.dialect)
    with open(args.output, "w", encoding="utf-8") as fh:  # main.rs:77-79
        fh.write(ddl + "\n")
    print(f"wrote {args.output} ({len(schema.fields)} columns, dialect={args.dialect})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
