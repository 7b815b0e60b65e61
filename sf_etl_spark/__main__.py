"""``python -m sf_etl_spark`` → the ``sf-sql`` CLI (see ``cli.py``)."""

from sf_etl_spark.cli import main

raise SystemExit(main())
