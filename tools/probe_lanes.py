#!/usr/bin/env python
"""Standalone best-of-3 wall timing for named lanes at a given sf dir
(the PLANS.md probe harness). Usage:
    python tools/probe_lanes.py <sf_dir> lane [lane...]
Prints one 'lane best_sec' line per lane."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sf_etl_spark.queries import all_queries  # noqa: E402
from sf_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, lanes = sys.argv[1], sys.argv[2:]
    spark = get_spark("lane-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    specs["q5_revenue_by_nation"].fn(spark, sf_dir).count()  # warm
    for name in lanes:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        print(f"{name} {best:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
