#!/usr/bin/env python
"""Round-15 optimization measurement harness (guide §1).

Times individual registered lanes in ISOLATION with the noop sink
(`df.write.format("noop")...` — computes every column of every row,
guide §1.4) so the computation is measured rather than the terminal
count()'s pruned plan, labels each job (§1.5), and captures
`.explain("formatted")` per lane for the plans/r15/ evidence files.

This tool is measurement-only: it never feeds CORRECTNESS/BENCH
artifacts (bench.py keeps its count()-based, round-comparable
methodology; see OPTIMIZATION_r15.md).

Usage:
  python tools/opt_measure.py LANE [LANE...] [--runs 3] [--action noop|count]
                              [--explain plans/r15] [--suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lanes", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--action", choices=["noop", "count"], default="noop")
    ap.add_argument("--explain", default=None, help="directory for <lane>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from sf_etl_spark.queries import all_queries
    from sf_etl_spark.session import get_spark

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    # JVM/parquet-footer warm-up, same as bench.py
    specs["q5_revenue_by_nation"].fn(spark, args.sf_dir).count()

    out: dict[str, float] = {}
    for name in args.lanes:
        fn = specs[name].fn
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(formatted_plan(df))
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt_measure: {name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]} s (best of {args.runs}, {args.action})", file=sys.stderr)
    print(json.dumps({"action": args.action, "runs": args.runs, "sf_dir": args.sf_dir, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
