#!/usr/bin/env python
"""Sub-second tail profiler (guide §1 / VERDICT r11 item 6).

For each named registry query, split the per-run wall into
- build_ms: the Python call that CONSTRUCTS the DataFrame (driver-side
  DAG building: py4j round-trips, any eager actions hidden in the
  operator),
- plan_ms: analysis + optimization + physical planning of the final
  frame (driver-side Catalyst work, forced via explain string),
- exec_ms: the noop-sink execution wall,
- work_ms: executor task-time delta for the run.

Sub-second entries are job-round-trip bound; this separates "slow to
ask" (build/plan — the F.lit(list)/py4j class the r11 numpy-lit fix
attacked) from "slow to run" (exec >> work/cores = scheduling).

Usage: python scripts/profile_tail.py [--runs N] [--json-out F] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from datapoints_csv_extractor_spark.plans.introspect import (
        executor_run_time_ms,
    )
    from datapoints_csv_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="profile_tail",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(qs["q1_pricing_summary"](spark, args.sf_dir))

    results: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"tail:{name}")
        best = None
        for _ in range(args.runs):
            w0 = executor_run_time_ms(spark)
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            # force full driver-side planning without executing
            spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            t2 = time.perf_counter()
            noop(df)
            t3 = time.perf_counter()
            work = max(executor_run_time_ms(spark) - w0, 0)
            row = {
                "build_ms": round((t1 - t0) * 1000),
                "plan_ms": round((t2 - t1) * 1000),
                "exec_ms": round((t3 - t2) * 1000),
                "total_ms": round((t3 - t0) * 1000),
                "work_ms": work,
            }
            if best is None or row["total_ms"] < best["total_ms"]:
                best = row
        results[name] = best
        print(
            f"{name}: build {best['build_ms']} plan {best['plan_ms']} "
            f"exec {best['exec_ms']} work {best['work_ms']} "
            f"(total {best['total_ms']})"
        )
        spark.sparkContext.setJobDescription(None)

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
