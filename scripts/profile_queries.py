#!/usr/bin/env python
"""Per-query optimization profiler (guide §1: measure first).

For each named registry query: run it through the noop sink with the
bench's best-of-N protocol on a bench-identical session, and record

- wall seconds (min over runs; same estimator as bench.py `_best_of`),
- executor task-time delta (work_ms; min over runs) — the dial that
  distinguishes "does more work" from "schedules more rounds",
- stage/task counts per run — the scheduling-latency dial for the
  iterative families (wall >> work/cores means round-trip bound),
- `.explain("formatted")` captured to plans/<dir>/<query>_<tag>.txt
  (the judge-facing before/after plan evidence).

Usage:
  python scripts/profile_queries.py [--sf-dir D] [--runs N]
      [--plans-dir plans/r11] [--tag before] [--json-out F] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_task_counts(spark) -> tuple[int, int]:
    sc = spark.sparkContext
    gw = sc._gateway
    empty = sc._jvm.java.util.ArrayList()
    no_quantiles = gw.new_array(gw.jvm.double, 0)
    stages = sc._jsc.sc().statusStore().stageList(
        empty, False, False, no_quantiles, empty
    )
    n_stages = 0
    n_tasks = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        n_stages += 1
        n_tasks += s.numCompleteTasks()
    return n_stages, n_tasks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from datapoints_csv_extractor_spark.plans.introspect import (
        executor_run_time_ms,
    )
    from datapoints_csv_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm the JVM the way bench.py does.
    noop(qs["q1_pricing_summary"](spark, args.sf_dir))

    results: dict[str, dict] = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! {name}: not in registry", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        wall = None
        work = None
        stages = None
        tasks = None
        for _ in range(args.runs):
            s0, t0c = _stage_task_counts(spark)
            w0 = executor_run_time_ms(spark)
            t0 = time.perf_counter()
            noop(qs[name](spark, args.sf_dir))
            dt = time.perf_counter() - t0
            dw = max(executor_run_time_ms(spark) - w0, 0)
            s1, t1c = _stage_task_counts(spark)
            wall = dt if wall is None else min(wall, dt)
            work = dw if work is None else min(work, dw)
            stages = s1 - s0
            tasks = t1c - t0c
        results[name] = {
            "wall_sec": round(wall, 3),
            "work_ms": work,
            "stages_per_run": stages,
            "tasks_per_run": tasks,
        }
        print(
            f"{name}: wall {wall:.3f}s work {work}ms "
            f"stages {stages} tasks {tasks}"
        )
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(txt)
        spark.sparkContext.setJobDescription(None)

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
