#!/usr/bin/env python
"""Skew-demo LSH profiler (guide §1: measure first).

Reproduces bench.py's adversarial skew setup (boilerplate-hot corpus
with a 0.2n identical-text hub clique) and measures the guarded and
unguarded `lsh_candidates_from_signatures` paths through the noop sink
with wall + executor work + stage/task telemetry, interleaved per run
so host stalls hit both variants alike.

Usage:
  python scripts/profile_skew_lsh.py [--sf 0.1] [--runs 3]
      [--plans-dir plans/r12] [--tag before]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from datapoints_csv_extractor_spark.plans.introspect import (
        executor_run_time_ms,
    )
    from datapoints_csv_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="profile_skew_lsh",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    from datapoints_csv_extractor_spark.operators.dedup import (
        lsh_candidates_from_signatures,
        minhash_signatures_df,
    )
    from pyspark.sql import functions as F

    skew_dir = os.path.join(
        tempfile.mkdtemp(prefix="profile_skew_"), "documents"
    )
    bench._make_skewed_corpus(spark, args.sf).write.mode(
        "overwrite"
    ).parquet(skew_dir)
    skew = spark.read.parquet(skew_dir)
    sig = minhash_signatures_df(skew).localCheckpoint()
    no_cap = 1 << 40

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "guarded": lambda: lsh_candidates_from_signatures(sig),
        "unguarded": lambda: lsh_candidates_from_signatures(
            sig, max_bucket=no_cap
        ),
    }

    # Checksum each variant's result once (order-insensitive).
    for name, make in variants.items():
        out = make()
        row = out.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("doc_id_1", "doc_id_2")).alias("h"),
        ).collect()[0]
        print(f"{name}: rows={row['n']} checksum={row['h']}")

    stats = {n: {"wall": [], "work": []} for n in variants}
    for r in range(args.runs):
        for name, make in variants.items():
            spark.sparkContext.setJobDescription(f"skew_lsh:{name}:{r}")
            w0 = executor_run_time_ms(spark)
            t0 = time.perf_counter()
            noop(make())
            dt = time.perf_counter() - t0
            dw = max(executor_run_time_ms(spark) - w0, 0)
            stats[name]["wall"].append(round(dt, 3))
            stats[name]["work"].append(dw)
            spark.sparkContext.setJobDescription(None)

    for name, s in stats.items():
        print(
            f"{name}: wall min {min(s['wall']):.3f}s all {s['wall']} | "
            f"work min {min(s['work'])}ms all {s['work']}"
        )

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name, make in variants.items():
            df = make()
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(
                args.plans_dir, f"skew_lsh_{name}_{args.tag}.txt"
            )
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"plan -> {path}")


if __name__ == "__main__":
    main()
