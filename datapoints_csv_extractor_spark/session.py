"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for correctness-vs-oracle determinism (UTC session
timezone, ANSI off so casts yield NULL like the reference's
skip-on-parse-error at csv_extractor.py:98-102) and for 100 TB-scale
behavior (AQE on with partition coalescing + skew-join handling, Arrow
for any pandas-UDF exchange, parquet filter pushdown).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

SCALE_DEFAULTS: dict[str, str] = {
    # Adaptive execution: runtime re-planning, small-partition coalescing
    # and skew-join splitting are essential at 100 TB where static
    # shuffle-partition counts are always wrong somewhere.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic wall-clock semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # The reference treats unparseable values as skip-not-fail
    # (csv_extractor.py:98-102); non-ANSI casts give the same
    # NULL-then-filter semantics JVM-side.
    "spark.sql.ansi.enabled": "false",
    # Arrow for pandas-UDF boundaries (vector ops, multimodal stubs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Scan hygiene: pushdown + pruning are the difference between
    # reading 100 TB and reading the 2 columns x 3 partitions asked for.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # 128 MiB split size is the classic sweet spot for parquet scans.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast joins for dimensions (region/nation/catalog) up to 64 MiB.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # PySpark's local-mode default heap is 1g — undersized for a
    # local[32] analytics driver (in local mode the driver JVM hosts
    # every executor thread AND every broadcast build; the dense-graph
    # triangle census's broadcasts exhausted the 1g default). Applied
    # at JVM launch only; getOrCreate on a live session ignores it,
    # and real cluster deploys size executors separately.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "datapoints-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    cluster manager is configured; on a real cluster the deploy
    environment provides the master and these settings still apply.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(SCALE_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    else:
        conf.setdefault("spark.sql.shuffle.partitions", "32")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
