"""Datapoints sinks: analytic parquet store + chunked-request connector.

The reference's only datapoint sink is the CDF HTTP API, posted as
requests of at most 1000 series each, one thread per request
(csv_extractor.py:137-147,162-168,175-196 — S7 in SURVEY.md §2.1).

Two Spark-first sinks re-express that:

- ``write_datapoints``: the engine-native sink — a parquet (or any
  DataFrameWriter format) table partitioned by event date. At 100 TB
  this is the layout that makes every downstream query prune: date
  partitions for time ranges + optional bucket column on external_id
  for series-local scans. No shuffle is forced here: partitionBy
  writes whatever partitioning the plan already has, one file per
  (task, date) pair; callers that need file-count control repartition
  first (see ``repartition_for_write``).
- ``post_datapoints``: connector-parity sink for API-like targets.
  ``foreachPartition`` over a series-clustered frame; each executor
  groups its partition into ≤``max_series_per_request`` payloads and
  hands them to a caller-supplied ``post_fn`` (the HTTP call in the
  reference; a fake in tests). The reference's thread-per-chunk
  fan-out (C1) is replaced by executor parallelism — each partition
  posts independently, so a 32-core cluster sustains 32 in-flight
  requests without any hand-rolled threading.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Reference parity: ≤1000 series per insert request. The literal 1000
#: at csv_extractor.py:138 is what executes (BATCH_MAX at :22 is dead).
MAX_SERIES_PER_REQUEST = 1000


def repartition_for_write(df: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Cluster datapoints by series hash-bucket for compact files.

    Hash-partitioning on ``external_id`` puts each series in exactly one
    task -> one file per (date, bucket), bounding small-file explosion
    in live mode. ``n_buckets`` sizes write parallelism, not storage.
    """
    return df.repartition(n_buckets, "external_id")


def write_datapoints(
    df: DataFrame,
    path: str,
    mode: str = "append",
    fmt: str = "parquet",
    partition_by_date: bool = True,
    cluster_by_series: bool = False,
    n_buckets: int = 32,
) -> None:
    """Engine-native datapoints sink (S7 re-expressed as a table).

    Adds a ``dt`` date column derived from ``ts_ms`` and partitions the
    layout by it, so time-range queries prune at the directory level
    (Catalyst partition pruning — the scale analog of the reference's
    filename-timestamp pruning, csv_extractor.py:242-254).

    ``cluster_by_series=True`` additionally hash-partitions on
    external_id and sorts rows (external_id, ts_ms) WITHIN each task
    before writing: each series lands contiguously in few files and
    every parquet row group carries tight external_id min/max stats,
    so point-series reads prune row groups off the pushed filter —
    the poor man's clustering key, worth it on any table queried by
    series. Costs one shuffle at write time.
    """
    out = df.withColumn("dt", F.to_date(F.timestamp_millis(F.col("ts_ms"))))
    if cluster_by_series:
        # Lead the sort with the partition column: the dynamic-partition
        # writer requires ordering by partition cols and would otherwise
        # re-sort (unstably) by dt alone, destroying the clustering.
        # With dt first, the required ordering is already satisfied and
        # the writer preserves our (external_id, ts_ms) order.
        sort_cols = (["dt"] if partition_by_date else []) + ["external_id", "ts_ms"]
        out = out.repartition(n_buckets, "external_id").sortWithinPartitions(*sort_cols)
    writer = out.write.format(fmt).mode(mode)
    if partition_by_date:
        writer = writer.partitionBy("dt")
    writer.save(path)


def _chunk_rows(
    rows: Iterable, max_series: int
) -> Iterator[list[tuple[str, list[tuple[int, float]]]]]:
    """Group an iterator of datapoint Rows into ≤max_series payloads.

    Payload shape mirrors csv_extractor.py:158:
    ``[(external_id, [(ts_ms, value), ...]), ...]``. Rows for one series
    are contiguous only if the caller clustered them (repartition on
    external_id); we still merge correctly either way because chunk
    boundaries are drawn between series, never inside one.
    """
    current: dict[str, list[tuple[int, float]]] = {}
    for row in rows:
        if row.external_id not in current and len(current) >= max_series:
            yield list(current.items())
            current = {}
        current.setdefault(row.external_id, []).append((row.ts_ms, row.value))
    if current:
        yield list(current.items())


def write_datapoints_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 32,
    mode: str = "append",
) -> None:
    """Datapoints as a BUCKETED catalog table: hash-bucketed + sorted
    on external_id.

    Bucketing is the shuffle-killer for the engine's dominant join
    pattern (datapoints x series catalog / datapoints x datapoints
    alignment): two tables bucketed on the same key join with ZERO
    exchange — the co-location was paid once at write. Also gives
    bucket pruning for point lookups on external_id. Requires
    saveAsTable (bucket metadata lives in the catalog, not the files);
    pinned by tests/test_bucketed_join.py asserting an exchange-free
    sort-merge join plan.
    """
    out = df.withColumn("dt", F.to_date(F.timestamp_millis(F.col("ts_ms"))))
    (
        out.write.mode(mode)
        .bucketBy(n_buckets, "external_id")
        .sortBy("external_id", "ts_ms")
        .format("parquet")
        .saveAsTable(table_name)
    )


def post_datapoints(
    df: DataFrame,
    post_fn: Callable[[list[tuple[str, list[tuple[int, float]]]]], None],
    max_series_per_request: int = MAX_SERIES_PER_REQUEST,
    cluster: bool = True,
) -> None:
    """Connector sink: ship datapoints as ≤1000-series requests (S7).

    ``post_fn`` runs on executors — it must be picklable and must not
    capture the SparkSession. Errors raised by ``post_fn`` fail the
    task and surface as a job failure (Spark's retry policy applies);
    the reference instead logged-and-dropped failed requests
    (csv_extractor.py:78-89) — that looser mode belongs in the caller's
    ``post_fn`` wrapper, not in the engine.
    """
    slim = df.select("external_id", "ts_ms", "value")
    if cluster:
        slim = repartition_for_write(slim)

    def _send(rows: Iterable) -> None:
        for payload in _chunk_rows(rows, max_series_per_request):
            post_fn(payload)

    slim.foreachPartition(_send)


def backfill_datapoints(
    spark,
    folder: str,
    sink_dir: str,
    time_from: int | None = None,
    time_until: int | None = None,
) -> dict[str, int]:
    """Repair/backfill a date range of the datapoints sink from the
    source CSV folder: re-ingest the files the reference's
    filename-timestamp pruning selects (S2 — strict-exclusive epoch
    bounds), then REPLACE exactly the ``dt=`` partitions those rows
    land in via dynamic partition overwrite.

    The operation every partitioned pipeline eventually needs ("day X
    was ingested with the bad parser — redo it") made idempotent: the
    rewritten partitions' content is a pure function of the source
    files, re-running converges, and untouched dt partitions are
    never rewritten (dynamic mode only replaces partitions present in
    the output). At 100 TB the cost is the re-ingested files plus the
    affected directories — never a full-table rewrite.

    Returns {"files": n, "datapoints": n, "partitions": n}.
    """
    from datapoints_csv_extractor_spark.sources.files import (
        find_historical_files,
    )
    from datapoints_csv_extractor_spark.sources.tebis_csv import (
        read_datapoints,
    )

    paths = find_historical_files(folder, time_from, time_until)
    if not paths:
        return {"files": 0, "datapoints": 0, "partitions": 0}
    dp = read_datapoints(spark, paths)
    out = dp.withColumn(
        "dt", F.to_date(F.timestamp_millis(F.col("ts_ms")))
    ).localCheckpoint()  # consumed twice: stats + write
    n_rows = out.count()
    n_parts = out.select("dt").distinct().count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("dt").parquet(sink_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"files": len(paths), "datapoints": n_rows, "partitions": n_parts}
