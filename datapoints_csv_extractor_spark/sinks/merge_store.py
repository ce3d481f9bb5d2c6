"""Hash-bucket-partitioned current-state store: MERGE INTO semantics
on plain parquet.

The scale problem with materializing ``merge_upsert`` results: a
naive implementation rewrites the WHOLE store every batch — O(corpus)
per ingest. This store partitions current state by
``xxhash64(keys) % n_buckets``; an incoming delta only touches the
buckets its keys hash into, so a batch's cost is
O(|delta| + |affected buckets|) — the fraction the delta actually
names — and Spark's dynamic partition overwrite makes the per-bucket
rewrite the commit unit. Replaying a batch is harmless: latest-wins
merge is idempotent (max of a max), so a crash between bucket writes
heals on retry.

Tombstones are applied and DROPPED at merge time (the store holds
only live rows). That is correct under the streaming contract —
batches arrive in order, so a delete can never be trumped by an
out-of-order older update. For out-of-order ingestion keep the
change-log and compact with ``merge_upsert`` instead.

Reference analog: the catalog store's append-missing upsert
(sinks/catalog_store.py, S6/S8) is the insert-only special case;
this adds updates and deletes with the same parquet-only posture.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.relational import merge_upsert

_BUCKET = "__bucket"


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    b = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    return df.withColumn(_BUCKET, b.cast("int"))


def read_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Current state (all live rows). The bucket column stays
    internal. A fully-emptied store (every key tombstoned) has no
    parquet files to infer from; the schema sidecar written at first
    merge covers that case with an empty frame."""
    import glob
    import json

    from pyspark.sql import types as T

    if glob.glob(os.path.join(store_path, f"{_BUCKET}=*", "*.parquet")):
        return spark.read.parquet(store_path).drop(_BUCKET)
    with open(os.path.join(store_path, "_schema.json")) as fh:
        schema = T.StructType.fromJson(json.load(fh))
    return spark.createDataFrame([], schema)


def upsert_into_store(
    spark: SparkSession,
    delta: DataFrame,
    store_path: str,
    keys: list[str],
    version_cols: list[str],
    deleted_col: str = "deleted",
    n_buckets: int = 64,
) -> list[int]:
    """Merge one delta batch into the store; returns the bucket ids
    rewritten (the O(affected) unit of work).

    Plan per batch: bucket the delta, collect its DISTINCT bucket ids
    (parameter-sized, <= n_buckets), read ONLY those bucket
    partitions of the store (partition pruning), latest-wins merge
    (one partial-aggregated shuffle over delta + affected state), and
    dynamic-partition-overwrite exactly those directories."""
    delta_b = _with_bucket(delta, keys, n_buckets)
    affected = sorted(
        r[_BUCKET] for r in delta_b.select(_BUCKET).distinct().collect()
    )
    if not affected:
        return []
    if os.path.exists(os.path.join(store_path, "_SUCCESS")):
        base = (
            spark.read.parquet(store_path)
            .where(F.col(_BUCKET).isin(affected))
            .drop(_BUCKET)
        )
        # stored rows are live by construction
        base = base.withColumn(deleted_col, F.lit(False))
        merged = merge_upsert(
            base,
            delta_b.drop(_BUCKET),
            keys=keys,
            version_cols=version_cols,
            deleted_col=deleted_col,
        )
    else:
        merged = merge_upsert(
            delta_b.drop(_BUCKET).limit(0),
            delta_b.drop(_BUCKET),
            keys=keys,
            version_cols=version_cols,
            deleted_col=deleted_col,
        )
    out = _with_bucket(merged.drop(deleted_col), keys, n_buckets)
    schema_path = os.path.join(store_path, "_schema.json")
    if not os.path.exists(schema_path):
        import json

        os.makedirs(store_path, exist_ok=True)
        with open(schema_path, "w") as fh:
            json.dump(out.drop(_BUCKET).schema.jsonValue(), fh)
    out = out.localCheckpoint()  # the survivor set is consumed twice
    survivors = {
        r[_BUCKET] for r in out.select(_BUCKET).distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy(_BUCKET).parquet(store_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Dynamic overwrite only replaces partitions PRESENT in the
    # output: an affected bucket whose every row was tombstoned has
    # no output partition and would keep its stale directory — clear
    # those explicitly.
    import shutil

    for b in affected:
        if b not in survivors:
            shutil.rmtree(
                os.path.join(store_path, f"{_BUCKET}={b}"),
                ignore_errors=True,
            )
    return affected


def stream_upsert_into_store(
    spark: SparkSession,
    delta_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    keys: list[str],
    version_cols: list[str],
    deleted_col: str = "deleted",
    n_buckets: int = 64,
    available_now: bool = True,
):
    """Continuous MERGE INTO: every micro-batch folds into the store
    through ``upsert_into_store``. foreachBatch is at-least-once;
    idempotent latest-wins makes the replay safe, and the checkpoint
    carries the source offsets."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        upsert_into_store(
            spark, batch_df, store_path, keys, version_cols,
            deleted_col=deleted_col, n_buckets=n_buckets,
        )

    writer = delta_stream.writeStream.foreachBatch(_handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
