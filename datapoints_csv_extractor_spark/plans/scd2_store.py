"""Maintained (incremental) SCD2 dimension store.

The batch operator (operators/relational.py: scd2_history) recomputes
a type-2 history from the full event log; a production dimension is
MAINTAINED — each day's (or micro-batch's) events fold into persisted
state without rescanning history. The trick that keeps the fold both
cheap and exactly equal to the batch recompute:

    persist CHANGE POINTS, derive the SCD2 view at read time.

A user's change-point list is a subsequence of their event stream that
preserves every attribute transition, so recomputing change points
over (stored change points ∪ new events) yields EXACTLY the change
points of the full event stream — including the subtle case where an
out-of-order event lands between two stored points and ABSORBS the
later one (its attribute now repeats). Version numbers, valid_to, and
is_current are all derivable by one per-user window at read time, so
none of them need repair on ingest.

Persistence rides the merge store (sinks/merge_store.py): change
points are rows keyed (user_id, ts, event_id) with latest-wins
versioning on the fold sequence and tombstone deletes for absorbed
points — giving the SCD2 store snapshots, time travel, CDF, and
vacuum for free, and O(delta + affected buckets) per fold. Replaying
a fold (foreachBatch is at-least-once) recomputes the identical delta
against the identical snapshot, so the store converges to the same
state — effectively-once.

Scale: per-fold work is one scan of the batch + the affected users'
stored change points (change points are the COMPRESSED history — one
row per transition, not per event) + the merge store's bucket-bounded
rewrite. Nothing rescans the raw event log, ever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.sinks.merge_store import (
    latest_version,
    read_store,
    upsert_into_store,
)


def _change_points(ev: DataFrame) -> DataFrame:
    """(user_id, ts, event_id, attr) -> the rows opening a new
    attribute run, per user in (ts, event_id) order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_attr", F.lag("attr").over(w))
        .where(F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr")))
        .drop("prev_attr")
    )


def scd2_fold(
    spark: SparkSession,
    store_path: str,
    events: DataFrame,
    attr: Column,
    fold_seq: int,
    n_buckets: int = 64,
) -> list[int]:
    """Fold one batch of events into the persisted SCD2 change-point
    store. ``events`` carries (user_id, ts, event_id) plus whatever
    ``attr`` reads; ``fold_seq`` is the monotone fold number (batch id
    in streaming) used as the latest-wins version. Returns the bucket
    ids the merge store rewrote."""
    batch = events.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        attr.alias("attr"),
    )
    affected = batch.select("user_id").distinct()
    if latest_version(store_path) is not None:
        old = read_store(spark, store_path).select(
            "user_id", "ts", "event_id", "attr"
        ).join(affected, "user_id", "left_semi")
    else:
        old = batch.limit(0)
    # Batch rows WIN over stored ones for the same (user, ts, event)
    # key — an amended attribute takes effect; a pure replay is a
    # no-op. Explicit max_by, not dropDuplicates (whose pick is
    # partition-order nondeterministic).
    merged = (
        old.withColumn("prio", F.lit(0))
        .unionByName(
            batch.dropDuplicates(["user_id", "ts", "event_id"]).withColumn(
                "prio", F.lit(1)
            )
        )
        .groupBy("user_id", "ts", "event_id")
        .agg(F.max_by("attr", "prio").alias("attr"))
    )
    new_changes = _change_points(merged)
    # Stored points no longer opening a run are ABSORBED -> tombstone.
    deletes = old.join(
        new_changes.select("user_id", "ts", "event_id"),
        ["user_id", "ts", "event_id"],
        "left_anti",
    ).withColumn("deleted", F.lit(True))
    delta = (
        new_changes.withColumn("deleted", F.lit(False))
        .unionByName(deletes)
        .withColumn("fold_seq", F.lit(fold_seq).cast("long"))
    )
    return upsert_into_store(
        spark,
        delta,
        store_path,
        keys=["user_id", "ts", "event_id"],
        version_cols=["fold_seq"],
        n_buckets=n_buckets,
    )


def scd2_read(
    spark: SparkSession, store_path: str, attr_name: str = "attr"
) -> DataFrame:
    """The SCD2 view over the stored change points: versions,
    [valid_from, valid_to) intervals, is_current — derived by one
    per-user window, so it is consistent with ANY fold history that
    produced the same change points (and therefore equals the batch
    scd2_history over the full event log)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cp = read_store(spark, store_path)
    return cp.select(
        "user_id",
        F.col("attr").alias(attr_name),
        F.row_number().over(w).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def stream_scd2_fold(
    events_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    attr: Column,
    on_batch=None,
    available_now: bool = True,
):
    """Streaming maintenance of the SCD2 store: each micro-batch folds
    under ``fold_seq=batch_id``, so a replayed batch recomputes the
    identical delta and the store state converges — effectively-once
    on top of foreachBatch's at-least-once."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        buckets = scd2_fold(spark, store_path, batch_df, attr, batch_id)
        if on_batch is not None:
            on_batch(batch_id, buckets)

    writer = (
        events_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", str(checkpoint_dir))
        .queryName("scd2_store_fold")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: fold the events table into a fresh scratch SCD2
    store in two halves (by event time), then read the maintained
    view back. Because the change-point fold is exact, the read-back
    equals the batch scd2_history over the full log — so this
    INCREMENTAL operator shares q_scd2_history's oracle verbatim.

    The scratch store is a private mkdtemp per call, removed after the
    result is localCheckpoint-materialized (q_dedup_incremental's
    lifecycle discipline)."""
    import shutil
    import tempfile

    from datapoints_csv_extractor_spark.operators.relational import load

    store = tempfile.mkdtemp(prefix="spark_graft_scd2store_")
    try:
        ev = load(spark, sf_dir, "events").select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_id",
            "event_type",
        )
        cut = ev.agg(
            F.expr("percentile_approx(unix_timestamp(ts), 0.5)")
        ).first()[0]
        first = ev.where(F.unix_timestamp("ts") <= cut)
        second = ev.where(F.unix_timestamp("ts") > cut)
        # 16 buckets: the testdata store is MB-scale, and each fold's
        # cost is stage-count-dominated — fewer bucket dirs halve the
        # demo's wall time (64 -> 16 measured 2x); production sizing
        # belongs to the caller via n_buckets.
        scd2_fold(spark, store, first, F.col("event_type"), fold_seq=1,
                  n_buckets=16)
        scd2_fold(spark, store, second, F.col("event_type"), fold_seq=2,
                  n_buckets=16)
        out = (
            scd2_read(spark, store, "event_type")
            .orderBy("user_id", "version")
            .localCheckpoint()
        )
        return out
    finally:
        shutil.rmtree(store, ignore_errors=True)
