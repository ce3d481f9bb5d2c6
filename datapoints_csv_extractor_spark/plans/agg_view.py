"""Incrementally maintained aggregate view (materialized rollup).

A dashboard-grade ``GROUP BY`` over an append-only event log should
not rescan the log per refresh: each batch folds O(delta) partial
aggregates into persisted state, and the served view equals the batch
recompute exactly. The design is the LSM / partial-aggregate shape:

- **fold**: one map-side-combinable ``groupBy(keys)`` over the batch
  produces decomposable partials (n, sum, min, max, sum of squares),
  stored as rows keyed ``(keys..., fold_seq)`` in the hash-bucketed
  merge store (sinks/merge_store.py). Because the row KEY includes
  the fold sequence and latest-wins content is deterministic, a
  replayed batch (foreachBatch is at-least-once) overwrites itself —
  effectively-once with no applied-fold ledger, no read-modify-write
  of prior state, and no cross-batch coordination.
- **read**: combine the per-fold partials per key — sums add, mins
  min, maxes max; avg and variance derive at the end (counts and
  integer sums stay integer until ONE final division, the engine's
  FP-parity rule). Read amplification is #folds-since-compaction
  rows per key — bounded by the compaction cadence.
- **compact**: replace each key's partial rows with their combined
  row under one reserved fold id (insert + tombstones in a single
  atomic manifest commit), restoring 1 row per key. Contract: run
  compaction from the maintenance path, not concurrently with a
  replay of an already-compacted fold (the standard LSM rule; the
  streaming checkpoint ensures committed batches do not replay after
  the next batch commits).

Scale: fold cost is O(|batch| + affected buckets); nothing ever
rescans the log. The view itself is #groups x #folds-since-compaction
rows, hash-bucketed so reads prune to the queried keys' buckets.
All decomposable-aggregate math is JVM-side codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.sinks.merge_store import (
    read_store,
    upsert_into_store,
)

COMPACT_SEQ = -1  # reserved fold id for compacted base rows


def _partials(value: Column, distinct: Column | None = None) -> list[Column]:
    v = value.cast("long")
    cols = [
        F.count(v).alias("n"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v * v).alias("sum_sq"),
    ]
    if distinct is not None:
        # HLL register state is a MERGEABLE partial (union = register-
        # wise max, associative and lossless), so a maintained
        # distinct-count rides the same fold/compact lifecycle as the
        # decomposable aggregates — the thing a raw COUNT(DISTINCT)
        # can never do incrementally.
        cols.append(F.hll_sketch_agg(distinct).alias("nd"))
    return cols


def _combine(keys: list[str], df: DataFrame) -> DataFrame:
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sum_sq").alias("sum_sq"),
    ]
    if "nd" in df.columns:
        aggs.append(F.hll_union_agg("nd").alias("nd"))
    return df.groupBy(*keys).agg(*aggs)


def agg_view_fold(
    spark: SparkSession,
    store_path: str,
    batch: DataFrame,
    keys: list[str],
    value: Column,
    fold_seq: int,
    n_buckets: int = 32,
    distinct: Column | None = None,
) -> list[int]:
    """Fold one batch into the view: one partial aggregate over the
    batch, upserted under key ``(keys..., fold_seq)``. ``value`` must
    be integral (cast to long) — integer partials keep the combined
    sums exact under any fold order. Pass ``distinct`` to also
    maintain an HLL approx-distinct of that column (mergeable sketch
    partials). Returns rewritten bucket ids."""
    delta = (
        batch.groupBy(*keys)
        .agg(*_partials(value, distinct))
        .withColumn("fold_seq", F.lit(fold_seq).cast("long"))
        .withColumn("gen", F.lit(fold_seq).cast("long"))
        .withColumn("deleted", F.lit(False))
    )
    return upsert_into_store(
        spark,
        delta,
        store_path,
        keys=[*keys, "fold_seq"],
        version_cols=["gen"],
        n_buckets=n_buckets,
    )


def agg_view_read(
    spark: SparkSession, store_path: str, keys: list[str]
) -> DataFrame:
    """The served view: per-key combined partials plus the derived
    mean and population variance. Integer until the final divisions;
    the variance is E[v^2] - mean^2 computed in doubles AFTER the
    integer partials — the same expression a batch engine derives, so
    it is bit-identical to the batch recompute."""
    c = _combine(keys, read_store(spark, store_path))
    mean = F.col("sum_v").cast("double") / F.col("n").cast("double")
    ex2 = F.col("sum_sq").cast("double") / F.col("n").cast("double")
    out = [
        *keys,
        "n",
        "sum_v",
        "min_v",
        "max_v",
        mean.alias("mean_v"),
        (ex2 - mean * mean).alias("var_v"),
    ]
    if "nd" in c.columns:
        out.append(F.hll_sketch_estimate("nd").alias("approx_distinct"))
    return c.select(*out)


def compact_agg_view(
    spark: SparkSession,
    store_path: str,
    keys: list[str],
    n_buckets: int = 32,
) -> int:
    """Fold every key's partial rows into one row under the reserved
    COMPACT_SEQ id and tombstone the constituents — one atomic
    manifest commit, so a reader pinned to either snapshot sees a
    complete view. Returns the number of partial rows retired.

    Versioning note: the merge's latest-wins tiebreak on EQUAL
    versions is partition-order nondeterministic, so compaction rows
    carry ``gen = max(stored gen) + 1`` — strictly above everything
    they replace (monotone: any partial present arrived after the
    previous compaction, so the new base always beats the old base
    and tombstones always beat the partials they retire)."""
    # Both scalars (partial census + generation high water) ride the
    # checkpoint's own materialization as observed metrics — one
    # action where there were two (the compaction is a
    # driver-sequential lifecycle, so every action saved is a whole
    # job round-trip; guide §5).
    obs = Observation()
    cur = (
        read_store(spark, store_path)
        .observe(
            obs,
            F.coalesce(
                F.sum((F.col("fold_seq") != COMPACT_SEQ).cast("long")),
                F.lit(0),
            ).alias("n_partials"),
            F.max("gen").alias("max_gen"),
        )
        .localCheckpoint()
    )
    got = obs.get
    n_partials, max_gen = got["n_partials"], got["max_gen"]
    if n_partials == 0:
        return 0
    next_gen = max_gen + 1
    base = (
        _combine(keys, cur.drop("gen"))
        .withColumn("fold_seq", F.lit(COMPACT_SEQ).cast("long"))
        .withColumn("gen", F.lit(next_gen).cast("long"))
        .withColumn("deleted", F.lit(False))
    )
    dead = (
        cur.where(F.col("fold_seq") != COMPACT_SEQ)
        .withColumn("gen", F.lit(next_gen).cast("long"))
        .withColumn("deleted", F.lit(True))
    )
    upsert_into_store(
        spark,
        base.unionByName(dead),
        store_path,
        keys=[*keys, "fold_seq"],
        version_cols=["gen"],
        n_buckets=n_buckets,
    )
    return n_partials


def stream_agg_view_fold(
    events_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    keys: list[str],
    value: Column,
    on_batch=None,
    available_now: bool = True,
    distinct: Column | None = None,
):
    """Streaming maintenance: each micro-batch folds under
    ``fold_seq=batch_id`` — replays overwrite themselves (the row key
    carries the batch id), so the view converges effectively-once."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        buckets = agg_view_fold(
            spark, store_path, batch_df, keys, value, batch_id,
            distinct=distinct,
        )
        if on_batch is not None:
            on_batch(batch_id, buckets)

    writer = (
        events_stream.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", str(checkpoint_dir))
        .queryName("agg_view_fold")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def q_agg_view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: maintain a (event_type, day) rollup of the
    events table in two time-sliced folds with a compaction between
    them (fold -> compact -> fold: both the pre- and post-compaction
    fold paths run), and serve the view — which must equal the
    one-shot batch GROUP BY, so the oracle is that plain SQL. The
    measure is the event value in integer cents (round then cast
    keeps both engines exact; integer sums make fold order
    irrelevant). Two folds, not three: the third fold re-exercised a
    path the second already covers at ~2 s of commit overhead
    (round-8 demo trim; multi-fold sequences stay pinned in pytest).

    Scratch store per call: mkdtemp -> folds -> localCheckpoint the
    small served view -> rmtree."""
    import shutil
    import tempfile

    from datapoints_csv_extractor_spark.operators.relational import load

    store = tempfile.mkdtemp(prefix="spark_graft_aggview_")
    try:
        # localCheckpoint: three consumers (the percentile scalar and
        # two folds) would otherwise each re-scan and re-project the
        # events parquet — pure stage-count overhead at demo scale.
        # The percentile cut rides the checkpoint's materialization as
        # an observed metric — one action instead of two (guide §5).
        obs = Observation()
        ev = (
            load(spark, sf_dir, "events")
            .select(
                "event_type",
                F.date_trunc("day", F.col("ts").cast("timestamp")).alias(
                    "day"
                ),
                F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
                F.col("ts").cast("timestamp").alias("ts"),
            )
            .observe(
                obs,
                F.expr(
                    "percentile_approx(unix_timestamp(ts), 0.5)"
                ).alias("cut"),
            )
            .localCheckpoint()
        )
        cut = obs.get["cut"]
        keys = ["event_type", "day"]
        slices = [
            ev.where(F.unix_timestamp("ts") <= cut),
            ev.where(F.unix_timestamp("ts") > cut),
        ]
        for i, s in enumerate(slices):
            agg_view_fold(
                spark, store, s, keys, F.col("cents"), fold_seq=i,
                n_buckets=8,
            )
            if i == 0:
                compact_agg_view(spark, store, keys, n_buckets=8)
        out = (
            agg_view_read(spark, store, keys)
            .orderBy("event_type", "day")
            .localCheckpoint()
        )
        return out
    finally:
        shutil.rmtree(store, ignore_errors=True)
