"""Incrementally maintained aggregate view: the served rollup must
equal the one-shot batch GROUP BY after any fold slicing, replays,
compaction, and streaming restarts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.plans.agg_view import (
    COMPACT_SEQ,
    agg_view_fold,
    agg_view_read,
    compact_agg_view,
    stream_agg_view_fold,
)
from datapoints_csv_extractor_spark.sinks.merge_store import read_store

d = dt.datetime

SCHEMA = "k string, v long"


def _b(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _view(spark, store):
    return {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v, r.mean_v, r.var_v)
        for r in agg_view_read(spark, store, ["k"]).collect()
    }


def _truth(spark, all_rows):
    mean = F.col("sum_v").cast("double") / F.col("n").cast("double")
    ex2 = F.col("sum_sq").cast("double") / F.col("n").cast("double")
    out = (
        _b(spark, all_rows)
        .groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum(F.col("v") * F.col("v")).alias("sum_sq"),
        )
        .select(
            "k", "n", "sum_v", "min_v", "max_v",
            mean.alias("mean_v"), (ex2 - mean * mean).alias("var_v"),
        )
    )
    return {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v, r.mean_v, r.var_v)
        for r in out.collect()
    }


def test_agg_view_fold_equals_batch_and_replay_is_noop(spark, tmp_path):
    store = str(tmp_path / "view")
    b1 = [("a", 1), ("a", 5), ("b", 10)]
    b2 = [("a", 2), ("c", 7)]
    agg_view_fold(spark, store, _b(spark, b1), ["k"], F.col("v"), 0,
                  n_buckets=4)
    agg_view_fold(spark, store, _b(spark, b2), ["k"], F.col("v"), 1,
                  n_buckets=4)
    assert _view(spark, store) == _truth(spark, b1 + b2)
    # At-least-once replay of fold 1: the partial row key carries the
    # fold id, so the replay overwrites itself — no double counting.
    agg_view_fold(spark, store, _b(spark, b2), ["k"], F.col("v"), 1,
                  n_buckets=4)
    assert _view(spark, store) == _truth(spark, b1 + b2)


def test_agg_view_compaction_preserves_view_and_shrinks_rows(spark, tmp_path):
    store = str(tmp_path / "view")
    batches = [
        [("a", i), ("b", 2 * i), ("c", i * i)] for i in range(1, 5)
    ]
    for i, b in enumerate(batches):
        agg_view_fold(spark, store, _b(spark, b), ["k"], F.col("v"), i,
                      n_buckets=4)
    all_rows = [r for b in batches for r in b]
    before = _view(spark, store)
    assert before == _truth(spark, all_rows)
    n_retired = compact_agg_view(spark, store, ["k"], n_buckets=4)
    assert n_retired == 12  # 3 keys x 4 folds
    stored = read_store(spark, store)
    assert stored.count() == 3  # one base row per key
    assert stored.where(F.col("fold_seq") != COMPACT_SEQ).count() == 0
    assert _view(spark, store) == before
    # Folds keep landing after compaction and recompaction refolds.
    agg_view_fold(spark, store, _b(spark, [("a", 100)]), ["k"],
                  F.col("v"), 10, n_buckets=4)
    assert _view(spark, store) == _truth(spark, all_rows + [("a", 100)])
    compact_agg_view(spark, store, ["k"], n_buckets=4)
    assert _view(spark, store) == _truth(spark, all_rows + [("a", 100)])


def test_stream_agg_view_across_restarts(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    store = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    b1 = [("a", 3), ("b", 4)]
    _b(spark, b1).repartition(1).write.mode("append").parquet(str(src))

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = stream_agg_view_fold(stream, store, ckpt, ["k"], F.col("v"))
        q.awaitTermination(120)

    run()
    assert _view(spark, store) == _truth(spark, b1)
    b2 = [("a", 9), ("c", 1)]
    _b(spark, b2).repartition(1).write.mode("append").parquet(str(src))
    run()
    assert _view(spark, store) == _truth(spark, b1 + b2)


def test_agg_view_maintains_hll_distinct_across_folds_and_compaction(
    spark, tmp_path
):
    """HLL register state is a lossless-mergeable partial: the
    maintained approx-distinct must equal the one-shot sketch over
    the full data after any fold slicing AND after compaction (sketch
    union is register-wise max, associative)."""
    store = str(tmp_path / "view")
    rows = [("a", i % 7) for i in range(50)] + [("b", i % 13) for i in range(40)]
    b1, b2 = rows[:30], rows[30:]
    for i, b in enumerate((b1, b2)):
        agg_view_fold(
            spark, store, _b(spark, b), ["k"], F.col("v"), i,
            n_buckets=4, distinct=F.col("v"),
        )
    batch = {
        r.k: r.nd
        for r in _b(spark, rows)
        .groupBy("k")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("nd")
        )
        .collect()
    }
    got = {
        r.k: r.approx_distinct
        for r in agg_view_read(spark, store, ["k"]).collect()
    }
    assert got == batch  # exact at these cardinalities: {a: 7, b: 13}
    assert got == {"a": 7, "b": 13}
    compact_agg_view(spark, store, ["k"], n_buckets=4)
    got2 = {
        r.k: r.approx_distinct
        for r in agg_view_read(spark, store, ["k"]).collect()
    }
    assert got2 == batch
