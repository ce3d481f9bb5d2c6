"""Maintained SCD2 store: the incremental fold must equal the batch
recompute under out-of-order arrival, absorption, replays, and
streaming restarts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.relational import scd2_history
from datapoints_csv_extractor_spark.plans.scd2_store import (
    scd2_fold,
    scd2_read,
    stream_scd2_fold,
)

d = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def _view(spark, store):
    return {
        (r.user_id, r.version): (r.event_type, r.valid_from, r.valid_to,
                                 r.is_current)
        for r in scd2_read(spark, store, "event_type").collect()
    }


def _batch_truth(spark, all_rows):
    hist = scd2_history(
        _ev(spark, all_rows), F.col("event_type"), "event_type"
    )
    return {
        (r.user_id, r.version): (r.event_type, r.valid_from, r.valid_to,
                                 r.is_current)
        for r in hist.collect()
    }


def test_scd2_fold_absorbs_out_of_order_change(spark, tmp_path):
    store = str(tmp_path / "scd2")
    b1 = [
        (1, d(2024, 1, 1), 1, "a"),
        (1, d(2024, 1, 10), 2, "b"),  # change point a->b
        (1, d(2024, 1, 20), 3, "a"),  # change point b->a
    ]
    scd2_fold(spark, store, _ev(spark, b1), F.col("event_type"), 1)
    # Out-of-order arrival on Jan 5 with attr 'b': it opens b EARLIER,
    # so the stored Jan-10 'b' change point is ABSORBED (b repeats).
    b2 = [(1, d(2024, 1, 5), 9, "b")]
    scd2_fold(spark, store, _ev(spark, b2), F.col("event_type"), 2)
    got = _view(spark, store)
    assert got == _batch_truth(spark, b1 + b2)
    # The absorbed point is really gone: 3 versions, b starts Jan 5.
    assert len(got) == 3
    assert got[(1, 2)][0] == "b" and got[(1, 2)][1] == d(2024, 1, 5)


def test_scd2_fold_replay_is_noop_and_untouched_users_stay(spark, tmp_path):
    store = str(tmp_path / "scd2")
    b1 = [
        (1, d(2024, 1, 1), 1, "a"),
        (2, d(2024, 1, 2), 2, "x"),
        (2, d(2024, 1, 3), 3, "y"),
    ]
    scd2_fold(spark, store, _ev(spark, b1), F.col("event_type"), 1)
    before = _view(spark, store)
    # Replay the same fold (at-least-once delivery): state unchanged.
    scd2_fold(spark, store, _ev(spark, b1), F.col("event_type"), 1)
    assert _view(spark, store) == before
    # A fold touching only user 1 leaves user 2's history intact.
    b2 = [(1, d(2024, 2, 1), 9, "b")]
    scd2_fold(spark, store, _ev(spark, b2), F.col("event_type"), 2)
    got = _view(spark, store)
    assert got == _batch_truth(spark, b1 + b2)
    assert got[(2, 1)] == before[(2, 1)] and got[(2, 2)] == before[(2, 2)]


def test_stream_scd2_fold_across_restarts(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    store = str(tmp_path / "scd2")
    ckpt = str(tmp_path / "ckpt")
    b1 = [(1, d(2024, 1, 1), 1, "a"), (1, d(2024, 1, 10), 2, "b")]
    _ev(spark, b1).coalesce(1).write.mode("append").parquet(str(src))

    def run():
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string"
        ).parquet(str(src))
        q = stream_scd2_fold(stream, store, ckpt, F.col("event_type"))
        q.awaitTermination(120)

    run()
    assert _view(spark, store) == _batch_truth(spark, b1)
    # Second run processes only the NEW shard (file-source checkpoint).
    b2 = [(1, d(2024, 1, 5), 9, "b")]  # absorbs the Jan-10 change
    _ev(spark, b2).coalesce(1).write.mode("append").parquet(str(src))
    run()
    assert _view(spark, store) == _batch_truth(spark, b1 + b2)
