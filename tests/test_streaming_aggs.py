"""Streaming aggregation tests: watermarked windows + custom state.

Drives streaming/aggregates.py with parquet file-streams of long
datapoints, using availableNow + memory sinks for determinism.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest

from datapoints_csv_extractor_spark.streaming.aggregates import (
    series_state_tracker,
    stream_datapoints,
    windowed_rollup,
)

BASE_TS = 1_550_092_560_000  # aligned to a whole minute? (checked below)


def _write_points(spark, path: Path, rows: list[tuple[str, int, float]]) -> None:
    """rows = [(external_id, ts_ms, value)]; schema-pads the rest."""
    df = spark.createDataFrame(
        [(eid, f"name-{eid}", ts, v, "mem://test", 0) for eid, ts, v in rows],
        schema="external_id string, name string, ts_ms long, value double, "
        "source_file string, file_ts long",
    )
    df.coalesce(1).write.mode("append").parquet(str(path))


def _drain(spark, stream_df, sink_name: str, ckpt: Path, output_mode: str):
    """availableNow drain via foreachBatch (memory sink can't resume
    from a checkpoint; foreachBatch can). Returns collected rows."""
    rows: list = []
    q = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, bid: rows.extend(bdf.collect())
        )
        .outputMode(output_mode)
        .option("checkpointLocation", str(ckpt))
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_windowed_rollup_batch_semantics(spark, tmp_path):
    """The same windowed_rollup expression works in plain batch mode —
    streaming/batch unification — and buckets by minute correctly."""
    src = tmp_path / "dp"
    minute = 60_000
    t0 = (BASE_TS // minute) * minute
    _write_points(
        spark,
        src,
        [
            ("s1", t0 + 1_000, 1.0),
            ("s1", t0 + 2_000, 3.0),
            ("s1", t0 + minute + 1_000, 10.0),
            ("s2", t0 + 5_000, 7.0),
        ],
    )
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    out = {
        (r.external_id, r.window_start.minute): r
        for r in windowed_rollup(batch).collect()
    }
    first_min = pd.Timestamp(t0, unit="ms").minute
    assert out[("s1", first_min)].n_points == 2
    assert out[("s1", first_min)].avg_value == 2.0
    assert out[("s1", (first_min + 1) % 60)].n_points == 1
    assert out[("s2", first_min)].avg_value == 7.0


def test_windowed_rollup_streaming_append_and_late_drop(spark, tmp_path):
    """Append-mode emission: a window only finalizes once the watermark
    passes; data later than the watermark horizon is dropped."""
    src = tmp_path / "dp"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    minute = 60_000
    t0 = (BASE_TS // minute) * minute

    # Batch 1: two points in window W0, one far ahead (advances the
    # watermark well past W0 on the NEXT batch).
    _write_points(
        spark,
        src,
        [("s1", t0 + 1_000, 1.0), ("s1", t0 + 2_000, 2.0), ("s1", t0 + 10 * minute, 5.0)],
    )
    stream = stream_datapoints(spark, str(src))
    out1 = _drain(spark, windowed_rollup(stream), "roll1", ckpt, "append")
    # availableNow processes all files in one batch; watermark advances
    # only BETWEEN batches, so nothing is final yet or W0 is final
    # depending on file split — drain again after more data to be
    # deterministic.

    # Batch 2: a LATE point for W0 (behind the watermark -> dropped)
    # plus a fresh point even further ahead.
    _write_points(
        spark,
        src,
        [("s1", t0 + 3_000, 100.0), ("s1", t0 + 20 * minute, 6.0)],
    )
    out2 = _drain(spark, windowed_rollup(stream), "roll2", ckpt, "append")

    # Exactly-once emission: across BOTH drains, W0 finalizes exactly
    # once (availableNow advances the watermark between its internal
    # batches, so W0 may close in either drain — but never twice).
    w0 = pd.Timestamp(t0, unit="ms", tz="UTC").tz_localize(None)
    w0_rows = [r for r in out1 + out2 if pd.Timestamp(r.window_start) == w0]
    assert len(w0_rows) == 1
    # The late value=100 point (behind the watermark) did NOT make it
    # into the finalized W0.
    assert w0_rows[0].n_points == 2
    assert w0_rows[0].avg_value == 1.5


def test_series_state_tracker_across_batches(spark, tmp_path):
    """Custom state survives micro-batch boundaries: counts accumulate
    and the max inter-arrival gap bridges batch 1 -> batch 2."""
    src = tmp_path / "dp"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_points(spark, src, [("s1", 1000, 1.0), ("s1", 2000, 2.0), ("s2", 1000, 9.0)])
    out1 = _drain(
        spark, series_state_tracker(stream_datapoints(spark, str(src))),
        "trk1", ckpt, "update",
    )
    rows1 = {r.external_id: r for r in out1}
    assert rows1["s1"].n_points == 2
    assert rows1["s1"].max_gap_ms == 1000
    assert rows1["s2"].n_points == 1

    # Batch 2: s1 returns after a 60 s silence -> gap spans batches.
    _write_points(spark, src, [("s1", 62_000, 3.0)])
    out2 = _drain(
        spark, series_state_tracker(stream_datapoints(spark, str(src))),
        "trk2", ckpt, "update",
    )
    rows2 = {r.external_id: r for r in out2}
    assert rows2["s1"].n_points == 3
    assert rows2["s1"].sum_value == 6.0
    assert rows2["s1"].max_gap_ms == 60_000


def test_session_window_streaming(spark, tmp_path):
    """session_window works under a watermark in streaming: two bursts
    separated by > gap close as two sessions once the watermark passes."""
    from pyspark.sql import functions as F
    from datapoints_csv_extractor_spark.streaming.aggregates import stream_datapoints

    src = tmp_path / "dp"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    t0 = 1_550_092_560_000

    def sessionized(stream):
        return (
            stream.withWatermark("event_time", "1 minute")
            .groupBy(
                F.session_window("event_time", "30 seconds").alias("w"), "external_id"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select("external_id", F.col("w.start").alias("start"), "n")
        )

    # Burst 1 (3 points, 5 s apart), burst 2 (2 points) 10 min later,
    # then a far-future point to push the watermark past both bursts.
    _write_points(spark, src, [("s1", t0 + i * 5_000, 1.0) for i in range(3)])
    _write_points(spark, src, [("s1", t0 + 600_000, 1.0), ("s1", t0 + 610_000, 1.0)])
    _write_points(spark, src, [("s1", t0 + 3_600_000, 1.0)])

    out: list = []
    q = (
        sessionized(stream_datapoints(spark, str(src)))
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    finalized = {int(r.start.timestamp() * 1000): r.n for r in out}
    assert finalized.get(t0) == 3
    assert finalized.get(t0 + 600_000) == 2


def test_stream_reads_date_partitioned_sink(spark, tmp_path):
    """Integration: the live sink writes dt= partitions; the stream
    source must see rows inside them (regression: without
    recursiveFileLookup the file source silently read zero rows)."""
    from datapoints_csv_extractor_spark.sinks.datapoints import write_datapoints

    df = spark.createDataFrame(
        [("s1", "n", 1_550_092_560_000 + i * 1000, float(i), "f", 0) for i in range(10)],
        "external_id string, name string, ts_ms long, value double, "
        "source_file string, file_ts long",
    )
    write_datapoints(df, str(tmp_path / "dp"))
    rows = _drain(
        spark,
        series_state_tracker(stream_datapoints(spark, str(tmp_path / "dp"))),
        "part_trk", tmp_path / "ckpt", "update",
    )
    assert rows and rows[0].n_points == 10


def test_stream_dedup_exact_drops_redelivery(spark, tmp_path):
    """A datapoint re-delivered in a later micro-batch (at-least-once
    replay) must be emitted exactly once downstream."""
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_dedup_exact,
    )

    src = tmp_path / "dp"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    t0 = 1_550_092_560_000

    _write_points(spark, src, [("s1", t0, 1.0), ("s1", t0 + 1000, 2.0)])
    out1 = _drain(
        spark, stream_dedup_exact(stream_datapoints(spark, str(src))),
        "dd1", ckpt, "append",
    )
    # Replay of (s1, t0, 1.0) plus one genuinely new point.
    _write_points(spark, src, [("s1", t0, 1.0), ("s2", t0 + 2000, 3.0)])
    out2 = _drain(
        spark, stream_dedup_exact(stream_datapoints(spark, str(src))),
        "dd2", ckpt, "append",
    )
    emitted = [(r.external_id, r.ts_ms, r.value) for r in out1 + out2]
    assert sorted(emitted) == [
        ("s1", t0, 1.0), ("s1", t0 + 1000, 2.0), ("s2", t0 + 2000, 3.0)
    ]


def test_stream_decontamination_admission_control(spark, tmp_path):
    """Two availableNow runs over a growing training-doc folder: each
    run flags exactly its new docs sharing an 8-gram with the static
    eval suite, clean docs never surface, and the file-source
    checkpoint keeps run 2 from re-flagging run 1's docs."""
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_decontamination,
    )

    eval_docs = spark.createDataFrame(
        [(9000, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    src = tmp_path / "train"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    leak = (
        "prefix words then alpha beta gamma delta epsilon zeta eta "
        "theta more trailing content"
    )  # contains eval 8-gram "alpha ... theta"
    clean = (
        "wholly unrelated text about shuffle partitions and adaptive "
        "query execution in distributed engines"
    )
    spark.createDataFrame(
        [(1, leak), (2, clean)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(src))

    batches: list[tuple[int, list]] = []

    def run() -> None:
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(str(src))
        q = stream_decontamination(
            stream, eval_docs, ckpt,
            on_batch=lambda bid, v: batches.append((bid, v.collect())),
        )
        q.awaitTermination(120)

    run()
    flagged = {r.doc_id: r for rows in batches for r in (rows[1] if isinstance(rows, tuple) else rows)}
    assert set(flagged) == {1}
    assert flagged[1].n_contaminated_grams >= 1
    assert flagged[1].n_eval_docs_hit == 1

    # Run 2: one new contaminated doc; run 1's docs are checkpointed
    # away and must not re-flag.
    spark.createDataFrame(
        [(3, "noise then beta gamma delta epsilon zeta eta theta iota done")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(str(src))
    batches.clear()
    run()
    flagged2 = {r.doc_id for rows in batches for r in (rows[1] if isinstance(rows, tuple) else rows)}
    assert flagged2 == {3}


def test_stream_dedup_incremental_across_restarts(spark, tmp_path):
    """Two availableNow runs over a growing document folder: the second
    run must process ONLY the new shard (file-source checkpoint), flag
    its near-dups against shard 1 from the persisted band store, and
    leave shard 1's stored signatures untouched."""
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_dedup_incremental,
    )

    src = tmp_path / "docs"
    src.mkdir()
    store = str(tmp_path / "bandstore")
    ckpt = str(tmp_path / "ckpt")
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy riverbank under pale skies"
    )
    other = (
        "completely different content about distributed query engines "
        "shuffling partitions across executors with adaptive plans"
    )
    spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    batches: list[tuple[int, list]] = []
    q = stream_dedup_incremental(
        stream, store, ckpt,
        on_batch=lambda bid, v: batches.append((bid, v.collect())),
    )
    q.awaitTermination(120)
    assert all(not rows for _, rows in batches)  # no dups inside shard 1
    sig1 = {
        r.doc_id: r.signature
        for r in spark.read.parquet(f"{store}/signatures").collect()
    }
    assert set(sig1) == {1, 2}

    # Shard 2: a near-copy of doc 1 plus a unique doc.
    spark.createDataFrame(
        [(101, base.replace("pale", "dark")), (102, "entirely novel words here today")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(str(src))
    batches.clear()
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q2 = stream_dedup_incremental(
        stream2, store, ckpt,
        on_batch=lambda bid, v: batches.append((bid, v.collect())),
    )
    q2.awaitTermination(120)
    flagged = {
        (r.doc_id, r.dup_of_doc_id, r.dup_kind)
        for _, rows in batches
        for r in rows
    }
    assert (101, 1, "known") in flagged, flagged
    sig2 = {
        r.doc_id: r.signature
        for r in spark.read.parquet(f"{store}/signatures").collect()
    }
    assert set(sig2) == {1, 2, 101, 102}
    assert sig2[1] == sig1[1] and sig2[2] == sig1[2]


def test_stream_ingest_corpus_end_to_end(spark, tmp_path):
    """The full curation plan as a stream: two availableNow runs over a
    growing document folder publish batch-partitioned corpus output,
    scrub PII before anything persists, and drop cross-batch near-dups
    via the shared band store."""
    from datapoints_csv_extractor_spark.plans.corpus_ingest import (
        stream_ingest_corpus,
    )

    src = tmp_path / "docs"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "bandstore")
    ckpt = str(tmp_path / "ckpt")
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy riverbank under pale skies"
    )
    schema = "doc_id long, text string, source string"
    spark.createDataFrame(
        [
            (1, base + " email me at bob@example.net", "web"),
            (2, "short!", "web"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))

    ledgers: list[tuple[int, dict]] = []
    q = stream_ingest_corpus(
        spark,
        spark.readStream.schema(schema).parquet(str(src)),
        corpus,
        store,
        ckpt,
        on_batch=lambda bid, stats: ledgers.append((bid, stats)),
    )
    q.awaitTermination(120)
    assert ledgers and ledgers[0][1]["published"] == 1
    assert ledgers[0][1]["pii_redacted"] == 1
    out1 = spark.read.parquet(corpus)
    texts = [r.text for r in out1.collect()]
    assert len(texts) == 1 and "<EMAIL>" in texts[0]
    assert "bob@example.net" not in texts[0]

    # Second run: a near-copy of doc 1 arrives — dropped against the
    # store; a novel doc publishes under a new batch directory.
    spark.createDataFrame(
        [
            (101, base.replace("pale", "dark"), "web"),
            (
                102,
                "entirely new discussion of tidal energy converters and "
                "their maintenance schedules in northern waters",
                "web",
            ),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    ledgers.clear()
    q2 = stream_ingest_corpus(
        spark,
        spark.readStream.schema(schema).parquet(str(src)),
        corpus,
        store,
        ckpt,
        on_batch=lambda bid, stats: ledgers.append((bid, stats)),
    )
    q2.awaitTermination(120)
    assert ledgers and ledgers[0][1]["duplicate"] == 1
    assert ledgers[0][1]["published"] == 1
    out2 = spark.read.parquet(corpus)
    assert sorted(r.doc_id for r in out2.collect()) == [1, 102]
    # Batch-partitioned layout: each run's publish is its own directory.
    assert "batch" in out2.columns and "split" in out2.columns


def test_stream_semantic_dedup_incremental(spark, tmp_path):
    """Two availableNow runs over a growing embedding folder: run 2
    processes only the new shard, flags its near-dup of a run-1 vector
    against the persisted IVF index, and the index grows by survivors
    only."""
    import random

    from datapoints_csv_extractor_spark.operators.similarity import (
        build_ivf_index,
    )
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_semantic_dedup_incremental,
    )

    rng = random.Random(13)
    dim = 12
    src = tmp_path / "vecs"
    src.mkdir()
    index_dir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")

    base = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(30)]
    build_ivf_index(
        spark.createDataFrame(base, "vec_id long, embedding array<double>"),
        index_dir,
        n_centroids=4,
    )

    novel = [rng.uniform(-1, 1) for _ in range(dim)]
    spark.createDataFrame(
        [(100, novel)], "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("append").parquet(str(src))

    batches = []
    q = stream_semantic_dedup_incremental(
        spark.readStream.schema("vec_id long, embedding array<double>").parquet(str(src)),
        index_dir, ckpt, threshold=0.98,
        on_batch=lambda bid, v: batches.append((bid, v.collect())),
    )
    q.awaitTermination(120)
    assert batches and all(r.keep for _, rows in batches for r in rows)

    # Shard 2: a near-copy of shard 1's vector 100 + a fresh one.
    spark.createDataFrame(
        [
            (200, [x + rng.uniform(-0.002, 0.002) for x in novel]),
            (201, [rng.uniform(-1, 1) for _ in range(dim)]),
        ],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.mode("append").parquet(str(src))
    batches.clear()
    q2 = stream_semantic_dedup_incremental(
        spark.readStream.schema("vec_id long, embedding array<double>").parquet(str(src)),
        index_dir, ckpt, threshold=0.98,
        on_batch=lambda bid, v: batches.append((bid, v.collect())),
    )
    q2.awaitTermination(120)
    verdicts = {r.vec_id: r for _, rows in batches for r in rows}
    assert set(verdicts) == {200, 201}
    assert not verdicts[200].keep and verdicts[200].rep_id == 100
    assert verdicts[200].rep_kind == "known"
    assert verdicts[201].keep

    stored = {
        r.vec_id for r in spark.read.parquet(f"{index_dir}/assignments").collect()
    }
    assert 100 in stored and 201 in stored and 200 not in stored


def test_stream_time_weighted_partials_bridge_across_batches(spark, tmp_path):
    """Streaming partials must sum to the batch closed form, including
    the bridge segment whose endpoints live in DIFFERENT micro-batches
    and a segment spanning a day boundary.

    s1: 10 @ day0 12:00 -> 20 @ day1 12:00 (batch 2) -> 14 @ day1 18:00.
    Day0: uniform 10->15 half-day => dur 43200, integral 540000, tv 5.
    Day1: 15->20 (12 h) then 20->14 (6 h) => dur 64800,
          integral 756000 + 367200, tv 11.
    """
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_time_weighted_partials,
    )

    src = tmp_path / "dp"
    ckpt = tmp_path / "ckpt"
    day = 86_400_000
    t0 = 500 * day + day // 2  # noon, day index 500
    _write_points(spark, src, [("s1", t0, 10.0)])
    rows = _drain(
        spark,
        stream_time_weighted_partials(stream_datapoints(spark, str(src))),
        "tw1",
        ckpt,
        "append",
    )
    assert rows == []  # one point, no segment yet

    _write_points(
        spark, src, [("s1", t0 + day, 20.0), ("s1", t0 + day + day // 4, 14.0)]
    )
    rows = _drain(
        spark,
        stream_time_weighted_partials(stream_datapoints(spark, str(src))),
        "tw2",
        ckpt,
        "append",
    )
    by_day = {}
    for r in rows:
        acc = by_day.setdefault(r.day_ms, [0.0, 0.0, 0.0])
        acc[0] += r.dur_sec
        acc[1] += r.ivdt
        acc[2] += r.tv
    d0, d1 = 500 * day, 501 * day
    assert set(by_day) == {d0, d1}
    assert by_day[d0] == [43200.0, 540000.0, 5.0]
    assert by_day[d1][0] == 64800.0
    assert by_day[d1][1] == 756000.0 + 367200.0
    assert by_day[d1][2] == 11.0


def test_stream_time_weighted_drops_out_of_order(spark, tmp_path):
    """A point behind the carried state must be dropped, not create a
    negative-duration segment."""
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_time_weighted_partials,
    )

    src = tmp_path / "dp"
    ckpt = tmp_path / "ckpt"
    day = 86_400_000
    t0 = 600 * day
    _write_points(spark, src, [("s1", t0 + 2_000_000, 10.0)])
    _drain(
        spark,
        stream_time_weighted_partials(stream_datapoints(spark, str(src))),
        "tw3",
        ckpt,
        "append",
    )
    _write_points(
        spark, src, [("s1", t0 + 1_000_000, 99.0), ("s1", t0 + 3_000_000, 20.0)]
    )
    rows = _drain(
        spark,
        stream_time_weighted_partials(stream_datapoints(spark, str(src))),
        "tw4",
        ckpt,
        "append",
    )
    assert len(rows) == 1
    r = rows[0]
    assert r.dur_sec == 1000.0 and r.ivdt == 15000.0 and r.tv == 10.0


def test_stream_funnel_stages_across_batches(spark, tmp_path):
    """Funnel state must persist across micro-batches: a user whose
    view arrives in batch 1 and click/purchase in batch 2 ends at
    stage 3; stage events arriving out of order (behind the accepted
    state) do not advance."""
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_funnel_stages,
    )

    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"

    def write_events(rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts_ms long, event_type string"
        )
        df.coalesce(1).write.mode("append").parquet(str(src))

    def drain(name):
        stream = (
            spark.readStream.schema("user_id long, ts_ms long, event_type string")
            .parquet(str(src))
        )
        return _drain(
            spark, stream_funnel_stages(stream, ["view", "click", "purchase"]),
            name, ckpt, "update",
        )

    write_events([(1, 1000, "view"), (2, 1000, "click")])  # u2: click first, no view
    rows = {r.user_id: r.funnel_stage for r in drain("f1")}
    assert rows == {1: 1, 2: 0}

    write_events([(1, 2000, "click"), (1, 3000, "purchase"), (2, 4000, "view")])
    rows = {r.user_id: r.funnel_stage for r in drain("f2")}
    assert rows == {1: 3, 2: 1}


def test_stream_anomaly_zscore_matches_batch_math(spark, tmp_path):
    """Streaming z-scores must equal the batch formula (trailing 24 h,
    current second excluded, centi-unit integer sums) even when the
    window's points span micro-batches, and expired points must fall
    out of both the score and the state."""
    import math

    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_anomaly_zscore,
    )

    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    H = 3_600_000

    def write(rows):
        spark.createDataFrame(
            rows, "user_id long, ts_ms long, value double"
        ).coalesce(1).write.mode("append").parquet(str(src))

    def drain(name):
        stream = (
            spark.readStream.schema("user_id long, ts_ms long, value double")
            .parquet(str(src))
        )
        return _drain(
            spark, stream_anomaly_zscore(stream), name, ckpt, "append"
        )

    def expected(history, v):
        win = [int(math.floor(x * 100 + 0.5)) for x in history]
        n = len(win)
        s, q = sum(win), sum(c * c for c in win)
        var_c = max((q - s * s / n) / n, 0.0)
        mean_v, std_v = s / n / 100.0, math.sqrt(var_c) / 100.0
        z = (v - mean_v) / std_v
        return math.floor(z * 10000 + 0.5) / 10000.0

    t0 = 1_700_000_000_000
    # Batch 1: two points — not enough preceding history, no scores.
    write([(7, t0, 10.0), (7, t0 + H, 12.0)])
    assert drain("z1") == []

    # Batch 2: a third point scored against the two carried in state.
    write([(7, t0 + 2 * H, 20.0)])
    rows = drain("z2")
    assert len(rows) == 1
    assert rows[0].zscore == expected([10.0, 12.0], 20.0)
    assert rows[0].is_anomaly  # (20 - 11) / std 1.0 = z 9.0

    # Batch 3: 25 h later — every earlier point expired, so no score;
    # the next point sees only the survivor.
    t_late = t0 + 2 * H + 25 * 3_600_000
    write([(7, t_late, 30.0), (7, t_late + H, 31.0), (7, t_late + 2 * H, 5.0)])
    rows = drain("z3")
    assert len(rows) == 1  # only the third has >= 2 preceding points
    assert rows[0].value == 5.0
    assert rows[0].zscore == expected([30.0, 31.0], 5.0)


def test_stream_quantile_sketch_partials_match_batch_sketch(spark, tmp_path):
    """The streaming sketch producer must emit exactly the batch
    quantile_sketch partials for closed windows (stream/batch sketch
    interchangeability — the property the sketch family is built on),
    and drop points behind the watermark."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.analytic import (
        quantile_sketch,
    )
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_quantile_sketch,
    )

    src = tmp_path / "dp"
    ckpt = tmp_path / "ckpt"
    day = 86_400_000
    t0 = 500 * day
    _write_points(
        spark,
        src,
        [
            ("s1", t0 + 1_000, 3.2),
            ("s1", t0 + 2_000, 3.9),   # same bin as 3.2
            ("s1", t0 + 3_000, 10.5),
            ("s2", t0 + 4_000, 0.4),
        ],
    )
    # batch mode over the same expression
    batch = (
        spark.read.parquet(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    )
    batch_rows = {
        (r.external_id, r.bin): r.n
        for r in quantile_sketch(
            batch.withColumn("day", F.date_trunc("day", "event_time")),
            ["external_id", "day"],
            value_col="value",
        ).collect()
    }
    assert batch_rows == {("s1", 3): 2, ("s1", 10): 1, ("s2", 0): 1}

    # streaming: window closes when a next-day point advances the
    # watermark past its end
    _write_points(spark, src, [("s1", t0 + 2 * day, 5.0)])
    stream = stream_datapoints(spark, str(src)).withColumn(
        "event_time", F.timestamp_millis(F.col("ts_ms"))
    )
    rows = _drain(
        spark, stream_quantile_sketch(stream), "qs1", ckpt, "append"
    )
    got = {(r.external_id, r.bin): r.n for r in rows}
    assert got == batch_rows  # day-500 window closed; day-502 not yet


def test_stream_ivfpq_ingest_folds_batches_replay_safe(spark, tmp_path):
    """Streaming IVF-PQ maintenance: a drained folder of embedding
    shards folds into the index batch by batch; a checkpoint restart
    replays nothing; the planted near-dups that arrived via the
    stream are immediately servable."""
    import json
    import random

    from datapoints_csv_extractor_spark.operators.similarity import (
        ann_ivfpq_topk,
        build_ivfpq_index,
    )
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_ivfpq_ingest,
    )

    rng = random.Random(23)
    dim = 32
    query = [rng.uniform(-1, 1) for _ in range(dim)]
    base_rows = [(0, 0, query)] + [
        (i, 1, [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(1, 100)
    ]
    index_dir = str(tmp_path / "ivfpq")
    build_ivfpq_index(
        spark.createDataFrame(
            base_rows, "vec_id long, label int, embedding array<double>"
        ),
        index_dir, n_centroids=4, m=4, k=8, n_iters=2,
    )

    qdir = tmp_path / "shards"
    qdir.mkdir()
    (qdir / "s1.json").write_text(
        "\n".join(
            json.dumps(
                {
                    "vec_id": 500 + i,
                    "label": 0,
                    "embedding": [
                        x + rng.uniform(-0.02, 0.02) for x in query
                    ],
                }
            )
            for i in range(6)
        )
    )
    stream = spark.readStream.schema(
        "vec_id long, label int, embedding array<double>"
    ).json(str(qdir))
    folds: list[tuple[int, bool]] = []
    q = stream_ivfpq_ingest(
        stream, index_dir, str(tmp_path / "ckpt"),
        on_batch=lambda bid, ok: folds.append((bid, ok)),
    )
    q.awaitTermination(120)
    assert folds and all(ok for _, ok in folds)

    got = [
        r.vec_id
        for r in ann_ivfpq_topk(
            spark, index_dir, query, k=6, n_probe=4, exclude_vec_id=0
        ).collect()
    ]
    assert len(set(got) & set(range(500, 506))) >= 5

    # Restart: the drained file is not replayed; a forced same-batch
    # replay would no-op on the manifest anyway.
    folds.clear()
    q2 = stream_ivfpq_ingest(
        stream, index_dir, str(tmp_path / "ckpt"),
        on_batch=lambda bid, ok: folds.append((bid, ok)),
    )
    q2.awaitTermination(120)
    assert folds == []


def test_stream_countmin_partials_match_batch_sketch(spark, tmp_path):
    """The streaming Count-Min producer's closed-window cells must
    equal the batch countmin_table over the same items (mergeable
    stream/batch interchangeability on the frequency axis)."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.textops import (
        countmin_table,
    )
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_countmin_sketch,
    )

    src = tmp_path / "dp"
    ckpt = tmp_path / "ckpt"
    day = 86_400_000
    t0 = 500 * day
    _write_points(
        spark,
        src,
        [
            ("alpha", t0 + 1_000, 1.0),
            ("alpha", t0 + 2_000, 1.0),
            ("beta", t0 + 3_000, 1.0),
        ],
    )
    batch_cells = {
        (r.row, r.bucket): r.c
        for r in countmin_table(
            spark.read.parquet(str(src)).select(
                F.col("external_id").alias("item")
            )
        ).collect()
    }
    # advance the watermark past day 500 with a day-502 point
    _write_points(spark, src, [("gamma", t0 + 2 * day, 1.0)])
    stream = stream_datapoints(spark, str(src)).withColumn(
        "event_time", F.timestamp_millis(F.col("ts_ms"))
    )
    rows = _drain(
        spark,
        stream_countmin_sketch(
            stream.select("event_time", F.col("external_id").alias("item"))
        ),
        "cm1",
        ckpt,
        "append",
    )
    got = {(r.row, r.bucket): r.c for r in rows}
    assert got == batch_cells


def test_stream_interval_join_matches_batch_join(spark, tmp_path):
    """Stream-stream interval join parity: pairs within tolerance on
    the same key match exactly the batch join's pairs; out-of-window
    and cross-key rows never pair."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_interval_join,
    )

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    ckpt = tmp_path / "ckpt"
    t0 = 1_700_000_000_000
    _write_points(
        spark, lsrc,
        [("s1", t0, 1.0), ("s1", t0 + 300_000, 2.0), ("s2", t0, 3.0)],
    )
    _write_points(
        spark, rsrc,
        [
            ("s1", t0 + 30_000, 10.0),   # within 60s of left#1 only
            ("s1", t0 + 290_000, 20.0),  # within 60s of left#2 only
            ("s2", t0 + 200_000, 30.0),  # out of window for s2's left
            ("s3", t0, 40.0),            # no left key
        ],
    )

    def prep(path):
        return spark.read.parquet(str(path)).withColumn(
            "event_time", F.timestamp_millis(F.col("ts_ms"))
        )

    batch_l, batch_r = prep(lsrc), prep(rsrc)
    tol = F.expr("INTERVAL 60 SECONDS")
    rb = batch_r.select(
        F.col("external_id").alias("__rkey"),
        F.col("event_time").alias("right_time"),
        F.col("value").alias("right_value"),
    )
    expected = {
        (r.external_id, r.ts_ms, r.right_value)
        for r in batch_l.join(
            rb,
            (F.col("external_id") == F.col("__rkey"))
            & (F.col("right_time") >= F.col("event_time") - tol)
            & (F.col("right_time") <= F.col("event_time") + tol),
        ).collect()
    }
    assert expected == {("s1", t0, 10.0), ("s1", t0 + 300_000, 20.0)}

    sl = stream_datapoints(spark, str(lsrc)).withColumn(
        "event_time", F.timestamp_millis(F.col("ts_ms"))
    )
    sr = stream_datapoints(spark, str(rsrc)).withColumn(
        "event_time", F.timestamp_millis(F.col("ts_ms"))
    )
    rows = _drain(
        spark, stream_interval_join(sl, sr), "ij1", ckpt, "append"
    )
    got = {(r.external_id, r.ts_ms, r.right_value) for r in rows}
    assert got == expected


def test_stream_interval_join_left_outer_flushes_on_watermark(spark, tmp_path):
    """leftOuter interval join: unmatched left events emit with NULL
    right columns once the right watermark passes their window; a
    late-arriving advancing row triggers the flush."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_interval_join,
    )

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    ckpt = tmp_path / "ckpt"
    day = 86_400_000
    t0 = 1_700_000_000_000
    _write_points(spark, lsrc, [("s1", t0, 1.0), ("s2", t0, 2.0)])
    _write_points(
        spark, rsrc,
        [
            ("s1", t0 + 10_000, 10.0),       # matches s1
            # watermark pusher: 3 days later, far past t0 + tolerance
            ("zz", t0 + 3 * day, 0.0),
        ],
    )
    def mk():
        sl = stream_datapoints(spark, str(lsrc)).withColumn(
            "event_time", F.timestamp_millis(F.col("ts_ms"))
        )
        sr = stream_datapoints(spark, str(rsrc)).withColumn(
            "event_time", F.timestamp_millis(F.col("ts_ms"))
        )
        return stream_interval_join(sl, sr, how="leftOuter")

    rows = _drain(spark, mk(), "ij2", ckpt, "append")
    # Outer flushes need a LATER batch to run in (watermark advances
    # between batches) and BOTH sides' watermarks past the window —
    # the left row's own state must be evictable too. Push far-future
    # rows on both streams and resume from the same checkpoint.
    _write_points(spark, lsrc, [("zz", t0 + 4 * day, 0.0)])
    _write_points(spark, rsrc, [("zz", t0 + 4 * day, 0.0)])
    rows += _drain(spark, mk(), "ij2", ckpt, "append")
    got = {(r.external_id, r.right_value) for r in rows}
    assert ("s1", 10.0) in got
    assert ("s2", None) in got  # flushed as unmatched after watermark


def test_stream_holt_state_matches_batch_fold(spark, tmp_path):
    """Streaming Holt state across two micro-batches must equal the
    batch fold over the concatenated in-order series."""
    import json

    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_holt_state,
    )

    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_batch(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps(r) for r in rows)
        )

    schema = (
        "event_type string, event_id long, ts_ms long, value double"
    )
    write_batch(
        "b1.jsonl",
        [
            {"event_type": "s", "event_id": i, "ts_ms": 1000 * i,
             "value": float(v)}
            for i, v in enumerate([10.0, 12.0, 11.0], start=1)
        ],
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    rows = _drain(spark, stream_holt_state(stream), "hw1", ckpt, "update")

    write_batch(
        "b2.jsonl",
        [
            {"event_type": "s", "event_id": i, "ts_ms": 1000 * i,
             "value": float(v)}
            for i, v in enumerate([13.0, 15.0], start=4)
        ],
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    rows = _drain(spark, stream_holt_state(stream), "hw2", ckpt, "update")
    final = rows[-1]

    level, trend = 10.0, 0.0
    for v in [12.0, 11.0, 13.0, 15.0]:
        nl = 0.5 * v + 0.5 * (level + trend)
        trend = 0.3 * (nl - level) + 0.7 * trend
        level = nl
    assert final.n_points == 5
    assert abs(final.level - level) < 1e-12
    assert abs(final.trend - trend) < 1e-12
    assert abs(final.forecast_h24 - (level + 24.0 * trend)) < 1e-12


def test_stream_session_rollup_native_session_window(spark, tmp_path):
    """Native session_window streaming: two bursts 40 min apart form
    two sessions; a third-day watermark pusher closes both. Session
    end = last event + gap (the session_window contract)."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_session_rollup,
    )

    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    minute = 60_000
    day = 86_400_000
    t0 = 1_700_000_000_000
    _write_points(
        spark, src,
        [
            ("u1", t0, 1.0),
            ("u1", t0 + 10 * minute, 2.0),     # same session (<=30m gap)
            ("u1", t0 + 50 * minute, 3.0),     # 40m gap -> new session
            ("u1", t0 + 3 * day, 0.0),         # watermark pusher
        ],
    )
    stream = stream_datapoints(spark, str(src)).select(
        F.timestamp_millis(F.col("ts_ms")).alias("event_time"),
        F.col("external_id").alias("user_id"),
        "value",
    )
    rows = _drain(spark, stream_session_rollup(stream), "ss1", ckpt, "append")
    sess = sorted(
        (r.session_start.timestamp() * 1000, r.n_events, r.total_value)
        for r in rows
        if r.user_id == "u1"
    )
    assert len(sess) == 2
    assert sess[0] == (t0, 2, 3.0)
    assert sess[1] == (t0 + 50 * minute, 1, 3.0)


def test_stream_cusum_matches_batch_fold(spark, tmp_path):
    """Streaming CUSUM state across two micro-batches, fed the batch
    target mean, must equal the batch recurrence over the
    concatenated in-order series (alarm reset included)."""
    import json

    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_cusum,
    )

    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    vals1 = [100.0, 400.0, 420.0, 50.0]
    vals2 = [430.0, 10.0, 20.0, 30.0]
    mean = 120.0

    def write_batch(name, vals, start):
        (src / name).write_text(
            "\n".join(
                json.dumps(
                    {"event_type": "s", "event_id": i, "ts_ms": 1000 * i,
                     "value": v}
                )
                for i, v in enumerate(vals, start=start)
            )
        )

    schema = "event_type string, event_id long, ts_ms long, value double"
    write_batch("b1.jsonl", vals1, 1)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    _drain(
        spark, stream_cusum(stream, {"s": mean}), "cu1", ckpt, "update"
    )
    write_batch("b2.jsonl", vals2, 5)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    rows = _drain(
        spark, stream_cusum(stream, {"s": mean}), "cu2", ckpt, "update"
    )
    final = rows[-1]

    sp = sn = msp = msn = 0.0
    alarms, first = 0, 0
    for i, x in enumerate(vals1 + vals2):
        sp = max(0.0, sp + (x - mean) - 25.0)
        sn = max(0.0, sn + (mean - x) - 25.0)
        msp, msn = max(msp, sp), max(msn, sn)
        if sp > 200.0 or sn > 200.0:
            alarms += 1
            if first == 0:
                first = i + 1
            sp = sn = 0.0
    assert alarms >= 1  # the drive must exercise the reset path
    assert final.n_points == 8
    assert final.n_alarms == alarms
    assert final.first_alarm_i == first
    assert abs(final.max_cusum_pos - msp) < 1e-12
    assert abs(final.max_cusum_neg - msn) < 1e-12


def test_stream_ols_trend_matches_batch_slope(spark, tmp_path):
    """Additive OLS partials across two micro-batches: slope and R^2
    are origin-shift-invariant, so the streaming result (fixed
    origin) must equal the batch operator (per-series-min origin) on
    the same points."""
    import json
    from datetime import datetime, timezone

    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_ols_trend,
    )
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_series_ols_trend,
    )

    src = tmp_path / "ev"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    t0 = 1_700_000_000  # whole seconds; epoch origin for the stream
    pts = [(i, t0 + 3600 * i, 10.0 + 2.5 * i + (i % 3)) for i in range(40)]

    def write_batch(name, chunk):
        (src / name).write_text(
            "\n".join(
                json.dumps(
                    {"event_type": "s", "event_id": i,
                     "ts_ms": 1000 * ts, "value": v}
                )
                for i, ts, v in chunk
            )
        )

    schema = "event_type string, event_id long, ts_ms long, value double"
    write_batch("b1.jsonl", pts[:25])
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    _drain(spark, stream_ols_trend(stream, t0), "ols1", ckpt, "update")
    write_batch("b2.jsonl", pts[25:])
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    rows = _drain(
        spark, stream_ols_trend(stream, t0), "ols2", ckpt, "update"
    )
    final = rows[-1]

    # Batch twin over the same points written as an events table.
    bdir = tmp_path / "batch"
    spark.createDataFrame(
        [
            (i, datetime.fromtimestamp(ts, tz=timezone.utc)
             .replace(tzinfo=None), 1, "s", v, "{}")
            for i, ts, v in pts
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{bdir}/events.parquet", mode="overwrite")
    batch = q_series_ols_trend(spark, str(bdir)).collect()[0]

    assert final.n_points == 40 == batch.n_points
    assert final.slope_per_day == batch.slope_per_day
    assert final.r2 == batch.r2
    # Streaming intercept reads at origin_s == the series min here,
    # so it matches the batch intercept too.
    assert final.intercept_at_origin == batch.intercept


def test_stream_heavy_hitters_brackets_and_replay_idempotence(spark, tmp_path):
    """The streaming space-saving store must bracket every reported
    item's exact count after multiple batches, and an at-least-once
    redelivery of a batch id must overwrite itself (idempotent)."""
    import os

    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.textops import (
        spacesaving_summaries,
    )
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        heavy_hitters_from_store,
        stream_heavy_hitters_fold,
    )

    src = tmp_path / "items"
    src.mkdir()
    store = str(tmp_path / "hh_store")
    ckpt = str(tmp_path / "ckpt")
    b1 = [("x",)] * 30 + [("y",)] * 10 + [("z",)] * 2
    b2 = [("x",)] * 5 + [("w",)] * 20
    spark.createDataFrame(b1, "item string").repartition(1).write.mode(
        "append"
    ).parquet(str(src))

    def run():
        stream = spark.readStream.schema("item string").parquet(str(src))
        q = stream_heavy_hitters_fold(stream, store, ckpt, capacity=16)
        q.awaitTermination(120)

    run()
    spark.createDataFrame(b2, "item string").repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run()

    exact = {"x": 35, "y": 10, "z": 2, "w": 20}
    rows = heavy_hitters_from_store(spark, store, k=10).collect()
    got = {r.item: (r.lower, r.upper) for r in rows}
    assert set(got) == set(exact)  # ample capacity: everything tracked
    for item, n in exact.items():
        lo, up = got[item]
        assert lo <= n <= up
    # Ample capacity means every partial is exact -> brackets are tight.
    assert all(lo == up for lo, up in got.values())

    # Redelivery: rewriting one batch id's summaries (the foreachBatch
    # replay path) leaves the served brackets unchanged.
    before = sorted(tuple(r) for r in rows)
    summary = spacesaving_summaries(
        spark.createDataFrame(b2, "item string"), "item", 16
    )
    summary.write.mode("overwrite").parquet(os.path.join(store, "batch=1"))
    after = sorted(
        tuple(r) for r in heavy_hitters_from_store(spark, store, k=10).collect()
    )
    assert after == before


def test_stream_series_tracker_tws_matches_legacy_twin(spark, tmp_path):
    """The Spark-4 transformWithStateInPandas tracker: where the
    protobuf state protocol is available, exact per-series state
    across micro-batches and restarts (counts accumulate, carried
    last value follows max ts, not arrival order); where it is not,
    the operator must fail EAGERLY with the dependency named — never
    the opaque mid-query worker crash."""
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_series_tracker_tws,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False

    src = tmp_path / "dp"
    ckpt = tmp_path / "ckpt"
    _write_points(
        spark, src,
        [("a", 1_000, 1.0), ("a", 3_000, 3.0), ("b", 2_000, 2.0)],
    )

    if not have_protobuf:
        with pytest.raises(RuntimeError, match="protobuf"):
            stream_series_tracker_tws(
                spark.readStream.schema(
                    "external_id string, name string, ts_ms long, "
                    "value double, source_file string, file_ts long"
                ).parquet(str(src))
            )
        return

    prov = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(prov, None)
    spark.conf.set(
        prov,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    def run():
        stream = spark.readStream.schema(
            "external_id string, name string, ts_ms long, value double, "
            "source_file string, file_ts long"
        ).parquet(str(src))
        out = stream_series_tracker_tws(stream)
        collected: list = []
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(df.collect())
            )
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.external_id: (r.n_points, r.last_ts_ms, r.last_value)
                for r in collected}

    try:
        got = run()
        assert got == {"a": (2, 3_000, 3.0), "b": (1, 2_000, 2.0)}
        _write_points(spark, src, [("a", 2_500, 99.0), ("b", 4_000, 4.0)])
        got2 = run()
        assert got2 == {"a": (3, 3_000, 3.0), "b": (2, 4_000, 4.0)}
    finally:
        if before is None:
            spark.conf.unset(prov)
        else:
            spark.conf.set(prov, before)


def test_stream_embedding_drift_alarms_on_shifted_batch(spark, tmp_path):
    """Two micro-batch drops against a fixed reference: the
    same-distribution drop stays quiet, the +0.5-shifted drop pushes
    the CUMULATIVE z over the 1% line; the per-batch partial files
    make replays idempotent (one file per batch id) and the
    cumulative stats equal a batch recompute over the union (the
    sufficient statistics are additive)."""
    import time

    from datapoints_csv_extractor_spark.operators.similarity import (
        mmd_drift_report,
        mmd_quadruple_stats,
    )
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_embedding_drift,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ref = src.where("vec_id % 2 = 0").select("vec_id", "embedding")
    clean = src.where("vec_id % 2 = 1").select("vec_id", "embedding")
    from pyspark.sql import functions as F

    shifted = clean.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            "embedding", lambda v: (v.cast("double") + 0.5).cast("float")
        ).alias("embedding"),
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    clean.coalesce(1).write.parquet(str(in_dir / "drop1"))
    reports = {}

    def drain():
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(str(in_dir))
        )
        q = stream_embedding_drift(
            stream,
            ref,
            str(tmp_path / "state"),
            str(tmp_path / "ckpt"),
            on_batch=lambda bid, row: reports.__setitem__(bid, row),
            available_now=True,
        )
        q.awaitTermination(120)
        time.sleep(0.2)

    drain()
    first = reports[max(reports)]
    assert first.drifted is False

    shifted.coalesce(1).write.parquet(str(in_dir / "drop2"))
    drain()
    second = reports[max(reports)]
    assert second.drifted is True
    assert second.z_score > 2.3263

    # Cumulative state == one batch recompute over the union.
    union_stats = mmd_quadruple_stats(ref, clean.unionAll(shifted))
    want = mmd_drift_report(union_stats).first()
    assert second.n_quadruples == want.n_quadruples


def test_stream_sprt_crosses_bound_mid_ingest(spark, tmp_path):
    """Two micro-batch drops: after the first (12 all-success trials
    on arm 0) the walk is still inside the Wald bounds; the second
    batch pushes the CUMULATIVE LLR over the accept_h1 line — the
    mid-ingest stop the SPRT exists for. The cumulative verdict must
    equal the batch sprt_monitor over the union, and re-draining is
    idempotent (one partial file per batch id)."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.analytic import (
        sprt_monitor,
    )
    from datapoints_csv_extractor_spark.streaming.aggregates import (
        stream_sprt_monitor,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    b1 = spark.createDataFrame(
        [(0, True)] * 12, "arm long, success boolean"
    )
    b1.coalesce(1).write.parquet(str(in_dir / "drop1"))
    reports = {}

    def drain():
        stream = (
            spark.readStream.schema("arm long, success boolean")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(str(in_dir))
        )
        q = stream_sprt_monitor(
            stream,
            str(tmp_path / "state"),
            str(tmp_path / "ckpt"),
            on_batch=lambda bid, rows: reports.update({bid: rows}),
        )
        q.awaitTermination(120)

    drain()
    first = list(reports.values())[-1]
    assert first[0].verdict == "continue", first
    assert first[0].cum_n == 12

    b2 = spark.createDataFrame(
        [(0, True)] * 12, "arm long, success boolean"
    )
    b2.coalesce(1).write.parquet(str(in_dir / "drop2"))
    reports.clear()
    drain()
    final = list(reports.values())[-1]
    assert final[0].verdict == "accept_h1", final
    assert final[0].cum_n == 24 and final[0].cum_k == 24

    # cumulative == one batch run over the union (period is a dummy)
    union = b1.unionAll(b2).withColumn("day", F.lit(1))
    batch = sprt_monitor(union, period_col="day").collect()[-1]
    assert batch.llr == final[0].llr
    assert batch.verdict == final[0].verdict

    # replay idempotence: draining again with no new files changes
    # nothing (checkpointed source skips processed files).
    reports.clear()
    drain()
    assert not reports or list(reports.values())[-1][0].cum_n == 24
