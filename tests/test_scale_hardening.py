"""Phase-5 scale tools: compaction and skew salting."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.skew import salted_join
from datapoints_csv_extractor_spark.plans.compaction import compact_datapoints
from datapoints_csv_extractor_spark.sinks.datapoints import write_datapoints


def test_compact_datapoints_reduces_files_preserves_rows(spark, tmp_path):
    sink = tmp_path / "dp"
    # Simulate live mode: 12 tiny appends into the same date partition.
    for i in range(12):
        df = spark.createDataFrame(
            [(f"s{j}", f"n{j}", 1_550_092_560_000 + i * 1000 + j, float(i * j))
             for j in range(20)],
            "external_id string, name string, ts_ms long, value double",
        ).withColumn("source_file", F.lit(f"batch{i}")).withColumn("file_ts", F.lit(0))
        write_datapoints(df.coalesce(1), str(sink))

    before = spark.read.parquet(str(sink))
    n_rows = before.count()
    # Materialize BEFORE compaction: the lazy plan pins file paths that
    # won't exist afterwards.
    before_stats = before.agg(F.sum("value"), F.countDistinct("external_id")).first()
    part = next(Path(sink).glob("dt=*"))
    n_files_before = len(list(part.glob("*.parquet")))
    assert n_files_before >= 12

    stats = compact_datapoints(spark, sink, max_files=4)
    assert stats, "oversized partition should have been compacted"
    (b, a), = stats.values()
    assert b == n_files_before and a < b

    after = spark.read.parquet(str(sink))
    assert after.count() == n_rows
    # Values intact, not just counts.
    assert (
        after.agg(F.sum("value"), F.countDistinct("external_id")).first()
        == before_stats
    )


def test_compact_skips_small_partitions(spark, tmp_path):
    sink = tmp_path / "dp"
    df = spark.createDataFrame(
        [("s1", "n1", 1_550_092_560_000, 1.0)],
        "external_id string, name string, ts_ms long, value double",
    ).withColumn("source_file", F.lit("f")).withColumn("file_ts", F.lit(0))
    write_datapoints(df, str(sink))
    assert compact_datapoints(spark, sink, max_files=4) == {}


def test_salted_join_equals_plain_join_on_skewed_data(spark):
    # 90% of fact rows share one hot key.
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    plain = fact.join(dim, "k").select("k", "payload", "label")
    salted = salted_join(fact, dim, "k", n_salts=8).select("k", "payload", "label")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_compact_band_store_preserves_dedup_state(spark, tmp_path):
    """Five single-doc shards fragment the band store into 5+ file
    sets; compaction shrinks the file counts without changing any
    signature/band row, and a post-compaction ingest still flags dups
    against pre-compaction shards."""
    from datapoints_csv_extractor_spark.operators.dedup import dedup_incremental
    from datapoints_csv_extractor_spark.plans.compaction import compact_band_store

    store = str(tmp_path / "bandstore")
    texts = [
        f"shard {i} carries its own entirely distinct narrative about "
        f"topic number {i} with plenty of unique words like token{i}a "
        f"token{i}b token{i}c spread across the document body"
        for i in range(5)
    ]
    for i, t in enumerate(texts):
        dedup_incremental(
            spark.createDataFrame([(i, t)], "doc_id long, text string"), store
        ).count()

    import glob

    sig_dir = f"{store}/signatures"
    before_rows = sorted(
        (r.doc_id, tuple(r.signature))
        for r in spark.read.parquet(sig_dir).collect()
    )
    assert len(glob.glob(f"{sig_dir}/ingest=*")) == 5

    results = compact_band_store(spark, store)
    assert set(results) == {"signatures", "bands", "bucket_counts"}
    for name, (before, after) in results.items():
        assert after < before, (name, before, after)
    # One committed ingest remains; old dirs are garbage-collected.
    assert len(glob.glob(f"{sig_dir}/ingest=*")) == 1

    after_rows = sorted(
        (r.doc_id, tuple(r.signature))
        for r in spark.read.parquet(sig_dir).collect()
    )
    assert after_rows == before_rows

    # The compacted store still recognizes old content as known.
    v = dedup_incremental(
        spark.createDataFrame([(100, texts[0])], "doc_id long, text string"),
        store,
    ).collect()
    assert {(r.doc_id, r.dup_of_doc_id, r.dup_kind) for r in v} == {
        (100, 0, "known")
    }


def test_compact_flat_table(spark, tmp_path):
    """Generic flat-dir compaction: many appended file sets rewrite to
    fewer files with identical rows; under-threshold dirs are left
    alone."""
    from datapoints_csv_extractor_spark.plans.compaction import (
        compact_flat_table,
    )

    path = str(tmp_path / "flat")
    for i in range(6):
        spark.range(i * 10, i * 10 + 10).coalesce(2).write.mode(
            "append"
        ).parquet(path)
    before = sorted(r.id for r in spark.read.parquet(path).collect())
    result = compact_flat_table(spark, path, max_files=4)
    assert result is not None and result[1] < result[0]
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before
    # Already compact: no-op.
    assert compact_flat_table(spark, path, max_files=64) is None
