"""Live mode as Structured Streaming (SURVEY.md §2.8 ST1-ST7, §7 Phase 3).

Reference behavior (csv_extractor.py:33-50, 265-280): every 8 s, pick
the ≤20 newest settled csv files, run the batch pipeline on them,
post datapoints, create missing series, then delete/archive the files.
No checkpointing — a crash reprocesses or loses work (ST6).

Spark-first re-expression:

- **Discovery** is a checkpointed file-stream source. TEBIS files have
  per-file dynamic headers (no shared read schema), so the stream's
  *content* can't be the parse input; instead the ``text`` source acts
  as an exactly-once file-arrival log (its seen-files journal in the
  checkpoint replaces — and strengthens — the reference's
  "the move/delete IS the commit" protocol; ST6 fixed).
- ``maxFilesPerTrigger=20`` + ``latestFirst=true`` reproduce the
  newest-first ≤20-file cycle (ST2/O2); ``Trigger.ProcessingTime("8
  seconds")`` reproduces the poll cadence (ST1).
- **Processing** happens in ``foreachBatch``: the micro-batch yields
  the new file paths (≤20 — a tiny driver-side collect of *metadata*,
  not data); the proven batch plan (sources/tebis_csv.read_datapoints)
  re-reads exactly those files distributed, writes the datapoints
  sink, upserts the catalog (ST5 state = the dimension table, not
  stream state — SURVEY.md §2.8), then archives the inputs (S9).
  Re-reading ≤20 small files costs one extra scan but keeps ONE parser
  implementation — no batch/streaming semantic drift.
- The 1 s mtime settle guard (ST3) has no native file-source
  equivalent; the documented approximation is that the source only
  picks up files on a later listing pass, and writers should
  write-then-rename (the universal atomic-publish idiom). See
  SURVEY.md §7 "what's hard" #6.

At scale: each micro-batch is the batch plan — scan -> broadcast-join
headers -> posexplode -> filter, shuffle-free; state never grows with
stream length (the checkpoint file log is O(files seen), the catalog
is O(series)).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datapoints_csv_extractor_spark.sinks.catalog_store import append_missing
from datapoints_csv_extractor_spark.sinks.datapoints import write_datapoints
from datapoints_csv_extractor_spark.sinks.lifecycle import (
    finalize_succeeded,
    quarantine_failed,
    setup_directories,
)
from datapoints_csv_extractor_spark.sources.tebis_csv import read_datapoints

LIVE_MAX_FILES_PER_TRIGGER = 20  # csv_extractor.py:279-280
LIVE_TRIGGER = "8 seconds"  # csv_extractor.py:47


def _batch_paths(batch_df: DataFrame) -> list[Path]:
    """Distinct source files of a micro-batch (file: URI -> local path)."""
    rows = (
        batch_df.select(
            F.url_decode(
                F.regexp_replace(F.col("file"), r"^file:(//)?", "")
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    return [Path(r.p) for r in rows]


def process_batch(
    spark: SparkSession,
    paths: list[Path],
    sink_dir: str | Path,
    catalog_path: str | Path,
    finished_dir: Path | None = None,
    failed_dir: Path | None = None,
    delete_on_success: bool = False,
) -> dict[str, int]:
    """One live cycle over explicit paths: ingest -> sink -> upsert -> archive.

    Mirrors process_files + post_all_data (csv_extractor.py:199-236,
    175-196) with per-batch failure containment (ST7): if the batch
    fails, its files go to ``failed/`` and the error re-raises (the
    streaming engine will retry the batch from the checkpoint).
    """
    if not paths:
        return {"files": 0, "datapoints": 0, "series": 0, "new_series": 0}
    try:
        dp = read_datapoints(spark, paths)
        # A1/A2-grade metrics ride along on the write action via
        # observe() instead of a second scan (SURVEY.md §2.6).
        obs = Observation("ingest_metrics")
        observed = dp.observe(
            obs,
            F.count(F.lit(1)).alias("datapoints"),
            F.approx_count_distinct("external_id").alias("series"),
        )
        write_datapoints(observed, str(sink_dir))
        metrics = obs.get
    except Exception:
        if failed_dir is not None:
            quarantine_failed(paths, failed_dir)
        raise
    n_new = append_missing(spark, dp, catalog_path)
    finalize_succeeded(paths, finished_dir, delete=delete_on_success)
    return {
        "files": len(paths),
        "datapoints": int(metrics["datapoints"]),
        "series": int(metrics["series"]),
        "new_series": n_new,
    }


def start_live_ingest(
    spark: SparkSession,
    input_dir: str | Path,
    sink_dir: str | Path,
    catalog_path: str | Path,
    checkpoint_dir: str | Path,
    trigger: str | None = LIVE_TRIGGER,
    available_now: bool = False,
    max_files_per_trigger: int = LIVE_MAX_FILES_PER_TRIGGER,
    delete_on_success: bool = False,
    on_batch: Callable[[int, dict[str, int]], None] | None = None,
) -> StreamingQuery:
    """Start the live-mode stream (entry point 2, main.py --live).

    ``available_now=True`` drains the current folder contents then
    stops — the batch-test / catch-up mode. ``on_batch`` is an optional
    metrics hook (C3's Prometheus push becomes the caller's concern).
    """
    finished_dir, failed_dir = setup_directories(input_dir)

    files = (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.csv")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("latestFirst", "true")
        .load(str(input_dir))
        # Only the arrival log matters; content is re-read (correctly
        # latin-1-decoded) by the batch plan inside foreachBatch.
        .select(F.input_file_name().alias("file"))
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        stats = process_batch(
            spark,
            _batch_paths(batch_df),
            sink_dir=sink_dir,
            catalog_path=catalog_path,
            finished_dir=finished_dir,
            failed_dir=failed_dir,
            delete_on_success=delete_on_success,
        )
        if on_batch is not None:
            on_batch(batch_id, stats)

    writer = (
        files.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", str(checkpoint_dir))
        .queryName("tebis_live_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()
