"""Daily corpus-shard ingestion: the production composition of the
LLM-pipeline pieces.

A pretraining corpus is not built in one batch — shards arrive
continuously (a crawl day, a dump, a partner drop) and each must be
quality-gated, deduped against EVERYTHING already accepted, split, and
published, without ever recomputing the existing corpus. This plan
wires the incremental pieces end to end:

    JSONL shard (sources/documents.py — skip-don't-fail parse)
      -> cheap quality gate (textops.quality_passes, scan-side)
      -> dedup_incremental (operators/dedup.py — asymmetric band join
         against the persisted MinHash store; O(|shard| + candidates))
      -> deterministic split assignment (textops.split_assignment)
      -> append to the split-partitioned corpus (sinks/corpus.py)

Per-shard cost is linear in the shard; the corpus-sized state lives in
two append-only parquet stores (the curated corpus + the band store).
This is the reference's fetch-known/create-missing batch loop
(csv_extractor.py:151-154) raised to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.dedup import dedup_incremental
from datapoints_csv_extractor_spark.operators.textops import (
    quality_passes,
    split_assignment,
)
from datapoints_csv_extractor_spark.sinks.corpus import write_corpus


def ingest_corpus_shard(
    spark: SparkSession,
    shard: DataFrame,
    corpus_path: str,
    store_path: str,
    est_threshold: float = 0.5,
) -> dict[str, int]:
    """Ingest one (doc_id, text, ...) shard into the curated corpus.

    Quality-rejected docs never reach the dedup stage (no signatures
    are wasted on them — and a low-quality doc must not block a later
    clean near-copy). Docs flagged by the incremental dedup (against
    the stored corpus OR an earlier doc in the same shard) are
    dropped; survivors get their split and append to the corpus.

    Returns the shard's bookkeeping counts (the numbers an ingest
    pipeline alarms on): ``received``, ``low_quality``, ``duplicate``,
    ``published``.
    """
    shard = shard.localCheckpoint()  # one materialization feeds 3 consumers
    n_received = shard.count()
    passed = shard.where(quality_passes(F.col("text"))).localCheckpoint()
    n_passed = passed.count()

    verdicts = dedup_incremental(
        passed.select("doc_id", "text"), store_path, est_threshold
    )
    dup_ids = verdicts.select("doc_id").distinct()
    survivors = passed.join(dup_ids, "doc_id", "left_anti").withColumn(
        "split", split_assignment(F.col("doc_id"))
    )
    write_corpus(survivors, corpus_path, mode="append")
    # Counted from the shard-sized lineage (checkpointed shard +
    # verdicts), NOT by re-reading the corpus: per-shard cost must stay
    # O(|shard|), independent of how big the corpus has grown.
    n_published = survivors.count()
    return {
        "received": n_received,
        "low_quality": n_received - n_passed,
        "duplicate": n_passed - n_published,
        "published": n_published,
    }
