"""Right-to-be-forgotten composite: remove documents from EVERY place
the pipeline put them.

A published document lives in up to four stores: the curated corpus
(split-partitioned parquet), the MinHash band store (dedup state),
the BM25 inverted index (retrieval), and — for its embedding — the
IVF assignment store. A redaction request (PII discovered after
publication, a takedown, a licensing change) must remove it from all
of them, with each store's own commit/replay contract intact.

Cost shape at 100 TB:

- The three INDEX stores take O(|delete batch|) tombstone writes plus
  one atomic ledger commit each — serving stops immediately via the
  query-path anti-joins; the physical rows leave at each store's next
  ``compact_*``. No index data is rewritten here.
- The CORPUS is the one store that gets rewritten inline, and only
  its AFFECTED split partitions (a membership probe per split, then a
  staging + atomic-swap rewrite of those splits — same flow as
  ``compact_flat_table``). With 2-3 split partitions this is a
  bounded number of partition scans. A deployment taking frequent
  point deletes should publish the corpus through the bucketed
  ``sinks/merge_store`` instead (deletes become O(delta + affected
  buckets) CDC upserts); this plan serves the common
  append-partitioned layout.

Reference analog: the reference can only ever append datapoints
(csv_extractor.py has no delete path at all) — this is the lifecycle
surface a data PLATFORM needs layered over the engine.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def forget_documents(
    spark: SparkSession,
    doc_ids,
    corpus_path: str | None = None,
    band_store: str | None = None,
    bm25_index: str | None = None,
    ivf_index: str | None = None,
    vec_ids=None,
    delete_id: str | None = None,
) -> dict:
    """Remove ``doc_ids`` from every provided store. Pass only the
    stores the deployment actually runs; ``vec_ids`` (defaults to
    ``doc_ids``) addresses the IVF store, whose key is vec_id.

    ``delete_id`` makes the whole request replay-idempotent: each
    index store commits the tombstone batch under this id (an
    already-committed id is a per-store no-op), and the corpus
    rewrite is naturally idempotent (removing absent rows rewrites
    nothing). Returns a ledger of what each store did.
    """
    from datapoints_csv_extractor_spark.operators.dedup import (
        delete_from_store,
    )
    from datapoints_csv_extractor_spark.operators.textops import (
        delete_from_bm25_index,
    )

    delete_id = delete_id or uuid.uuid4().hex[:12]
    ids_df = (
        doc_ids
        if isinstance(doc_ids, DataFrame)
        else spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long"
        )
    ).select("doc_id").distinct().localCheckpoint()

    ledger: dict = {"delete_id": delete_id}
    if corpus_path is not None:
        ledger["corpus_rows_removed"] = _rewrite_corpus_partitions(
            spark, corpus_path, ids_df
        )
    if band_store is not None:
        ledger["band_store_committed"] = delete_from_store(
            spark, band_store, ids_df, delete_id=delete_id
        )
    if bm25_index is not None:
        ledger["bm25_committed"] = delete_from_bm25_index(
            spark, bm25_index, ids_df, delete_id=delete_id
        )
    if ivf_index is not None:
        vdf = (
            vec_ids
            if isinstance(vec_ids, DataFrame)
            else (
                spark.createDataFrame(
                    [(int(i),) for i in vec_ids], "vec_id long"
                )
                if vec_ids is not None
                else ids_df.select(F.col("doc_id").alias("vec_id"))
            )
        )
        ledger["ivf_committed"] = delete_from_store(
            spark, ivf_index, vdf, delete_id=delete_id, id_col="vec_id"
        )
    return ledger


def _rewrite_corpus_partitions(
    spark: SparkSession, corpus_path: str, ids_df: DataFrame
) -> int:
    """Rewrite ONLY the split partitions that contain a doc to
    forget: per-partition membership probe (one pruned scan), then a
    staging write + atomic directory swap for each affected split —
    untouched splits keep their bytes (and mtimes). Returns rows
    removed."""
    root = Path(corpus_path)
    removed = 0
    for part_dir in sorted(root.glob("split=*")):
        part = spark.read.parquet(str(part_dir))
        hit = part.join(ids_df, "doc_id", "left_semi").count()
        if not hit:
            continue
        survivors = part.join(ids_df, "doc_id", "left_anti")
        staging = root / f"_redact_{part_dir.name}_{uuid.uuid4().hex[:8]}"
        survivors.write.mode("overwrite").parquet(str(staging))
        retired = root / f"_retired_{part_dir.name}_{uuid.uuid4().hex[:8]}"
        part_dir.rename(retired)
        staging.rename(part_dir)
        shutil.rmtree(retired, ignore_errors=True)
        removed += hit
    return removed
