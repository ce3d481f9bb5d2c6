"""Curated-corpus sink: the write side of the LLM-data pipeline.

Counterpart of ``sources/documents.py``: after curation
(``q_curation_pipeline_full``) and split assignment
(``q_dataset_split``), the surviving documents land as parquet
partitioned by ``split`` (and optionally ``lang``) so downstream
training jobs read exactly their slice via partition pruning — the
same layout payoff as the date-partitioned datapoints sink
(sinks/datapoints.py), applied to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    docs: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("split",),
    mode: str = "overwrite",
) -> None:
    """Write a documents frame partitioned for pruned downstream reads."""
    docs.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_curated_corpus(
    spark: SparkSession, sf_dir: str, path: str
) -> dict[str, int]:
    """End-to-end curate-and-publish: keep-decision (quality ∧ canonical
    ∧ uncontaminated) joins split assignment, kept docs write partitioned
    by split. Returns per-split row counts (from the written table, so
    the numbers reflect what a training job will actually read)."""
    from datapoints_csv_extractor_spark.operators.relational import load
    from datapoints_csv_extractor_spark.operators.textops import (
        q_curation_pipeline_full,
        q_dataset_split,
    )

    d = load(spark, sf_dir, "documents")
    keep = q_curation_pipeline_full(spark, sf_dir).where("keep").select("doc_id")
    split = q_dataset_split(spark, sf_dir).select("doc_id", "split")
    curated = d.join(keep, "doc_id").join(split, "doc_id")
    write_corpus(curated, path)
    out = spark.read.parquet(path)
    return {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
