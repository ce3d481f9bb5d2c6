"""Document-corpus sources for the LLM-pipeline operators.

The dedup/similarity/text operators consume a canonical
``(doc_id, text, ...)`` frame; these readers produce it from the
formats corpora actually arrive in:

- JSONL (one JSON object per line) — the de-facto corpus interchange
  format. Parsed as ``text`` + ``from_json`` with an EXPLICIT schema:
  no inference pass over the corpus, and — unlike the native json
  reader's PERMISSIVE mode — no internal corrupt-record column, whose
  restriction ("queries referencing only the corrupt column are not
  allowed") makes innocent patterns like ``reader(...).count()`` throw
  after column pruning. Malformed lines parse to a NULL struct and are
  counted/dropped explicitly — the same skip-don't-fail posture as the
  TEBIS value parser (csv_extractor.py:98-102).
- One-document-per-file text trees (``wholetext``) — crawl/export
  layouts. The doc_id derives from the file path via xxhash64:
  deterministic, collision-safe at corpus scale, and computed JVM-side.

Everything returns a lazy DataFrame; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


# from_json in PERMISSIVE mode yields an all-null struct for malformed
# input, indistinguishable from a valid-but-empty object — so the parse
# schema carries its own corrupt-record field (populated by the parser
# with the raw line). Unlike the native json reader's internal corrupt
# column, a from_json struct field has no "referencing only the corrupt
# column" restriction, so reader(...).count() works after pruning.
_PARSE_SCHEMA = T.StructType(
    list(DOCUMENT_SCHEMA.fields) + [T.StructField("_cr", T.StringType())]
)


def _parsed_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per input line: parsed struct ``d`` whose ``_cr`` field
    holds the raw line when parsing failed."""
    return spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            _PARSE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_cr"},
        ).alias("d")
    )


def read_documents_jsonl(
    spark: SparkSession, path: str, drop_corrupt: bool = True
) -> DataFrame:
    """Read a JSONL corpus into the canonical documents frame.

    Malformed lines surface as ``_corrupt`` (the raw line) when
    ``drop_corrupt=False``; by default they are dropped. Line-delimited
    JSON splits by newline, so a 100 TB corpus parallelizes per file
    split like any text source.
    """
    parsed = _parsed_lines(spark, path)
    ok = F.col("d").isNotNull() & F.col("d._cr").isNull()
    if drop_corrupt:
        return parsed.where(ok).select("d.*").drop("_cr")
    return parsed.select(
        *[F.col(f"d.{f.name}") for f in DOCUMENT_SCHEMA.fields],
        F.when(~ok, F.coalesce(F.col("d._cr"), F.lit(""))).alias("_corrupt"),
    )


def read_documents_text_tree(spark: SparkSession, path: str) -> DataFrame:
    """Read a one-document-per-file text tree (recursive) into the
    canonical frame. ``wholetext`` keeps each file a single row (no
    line splitting); doc_id = xxhash64 of the file path — deterministic
    and JVM-side, so re-ingesting the same tree yields the same ids.
    One caveat at scale: a single file must fit in one task's memory,
    which is the correct constraint for "a document"."""
    return (
        spark.read.option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .text(path)
        .select(
            F.xxhash64(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.input_file_name().alias("source"),
        )
    )


def corrupt_line_stats(spark: SparkSession, path: str) -> DataFrame:
    """Ingest-quality report for a JSONL corpus: clean vs corrupt line
    counts (the gauge a pipeline alarms on before training)."""
    parsed = _parsed_lines(spark, path)
    corrupt = F.col("d").isNull() | F.col("d._cr").isNotNull()
    return parsed.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(corrupt, 1).otherwise(0)).alias("n_corrupt"),
        F.sum(
            F.when(~corrupt & F.col("d.text").isNull(), 1).otherwise(0)
        ).alias("n_missing_text"),
    )
