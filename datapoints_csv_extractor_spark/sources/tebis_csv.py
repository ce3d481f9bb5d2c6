"""TEBIS wide-CSV -> long datapoints ingest, as one lazy DataFrame plan.

The reference's whole pipeline (csv_extractor.py:115-172) is:
DictReader(';', latin-1) -> pivot to column lists -> drop units row
(``[1:]``) -> per value column: split header on last ':', decimal-comma
float parse (skip empty/bad), pair with ``int(ts)*1000``.

Spark-first re-expression (SURVEY.md §1.5, §7 Phase 0):

1. Files are grouped by header signature (the column set is dynamic
   per file — SURVEY.md §7 "what's hard" #1). The header peek is
   driver-side metadata work on the first line of each file, the same
   cost class as Spark's own FileIndex listing / schema inference; the
   bulk data path is fully distributed.
2. Each group is read with an explicit all-string positional schema and
   ``header=False`` so the header row stays a data row; header + units
   rows are then dropped by the one predicate "timestamp cell is not an
   integer" — deterministic, distributed, and order-independent (Spark
   gives no stable row order inside a file split; the reference's
   positional ``[1:]`` drop is re-expressed as this content predicate,
   pinned by tests including the nonfloat.csv named-ts-column edge).
3. The wide->long unpivot (T1) is ``explode(array(struct(lit(header),
   col)))`` — melt with the real header string inlined as a literal, so
   no join and no SQL-string parsing; it stays inside whole-stage
   codegen as Project+Generate.
4. All scalar rules (F1-F3, P3-P4) are built-in Column expressions from
   functions/tebis.py — zero Python UDFs in the hot path.

Scale notes (100 TB): the per-group plan is an embarrassingly parallel
scan->project->generate->filter with NO shuffle at all; throughput is
bounded by CSV decode. Group count is bounded by distinct header
signatures (sites), not file count. For a permanent lake, land the long
output partitioned by date(ts)/bucket(external_id) so downstream aggs
and as-of joins prune and co-locate (see plans/scale.md).
"""

from __future__ import annotations

import csv
import io
from concurrent.futures import ThreadPoolExecutor
from functools import reduce
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapoints_csv_extractor_spark.functions.tebis import (
    decimal_comma_double,
    file_timestamp,
    header_external_id,
    header_name,
    seconds_to_ms,
)
from datapoints_csv_extractor_spark.sources.files import find_historical_files

DATAPOINTS_SCHEMA = T.StructType(
    [
        T.StructField("external_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("file_ts", T.LongType()),
    ]
)


def _peek_header(path: Path, encoding: str, sep: str) -> tuple[str, ...]:
    """First line of the file parsed as one csv record (driver-side)."""
    with open(path, "r", encoding=encoding, newline="") as f:
        first = f.readline()
    row = next(csv.reader(io.StringIO(first), delimiter=sep), [])
    return tuple(row)


def group_files_by_header(
    paths: list[Path], encoding: str = "latin-1", sep: str = ";"
) -> dict[tuple[str, ...], list[Path]]:
    """Group files by exact header signature so each group shares one
    read schema. Peeks only the first line per file (parallel)."""
    groups: dict[tuple[str, ...], list[Path]] = {}
    if not paths:
        return groups
    with ThreadPoolExecutor(max_workers=min(32, len(paths))) as pool:
        headers = list(pool.map(lambda p: _peek_header(p, encoding, sep), paths))
    for path, header in zip(paths, headers):
        if len(header) < 2:
            continue  # no value columns -> nothing to emit
        groups.setdefault(header, []).append(path)
    return groups


def _read_group(
    spark: SparkSession,
    header: tuple[str, ...],
    paths: list[Path],
    encoding: str,
    sep: str,
) -> DataFrame:
    """One header-signature group -> long datapoints DataFrame."""
    n = len(header)
    pos_schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType()) for i in range(n)]
    )
    # Spark's CSV reader names this charset iso-8859-1; 'latin-1' is the
    # Python alias the reference uses (csv_extractor.py:118).
    charset = "iso-8859-1" if encoding.lower().replace("-", "") == "latin1" else encoding
    raw = (
        spark.read.schema(pos_schema)
        .options(sep=sep, encoding=charset, quote='"', header="false", mode="PERMISSIVE")
        .csv([str(p) for p in paths])
    )
    ts_ms = seconds_to_ms(F.col("_c0"))
    # One content predicate drops BOTH the header row and the units row
    # (neither has an integer timestamp cell) — the reference's
    # positional [1:] drop, made order-independent.
    rows = raw.where(ts_ms.isNotNull()).select(
        ts_ms.alias("ts_ms"),
        F.input_file_name().alias("source_file"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(header[i]).alias("header"),
                        F.col(f"_c{i}").alias("raw_value"),
                    )
                    for i in range(1, n)
                ]
            )
        ).alias("kv"),
    )
    value = decimal_comma_double(F.col("kv.raw_value"))
    return (
        rows.select(
            header_external_id(F.col("kv.header")).alias("external_id"),
            header_name(F.col("kv.header")).alias("name"),
            F.col("ts_ms"),
            value.alias("value"),
            F.col("source_file"),
            file_timestamp(F.col("source_file")).alias("file_ts"),
        )
        # Empty cells ('' -> NULL cast) and unparseable floats are
        # skipped, not errors: csv_extractor.py:97-102.
        .where(F.col("value").isNotNull())
    )


def read_datapoints(
    spark: SparkSession,
    paths: list[Path] | list[str],
    encoding: str = "latin-1",
    sep: str = ";",
) -> DataFrame:
    """Ingest explicit csv paths into the long datapoints model.

    Output schema: ``DATAPOINTS_SCHEMA`` = (external_id, name, ts_ms,
    value, source_file, file_ts).
    """
    norm = [Path(p) for p in paths]
    groups = group_files_by_header(norm, encoding=encoding, sep=sep)
    if not groups:
        return spark.createDataFrame([], DATAPOINTS_SCHEMA)
    parts = [
        _read_group(spark, header, ps, encoding, sep)
        for header, ps in groups.items()
    ]
    return reduce(DataFrame.unionByName, parts)


def read_datapoints_from_folder(
    spark: SparkSession,
    folder: str | Path,
    time_from: int | None = None,
    time_until: int | None = None,
    encoding: str = "latin-1",
    sep: str = ";",
) -> DataFrame:
    """Historical-mode ingest: prune by filename ts (exclusive bounds),
    then build the distributed ingest plan over the surviving files."""
    paths = find_historical_files(folder, time_from, time_until)
    return read_datapoints(spark, paths, encoding=encoding, sep=sep)
