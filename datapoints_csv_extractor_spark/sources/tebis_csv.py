"""TEBIS wide-CSV -> long datapoints ingest, as one lazy DataFrame plan.

The reference's whole pipeline (csv_extractor.py:115-172) is:
DictReader(';', latin-1) -> pivot to column lists -> drop units row
(``[1:]``) -> per value column: split header on last ':', decimal-comma
float parse (skip empty/bad), pair with ``int(ts)*1000``.

Spark-first re-expression (SURVEY.md §1.5, §7 Phase 0):

1. The column set is dynamic per file (SURVEY.md §7 "what's hard" #1),
   so the engine peeks only the FIRST LINE of each file driver-side —
   the same cost class as Spark's own FileIndex listing / schema
   inference — and builds a tiny ``(file_name, headers[])`` dimension.
2. ALL files are read in ONE scan with a positional all-string schema
   sized to the widest header (PERMISSIVE mode pads narrower files
   with NULLs). One scan = one job regardless of how many distinct
   header signatures exist; a per-signature read would plan one scan
   per signature (measured: 40 single-file scans cost ~20 s of pure
   driver/job overhead for 12 MB of data).
3. The header dimension is broadcast-joined to the raw rows BEFORE the
   unpivot — one hash probe per input row, not per datapoint.
4. Header + units rows are dropped by the one content predicate
   "timestamp cell is not an integer" — deterministic, distributed,
   order-independent (Spark gives no stable row order inside a file
   split; the reference's positional ``[1:]`` drop is re-expressed as
   this predicate, pinned by tests incl. the nonfloat.csv edge).
5. The wide->long unpivot (T1) is one ``posexplode`` of the value
   columns; the header string for each position comes from
   ``element_at(headers, pos+2)``. All scalar rules (F1-F3, P3-P4)
   are built-in Column expressions — zero Python UDFs.

Scale notes (100 TB): scan->join(broadcast)->generate->filter, NO
shuffle. Throughput is bounded by CSV decode. The header dimension is
one row per file; for millions of files it still broadcasts (file
name + ~30 strings each), and if it ever didn't, the join degrades
gracefully to a shuffle join on file_name. A single pathologically
wide file widens the schema for all rows of the batch (PERMISSIVE
NULL padding is cheap but not free) — callers can pre-bucket by width
if that matters. Files sharing a basename across directories in one
call are not supported (the reference processes one folder).
"""

from __future__ import annotations

import csv
import io
from concurrent.futures import ThreadPoolExecutor
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


def peek_headers(
    paths: list[Path], encoding: str = "latin-1", sep: str = ";"
) -> list[tuple[Path, tuple[str, ...]]]:
    """(path, header) for each file, first lines peeked in parallel."""
    if not paths:
        return []
    with ThreadPoolExecutor(max_workers=min(32, len(paths))) as pool:
        headers = list(pool.map(lambda p: _peek_header(p, encoding, sep), paths))
    return list(zip(paths, headers))


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
    # The header dimension keys on basename (input_file_name gives a
    # URI; joining on the full path would be brittle across schemes).
    # Two files sharing a basename would cross-join their headers —
    # refuse loudly instead of corrupting silently. The reference
    # processes one folder, where basenames are unique by construction.
    names = [p.name for p in norm]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"duplicate file basenames not supported in one ingest: {dupes}"
        )
    peeked = [(p, h) for p, h in peek_headers(norm, encoding, sep) if len(h) >= 2]
    if not peeked:
        return spark.createDataFrame([], DATAPOINTS_SCHEMA)

    n_max = max(len(h) for _, h in peeked)
    header_dim = spark.createDataFrame(
        [(p.name, list(h)) for p, h in peeked],
        "file_name string, headers array<string>",
    )

    # Spark's CSV reader names this charset iso-8859-1; 'latin-1' is
    # the Python alias the reference uses (csv_extractor.py:118).
    charset = "iso-8859-1" if encoding.lower().replace("-", "") == "latin1" else encoding
    pos_schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType()) for i in range(n_max)]
    )
    raw = (
        spark.read.schema(pos_schema)
        .options(sep=sep, encoding=charset, quote='"', header="false", mode="PERMISSIVE")
        .csv([str(p) for p, _ in peeked])
    )

    ts_ms = seconds_to_ms(F.col("_c0"))
    file_name = F.url_decode(F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1))
    rows = (
        # One content predicate drops BOTH the header row and the
        # units row (neither has an integer timestamp cell).
        raw.where(ts_ms.isNotNull())
        .select(
            ts_ms.alias("ts_ms"),
            F.input_file_name().alias("source_file"),
            file_name.alias("file_name"),
            F.array(*[F.col(f"_c{i}") for i in range(1, n_max)]).alias("vals"),
        )
        .join(F.broadcast(header_dim), "file_name")
        .select(
            "ts_ms",
            "source_file",
            "headers",
            F.posexplode(F.col("vals")).alias("pos", "raw_value"),
        )
    )
    # Value column at 0-based pos maps to header index pos+2 (1-based
    # element_at; headers[1] is the timestamp column's header cell).
    header = F.element_at(F.col("headers"), F.col("pos") + 2)
    value = decimal_comma_double(F.col("raw_value"))
    return (
        rows.where(header.isNotNull())
        .select(
            header_external_id(header).alias("external_id"),
            header_name(header).alias("name"),
            F.col("ts_ms"),
            value.alias("value"),
            F.col("source_file"),
            file_timestamp(F.col("source_file")).alias("file_ts"),
        )
        # Empty cells ('' -> NULL cast) and unparseable floats are
        # skipped, not errors: csv_extractor.py:97-102.
        .where(F.col("value").isNotNull())
    )


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
