"""Long datapoints -> TEBIS wide-CSV export (the reader's inverse).

The reference only CONSUMES the TEBIS format (csv_extractor.py:115-172);
an engine that replaces it also needs the producing side — regression
fixtures, backfills into the same folder layout, handoffs to other
TEBIS consumers. This writer emits files ``read_datapoints_from_folder``
ingests back losslessly: latin-1, ';'-separated, ``ext_id : name``
column headers, a units row (dropped on read by the non-integer-ts
predicate), epoch-second timestamps, decimal-comma values.

Spark-first shape: ONE pivot per call (long -> wide, explicit column
list so no extra distinct job), partitioned by time chunk so each
chunk becomes one file — the reference's `<name>_<epoch>.csv` naming
carries the chunk timestamp, which the reader's filename pruning (S2)
then understands. The series axis is schema-sized (distinct headers
collected driver-side, the same parameter class as the reader's
first-line peek); the data axis never touches the driver. The final
per-file rename is driver-side file metadata work, one op per file —
the same cost class as the reference's per-file finished/failed moves.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

TS_COL = "ts"
UNITS_SENTINEL = ""  # units-row timestamp cell: non-integer => dropped on read


def _header(external_id: F.Column, name: F.Column) -> F.Column:
    return F.concat(external_id, F.lit(" : "), name)


def write_tebis_csv(
    dp: DataFrame,
    out_dir: str,
    chunk_seconds: int = 3600,
    prefix: str = "TEBIS_EXPORT",
    unit: str = "u",
) -> list[str]:
    """Write long datapoints as TEBIS wide-CSV files, one per
    ``chunk_seconds`` time chunk; returns the written file paths.

    Values print as decimal-comma strings (plain or scientific — the
    reader's comma->dot float parse accepts both); series absent at a
    timestamp stay empty cells (skipped on read, P3). Timestamps must
    be whole seconds (the format's resolution — csv_extractor.py:158
    ``int(timestamp)*1000``); sub-second inputs raise. Series ids
    containing ';' would corrupt the unquoted layout and raise too.
    """
    hdr_rows = (
        dp.select("external_id", "name").distinct().collect()
    )  # schema axis: one row per series, parameter-sized
    headers = sorted(f"{r.external_id} : {r.name}" for r in hdr_rows)
    if any(";" in h for h in headers):
        raise ValueError("series ids containing ';' cannot be TEBIS-exported")

    bad = dp.where((F.col("ts_ms") % 1000) != 0).limit(1).collect()
    if bad:
        raise ValueError(
            f"TEBIS format has second resolution; got ts_ms={bad[0].ts_ms}"
        )

    ts_s = (F.col("ts_ms") / 1000).cast("long")
    chunk = (ts_s - (ts_s % chunk_seconds)).alias("chunk_ts")
    # Decimal-comma text; DOUBLE->string never itself contains ','.
    val_s = F.replace(
        F.col("value").cast("string"), F.lit("."), F.lit(",")
    )
    long_rows = dp.select(
        chunk,
        ts_s.cast("string").alias(TS_COL),
        _header(F.col("external_id"), F.col("name")).alias("hdr"),
        val_s.alias("v"),
    )
    wide = (
        long_rows.groupBy("chunk_ts", TS_COL)
        .pivot("hdr", headers)
        .agg(F.first("v"))
        .withColumn("_sort", F.lit(1))
    )
    units = (
        wide.select("chunk_ts")
        .distinct()
        .select(
            "chunk_ts",
            F.lit(UNITS_SENTINEL).alias(TS_COL),
            *[F.lit(unit).alias(h) for h in headers],
            F.lit(0).alias("_sort"),
        )
    )
    staging = str(Path(out_dir) / "_staging")
    (
        wide.unionByName(units)
        .repartition("chunk_ts")
        # try_cast: the units row's sentinel ts is not numeric and must
        # not blow up under the session's ANSI default; _sort already
        # forces it first.
        .sortWithinPartitions("chunk_ts", "_sort", F.expr(f"try_cast({TS_COL} AS BIGINT)"))
        .drop("_sort")
        .write.mode("overwrite")
        .partitionBy("chunk_ts")
        .options(sep=";", encoding="ISO-8859-1", header=True, emptyValue="", nullValue="")
        .csv(staging)
    )

    out = Path(out_dir)
    written: list[str] = []
    for d in sorted(Path(staging).glob("chunk_ts=*")):
        chunk_ts = d.name.split("=", 1)[1]
        parts = sorted(d.glob("part-*.csv"))
        for i, p in enumerate(parts):
            suffix = "" if len(parts) == 1 else f"-{i}"
            dest = out / f"{prefix}{suffix}_{chunk_ts}.csv"
            shutil.move(str(p), dest)
            written.append(str(dest))
    shutil.rmtree(staging, ignore_errors=True)
    return written
