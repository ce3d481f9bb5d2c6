"""Unified datapoints read facade — the serving surface of the store.

The reference SHIPS datapoints (csv_extractor.py:150-166) into a
time-series store whose read API is what users actually touch:
windowed raw reads, per-granularity aggregates (point-weighted and
time-weighted), and latest-value lookups. This module composes the
column-parameterized operators in ``operators.analytic`` into one
entry point over any long datapoints table (the ingest sink's layout:
``external_id, ts, value`` at minimum), so a reference user's read
patterns map 1:1.

Every path is a pure DataFrame composition: the range filter lands in
the parquet scan (partition/row-group pruning on a date-partitioned
or z-ordered sink), the series filter is an isin pushdown for
parameter-sized lists, and each aggregate mode costs the single
shuffle its operator documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.analytic import (
    datapoint_aggregates,
    time_weighted_aggregates,
)

MODES = ("raw", "aggregates", "time_weighted", "latest")


def read_datapoints(
    dp: DataFrame,
    series: list[str] | None = None,
    start=None,
    end=None,
    mode: str = "raw",
    granularity: str = "day",
    series_col: str = "external_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One read call for the store's serving patterns.

    - ``mode="raw"``: windowed scan, ordered per series.
    - ``mode="aggregates"``: count/sum/avg/min/max/first/last per
      (series, granularity) bucket.
    - ``mode="time_weighted"``: duration-weighted avg, continuous
      variance, total variation per bucket.
    - ``mode="latest"``: newest observation at-or-before ``end`` per
      series (max_by — no sort).

    ``start`` is inclusive, ``end`` exclusive (the reference's
    exclusive-bound idiom, S2); pass None to leave a side unbounded.
    ``series=None`` reads all series — at 100 TB prefer passing the
    parameter-sized list so the isin filter reaches the scan.
    """
    if mode not in MODES:
        raise ValueError(f"unknown read mode {mode!r}; expected one of {MODES}")
    out = dp
    if series is not None:
        out = out.where(F.col(series_col).isin(list(series)))
    if start is not None:
        out = out.where(F.col(ts_col) >= F.lit(start))
    if end is not None:
        out = out.where(F.col(ts_col) < F.lit(end))
    if mode == "raw":
        return out.select(series_col, ts_col, value_col).orderBy(series_col, ts_col)
    if mode == "aggregates":
        return datapoint_aggregates(
            out, granularity, series_col=series_col, ts_col=ts_col,
            value_col=value_col,
        ).withColumnRenamed("user_id", series_col)
    if mode == "time_weighted":
        return time_weighted_aggregates(
            out, series_col=series_col, ts_col=ts_col, value_col=value_col,
            granularity=granularity,
        ).withColumnRenamed("user_id", series_col)
    return (
        out.groupBy(series_col)
        .agg(
            F.max(ts_col).alias("latest_ts"),
            F.max_by(value_col, ts_col).alias("latest_value"),
        )
        .orderBy(series_col)
    )
