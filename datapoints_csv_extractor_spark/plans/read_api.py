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
    quantile_sketch,
    sketch_quantiles,
    time_weighted_aggregates,
)

MODES = ("raw", "aggregates", "time_weighted", "latest", "quantiles",
         "anomaly")


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
    - ``mode="quantiles"``: p50/p95/p99 per (series, granularity)
      bucket off the mergeable bin sketches — exact to one bin width,
      the rollup-friendly percentile read.
    - ``mode="anomaly"``: trailing-24 h z-score per point (exact
      centi-unit integer sums; the q_anomaly_zscore machinery,
      column-parameterized).

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
    if mode == "quantiles":
        daily = quantile_sketch(
            out.withColumn(
                "bucket",
                F.date_trunc(granularity, F.col(ts_col).cast("timestamp")),
            ),
            [series_col, "bucket"],
            value_col=value_col,
        )
        return sketch_quantiles(
            daily, [series_col, "bucket"], [0.5, 0.95, 0.99]
        ).orderBy(series_col, "bucket")
    if mode == "anomaly":
        from pyspark.sql import Window

        x = F.round(F.col(value_col) * 100).cast("long")
        epoch_s = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        w = (
            Window.partitionBy(series_col)
            .orderBy(epoch_s)
            .rangeBetween(-86400, -1)
        )
        n = F.count(F.lit(1)).over(w).cast("double")
        s = F.sum(x).over(w)
        q = F.sum(x * x).over(w)
        var_c = F.greatest((q - s * s / n) / n, F.lit(0.0))
        mean_v = s / n / F.lit(100.0)
        std_v = F.sqrt(var_c) / F.lit(100.0)
        z = (F.col(value_col) - mean_v) / std_v
        r4 = F.floor(z * 10000 + F.lit(0.5)) / F.lit(10000.0)
        return (
            out.select(
                series_col, ts_col, value_col,
                F.when((n >= 2) & (std_v > 0), r4).alias("zscore"),
            )
            .where(F.col("zscore").isNotNull())
            .withColumn("is_anomaly", F.abs(F.col("zscore")) > 3.0)
            .orderBy(series_col, ts_col)
        )
    return (
        out.groupBy(series_col)
        .agg(
            F.max(ts_col).alias("latest_ts"),
            F.max_by(value_col, ts_col).alias("latest_value"),
        )
        .orderBy(series_col)
    )
