"""Temporal / OLAP analytics beyond the reference's operator set.

The reference has no grouped analytics at all (SURVEY.md §2.6: its
aggregates are metrics-grade scalars), but a datapoints engine is used
through exactly these shapes — time-bucket rollups (the hypertable
pattern), sessionization, CUBE summaries, long->wide pivot, exact
percentiles, interval/range joins. All are built-in DataFrame ops;
every query here has a DuckDB oracle twin.

Scale notes per operator are inline; the common theme: one shuffle on
the declared grouping key, map-side partial aggregation, dimension
sides broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.relational import load

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_time_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows per event type (hypertable-style rollup).

    ``F.window`` is the native tumbling bucketizer; at 100 TB this is
    the standing pre-aggregation that turns raw events into a rollup
    table, and the bucket column doubles as the partition key for the
    rollup's layout. One shuffle, partial aggs map-side.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap.

    ``F.session_window`` merges events whose gaps are < 30 min; the
    window ends 30 min after the last event (pinned by the oracle's
    gaps-and-islands formulation: lag -> new-session flag -> running
    sum -> group). Scale: shuffle on user_id only; session merging is
    per-key and streaming-compatible (same expression works under
    ``withWatermark`` in Structured Streaming).
    """
    return session_window_agg(load(spark, sf_dir, "events"))


def session_window_agg(e: DataFrame) -> DataFrame:
    """Single-window sessionization over an events frame (the
    DataFrame-level form q_session_window and the skew bench share)."""
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_window_scalable(
    events: DataFrame, gap_minutes: int = 30, chunk: str = "hour"
) -> DataFrame:
    """Hot-key-safe exact sessionization — the two-phase answer to the
    one skew surface a per-user window cannot dodge: ONE user with a
    huge event history lands whole in one task under
    ``q_session_window``'s user-partitioned sort.

    Phase 1 chunks events by (user, time bucket) and sessionizes
    WITHIN each chunk (gaps-and-islands over the chunk — a hot user's
    day spreads across 24 hourly tasks). Chunk length must exceed the
    gap, so a session crossing a boundary is split between EXACTLY
    adjacent chunks. Phase 2 repairs the splits with the same
    gaps-and-islands trick one level up: a window over the per-chunk
    SESSION table (rows = sessions, bounded ~chunk_len/gap per chunk,
    orders of magnitude below events) chains sessions whose gap
    start - prev_last <= gap, then one aggregate merges each chain.
    Output and semantics are identical to the single-window form —
    it shares q_session_window's DuckDB oracle, which is the
    equivalence proof.
    """
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTE")
    ev = events.withColumn("chunk", F.date_trunc(chunk, F.col("ts")))
    w1 = Window.partitionBy("user_id", "chunk").orderBy("ts")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") <= F.lag("ts").over(w1) + gap, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "lsid",
        F.sum("new_session").over(
            w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    local = flagged.groupBy("user_id", "chunk", "lsid").agg(
        F.min("ts").alias("start"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
    )
    w2 = Window.partitionBy("user_id").orderBy("start")
    chained = local.withColumn(
        "new_chain",
        F.when(
            F.col("start") <= F.lag("last_ts").over(w2) + gap, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "chain",
        F.sum("new_chain").over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        chained.groupBy("user_id", "chain")
        .agg(
            F.min("start").alias("session_start"),
            (F.max("last_ts") + gap).alias("session_end"),
            F.sum("n").alias("n_events"),
            F.round(F.sum("s"), 2).alias("sum_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "sum_value"
        )
    )


def q_session_window_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: the two-phase sessionizer over the events
    stream — shares q_session_window's oracle (same output by
    construction)."""
    return session_window_scalable(load(spark, sf_dir, "events"))


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping sets in
    one pass (Expand -> single shuffle), the OLAP summary the reference
    computes piecemeal with driver-side counters."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot (T1's inverse): per-user value totals by event
    type. The pivot value list is EXPLICIT — with it, Spark skips the
    extra distinct-scan job and the output schema is stable; never
    pivot on unbounded cardinality at scale."""
    e = load(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in EVENT_TYPES]
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90 / p99) of order totalprice per
    orderpriority. Exact ``percentile`` needs the full value set per
    group (sort-based, memory ~ group size); the 100 TB path swaps in
    ``approx_percentile`` (t-digest sketch, mergeable map-side) —
    same call shape, documented trade."""
    o = load(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        o.groupBy("o_orderpriority")
        .agg(pct.alias("p"))
        .select(
            "o_orderpriority",
            F.round(F.col("p")[0], 2).alias("p50"),
            F.round(F.col("p")[1], 2).alias("p90"),
            F.round(F.col("p")[2], 2).alias("p99"),
        )
    )


def q_anomaly_mad(
    spark: SparkSession, sf_dir: str, cutoff: float = 3.5
) -> DataFrame:
    """Robust anomaly detection by modified z-score (Iglewicz-Hoaglin,
    public statistics practice): flag events where
    0.6745 * |value - median| / MAD > ``cutoff``. Unlike
    q_anomaly_zscore's mean/std, median and MAD don't move when the
    outliers themselves get bigger — the robustness an alerting
    pipeline needs when the contamination is exactly what it's
    hunting.

    Two grouped exact medians (value, then absolute deviation), each
    joined back to the scan as a types-sized broadcast. Exact
    ``percentile`` is sort-based per group; the 100 TB swap is
    ``approx_percentile`` (mergeable t-digest), same call shape — the
    q_percentiles trade, stated there."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("abs_dev", F.lit(0.5)).alias("mad")
    )
    z = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.abs(z) > cutoff)
        .select(
            "event_id",
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
            F.round(z, 4).alias("robust_z"),
        )
        .orderBy("event_type", "event_id")
    )


def q_feature_drift_ks(
    spark: SparkSession, sf_dir: str, alpha_c: float = 1.358
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event type: the
    max ECDF gap between the first half of the month and the rest —
    the nonparametric partner of q_distribution_drift_psi (PSI needs
    binning; KS sees ANY distributional change and comes with a
    significance cut, c(0.05)=1.358).

    Exactness discipline: one hash aggregate to (type, value,
    n_before, n_after) collapses ties, running INTEGER window sums
    build both ECDFs, and the statistic is max |cum1*n2 - cum2*n1| —
    all integer — divided once by n1*n2 at the end. The significance
    threshold uses sqrt (IEEE correctly-rounded, engine-safe unlike
    log/exp). Group cardinality is distinct values per type, not
    rows."""
    ev = load(spark, sf_dir, "events")
    before = (
        F.col("ts").cast("timestamp") < F.lit("2024-01-16").cast("timestamp")
    ).cast("long")
    pts = ev.groupBy("event_type", "value").agg(
        F.sum(before).alias("c1"),
        F.sum(1 - before).alias("c2"),
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = pts.select(
        "event_type",
        F.sum("c1").over(wv).alias("cum1"),
        F.sum("c2").over(wv).alias("cum2"),
        F.sum("c1").over(wt).alias("n1"),
        F.sum("c2").over(wt).alias("n2"),
    )
    gap = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    agg = cum.groupBy("event_type", "n1", "n2").agg(
        F.max(gap).alias("max_gap")
    )
    ks = F.col("max_gap") / (F.col("n1") * F.col("n2"))
    crit = F.lit(alpha_c) * F.sqrt(
        (F.col("n1") + F.col("n2")) / (F.col("n1") * F.col("n2"))
    )
    return agg.select(
        "event_type",
        F.col("n1").alias("n_before"),
        F.col("n2").alias("n_after"),
        F.round(ks, 6).alias("ks_stat"),
        (ks > crit).alias("drifted"),
    ).orderBy("event_type")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: events bucketed into generated 7-day
    intervals via ``start <= ts < end``.

    The interval dimension is tiny and broadcast, so the non-equi
    condition runs as BroadcastNestedLoopJoin — the right plan for
    few-intervals x many-facts. (Many-x-many range joins instead get
    bucketized to an equijoin on overlapping bucket ids — that
    pattern is what q_time_window_rollup's bucketing gives.)
    """
    e = load(spark, sf_dir, "events")
    weeks = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit("2024-01-01")),
                F.to_timestamp(F.lit("2024-01-29")),
                F.expr("INTERVAL 7 DAYS"),
            )
        ).alias("week_start")
    )
    weeks = weeks.withColumn("week_end", F.col("week_start") + F.expr("INTERVAL 7 DAYS"))
    return (
        e.join(
            F.broadcast(weeks),
            (F.col("ts") >= F.col("week_start")) & (F.col("ts") < F.col("week_end")),
        )
        .groupBy("week_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user trailing-1-hour moving average —
    the datapoints-smoothing shape (ROWS frames count rows; RANGE
    frames bound by VALUE distance, which is what time series need:
    irregular cadence means a fixed row count is a variable time
    span). Ordered by epoch seconds so the frame bound is numeric on
    both engines. One shuffle on user_id; the frame scan is a single
    ordered pass per partition."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), 4).alias("trailing_1h_avg"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    )


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embeddings table: slice, sort,
    element stats — all JVM higher-order/collection functions, the
    vector-column manipulation kit an embedding pipeline leans on.
    Shuffle-free scan->project."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    as_double = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(F.array_sort(as_double), -1), 4).alias("max_component"),
        F.round(F.element_at(F.array_sort(as_double), 1), 4).alias("min_component"),
        F.round(
            F.aggregate(F.slice(as_double, 1, 8), F.lit(0.0), lambda a, x: a + x), 4
        ).alias("head8_sum"),
        F.size(F.filter(as_double, lambda x: x > 0)).alias("n_positive"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form behind ROLLUP/CUBE:
    totals by status and, separately, by priority, in ONE pass (Expand
    duplicates each row per set -> single shuffle; two separate
    groupBys would scan and shuffle twice)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals via width_bucket: the
    single-pass distribution profile (one groupBy on the bucket id —
    contrast percentiles, which need per-group value sets). Bounds are
    literals so both engines bucket identically; the +2 buckets catch
    underflow/overflow."""
    o = load(spark, sf_dir, "orders")
    bucket = F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12))
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: distinct order statuses per
    priority as one sorted CSV cell. collect_set -> array_sort ->
    array_join is the DETERMINISTIC form (bare listagg/string_agg
    concatenates in arrival order, which differs per partitioning —
    a cross-engine hash would never match)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample + forward-fill (gap filling): each user's value series
    sampled onto a regular daily grid, carrying the last observation
    forward — THE canonical datapoints read pattern (irregular sensor
    cadence -> regular analytical grid).

    Same single-shuffle union+window plan as the as-of join: grid
    points and events union into one stream per user, one sort, and
    ``last(ignorenulls)`` carries values onto grid rows. Grid points
    with no prior observation stay NULL (left-asof semantics). At
    100 TB this beats a grid-to-events range join by never building
    the quadratic candidate space.
    """
    e = load(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    grid_ts = F.explode(
        F.sequence(
            F.to_timestamp(F.lit("2024-01-02")),
            F.to_timestamp(F.lit("2024-01-30")),
            F.expr("INTERVAL 1 DAY"),
        )
    ).alias("ts")
    grid = users.select("user_id", grid_ts).select(
        "user_id", "ts",
        F.lit(None).cast("double").alias("obs_value"), F.lit(1).alias("is_grid"),
    )
    obs = e.select(
        "user_id", "ts", F.col("value").alias("obs_value"), F.lit(0).alias("is_grid")
    )
    # Events sort before a grid point at the same instant (is_grid
    # ascending), so "at-or-before" includes them — ASOF >= semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.unionByName(obs)
        .select(
            "user_id", "ts", "is_grid",
            F.round(F.last("obs_value", ignorenulls=True).over(w), 2).alias("filled_value"),
        )
        .where(F.col("is_grid") == 1)
        .select("user_id", F.col("ts").alias("grid_ts"), "filled_value")
    )


def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: correlation, sample covariance
    and stddev of quantity vs extended price per return flag — one
    pass, map-side partials (all three are algebraic aggregates with
    constant-size state, the 100 TB-friendly kind)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
    )


def lttb_downsample(
    df: DataFrame,
    series_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_buckets: int = 50,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series — the
    standard algorithm a datapoints UI uses to draw a million-point
    series with a few hundred visually-faithful points (Steinarsson
    2013). Endpoints are kept; each interior bucket keeps the point
    maximizing the triangle area with the previously kept point and
    the next bucket's centroid.

    The selection is inherently sequential WITHIN a series (each
    choice depends on the previous kept point), so it cannot be a
    window expression; it is embarrassingly parallel ACROSS series,
    which is exactly applyInPandas' contract: one shuffle on the
    series key, then a per-group numpy pass. Group memory is one
    series (the same bound the reference's per-file pivot loop had,
    csv_extractor.py:92-160); series longer than executor memory
    would pre-split by time range first.

    Rows-only at the driver (no SQL twin for the sequential
    selection); pytest pins parity with a pure-Python reference.
    """

    def _lttb(pdf):
        import numpy as np
        import pandas as pd

        # Stable sort with a value tie-break: quicksort's arbitrary
        # order for duplicate timestamps would make area.argmax() (and
        # therefore the selected points) nondeterministic across runs.
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort").reset_index(
            drop=True
        )
        n = len(pdf)
        if n <= n_buckets:
            return pdf[[series_col, ts_col, value_col]]
        ts64 = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        # Bucket boundaries over the interior points [1, n-1).
        bounds = np.linspace(1, n - 1, n_buckets - 1).astype(np.int64)
        keep = [0]
        prev = 0
        for b in range(n_buckets - 2):
            lo, hi = bounds[b], bounds[b + 1]
            nxt_lo, nxt_hi = hi, (bounds[b + 2] if b + 2 < len(bounds) else n)
            cx = ts64[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else ts64[-1]
            cy = vals[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else vals[-1]
            # Triangle area vs (prev kept, candidate, next centroid).
            area = np.abs(
                (ts64[prev] - cx) * (vals[lo:hi] - vals[prev])
                - (ts64[prev] - ts64[lo:hi]) * (cy - vals[prev])
            )
            choice = lo + int(area.argmax())
            keep.append(choice)
            prev = choice
        keep.append(n - 1)
        return pdf.iloc[keep][[series_col, ts_col, value_col]]

    out_schema = df.select(series_col, ts_col, value_col).schema
    # AQE would coalesce this small-by-bytes shuffle to one task and
    # serialize the whole Arrow stage; see pin_grouped_parallelism.
    from .skew import pin_grouped_parallelism

    return (
        pin_grouped_parallelism(df.select(series_col, ts_col, value_col), series_col)
        .groupBy(series_col)
        .applyInPandas(_lttb, out_schema)
    )


def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: LTTB-downsample each user's event series to 20
    points (rows-only; parity with a pure-Python LTTB is pinned in
    pytest)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    return lttb_downsample(ev, n_buckets=20)


def q_m4_downsample(
    spark: SparkSession, sf_dir: str, bucket_s: int = 21600
) -> DataFrame:
    """M4 visual downsampling (Jugel et al., VLDB'14 — public
    literature): per (series, pixel-bucket), keep the four ACTUAL
    points a pixel-perfect line render needs — first, last, min, max
    — instead of LTTB's triangle heuristic (q_lttb_downsample covers
    that; M4 is the error-free variant dashboards use).

    All four picks are row_number()=1 under four orderings of ONE
    window partitioning (event_type, bucket): a single shuffle, then
    in-partition sorts; ties break on (ts, event_id) so the witness
    point is engine-deterministic. Output is long-form (one row per
    role) — a point winning several roles appears once per role, so
    every bucket contributes exactly four rows and the downsample
    ratio is fixed by construction. Scale: state per task is one
    bucket's points; buckets are time-bounded, so skew is bounded by
    the hottest (series, 6 h) cell, not the series size."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    bucket = F.floor(F.unix_timestamp("ts") / bucket_s)
    ev = ev.withColumn("bucket_start", (bucket * bucket_s).cast("long"))
    part = ["event_type", "bucket_start"]
    orders = {
        "first": [F.col("ts").asc(), F.col("event_id").asc()],
        "last": [F.col("ts").desc(), F.col("event_id").asc()],
        "min": [F.col("value").asc(), F.col("ts").asc(), F.col("event_id").asc()],
        "max": [F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()],
    }
    flagged = ev.select(
        "event_type",
        "bucket_start",
        "ts",
        "value",
        "event_id",
        *[
            F.row_number()
            .over(Window.partitionBy(*part).orderBy(*o))
            .alias(f"rn_{role}")
            for role, o in orders.items()
        ],
    )
    roles = F.array(
        *[
            F.when(F.col(f"rn_{role}") == 1, F.lit(role))
            for role in orders
        ]
    )
    return (
        flagged.select(
            "event_type",
            "bucket_start",
            F.explode(F.filter(roles, lambda r: r.isNotNull())).alias("role"),
            "ts",
            "value",
        )
        .orderBy("event_type", "bucket_start", "role", "ts")
    )


def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-lite decomposition of each event type's daily
    series: value = trend + seasonal(day-of-week) + residual — the
    classical-decomposition baseline (trend via centered 7-day moving
    average, seasonal via per-weekday means of the detrended series)
    that seasonality-aware monitors subtract before thresholding.

    Engine-exactness discipline (the q_seasonal_profile /
    q_discrete_variance pattern): daily partials are exact centi-unit
    integer sums, the trend is ONE division of two windowed integer
    sums (a count-weighted centered MA — no FP accumulation order
    anywhere), and the weekday-seasonal mean is a day-ordered
    sequential fold over collect_list (both engines sum the identical
    sequence), so every output double is bit-identical to the DuckDB
    oracle before the display rounding."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n_points"),
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    day_mean = F.col("s") / F.col("n_points") / 100.0
    trend = (
        F.sum("s").over(w7) / F.sum("n_points").over(w7) / 100.0
    )
    x = daily.select(
        "event_type",
        "day",
        "n_points",
        day_mean.alias("day_mean"),
        trend.alias("trend"),
        (day_mean - trend).alias("detrended"),
        F.dayofweek("day").alias("dow"),
    )
    wdow = Window.partitionBy("event_type", "dow")
    ordered = F.array_sort(
        F.collect_list(F.struct("day", "detrended")).over(wdow)
    )
    fold = F.aggregate(
        ordered,
        F.lit(0.0).cast("double"),
        lambda acc, r: acc + r["detrended"],
    )
    seasonal = fold / F.count(F.lit(1)).over(wdow)
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000.0  # noqa: E731
    return (
        x.select(
            "event_type",
            "day",
            "n_points",
            r4(F.col("day_mean")).alias("day_mean"),
            r4(F.col("trend")).alias("trend"),
            r4(seasonal).alias("seasonal"),
            r4(F.col("detrended") - seasonal).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


def datapoint_aggregates(
    df: DataFrame,
    granularity: str = "day",
    series_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The standard point-weighted datapoints-API aggregate set per
    (series, granularity) bucket: count / sum / avg / min / max /
    first / last — what the reference's downstream (a time-series
    store) serves for every granularity the caller asks for
    (minute/hour/day/week named units). One map-side-combined
    groupBy; first/last use min_by / max_by on the timestamp (unique
    per series in this data, so the pick is deterministic)."""
    if granularity not in ("minute", "hour", "day", "week"):
        raise ValueError(f"unsupported granularity: {granularity!r}")
    day = F.date_trunc(granularity, F.col(ts_col)).alias("day")
    ev = df.select(
        F.col(series_col).alias("user_id"),
        day,
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    return (
        ev.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.min_by("value", "ts").alias("first_value"),
            F.max_by("value", "ts").alias("last_value"),
        )
        .orderBy("user_id", "day")
    )


def q_datapoint_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: daily point-weighted aggregate set over events."""
    return datapoint_aggregates(load(spark, sf_dir, "events"), "day")


def q_datapoint_aggregates_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: the same read at hourly granularity — pins that
    the granularity parameter really re-buckets (the datapoints API's
    core query axis)."""
    return datapoint_aggregates(load(spark, sf_dir, "events"), "hour")


def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling: each user's series sampled onto
    a regular daily grid, interpolating BETWEEN the surrounding
    observations (the datapoints-API 'interpolation' aggregate, next
    to q_gap_fill's step/'stepInterpolation' forward-fill).

    Same single-shuffle union+window plan as gap_fill/as-of: grid and
    events union into one per-user stream, ONE sort, then last()
    ignorenulls looking back and first() ignorenulls looking forward
    fetch the bracketing (ts, value) pairs — never a grid-to-events
    range join (quadratic candidate space). Grid points outside the
    observed range stay NULL (no extrapolation).
    """
    e = load(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    grid_ts = F.explode(
        F.sequence(
            F.to_timestamp(F.lit("2024-01-02")),
            F.to_timestamp(F.lit("2024-01-30")),
            F.expr("INTERVAL 1 DAY"),
        )
    ).alias("ts")
    grid = users.select("user_id", grid_ts).select(
        "user_id", "ts",
        F.lit(None).cast("double").alias("obs_value"), F.lit(1).alias("is_grid"),
    )
    obs = e.select(
        "user_id", "ts", F.col("value").alias("obs_value"), F.lit(0).alias("is_grid")
    )
    both = grid.unionByName(obs)
    # Events sort before grid points at the same instant, so a
    # coincident observation is the 'previous' bracket and the
    # interpolation collapses to its exact value.
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("obs_value", ignorenulls=True).over(back)
    next_v = F.first("obs_value", ignorenulls=True).over(fwd)
    prev_t = F.last(
        F.when(F.col("is_grid") == 0, F.col("ts")), ignorenulls=True
    ).over(back)
    next_t = F.first(
        F.when(F.col("is_grid") == 0, F.col("ts")), ignorenulls=True
    ).over(fwd)
    # Microsecond-exact epochs (unix_micros / DuckDB epoch_us), NOT
    # unix_timestamp: second-truncated epochs drop the observations'
    # sub-second offsets, which shifts the interpolation weights enough
    # to flip the 2-decimal rounding on ~10% of grid points vs the
    # oracle's fractional epoch() arithmetic.
    t_s = F.unix_micros(F.col("ts").cast("timestamp"))
    pt_s = F.unix_micros(prev_t.cast("timestamp"))
    nt_s = F.unix_micros(next_t.cast("timestamp"))
    interp = F.when(nt_s == pt_s, prev_v).otherwise(
        prev_v + (next_v - prev_v) * (t_s - pt_s) / (nt_s - pt_s)
    )
    # Window columns are computed BEFORE the grid filter (the filter
    # would otherwise remove the observation rows the frames read —
    # windows evaluate over their input frame, not the pre-filter one).
    return (
        both.select(
            "user_id",
            "ts",
            "is_grid",
            F.round(interp, 2).alias("interp_value"),
        )
        .where(F.col("is_grid") == 1)
        .select("user_id", "ts", "interp_value")
    )


def time_weighted_aggregates(
    df: DataFrame,
    series_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    granularity: str = "day",
) -> DataFrame:
    """Time-weighted datapoints aggregates per (series, granularity)
    bucket (named calendar units: minute/hour/day/week — the read
    API's granularity parameter):
    duration-weighted average, continuous variance, and total
    variation — the half of the standard datapoints-API aggregate set
    that ``q_datapoint_aggregates``'s point-weighted half cannot serve
    (irregular sensor cadence makes point averages biased toward
    burst periods; the time-weighted forms integrate the linearly
    interpolated series instead).

    Plan: ONE window shuffle on the series key builds consecutive-point
    segments (lag), each segment is clipped to the day buckets it
    overlaps (``sequence`` + ``explode`` — a segment spanning k days
    yields k clipped pieces, so no range join and no quadratic
    candidate space), and ONE groupBy on (series, day) folds the
    per-piece closed forms:

      - piece duration        dur  = B - A            (epoch micros)
      - integral of v dt      ivdt = (va + vb)/2 * dur
      - integral of v^2 dt    iv2  = (va^2 + va*vb + vb^2)/3 * dur
      - variation             |vb - va|   (linear pieces are monotone)

    with va/vb the interpolated values at the clip points. Then
    tw_avg = sum(ivdt)/sum(dur) and
    cont_var = sum(iv2)/sum(dur) - tw_avg^2 (exact for a piecewise
    linear integrand). Buckets whose every piece is zero-length are
    dropped (HAVING coverage > 0) so no engine-specific 0/0 value
    appears. Both stages are algebraic aggregates with constant state:
    map-side partials all the way, scale-linear at 100 TB.

    Reference analog: the reference only SHIPS datapoints
    (csv_extractor.py:150-166); these are the aggregates its
    downstream time-series store serves on read.
    """
    if granularity not in ("minute", "hour", "day", "week"):
        raise ValueError(f"unsupported granularity: {granularity!r}")
    step = F.expr(f"INTERVAL 1 {granularity.upper()}")
    s, t, v = F.col(series_col), F.col(ts_col), F.col(value_col)
    w = Window.partitionBy(series_col).orderBy(ts_col)
    seg = df.select(
        s.alias("series"),
        F.lag(t).over(w).alias("t0"),
        F.lag(v).over(w).alias("v0"),
        t.alias("t1"),
        v.alias("v1"),
    ).where(F.col("t0").isNotNull())
    day = F.explode(
        F.sequence(
            F.date_trunc(granularity, F.col("t0")),
            F.date_trunc(granularity, F.col("t1")),
            step,
        )
    ).alias("day")
    pieces = seg.select("series", "t0", "v0", "t1", "v1", day)
    # .cast("timestamp"): events.ts is TIMESTAMP_NTZ and unix_micros
    # only takes TIMESTAMP (session UTC, so the cast is lossless).
    T0 = F.unix_micros(F.col("t0").cast("timestamp"))
    T1 = F.unix_micros(F.col("t1").cast("timestamp"))
    A = F.greatest(T0, F.unix_micros(F.col("day").cast("timestamp")))
    B = F.least(T1, F.unix_micros((F.col("day") + step).cast("timestamp")))
    # Interpolated values at the clip points; a zero-length segment
    # (duplicate timestamps) degenerates to its endpoints' values.
    dt = T1 - T0
    va = F.when(dt == 0, F.col("v0")).otherwise(
        F.col("v0") + (F.col("v1") - F.col("v0")) * (A - T0) / dt
    )
    vb = F.when(dt == 0, F.col("v1")).otherwise(
        F.col("v0") + (F.col("v1") - F.col("v0")) * (B - T0) / dt
    )
    dur = (B - A) / F.lit(1000000.0)
    clipped = pieces.select(
        "series",
        "day",
        dur.alias("dur"),
        ((va + vb) / 2 * dur).alias("ivdt"),
        ((va * va + va * vb + vb * vb) / 3 * dur).alias("iv2dt"),
        F.abs(vb - va).alias("tv"),
    )
    cov = F.sum("dur")
    tw_avg = F.sum("ivdt") / cov
    cont_var = F.sum("iv2dt") / cov - tw_avg * tw_avg
    return (
        clipped.groupBy("series", "day")
        .agg(
            F.round(cov, 6).alias("coverage_sec"),
            F.round(tw_avg, 4).alias("tw_avg"),
            # + 0.0: a zero-variance bucket can assemble to -1 ulp and
            # round to IEEE -0.0 in one engine but 0.0 in the other.
            (F.round(cont_var, 4) + F.lit(0.0)).alias("cont_var"),
            F.round(F.sum("tv"), 4).alias("total_variation"),
        )
        .where(F.col("coverage_sec") > 0)
        .orderBy("series", "day")
        .withColumnRenamed("series", "user_id")
    )


def q_time_weighted_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: time-weighted aggregate set over the events
    table per (user, day)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    return time_weighted_aggregates(ev)


def q_time_weighted_aggregates_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: the time-weighted read at hourly granularity —
    segments fan out to ~10x more clipped pieces (mean inter-point gap
    >> 1 h), exercising the Generate clipping path under real
    expansion."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    return time_weighted_aggregates(ev, granularity="hour")


def q_discrete_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datapoints-API 'discreteVariance' aggregate: population
    variance of the OBSERVED points per (series, day) — the
    point-weighted partner of ``time_weighted_aggregates``'s
    continuous variance. Algebraic (count / sum / sum-of-squares
    state), so one map-side-combined shuffle.

    Cross-engine exactness: built-in var_pop implementations disagree
    at the 4th decimal (Spark's incremental central moments vs the
    oracle's formula — observed 485.4167 vs 485.4166), so the sums are
    accumulated as EXACT integers over centi-units (the data is
    2-decimal) and the variance assembled from them with one fixed
    double expression — identical bit-for-bit in both engines, the
    same exact-integer-accumulation pattern as the quality
    classifier's margin (curation.py)."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    x = F.round(F.col("value") * 100).cast("long")  # centi-units, exact
    agg = ev.select("user_id", day.alias("day"), x.alias("x")).groupBy(
        "user_id", "day"
    ).agg(
        F.count("*").alias("n_points"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    n = F.col("n_points").cast("double")
    # greatest(..., 0): a zero-variance bucket can assemble to -1 ulp
    # (n^2*x^2/n is an inexact double division), and sqrt(-eps) is
    # engine-divergent (NaN vs error).
    disc_var = F.greatest(
        (F.col("q") - F.col("s") * F.col("s") / n) / n / F.lit(10000.0), F.lit(0.0)
    )
    # floor(x*1e4 + 0.5), not round(x, 4): centi-unit rationals land
    # exactly on .00005 boundaries (e.g. n=2 -> d^2/40000), where the
    # engines' rounding modes diverge (HALF_UP vs half-even). floor of
    # the identical double is identical.
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)
    return (
        agg.select(
            "user_id",
            "day",
            "n_points",
            r4(disc_var).alias("disc_var"),
            r4(F.sqrt(disc_var)).alias("disc_stddev"),
        )
        .orderBy("user_id", "day")
    )


def synthetic_datapoints(
    df: DataFrame,
    pairs: list[tuple[int, int, int]],
    series_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    combine=None,
) -> DataFrame:
    """Synthetic time series: evaluate an expression over two source
    series aligned at the UNION of their timestamps, linearly
    interpolating whichever series is not sampled at that instant —
    the datapoints-API 'synthetic datapoints' read (e.g. sensorA +
    sensorB when the sensors report on unrelated cadences).

    ``pairs`` is a parameter-sized list of (pair_id, series_a,
    series_b); it becomes a broadcast membership join, so a series
    feeding many synthetic expressions just fans out. Alignment is the
    repo's standard single-sort shape: both series' observations union
    into ONE stream per pair (columns va/vb, null where the row is the
    other series') and two back/fwd window passes per side fetch the
    bracketing (ts, value) pairs — never a series-to-series range
    join. Every observation instant of either series yields one output
    row; coincident-instant duplicates collapse via distinct (their
    computed values are identical by construction). The window order
    carries the unique ``id_col`` as final tie-break so duplicate
    timestamps order identically in any engine.

    ``combine(a, b)`` defaults to a + b. Output outside the overlap of
    the two series' observed ranges is dropped (no extrapolation).
    """
    if combine is None:
        combine = lambda a, b: a + b
    spark = df.sparkSession
    pairs_df = spark.createDataFrame(
        [(p, a, "a") for p, a, _ in pairs] + [(p, b, "b") for p, _, b in pairs],
        "pair_id int, member_id long, role string",
    )
    obs = (
        df.select(
            F.col(series_col).alias("member_id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("v"),
            F.col(id_col).alias("row_id"),
        )
        .join(F.broadcast(pairs_df), "member_id")
        .select(
            "pair_id",
            "ts",
            "row_id",
            F.when(F.col("role") == "a", F.col("v")).alias("va"),
            F.when(F.col("role") == "b", F.col("v")).alias("vb"),
        )
    )
    back = (
        Window.partitionBy("pair_id")
        .orderBy("ts", "row_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("pair_id")
        .orderBy("ts", "row_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))

    def interp(col):
        pv = F.last(col, ignorenulls=True).over(back)
        nv = F.first(col, ignorenulls=True).over(fwd)
        pt = F.last(F.when(col.isNotNull(), t_us), ignorenulls=True).over(back)
        nt = F.first(F.when(col.isNotNull(), t_us), ignorenulls=True).over(fwd)
        return F.when(nt == pt, pv).otherwise(
            pv + (nv - pv) * (t_us - pt) / (nt - pt)
        )

    a_i, b_i = interp(F.col("va")), interp(F.col("vb"))
    return (
        obs.select(
            "pair_id",
            "ts",
            F.round(combine(a_i, b_i), 2).alias("synth_value"),
        )
        .where(F.col("synth_value").isNotNull())
        .distinct()
        .orderBy("pair_id", "ts")
    )


def q_synthetic_datapoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: sum-of-two-series synthetic datapoints for five
    user pairs of the events table."""
    ev = load(spark, sf_dir, "events")
    pairs = [(i, 2 * i - 1, 2 * i) for i in range(1, 6)]
    return synthetic_datapoints(ev, pairs)


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    series_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy funnel analysis: how far each user progresses through an
    ordered stage sequence (earliest-accept semantics — stage k+1 must
    occur STRICTLY after the accepted stage-k event).

    One shuffle total: per-user events collect into an array (bounded
    per-user cardinality — the sessionized shape), ``array_sort``
    orders it, and a JVM ``aggregate`` HOF walks it as a state machine
    carrying (stage, last_accept_ts). No per-stage self-join cascade
    (the textbook SQL needs one join per stage, each a shuffle; at
    100 TB with a 5-stage funnel that is 5 shuffles vs this plan's 1).
    The strict ts inequality makes the result independent of how
    coincident-timestamp events tie-break in the sort.
    """
    stage_lit = F.array(*[F.lit(s) for s in stages])
    events = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")))
    )
    walk = F.aggregate(
        events,
        F.struct(
            F.lit(0).alias("stage"),
            # Match the source ts type (TIMESTAMP vs TIMESTAMP_NTZ)
            # so the state struct unifies with the event struct.
            F.lit(None).cast(dict(df.dtypes)[ts_col]).alias("last_ts"),
        ),
        lambda acc, ev: F.when(
            (acc["stage"] < F.size(stage_lit))
            & (ev["t"] == F.element_at(stage_lit, acc["stage"] + 1))
            & (acc["last_ts"].isNull() | (ev["ts"] > acc["last_ts"])),
            F.struct((acc["stage"] + 1).alias("stage"), ev["ts"].alias("last_ts")),
        ).otherwise(acc),
        lambda acc: acc["stage"],
    )
    return (
        df.groupBy(series_col)
        .agg(walk.alias("funnel_stage"))
        .orderBy(series_col)
    )


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: view -> click -> purchase funnel progression per
    user over the events table."""
    ev = load(spark, sf_dir, "events")
    return funnel_stages(ev, ["view", "click", "purchase"])


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    again in each later week — the canonical activation/retention
    matrix.

    Plan: distinct (user, week) pairs (one shuffle, map-side
    combined), per-user cohort week via a min window over the SAME
    user-keyed partitioning (no second shuffle — the distinct already
    clustered by user since user leads the key), then one groupBy on
    (cohort_week, week_offset). Retention is emitted as counts, not
    ratios, so the oracle compares exact integers.
    """
    e = load(spark, sf_dir, "events")
    uw = (
        e.select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .distinct()
    )
    cohort = Window.partitionBy("user_id")
    with_cohort = uw.withColumn("cohort_week", F.min("week").over(cohort))
    offset = F.datediff(F.col("week"), F.col("cohort_week")) / 7
    return (
        with_cohort.select(
            "cohort_week", offset.cast("int").alias("week_offset"), "user_id"
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup: 7-day windows sliding by 1 day, per
    event type — the trailing-week dashboard aggregate.

    ``F.window(ts, "7 days", "1 day")`` expands each event into its 7
    covering windows (an Expand node — fan-out 7, the slide ratio)
    before ONE shuffle on (window, type); the 100 TB cost model is
    explicit: slide ratio multiplies shuffle volume, so wide windows
    with tiny slides belong in a two-level rollup (1-day tumbling
    pre-agg -> 7-day reduce). At this ratio the direct form wins.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "7 days", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def q_sliding_window_rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path twin of ``q_sliding_window_rollup``: identical
    output, different cost model. Instead of Expanding every event
    into its windows/slide covering windows (shuffle volume x7 here,
    x(window/slide) in general), events pre-aggregate into 1-day
    tumbling buckets FIRST (one shuffle, map-side partials, output =
    days x types rows), and each 7-day window start then sums its 7
    covering buckets with a RANGE-frame window over epoch days.

    The bucket table joins a generated full day-grid per type so
    window starts whose own day is empty (but whose later days are
    not) still appear — the Expand form emits those; a gaps-and-
    islands range frame alone would not. The grid is days x types
    (tiny at any corpus scale: time x schema, not data volume) and
    broadcasts.

    Crossover: Expand wins while (window/slide) x event_row_bytes <
    bucket_cardinality costs; two-level wins at 100 TB where the x7
    shuffle dwarfs the days x types bucket table. Output equality is
    pinned by sharing the Expand twin's DuckDB oracle.
    """
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    buckets = e.groupBy(day, "event_type").agg(
        F.count(F.lit(1)).alias("b_n"), F.sum("value").alias("b_sum")
    )
    types = [r[0] for r in buckets.select("event_type").distinct().collect()]
    # Join-free grid: two explodes from one literal row (days x types
    # both parameter-sized), so no nested-loop join ever appears.
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit("2023-12-26")),
                    F.to_timestamp(F.lit("2024-01-30")),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day")
        )
        .select(
            "day",
            F.explode(F.array(*[F.lit(t) for t in types])).alias("event_type"),
        )
    )
    full = F.broadcast(grid).join(
        buckets.withColumn("day", F.col("day").cast("timestamp")),
        ["day", "event_type"],
        "left",
    )
    epoch_day = (F.unix_micros(F.col("day").cast("timestamp")) / 86_400_000_000).cast(
        "long"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(epoch_day)
        .rangeBetween(Window.currentRow, 6)
    )
    return (
        full.select(
            F.col("day").alias("window_start"),
            "event_type",
            F.sum("b_n").over(w).alias("n_events"),
            F.round(F.sum("b_sum").over(w), 2).alias("sum_value"),
        )
        .where(F.col("n_events").isNotNull())
        .orderBy("window_start", "event_type")
    )


def q_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup via HLL sketches: per-(day,
    type) user sketches union into per-type monthly distincts —
    the pre-aggregation shape EXACT distinct cannot provide (distinct
    counts don't add; sketches do). At 100 TB this is how a standing
    daily rollup serves any ad-hoc coarser granularity without
    re-scanning raw events: store ~1.5 KB binary sketches per bucket,
    union at query time. Rows-only (sketch estimates have no SQL
    twin); the relative-error bound vs exact countDistinct is pinned
    in pytest."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    daily = ev.groupBy(day, "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_daily_buckets"),
        )
        .orderBy("event_type")
    )


def q_latest_datapoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datapoints-API 'latest' endpoint: newest observation per
    series in one max_by/min-state aggregate — constant state per
    series, map-side combined; at 100 TB this beats the
    window-row_number formulation (no sort, no full-row shuffle)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("latest_ts"),
            F.max_by("value", "ts").alias("latest_value"),
        )
        .orderBy("user_id")
    )


def q_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datapoints-API 'derivative' read: per-point rate of change
    (value units per second) from the previous observation — one lag
    window per series, no shuffle beyond it. Duplicate-timestamp
    segments yield NULL (undefined slope) rather than a division
    blow-up; epoch microseconds keep the denominators exact."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    dt_us = t - F.lag(t).over(w)
    dv = F.col("value") - F.lag("value").over(w)
    deriv = F.when(dt_us > 0, dv / (dt_us / F.lit(1_000_000.0)))
    return (
        ev.select(
            "user_id",
            "ts",
            # + 0.0 canonicalizes IEEE negative zero: round() of a tiny
            # negative slope yields -0.0 in one engine and 0.0 in the
            # other, which value-hashes differently.
            (F.round(deriv, 6) + F.lit(0.0)).alias("deriv_per_sec"),
        )
        .where(F.col("deriv_per_sec").isNotNull())
        .orderBy("user_id", "ts")
    )


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly flags: each observation scored
    against the mean/std of its series' PRECEDING 24 h (current row
    excluded — the score must not see itself). RANGE frame on epoch
    seconds (irregular cadence: row-count frames are the wrong
    window), one shuffle on the series key.

    Cross-engine exactness: window mean/std assemble from exact
    centi-unit integer sums (n, s, q) with one fixed double
    expression and floor-rounding — built-in window stddev diverges
    at the 4th decimal between engines (same pitfall as
    q_discrete_variance). Scores only exist where the trailing window
    holds >= 2 points and has nonzero spread.
    """
    ev = load(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    epoch_s = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-86400, -1)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    s = F.sum(x).over(w)
    q = F.sum(x * x).over(w)
    var_c = F.greatest((q - s * s / n) / n, F.lit(0.0))  # centi-units^2
    mean_v = s / n / F.lit(100.0)
    std_v = F.sqrt(var_c) / F.lit(100.0)
    z = (F.col("value") - mean_v) / std_v
    r4 = F.floor(z * 10000 + F.lit(0.5)) / F.lit(10000.0)
    return (
        ev.select(
            "user_id",
            "ts",
            "value",
            F.when((n >= 2) & (std_v > 0), r4).alias("zscore"),
        )
        .where(F.col("zscore").isNotNull())
        .select(
            "user_id", "ts", "value", "zscore",
            (F.abs(F.col("zscore")) > 3.0).alias("is_anomaly"),
        )
        .orderBy("user_id", "ts")
    )


def q_funnel_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for users completing the full view -> click ->
    purchase funnel: seconds from the ACCEPTED view to the ACCEPTED
    purchase (greedy earliest-accept, same machine as
    ``funnel_stages`` with the state widened to carry the first
    accept's timestamp). Still one collect_list shuffle — the oracle
    pays one join per stage for the same numbers."""
    stages = ["view", "click", "purchase"]
    stage_lit = F.array(*[F.lit(s) for s in stages])
    ev = load(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    events = F.array_sort(
        F.collect_list(F.struct(F.col("ts").alias("ts"), F.col("event_type").alias("t")))
    )
    walk = F.aggregate(
        events,
        F.struct(
            F.lit(0).alias("stage"),
            F.lit(None).cast(ts_type).alias("last_ts"),
            F.lit(None).cast(ts_type).alias("first_ts"),
        ),
        lambda acc, e: F.when(
            (acc["stage"] < F.size(stage_lit))
            & (e["t"] == F.element_at(stage_lit, acc["stage"] + 1))
            & (acc["last_ts"].isNull() | (e["ts"] > acc["last_ts"])),
            F.struct(
                (acc["stage"] + 1).alias("stage"),
                e["ts"].alias("last_ts"),
                F.coalesce(acc["first_ts"], e["ts"]).alias("first_ts"),
            ),
        ).otherwise(acc),
    )
    done = F.col("w")["stage"] == len(stages)
    secs = (
        F.unix_micros(F.col("w")["last_ts"].cast("timestamp"))
        - F.unix_micros(F.col("w")["first_ts"].cast("timestamp"))
    ) / F.lit(1_000_000.0)
    return (
        ev.groupBy("user_id")
        .agg(walk.alias("w"))
        .where(done)
        .select("user_id", F.round(secs, 6).alias("convert_sec"))
        .orderBy("user_id")
    )


def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user (the behavioral-model estimation read): one lag
    window on the user key, one map-side-combined groupBy over at
    most |types|^2 cells. Unique event_id tie-break keeps
    coincident-timestamp ordering engine-identical."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


def markov_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
) -> DataFrame:
    """Markov-chain (removal-effect) attribution — the data-driven
    model that replaces q_attribution_credit's positional heuristics
    (first/last/linear credit assume the answer; the Markov model
    MEASURES each channel's causal contribution as how much the
    conversion probability drops when the channel is removed from
    the journey graph; Anderl et al. 2014, the standard industry
    formulation).

    Journeys: per user, the event stream splits at each conversion
    (exclusive prefix count of conversions = journey id); within a
    journey every non-conversion event is a channel touch, the
    conversion is the absorbing CONV state, and a journey that ends
    without converting absorbs into NULL. Transitions (START ->
    first touch, touch -> touch, touch -> CONV/NULL, last-touch ->
    NULL) are counted distributed — one lag window on the user key
    plus one groupBy over at most (|types|+2)^2 cells — and ONLY the
    parameter-sized transition matrix reaches the driver (the PCA
    gram-partial pattern), where an O(k^3) absorption solve (k <=
    |types|) computes P(CONV | START) for the full chain and for
    each single-channel-removed chain (removal redirects the
    channel's inbound mass to NULL). Rows-only: the linear solve has
    no SQL twin; pinned in pytest against an independent
    power-iteration replica and a planted must-pass/never-pass
    corpus."""
    import numpy as np

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_conv = (F.col("event_type") == conversion_type).cast("long")
    rows = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.coalesce(
            F.sum(is_conv).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("journey"),
    )
    jw = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    state = F.when(
        F.col("event_type") == conversion_type, F.lit("CONV")
    ).otherwise(F.col("event_type"))
    stepped = rows.select(
        "user_id",
        "journey",
        state.alias("to_state"),
        F.coalesce(F.lag(state).over(jw), F.lit("START")).alias(
            "from_state"
        ),
        F.row_number()
        .over(
            Window.partitionBy("user_id", "journey").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        )
        .alias("rn_last"),
    )
    inner = stepped.select("from_state", "to_state")
    # Non-converting journeys: their last row absorbs into NULL.
    tail = stepped.where(
        (F.col("rn_last") == 1) & (F.col("to_state") != "CONV")
    ).select(
        F.col("to_state").alias("from_state"),
        F.lit("NULL").alias("to_state"),
    )
    counts = (
        inner.unionByName(tail)
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    # Driver side: parameter-sized absorbing-chain solve.
    trans: dict[str, dict[str, int]] = {}
    for r in counts:
        trans.setdefault(r["from_state"], {})[r["to_state"]] = r["n"]
    channels = sorted(
        s for s in set(trans) | {t for d in trans.values() for t in d}
        if s not in ("CONV", "NULL", "START")
    )

    def p_conv(removed: str | None) -> float:
        states = ["START"] + [c for c in channels if c != removed]
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        q = np.zeros((k, k))
        b = np.zeros(k)
        for s in states:
            out = trans.get(s, {})
            tot = sum(out.values())
            if tot == 0:
                continue
            for t, n in out.items():
                p = n / tot
                if t == "CONV":
                    b[idx[s]] += p
                elif t in idx:
                    q[idx[s], idx[t]] += p
                # else: t removed or NULL -> absorbed, no conversion
        return float(np.linalg.solve(np.eye(k) - q, b)[idx["START"]])

    p_full = p_conv(None)
    effects = []
    for c in channels:
        re_c = 0.0 if p_full == 0.0 else 1.0 - p_conv(c) / p_full
        effects.append((c, max(re_c, 0.0)))
    tot_re = sum(e for _, e in effects)
    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (
                c,
                round(re_c, 6),
                round(re_c / tot_re, 6) if tot_re > 0 else 0.0,
                round(p_full, 6),
            )
            for c, re_c in effects
        ],
        "channel string, removal_effect double, "
        "attribution_share double, p_conv_full double",
    ).orderBy("channel")


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution over the events stream (conversion
    = 'purchase'). Rows-only; the transition-count layer is the
    oracle-backed q_event_transition_matrix's shape, and pytest pins
    the solve against a power-iteration replica plus planted
    journeys with known effects."""
    return markov_attribution(load(spark, sf_dir, "events"))


def q_interevent_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-user inter-event gaps in logarithmic
    buckets (the cadence profile a capacity planner reads): lag diff
    in seconds, bucketed by floor(log10) — lag window + one tiny
    groupBy; exact integer second arithmetic so the bucket edges are
    engine-identical."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = t - F.lag(t).over(w)
    gap_s = (gap_us / F.lit(1_000_000.0))
    bucket = F.when(gap_us <= 0, F.lit(-1)).otherwise(
        F.floor(F.log10(gap_s)).cast("int")
    )
    gaps = ev.select(bucket.alias("log10_bucket")).where(
        F.col("log10_bucket").isNotNull()
    )
    return (
        gaps.groupBy("log10_bucket")
        .agg(F.count("*").alias("n_gaps"))
        .orderBy("log10_bucket")
    )


def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series (the persistence diagnostic a
    forecasting pipeline reads before model choice): Pearson r over
    consecutive (value_prev, value) pairs from one lag window, then
    one per-series aggregate.

    Cross-engine exactness: the same centi-unit integer-sum assembly
    as q_discrete_variance — n, Σx, Σy, Σxy, Σx², Σy² are exact
    longs, r is one fixed double expression, floor-rounded; built-in
    corr() diverges between engines at the 4th decimal. Series whose
    either side has zero variance emit no row (r undefined)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.round(F.lag("value").over(w) * 100).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    pairs = ev.select("user_id", x.alias("x"), y.alias("y")).where(
        F.col("x").isNotNull()
    )
    agg = pairs.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    r = cov / F.sqrt(vx * vy)
    r4 = F.floor(r * 10000 + F.lit(0.5)) / F.lit(10000.0) + F.lit(0.0)
    return (
        agg.where((F.col("n") >= 2) & (vx > 0) & (vy > 0))
        .select("user_id", F.col("n").alias("n_pairs"), r4.alias("autocorr_lag1"))
        .orderBy("user_id")
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    bin_width: float = 1.0,
) -> DataFrame:
    """Mergeable quantile sketch partials: per-group equi-width bin
    counts. The quantile analog of the HLL rollup
    (``q_hll_distinct_rollup``): a (group, bin, count) table is a
    SKETCH — tiny (value-range/bin_width rows per group, independent
    of row count), additive under sum, so daily partials roll up to
    any coarser period without re-touching raw data, and any quantile
    read off the merged sketch is exact to within one bin width."""
    b = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    return df.groupBy(*group_cols, b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )


def sketch_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    bin_width: float = 1.0,
) -> DataFrame:
    """Read quantiles off (merged) sketch partials: cumulative-count
    walk per group, first bin whose cumulative count reaches
    ceil(q * total). One window over the SKETCH table (bounded bins
    per group, never raw rows) — the whole serving cost is
    O(groups x bins). Estimates are bin midpoints: error <=
    bin_width / 2, deterministic, engine-exact (pure integer
    cumulative sums — no interpolation float paths)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = F.sum("n").over(w)
    total = F.sum("n").over(tot)
    mid = (F.col("bin") * F.lit(bin_width) + F.lit(bin_width / 2.0))
    walked = sketch.select(
        *group_cols, "bin", cum.alias("cum"), total.alias("total"), mid.alias("mid")
    )
    aggs = [
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")), F.col("mid"))
        ).alias(f"p{int(q * 100)}_est")
        for q in qs
    ]
    return walked.groupBy(*group_cols).agg(
        F.max("total").alias("n_points"), *aggs
    )


def q_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-event-type quantile sketches merged to the month,
    then p50/p95/p99 read off the merged sketch — the mergeable
    pre-aggregation pattern for latency-percentile-style dashboards:
    100 TB of raw points fold once into per-day sketches; every
    coarser rollup (week, month, all-time) is a sum over sketches.
    Oracle-exact because the sketch pipeline is deterministic
    arithmetic end to end (the ESTIMATES are exact; their distance to
    the true quantile is what's bounded by the bin width, pinned in
    pytest)."""
    ev = load(spark, sf_dir, "events")
    daily = quantile_sketch(
        ev.withColumn("day", F.date_trunc("day", F.col("ts").cast("timestamp"))),
        ["event_type", "day"],
    )
    monthly = (
        daily.withColumn("month", F.date_trunc("month", "day"))
        .groupBy("event_type", "month", "bin")
        .agg(F.sum("n").alias("n"))
    )
    return sketch_quantiles(
        monthly, ["event_type", "month"], [0.5, 0.95, 0.99]
    ).orderBy("event_type", "month")


def q_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report per event type: compare
    each series' value distribution in the month's first half against
    its second half, PSI = sum over bins of (pa - pb) * ln(pa / pb)
    with Laplace-smoothed bin shares (+0.5 per bin, so an empty bin on
    one side contributes finitely instead of blowing up the log).

    This is the monitoring read on top of the SAME mergeable bin
    sketches q_quantile_sketch_rollup folds: two sketches in, one
    number out — at 100 TB you never re-touch raw data to ask "did
    this feed drift this week", you PSI two stored sketch partials.
    Plan: one scan with a conditional split into the two periods'
    bin counts (single hash aggregate), one bounded window over the
    sketch table for per-series totals, one final aggregate.

    The drift flag is PSI > 0.1 (the conventional 'investigate'
    threshold) PLUS the sampling-noise floor (nb - 1) * (1/ta + 1/tb)
    — the expected PSI of a perfectly stationary multinomial at these
    sample sizes. Without the floor, small samples over many bins
    read as drift purely from shot noise (measured: ~0.12 'PSI' on
    the stationary feed at sf0.001); with it, the flag means the
    distribution moved MORE than chance would at this sample size, at
    every SF. Bin width 25 keeps bins populated at the smallest SF.
    The synthetic feed is stationary, so the report showing all-false
    drift flags is itself the correctness statement."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    b = F.floor(F.col("value") / 25).cast("long")
    counts = ev.groupBy("event_type", b.alias("bin")).agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("ts") < cutoff, 0).otherwise(1)).alias("cb"),
    )
    w = Window.partitionBy("event_type")
    nb = F.count(F.lit(1)).over(w).cast("double")
    ta = F.sum("ca").over(w).cast("double")
    tb = F.sum("cb").over(w).cast("double")
    pa = (F.col("ca") + 0.5) / (ta + 0.5 * nb)
    pb = (F.col("cb") + 0.5) / (tb + 0.5 * nb)
    term = (pa - pb) * F.log(pa / pb)
    walked = counts.select(
        "event_type", nb.alias("nb"), ta.alias("ta"), tb.alias("tb"),
        term.alias("term"),
    )
    noise_floor = (F.max("nb") - 1.0) * (1.0 / F.max("ta") + 1.0 / F.max("tb"))
    return (
        walked.groupBy("event_type")
        .agg(
            F.max("nb").cast("long").alias("n_bins"),
            F.round(F.sum("term"), 6).alias("psi"),
            F.round(F.lit(0.1) + noise_floor, 6).alias("threshold"),
        )
        .select(
            "event_type", "n_bins", "psi", "threshold",
            (F.col("psi") > F.col("threshold")).alias("drifted"),
        )
        .orderBy("event_type")
    )


def q_rolling_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day p50/p95 per (event_type, day) — the rolling-
    percentile dashboard query — computed ENTIRELY from the daily bin
    sketches, never from raw points.

    Rolling quantiles are the classic scale trap: a naive RANGE-frame
    percentile re-sorts every window's raw rows (O(n * window)). The
    sketch form is linear: each daily sketch row contributes FORWARD
    to the <=7 target days whose trailing window contains it (explode
    by offset — the same grid trick as the two-level sliding rollup),
    one sum-groupBy merges per-target-day sketches, and the quantile
    walk runs over merged BINS (bounded), not points. A day appears
    in the output only if the series actually had points that day
    (semi-join against the daily sketch), so trailing windows never
    dangle past the data. Exact to one bin width, deterministic, and
    oracle-EXACT because the whole pipeline is integer arithmetic."""
    ev = load(spark, sf_dir, "events")
    daily = quantile_sketch(
        ev.withColumn(
            "day", F.date_trunc("day", F.col("ts").cast("timestamp"))
        ),
        ["event_type", "day"],
    ).withColumn("day", F.col("day").cast("date"))
    contrib = daily.select(
        "event_type", "day", "bin", "n",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
    ).select(
        "event_type",
        F.date_add(F.col("day"), F.col("k")).alias("day"),
        "bin",
        "n",
    )
    merged = (
        contrib.groupBy("event_type", "day", "bin")
        .agg(F.sum("n").alias("n"))
        .join(
            daily.select("event_type", "day").distinct(),
            ["event_type", "day"],
            "left_semi",
        )
    )
    return sketch_quantiles(
        merged, ["event_type", "day"], [0.5, 0.95]
    ).orderBy("event_type", "day")


def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type: per-hour exact
    mean and its seasonal index (hour mean / series mean) — the
    decomposition a monitoring pipeline divides out before flagging
    anomalies, so a nightly lull doesn't read as a drop.

    One hash aggregate on (type, hour) — 24 x types rows — then the
    series-level mean via a bounded window over the PROFILE, never a
    second scan of raw events. Means assemble from exact centi-unit
    integer sums with one fixed expression and floor-rounding (the
    engine-exactness discipline of q_discrete_variance); the index is
    a ratio of two such means, rounded once."""
    ev = load(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    prof = ev.groupBy(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(x).alias("s"),
    )
    w = Window.partitionBy("event_type")
    g_mean = F.sum("s").over(w) / F.sum("n_points").over(w) / 100.0
    h_mean = F.col("s") / F.col("n_points") / 100.0
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000.0  # noqa: E731
    return (
        prof.select(
            "event_type",
            "hour_of_day",
            "n_points",
            r4(h_mean).alias("hour_mean"),
            r4(h_mean / g_mean).alias("seasonal_index"),
        )
        .orderBy("event_type", "hour_of_day")
    )


def q_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per (event_type, day) — the
    WAU-style rolling-distinct dashboard — from daily HLL sketches
    alone, via the same contribute-forward grid as
    q_rolling_quantile_sketch: each day's ~1.5 KB sketch fans out to
    the <=7 windows containing it and a union-aggregate merges per
    window. Rolling DISTINCT is the op exact pre-aggregation
    fundamentally cannot serve (distincts don't add; sketches union),
    so at 100 TB this turns an O(n x window) distinct re-count into
    sketch arithmetic. Rows-only (sketch binaries have no SQL twin);
    the relative-error bound vs the exact rolling distinct is pinned
    in pytest."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp"))
        .cast("date")
        .alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    contrib = daily.select(
        "event_type", "day", "sk",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
    ).select(
        "event_type",
        F.date_add(F.col("day"), F.col("k")).alias("day"),
        "sk",
    )
    return (
        contrib.groupBy("event_type", "day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_users_7d"
            ),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
        .join(
            daily.select("event_type", "day").distinct(),
            ["event_type", "day"],
            "left_semi",
        )
        .orderBy("event_type", "day")
    )


def q_seasonal_adjusted_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly flags: each value is first deflated
    by its (event_type, hour-of-day) seasonal index — so a nightly
    lull or lunchtime spike is expected, not anomalous — then scored
    with the trailing-24 h z-score machinery on the ADJUSTED series.
    The composition monitoring systems actually deploy: profile
    (q_seasonal_profile) x trailing z (q_anomaly_zscore).

    Plan: the 24 x types profile is a broadcast join onto the events
    scan (no fact shuffle), adjusted values re-enter the exact
    centi-unit integer domain by one explicit rounding (the
    cross-engine float discipline), and the single window shuffle on
    the series key is shared with the plain z-score. The seasonal
    index is floor-rounded at 4 decimals BEFORE the division on both
    engines, so the adjusted series is bit-identical."""
    ev = load(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    prof = ev.groupBy(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).alias("hour_of_day"),
    ).agg(F.count(F.lit(1)).alias("n_points"), F.sum(x).alias("s"))
    w = Window.partitionBy("event_type")
    g_mean = F.sum("s").over(w) / F.sum("n_points").over(w) / 100.0
    h_mean = F.col("s") / F.col("n_points") / 100.0
    idx = F.floor((h_mean / g_mean) * 10000 + F.lit(0.5)) / 10000.0
    profile = prof.select(
        "event_type", "hour_of_day", idx.alias("seasonal_index")
    )
    joined = ev.join(
        F.broadcast(profile),
        (ev["event_type"] == profile["event_type"])
        & (F.hour(ev["ts"].cast("timestamp")) == profile["hour_of_day"]),
    ).select(
        ev["user_id"], ev["ts"],
        F.col("value"),
        F.col("seasonal_index"),
    )
    adj_c = F.round(
        F.col("value") / F.col("seasonal_index") * 100
    ).cast("long")
    base = joined.select(
        "user_id", "ts",
        adj_c.alias("xc"),
        (adj_c / 100.0).alias("adjusted_value"),
    )
    epoch_s = F.unix_timestamp("ts")
    win = (
        Window.partitionBy("user_id").orderBy(epoch_s).rangeBetween(-86400, -1)
    )
    n = F.count(F.lit(1)).over(win).cast("double")
    s = F.sum("xc").over(win)
    q = F.sum(F.col("xc") * F.col("xc")).over(win)
    var_c = F.greatest((q - s * s / n) / n, F.lit(0.0))
    mean_v = s / n / F.lit(100.0)
    std_v = F.sqrt(var_c) / F.lit(100.0)
    z = (F.col("adjusted_value") - mean_v) / std_v
    r4 = F.floor(z * 10000 + F.lit(0.5)) / F.lit(10000.0)
    return (
        base.select(
            "user_id", "ts", "adjusted_value",
            F.when((n >= 2) & (std_v > 0), r4).alias("zscore"),
        )
        .where(F.col("zscore").isNotNull())
        .select(
            "user_id", "ts", "adjusted_value", "zscore",
            (F.abs(F.col("zscore")) > 3.0).alias("is_anomaly"),
        )
        .orderBy("user_id", "ts")
    )


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap: for every (event_type_a,
    event_type_b) pair, how many users did BOTH — the segment-overlap
    matrix behind 'what fraction of purchasers also hit errors'.

    Set-intersection cardinalities don't pre-aggregate (the same
    reason rolling distinct needed HLL); the EXACT form here reduces
    events to the distinct (user, type) membership table first — one
    shuffle, bounded by users x types — then self-joins it on user
    (co-partitioned by the same key, so no extra exchange) with
    type_a <= type_b to emit each unordered pair once. At sketch
    scale the same matrix comes from intersecting per-type HLL
    unions; the exact form is the oracle-checkable ground truth.
    Membership = high-value events only (value >= 250): the synthetic
    feed is dense enough that unrestricted membership saturates the
    matrix to the constant user count, which would verify the
    intersection logic only vacuously (the q_anti_join non-vacuous
    principle)."""
    ev = load(spark, sf_dir, "events")
    m = (
        ev.where(F.col("value") >= 250)
        .select("user_id", "event_type")
        .distinct()
    )
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(b, "user_id")
        .where(F.col("a.event_type") <= F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("type_a", "type_b")
    )


def q_audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for q_audience_overlap: per-type HLL user
    sketches (one aggregate over the same high-value membership),
    then pairwise |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B) by
    inclusion-exclusion over a types x types nested-loop join of the
    PARAMETER-SIZED sketch table (one ~1.5 KB sketch per type).

    This is the shape that survives when the exact path's membership
    table (users x types) itself no longer fits a shuffle: raw events
    fold once into sketches, every pairwise intersection is sketch
    arithmetic. Rows-only (sketch estimates have no SQL twin); pytest
    pins the estimates against the exact operator — at these
    cardinalities HLL runs in sparse mode and the two agree exactly."""
    ev = load(spark, sf_dir, "events")
    sk = (
        ev.where(F.col("value") >= 250)
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    a = sk.alias("a")
    b = sk.alias("b")
    est = F.hll_sketch_estimate
    inter = (
        est(F.col("a.sk"))
        + est(F.col("b.sk"))
        - est(F.hll_union(F.col("a.sk"), F.col("b.sk")))
    )
    return (
        a.join(
            F.broadcast(b),
            F.col("a.event_type") <= F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            inter.cast("long").alias("approx_users"),
        )
        .orderBy("type_a", "type_b")
    )


def kmv_sketches(
    df: DataFrame, group: str, value: Column, k: int = 256
) -> DataFrame:
    """K-minimum-values sketch per group (Bar-Yossef et al. 2002):
    the ``k`` smallest distinct 60-bit md5-prefix hashes of ``value``,
    as a sorted array, plus the distinct-count estimate — exact
    ``n_sk`` when the group holds fewer than k distinct values (the
    sketch IS the hash set), else (k-1) * 2^60 / kth_min.

    The HLL family (q_audience_overlap_hll, q_hll_distinct_rollup)
    covers the production sketch; KMV is its ORACLE-EXACT sibling —
    the md5-prefix hash is engine-reproducible (the Bloom/stratified
    discipline), every step is integer set math plus one fixed-shape
    double division, so a DuckDB twin reproduces the estimates
    bit-for-bit where HLL's opaque registers cannot. Sketch state is
    k longs per group; the build is one distinct + one per-group
    rank, both shuffled on the group key."""
    hashes = df.select(
        F.col(group),
        F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy(group).orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    m_scale = float(2**60)
    return ranked.groupBy(group).agg(
        F.sort_array(F.collect_list("h")).alias("arr"),
        F.count(F.lit(1)).alias("n_sk"),
    ).select(
        group,
        "arr",
        "n_sk",
        F.when(F.col("n_sk") < k, F.col("n_sk").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(m_scale)
            / F.element_at("arr", k).cast("double")
        )
        .alias("est_distinct"),
    )


def q_kmv_overlap(
    spark: SparkSession, sf_dir: str, k: int = 256
) -> DataFrame:
    """Pairwise audience overlap from KMV sketches: per event-type
    pair, estimated |A|, |B|, |A ∪ B| and |A ∩ B| — the
    q_audience_overlap matrix rebuilt from parameter-sized sketches
    instead of the users x types membership table, and unlike the HLL
    twin it is oracle-EXACT (deterministic hashes, integer set math,
    fixed-shape double arithmetic).

    Union estimate: k smallest of the merged sketch arrays (exact
    count when the merge holds < k hashes — then the sketches ARE the
    hash sets). Intersection: the standard KMV rho estimator —
    |shared hashes within the union's k-window| / k of the union
    estimate (every window hash below a side's kth min is IN that
    side's sketch iff it is in the side, so rho is well-defined).
    The pair join is a broadcast NLJ of the sketch table against
    itself — one ~2 KB row per type, never user-bounded. Same
    high-value membership corpus as q_audience_overlap, whose exact
    matrix pins the estimates in pytest."""
    ev = load(spark, sf_dir, "events")
    m = ev.where(F.col("value") >= 250).select("event_type", "user_id")
    sk = kmv_sketches(m, "event_type", F.col("user_id"), k=k)
    a = sk.alias("a")
    b = sk.alias("b")
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.concat(F.col("a.arr"), F.col("b.arr")))
        ),
        1,
        k,
    )
    n_merged = F.size(
        F.array_distinct(F.concat(F.col("a.arr"), F.col("b.arr")))
    )
    shared_all = F.size(F.array_intersect(F.col("a.arr"), F.col("b.arr")))
    shared_win = F.size(
        F.array_intersect(
            merged, F.array_intersect(F.col("a.arr"), F.col("b.arr"))
        )
    )
    m_scale = float(2**60)
    est_union = F.when(n_merged < k, n_merged.cast("double")).otherwise(
        F.lit(float(k - 1))
        * F.lit(m_scale)
        / F.element_at(merged, k).cast("double")
    )
    est_inter = F.when(n_merged < k, shared_all.cast("double")).otherwise(
        shared_win.cast("double") * est_union / F.lit(float(k))
    )
    return (
        a.join(
            F.broadcast(b),
            F.col("a.event_type") <= F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.round(F.col("a.est_distinct"), 4).alias("est_a"),
            F.round(F.col("b.est_distinct"), 4).alias("est_b"),
            F.round(est_union, 4).alias("est_union"),
            F.round(est_inter, 4).alias("est_intersection"),
        )
        .orderBy("type_a", "type_b")
    )


def q_holt_forecast(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 24,
) -> DataFrame:
    """Holt linear-trend exponential smoothing per series with an
    h-step-ahead forecast — the classic sensor-stream forecasting
    baseline (level/trend state folded once through the ordered
    series; forecast_h = level + h * trend).

    The recurrence is sequential, which normally exiles it to Python —
    but as a left fold it is ONE JVM ``F.aggregate`` over the
    per-series ordered value array: collect_list + sort_array (one
    shuffle on the series key), then a struct-accumulator fold with
    no Python anywhere. The DuckDB oracle replays the identical
    operation sequence as a recursive CTE, so the smoothed state is
    engine-exact to the rounded digit — the same
    sequential-fold-parity trick as the BPE merge fold.

    State per series is O(1); the array materialization bounds series
    length per executor (fine for telemetry series; beyond memory,
    the same fold runs in applyInPandasWithState — the streaming twin
    shape)."""
    e = load(spark, sf_dir, "events")
    pts = e.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ts"), F.col("event_id"),
                    F.col("value").cast("double").alias("v"),
                )
            )
        ).alias("pts")
    )
    vals = F.transform(F.col("pts"), lambda s: s["v"])
    a, b = float(alpha), float(beta)
    # Parsed-literal complements, NOT 1-alpha: the SQL oracle writes
    # 0.5/0.7 as literals, and 1.0-0.3 is a DIFFERENT double than
    # parsed 0.7 — a one-ulp seed that diverges under iteration.
    om_a, om_b = float(repr(1.0 - alpha)), float(repr(1.0 - beta))
    acc0 = F.struct(
        F.lit(0.0).alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0).cast("long").alias("i"),
    )

    def step(acc, x):
        first = acc["i"] == 0
        lvl = F.when(first, x).otherwise(
            a * x + om_a * (acc["level"] + acc["trend"])
        )
        trend = F.when(first, F.lit(0.0)).otherwise(
            b * (lvl - acc["level"]) + om_b * acc["trend"]
        )
        return F.struct(
            lvl.alias("level"),
            trend.alias("trend"),
            (acc["i"] + 1).alias("i"),
        )

    fin = F.aggregate(vals, acc0, step)
    return pts.select(
        "event_type",
        F.size(F.col("pts")).alias("n_points"),
        F.round(fin["level"], 4).alias("level"),
        F.round(fin["trend"], 6).alias("trend"),
        F.round(fin["level"] + float(horizon) * fin["trend"], 4).alias(
            "forecast_h24"
        ),
    ).orderBy("event_type")


def q_holt_winters(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) per
    series, seasonality indexed by HOUR OF DAY (m=24) so irregular
    sampling lands each observation in its true seasonal slot.

    Execution tier: an Arrow ``applyInPandas`` per-series pass (the
    LTTB contract — sequential WITHIN a series, embarrassingly
    parallel ACROSS series; one shuffle on the series key). This is
    the measured exception to the engine's prefer-JVM-folds rule:
    Spark evaluates higher-order-function lambdas INTERPRETED, and
    with the 24-slot seasonal vector riding the accumulator struct
    the per-step tree is large enough that the F.aggregate form costs
    15-25 s at sf0.1 (both the indexed-transform and slice+concat
    slot updates; scalar-state folds like q_holt_forecast/q_cusum
    stay sub-second and remain JVM-side). The Python loop runs the
    IDENTICAL IEEE-double operations in the identical order —
    initialization level=first value, trend 0, seasonal all-zero —
    so the recursive-CTE DuckDB oracle (24 seasonal walk columns,
    generated by ``holt_winters_oracle_sql``) still matches bit for
    bit; rounding happens JVM-side after the Arrow stage so both
    engines round the same raw doubles.

    Output: the final seasonal profile in long form plus the final
    level/trend per series."""
    import pandas as pd

    e = load(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").cast("double").alias("v"),
        F.hour("ts").alias("h"),
    )
    a, b, g = float(alpha), float(beta), float(gamma)
    om_a = float(repr(1.0 - alpha))
    om_b = float(repr(1.0 - beta))
    om_g = float(repr(1.0 - gamma))

    def _hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        vs = pdf["v"].to_list()
        hs = pdf["h"].to_list()
        level, trend, seasonal = vs[0], 0.0, [0.0] * 24
        for v, h in zip(vs[1:], hs[1:]):
            elem = seasonal[h]
            nl = a * (v - elem) + om_a * (level + trend)
            trend = b * (nl - level) + om_b * trend
            seasonal[h] = g * (v - nl) + om_g * elem
            level = nl
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]] * 24,
                "hour": list(range(24)),
                "seasonal_raw": seasonal,
                "n_points": [len(vs)] * 24,
                "level_raw": [level] * 24,
                "trend_raw": [trend] * 24,
            }
        )

    from .skew import pin_grouped_parallelism

    folded = (
        pin_grouped_parallelism(pts, "event_type")
        .groupBy("event_type")
        .applyInPandas(
            _hw,
            "event_type string, hour int, seasonal_raw double, "
            "n_points long, level_raw double, trend_raw double",
        )
    )
    return folded.select(
        "event_type",
        "hour",
        F.round("seasonal_raw", 4).alias("seasonal_index"),
        "n_points",
        F.round("level_raw", 4).alias("level"),
        F.round("trend_raw", 6).alias("trend"),
    ).orderBy("event_type", "hour")


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward forecast evaluation: one-step-ahead Holt(0.5,
    0.3) error per point, against the naive last-value baseline, per
    series — MAE for both plus the skill score 1 - mae_holt /
    mae_naive (positive = the model beats persistence; the first
    question to ask before shipping any forecaster).

    Same single-fold discipline as q_holt_forecast, with the error
    accumulators riding in the accumulator struct. The double error
    sums are SEQUENTIAL fold additions, so their order is fixed and
    the DuckDB recursive-CTE replay is bit-exact — a backtest whose
    metrics two engines agree on to the rounded digit."""
    e = load(spark, sf_dir, "events")
    pts = e.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ts"), F.col("event_id"),
                    F.col("value").cast("double").alias("v"),
                )
            )
        ).alias("pts")
    )
    vals = F.transform(F.col("pts"), lambda s: s["v"])
    a, b = 0.5, 0.3
    om_a, om_b = float(repr(1.0 - a)), float(repr(1.0 - b))
    acc0 = F.struct(
        F.lit(0.0).alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("prev"),
        F.lit(0.0).alias("esum"),
        F.lit(0.0).alias("nsum"),
        F.lit(0).cast("long").alias("i"),
    )

    def step(acc, x):
        first = acc["i"] == 0
        pred = acc["level"] + acc["trend"]
        esum = F.when(first, F.lit(0.0)).otherwise(
            acc["esum"] + F.abs(x - pred)
        )
        nsum = F.when(first, F.lit(0.0)).otherwise(
            acc["nsum"] + F.abs(x - acc["prev"])
        )
        lvl = F.when(first, x).otherwise(a * x + om_a * pred)
        trend = F.when(first, F.lit(0.0)).otherwise(
            b * (lvl - acc["level"]) + om_b * acc["trend"]
        )
        return F.struct(
            lvl.alias("level"),
            trend.alias("trend"),
            x.alias("prev"),
            esum.alias("esum"),
            nsum.alias("nsum"),
            (acc["i"] + 1).alias("i"),
        )

    fin = F.aggregate(vals, acc0, step)
    nm1 = (fin["i"] - 1).cast("double")
    # Guards: a 1-point series has no one-step errors (dropped); a
    # perfectly flat series has mae_naive 0 and an undefined skill
    # ratio (NULL via nullif, matching the oracle).
    return (
        pts.where(F.size("pts") >= 2)
        .select(
            "event_type",
            fin["i"].cast("long").alias("n_points"),
            F.round(fin["esum"] / nm1, 4).alias("mae_holt"),
            F.round(fin["nsum"] / nm1, 4).alias("mae_naive"),
            F.round(
                F.lit(1.0) - fin["esum"] / F.nullif(fin["nsum"], F.lit(0.0)),
                6,
            ).alias("skill_vs_naive"),
        )
        .orderBy("event_type")
    )


def holt_winters_oracle_sql(
    alpha: float = 0.3, beta: float = 0.1, gamma: float = 0.2
) -> str:
    """DuckDB recursive-CTE twin of q_holt_winters, generated from
    the same smoothing parameters. The seasonal vector is 24 walk
    columns; nested derived tables compute elem -> lvl once per step
    so every reuse references the SAME double, exactly like the
    Spark fold's column reuse."""
    a, b, g = float(alpha), float(beta), float(gamma)
    om_a = repr(1.0 - alpha)
    om_b = repr(1.0 - beta)
    om_g = repr(1.0 - gamma)
    s_cols = ", ".join(f"CAST(0.0 AS DOUBLE) AS s{k}" for k in range(24))
    w_cols = ", ".join(f"w.s{k}" for k in range(24))
    elem_case = (
        "CASE o.h "
        + " ".join(f"WHEN {k} THEN w.s{k}" for k in range(24))
        + " END"
    )
    s_updates = ", ".join(
        f"CASE WHEN h = {k} THEN {g!r} * (v - lvl) + {om_g} * elem "
        f"ELSE s{k} END AS s{k}"
        for k in range(24)
    )
    final_case = (
        "CASE h.hour "
        + " ".join(f"WHEN {k} THEN f.s{k}" for k in range(24))
        + " END"
    )
    return f"""
        WITH RECURSIVE ordered AS (
            SELECT event_type, CAST(value AS DOUBLE) AS v,
                   CAST(extract(hour FROM ts) AS INT) AS h,
                   CAST(row_number() OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id) AS INT)
                       AS rn
            FROM events
        ), counts AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM ordered GROUP BY event_type
        ), walk AS (
            SELECT event_type, rn AS i, v AS level,
                   CAST(0.0 AS DOUBLE) AS trend, {s_cols}
            FROM ordered WHERE rn = 1
            UNION ALL
            SELECT event_type, rn, lvl,
                   {b!r} * (lvl - plevel) + {om_b} * ptrend,
                   {s_updates}
            FROM (
                SELECT *,
                       {a!r} * (v - elem)
                         + {om_a} * (plevel + ptrend) AS lvl
                FROM (
                    SELECT o.event_type, o.rn, o.v, o.h,
                           w.level AS plevel, w.trend AS ptrend,
                           {w_cols}, {elem_case} AS elem
                    FROM walk w
                    JOIN ordered o
                      ON o.event_type = w.event_type
                     AND o.rn = w.i + 1
                )
            )
        )
        SELECT f.event_type,
               h.hour,
               round({final_case}, 4) AS seasonal_index,
               c.n AS n_points,
               round(f.level, 4) AS level,
               round(f.trend, 6) AS trend
        FROM walk f
        JOIN counts c USING (event_type)
        CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS hour) h
        WHERE f.i = c.n
        ORDER BY f.event_type, h.hour
    """


def q_cusum_changepoint(
    spark: SparkSession,
    sf_dir: str,
    k: float = 25.0,
    h: float = 200.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection per series: the classic
    SPC drift monitor (Page 1954). s+ accumulates positive deviations
    beyond slack ``k``, s- negative ones; crossing threshold ``h``
    fires an alarm and resets both accumulators. Output per series:
    alarm count, first alarm index, and the peak excursions.

    Sequential state, so it runs as ONE JVM ``F.aggregate`` fold over
    the per-series ordered value array (the q_holt_forecast pattern —
    one shuffle on the series key, no Python). The series mean enters
    the fold from exact centi-unit integer sums, reduced to a double
    by one identical expression on both engines, and every fold step
    is the same double arithmetic in the same order — so the DuckDB
    recursive-CTE replay is bit-exact and the query is oracle-EXACT,
    alarms and all (k=25/h=200 fire 12-21 alarms per series at
    sf0.01 with both tails non-vacuously positive)."""
    e = load(spark, sf_dir, "events")
    pts = (
        e.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ts"), F.col("event_id"),
                        F.col("value").cast("double").alias("v"),
                    )
                )
            ).alias("pts"),
            F.sum(
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("sum_c"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "mean",
            F.col("sum_c").cast("double")
            / F.lit(100.0)
            / F.col("n").cast("double"),
        )
    )
    vals = F.transform(F.col("pts"), lambda s: s["v"])
    kf, hf = float(k), float(h)
    acc0 = F.struct(
        F.lit(0.0).alias("sp"),
        F.lit(0.0).alias("sn"),
        F.lit(0).cast("long").alias("i"),
        F.lit(0).cast("long").alias("n_alarms"),
        F.lit(0).cast("long").alias("first_alarm"),
        F.lit(0.0).alias("max_sp"),
        F.lit(0.0).alias("max_sn"),
    )
    mean = F.col("mean")

    def step(acc, x):
        sp1 = F.greatest(F.lit(0.0), acc["sp"] + (x - mean) - kf)
        sn1 = F.greatest(F.lit(0.0), acc["sn"] + (mean - x) - kf)
        alarm = (sp1 > hf) | (sn1 > hf)
        return F.struct(
            F.when(alarm, F.lit(0.0)).otherwise(sp1).alias("sp"),
            F.when(alarm, F.lit(0.0)).otherwise(sn1).alias("sn"),
            (acc["i"] + 1).alias("i"),
            (
                acc["n_alarms"]
                + F.when(alarm, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_alarms"),
            F.when(
                alarm & (acc["first_alarm"] == 0), acc["i"] + 1
            )
            .otherwise(acc["first_alarm"])
            .alias("first_alarm"),
            F.greatest(acc["max_sp"], sp1).alias("max_sp"),
            F.greatest(acc["max_sn"], sn1).alias("max_sn"),
        )

    fin = F.aggregate(vals, acc0, step)
    return pts.select(
        "event_type",
        F.col("n").cast("long").alias("n_points"),
        F.round(mean, 4).alias("mean_value"),
        fin["n_alarms"].cast("long").alias("n_alarms"),
        fin["first_alarm"].cast("long").alias("first_alarm_i"),
        F.round(fin["max_sp"], 4).alias("max_cusum_pos"),
        F.round(fin["max_sn"], 4).alias("max_cusum_neg"),
    ).orderBy("event_type")


def q_series_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series ordinary-least-squares trend: slope (value/day),
    intercept, and R^2 — the 'is this drifting' regression read next
    to CUSUM's 'did it jump'.

    Engine-exactness discipline: the five sufficient statistics
    (n, Sx, Sy, Sxy, Sxx, Syy) accumulate as EXACT BIGINT sums —
    x is whole seconds from the per-series minimum timestamp (bounds
    Sxx ~ 1e16 at month-long series, inside long range; raw epochs
    would overflow), y is centi-units — and the closed-form slope/
    intercept/R^2 are then ONE double expression in identical
    operation order on both engines, so the query is oracle-exact
    without any built-in regr_* (whose accumulation order varies).
    Plan: one window (per-series min ts) + one groupBy on the same
    key — AQE-coalesced single shuffle."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    pts = (
        e.select(
            "event_type",
            F.unix_timestamp("ts").alias("ts_s"),
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("y_c"),
        )
        .withColumn("x_s", F.col("ts_s") - F.min("ts_s").over(w))
    )
    agg = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x_s").alias("sx"),
        F.sum("y_c").alias("sy"),
        F.sum(F.col("x_s") * F.col("y_c")).alias("sxy"),
        F.sum(F.col("x_s") * F.col("x_s")).alias("sxx"),
        F.sum(F.col("y_c") * F.col("y_c")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = nd * sxy - sx * sy
    denom = nd * sxx - sx * sx
    slope_c_s = cov / denom
    # Degenerate series guard: <2 points or zero x-variance (all
    # points at one instant) has no defined slope — drop the row
    # rather than emit NaN/inf (the oracle twin filters identically).
    agg = agg.where(
        (F.col("n") >= 2) & (nd * sxx - sx * sx != F.lit(0.0))
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_points"),
        F.round(slope_c_s * F.lit(86400.0) / F.lit(100.0), 6).alias(
            "slope_per_day"
        ),
        F.round(
            (sy - slope_c_s * sx) / nd / F.lit(100.0), 4
        ).alias("intercept"),
        F.round(
            (cov * cov) / (denom * (nd * syy - sy * sy)), 6
        ).alias("r2"),
    ).orderBy("event_type")


def q_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample experiment read: users split 50/50 into arms by the
    deterministic md5 coin (the mixture-resample idiom — replay-stable
    assignment, no RNG), then per event_type Welch's t statistic and
    Welch-Satterthwaite degrees of freedom compare arm means.

    Exactness: per-arm n / sum / sum-of-squares fold as BIGINT
    centi-unit partials inside ONE conditional-aggregation scan (no
    second pass, no join); t and dof are then single double
    expressions evaluated in identical order on both engines —
    oracle-exact, unlike built-in stddev whose accumulation order
    varies. The 1.96 flag is the two-sided 5% normal approximation
    (dof > 1000 here, where t and z coincide)."""
    e = load(spark, sf_dir, "events")
    # The shared hex-prefix coin idiom (textops.md5_prefix_bucket):
    # first md5 hex char >= '8' puts the user in arm B (~50%).
    arm_b = (
        F.substring(
            F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
            1,
            1,
        )
        >= "8"
    )
    y = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    agg = e.groupBy("event_type").agg(
        F.sum(F.when(arm_b, 0).otherwise(1)).alias("na"),
        F.sum(F.when(arm_b, F.lit(0).cast("long")).otherwise(y)).alias("sa"),
        F.sum(F.when(arm_b, F.lit(0).cast("long")).otherwise(y * y)).alias("qa"),
        F.sum(F.when(arm_b, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(arm_b, y).otherwise(F.lit(0).cast("long"))).alias("sb"),
        F.sum(F.when(arm_b, y * y).otherwise(F.lit(0).cast("long"))).alias("qb"),
    )
    # An empty or single-point arm has no sample variance — drop the
    # series rather than emit NaN (oracle twin filters identically).
    agg = agg.where((F.col("na") >= 2) & (F.col("nb") >= 2))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    qa, qb = F.col("qa").cast("double"), F.col("qb").cast("double")
    ma = sa / na / F.lit(100.0)
    mb = sb / nb / F.lit(100.0)
    # Sample variance from exact sums, in value units:
    va = (qa / F.lit(10000.0) - sa / F.lit(100.0) * sa / F.lit(100.0) / na) / (na - F.lit(1.0))
    vb = (qb / F.lit(10000.0) - sb / F.lit(100.0) * sb / F.lit(100.0) / nb) / (nb - F.lit(1.0))
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dof = se2 * se2 / (
        va / na * (va / na) / (na - F.lit(1.0))
        + vb / nb * (vb / nb) / (nb - F.lit(1.0))
    )
    return agg.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 2).alias("dof"),
        (F.abs(t) > F.lit(1.96)).alias("significant_5pct"),
    ).orderBy("event_type")


def q_attribution_credit(
    spark: SparkSession,
    sf_dir: str,
    lookback_days: int = 7,
) -> DataFrame:
    """Multi-touch marketing attribution: for every 'purchase'
    conversion, the user's click/view touches in the preceding
    ``lookback_days`` earn credit under three standard models —
    first-touch (1.0 to the earliest touch), last-touch (1.0 to the
    latest), and linear (1/n to each) — aggregated per channel.

    The touch-conversion join is blocked ON THE USER (equijoin on
    user_id + a time-range predicate), so pair work is bounded by
    per-user activity, never events^2; per-conversion ordering is one
    window over the conversion key. Linear credit is folded as exact
    integer MICRO-credits (floor(1e6/n) per touch) so both engines
    sum identically regardless of reduction order — the one float
    division happens once, after the exact sum. Conversions with no
    in-window touch earn no credit (inner join, documented)."""
    e = load(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = e.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
    )
    j = touch.join(
        conv,
        (touch["user_id"] == conv["user_id"])
        & (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        ),
    ).select("conv_id", "touch_id", "touch_ts", "channel")
    w = Window.partitionBy("conv_id")
    wf = w.orderBy("touch_ts", "touch_id")
    wl = w.orderBy(F.desc("touch_ts"), F.desc("touch_id"))
    scored = j.select(
        "channel",
        "conv_id",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count("*").over(w).alias("n_touches_conv"),
    )
    return (
        scored.groupBy("channel")
        .agg(
            F.count("*").alias("n_touches"),
            F.countDistinct("conv_id").alias("n_conversions"),
            F.sum((F.col("rn_first") == 1).cast("long")).alias(
                "first_touch"
            ),
            F.sum((F.col("rn_last") == 1).cast("long")).alias(
                "last_touch"
            ),
            F.sum(
                F.floor(
                    F.lit(1000000.0) / F.col("n_touches_conv").cast("double")
                ).cast("long")
            ).alias("linear_micro"),
        )
        .select(
            "channel",
            "n_touches",
            "n_conversions",
            "first_touch",
            "last_touch",
            F.round(
                F.col("linear_micro").cast("double") / F.lit(1000000.0), 4
            ).alias("linear_credit"),
        )
        .orderBy("channel")
    )


def q_top_session_paths(
    spark: SparkSession, sf_dir: str, max_steps: int = 4, top_k: int = 15
) -> DataFrame:
    """Path analysis: the most common event-type sequences users walk
    within a session (first ``max_steps`` steps, 30-minute gap
    sessions) — the "what do people actually do" read next to the
    funnel's "did they do THIS". Gaps-and-islands session ids (lag ->
    flag -> running count), per-session ordered path assembled with
    one sort-free aggregate (collect the (ts, event_id, type) structs,
    sort_array, slice, join with '>'), then a count + exact top-k.
    Two shuffles total (user window + path count); path strings are
    bounded by max_steps so the count key space stays small."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.withColumn(
            "new_sess",
            F.coalesce(
                F.unix_timestamp("ts")
                - F.lag(F.unix_timestamp("ts")).over(w)
                > 1800,
                F.lit(True),
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_sess").over(w))
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                max_steps,
            ).alias("steps")
        )
        .select(F.concat_ws(">", F.col("steps")).alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top_k)
    )


def skyline2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket_width: float = 1.0,
) -> DataFrame:
    """Two-dimensional skyline (Pareto frontier): rows not dominated
    by any other row, where a dominator has ``min_col`` <= and
    ``max_col`` >= with at least one strict inequality.

    Distributed shape (skyline is distributive: removing a dominated
    point never changes the frontier, and dominance chains terminate
    at frontier points):

    1. **Bucket prefilter** — group ``floor(min_col / width)`` buckets
       (cardinality bounded by the VALUE DOMAIN, not the row count),
       take each bucket's max of ``max_col``, and compute the running
       max over strictly-cheaper buckets with a window over the tiny
       bucket table. Any row at or below an earlier bucket's max is
       dominated by a strictly-cheaper point and is dropped by a
       broadcast equi-join — one map-side-combinable aggregate plus a
       map-only filter over the fact table; survivors are roughly the
       per-bucket frontier, O(buckets) in expectation.
    2. **Exact pass on survivors** — per exact ``min_col`` group max,
       then a strict-prefix running max over the (tiny) distinct-value
       table; a survivor is frontier iff it is its group's max and
       beats every strictly-cheaper group. Exactness holds because
       every dominated survivor is dominated by some frontier point
       (transitivity), and frontier points always survive step 1.

    At 100 TB the fact table is touched once, map-only, against a
    broadcast of O(domain/width) bucket rows; the only windows run
    over bucket/distinct-value tables that do not grow with the data.
    """
    price = F.col(min_col).cast("double")
    bucket = F.floor(price / F.lit(float(bucket_width))).alias("__bk")
    fact = df.where(
        F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
    ).withColumn("__bk", bucket)

    bstats = fact.groupBy("__bk").agg(F.max(max_col).alias("__bmax"))
    wb = Window.orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bprefix = bstats.select(
        "__bk", F.max("__bmax").over(wb).alias("__bprefix")
    )
    survivors = (
        fact.join(F.broadcast(bprefix), "__bk")
        .where(
            F.col("__bprefix").isNull()
            | (F.col(max_col) > F.col("__bprefix"))
        )
        .drop("__bk", "__bprefix")
    )

    gstats = survivors.groupBy(min_col).agg(
        F.max(max_col).alias("__gmax")
    )
    wg = Window.orderBy(min_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    gprefix = gstats.select(
        min_col,
        "__gmax",
        F.max("__gmax").over(wg).alias("__gprefix"),
    )
    return (
        survivors.join(F.broadcast(gprefix), min_col)
        .where(
            (F.col(max_col) == F.col("__gmax"))
            & (
                F.col("__gprefix").isNull()
                | (F.col(max_col) > F.col("__gprefix"))
            )
        )
        .drop("__gmax", "__gprefix")
    )


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts: no other part is at-most-as-expensive AND
    at-least-as-large (strict somewhere) — the classic skyline
    operator the reference (and stock Spark) lack as a primitive.
    Oracle twin is the textbook NOT EXISTS dominance query; this side
    is the two-phase bucket-prefilter + exact-pass composition in
    ``skyline2d``."""
    p = load(spark, sf_dir, "part")
    return (
        skyline2d(
            p.select("p_partkey", "p_retailprice", "p_size"),
            min_col="p_retailprice",
            max_col="p_size",
            bucket_width=50.0,
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    bucket_seconds: int | None = 7200,
) -> DataFrame:
    """Keyless many-x-many interval OVERLAP join as a binned equijoin.

    The naive plan for ``l_start < r_end AND r_start < l_end`` is a
    BroadcastNestedLoopJoin — O(|L| x |R|) compares and a broadcast
    of a whole side, the classic Spark range-join trap. Binning fixes
    the asymptotics: each interval explodes to the fixed-width time
    buckets it touches, the join becomes an EQUIJOIN on bucket id
    (shuffle-partitionable, AQE-skew-splittable), and the overlap
    predicate then prunes the per-bucket candidates. Work is
    sum_b(|L_b| x |R_b|) — local density, never the global product.
    A pair spanning several shared buckets is deduped by one
    ``distinct``; inputs must therefore be row-distinct (pre-distinct
    them — the demo does).

    Pick ``bucket_seconds`` near the typical interval length: the
    explode factor is span/bucket + 1 while per-bucket density falls
    with the bucket width (the standard binned-range-join dial;
    Databricks ships the same idea as ``spark.databricks.optimizer.
    rangeJoin.binSize``). Pass ``bucket_seconds=None`` to derive the
    dial from the data — the average of the two per-side median
    interval lengths (two 1-row sketch aggregates, parameter-sized
    driver state), clamped to [60 s, 7 d]. Spans are half-open
    [start, end)."""
    ls, le = left_span
    rs, re_ = right_span
    if bucket_seconds is None:
        med = [
            df.agg(
                F.expr(
                    f"percentile_approx(unix_timestamp({e}) - "
                    f"unix_timestamp({s}), 0.5)"
                )
            ).first()[0]
            for df, (s, e) in ((left, left_span), (right, right_span))
        ]
        spans = [m for m in med if m is not None and m > 0]
        bucket_seconds = int(
            min(max(sum(spans) / len(spans), 60), 7 * 86_400)
        ) if spans else 7200
    if set(left.columns) & set(right.columns):
        raise ValueError(
            "interval_overlap_join needs disjoint column names; rename "
            f"the overlap: {sorted(set(left.columns) & set(right.columns))}"
        )

    def _buckets(s: str, e: str):
        w = F.lit(bucket_seconds)
        return F.sequence(
            F.floor(F.unix_timestamp(F.col(s)) / w).cast("long"),
            F.floor(F.unix_timestamp(F.col(e)) / w).cast("long"),
        )

    lb = left.withColumn("__bucket", F.explode(_buckets(ls, le)))
    rb = right.withColumn("__bucket", F.explode(_buckets(rs, re_)))
    return (
        lb.join(rb, "__bucket")
        .where((F.col(ls) < F.col(re_)) & (F.col(rs) < F.col(le)))
        .drop("__bucket")
        .distinct()
    )


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing binned overlap join: for each 'incident window'
    (2 hours after an error event of the 1-in-100 sentinel users),
    how many OTHER users' sessions overlapped it — the cross-user
    interference read (did the incident coincide with foreign
    activity?). Sessions come from the same 30-minute sessionization
    q_session_window serves; windows are distinct-projected so both
    engines pair identical row sets. Oracle: the plain theta join in
    DuckDB — exact, because overlap is pure timestamp comparison and
    the counts are integers."""
    e = load(spark, sf_dir, "events")
    sessions = session_window_agg(e).select(
        F.col("user_id").alias("s_user"),
        F.col("session_start").alias("s_start"),
        F.col("session_end").alias("s_end"),
    )
    windows = (
        e.where((F.col("event_type") == "error") & (F.col("user_id") % 100 == 0))
        .select(
            F.col("user_id").alias("w_user"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
        )
        .distinct()
    )
    pairs = interval_overlap_join(
        sessions, windows, ("s_start", "s_end"), ("w_start", "w_end")
    ).where(F.col("s_user") != F.col("w_user"))
    return (
        pairs.groupBy("w_user", "w_start")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("s_user").alias("n_users"),
        )
        .orderBy("w_user", "w_start")
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival (repeat-purchase / churn analysis)
# --------------------------------------------------------------------------

def kaplan_meier(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator (Kaplan & Meier
    1958) — the standard right-censoring-aware answer to "how long
    until the event", which a plain duration histogram gets WRONG
    whenever some subjects haven't had the event yet (dropping them
    biases short, counting them as events biases the tail).

    Input: one row per subject with an integer ``duration`` and
    ``event`` (1 = observed, 0 = right-censored). Output: one row per
    distinct EVENT time with the risk-set size, event/censor counts,
    and the survival curve S(t) = prod_{t_i <= t} (n_i - d_i) / n_i.

    Exactness contract: n_i and d_i are exact integers, each factor is
    ONE double division of those integers, and S(t) is the
    left-to-right product of those identical doubles — the Spark side
    folds a time-ordered factor array, the DuckDB twin multiplies in
    the same order through a recursive CTE, so the products are
    bit-identical (IEEE multiplication is deterministic; no exp/ln
    round trip).

    Scale shape: one shuffle aggregates subjects to the per-duration
    table, which is DIMENSION-sized (distinct integer durations are
    bounded by the observation span — days, not subjects), so the
    ordered window + fold run on a parameter-sized frame. The subject
    table is scanned once."""
    dur = F.col(duration_col)
    ev = F.col(event_col).cast("long")
    per_t = subjects.groupBy(dur.alias("t")).agg(
        F.sum(ev).alias("d"),
        F.sum(1 - ev).alias("censored"),
        F.count(F.lit(1)).alias("arrivals"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = subjects.agg(F.count(F.lit(1)).alias("n_total"))
    risked = per_t.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("n_total") - (F.sum("arrivals").over(w_all) - F.col("arrivals")),
    )
    factor = (
        (F.col("n_risk") - F.col("d")).cast("double")
        / F.col("n_risk").cast("double")
    )
    curve = risked.withColumn("factor", factor).withColumn(
        "survival",
        F.aggregate(
            F.collect_list(
                F.when(F.col("d") > 0, F.col("factor"))
            ).over(w_all),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ),
    )
    return (
        curve.where(F.col("d") > 0)
        .select(
            "t",
            "n_risk",
            F.col("d").alias("n_events"),
            "censored",
            F.round(F.col("survival"), 6).alias("survival"),
        )
        .orderBy("t")
    )


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing repeat-purchase survival over orders: per
    customer, the event is the SECOND distinct order date (duration =
    days from first to second distinct order date); customers who
    never reorder are right-censored at the dataset's last order date.
    Same-day repeat orders don't count as a reorder — the curve
    answers "how long until the customer comes BACK"."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"), F.col("o_orderdate").alias("dt")
    )
    dd = o.distinct()
    w = Window.partitionBy("cust").orderBy("dt")
    ranked = dd.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 2)
    per_cust = ranked.groupBy("cust").agg(
        F.min(F.when(F.col("rn") == 1, F.col("dt"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("dt"))).alias("d2"),
    )
    maxd = o.agg(F.max("dt").alias("dmax"))
    subjects = per_cust.crossJoin(F.broadcast(maxd)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
        )
        .otherwise(F.datediff(F.col("dmax"), F.col("d1")))
        .cast("long")
        .alias("duration"),
        F.col("d2").isNotNull().cast("long").alias("event"),
    )
    return kaplan_meier(subjects)


def kaplan_meier_oracle_sql() -> str:
    """DuckDB twin of q_kaplan_meier: identical subject construction;
    the survival product is a recursive CTE multiplying the SAME
    time-ordered double factors left to right, so the curve is
    bit-identical to Spark's array fold."""
    return """
        WITH RECURSIVE dd AS (
            SELECT DISTINCT o_custkey AS cust, o_orderdate AS dt
            FROM orders
        ), ranked AS (
            SELECT cust, dt,
                   row_number() OVER (PARTITION BY cust ORDER BY dt) AS rn
            FROM dd
        ), per_cust AS (
            SELECT cust,
                   min(CASE WHEN rn = 1 THEN dt END) AS d1,
                   min(CASE WHEN rn = 2 THEN dt END) AS d2
            FROM ranked WHERE rn <= 2 GROUP BY cust
        ), maxd AS (
            SELECT max(o_orderdate) AS dmax FROM orders
        ), subjects AS (
            SELECT CASE WHEN d2 IS NOT NULL
                        THEN date_diff('day', d1, d2)
                        ELSE date_diff('day', d1, dmax) END AS duration,
                   CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM per_cust CROSS JOIN maxd
        ), per_t AS (
            SELECT duration AS t,
                   sum(event) AS d,
                   sum(1 - event) AS censored,
                   count(*) AS arrivals
            FROM subjects GROUP BY 1
        ), risked AS (
            SELECT t, d, censored,
                   (SELECT count(*) FROM subjects)
                       - (sum(arrivals) OVER (ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - arrivals) AS n_risk
            FROM per_t
        ), ev AS (
            SELECT t, n_risk, d, censored,
                   CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                       AS factor,
                   row_number() OVER (ORDER BY t) AS r
            FROM risked WHERE d > 0
        ), km AS (
            SELECT r, t, n_risk, d, censored, factor,
                   factor AS survival
            FROM ev WHERE r = 1
            UNION ALL
            SELECT e.r, e.t, e.n_risk, e.d, e.censored, e.factor,
                   km.survival * e.factor
            FROM ev e JOIN km ON e.r = km.r + 1
        )
        SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_events,
               CAST(censored AS BIGINT) AS censored,
               round(survival, 6) AS survival
        FROM km ORDER BY t
    """


# --------------------------------------------------------------------------
# Sequential A/B testing (Wald SPRT)
# --------------------------------------------------------------------------

def sprt_monitor(
    subjects: DataFrame,
    arm_col: str = "arm",
    period_col: str = "day",
    success_col: str = "success",
    p0: float = 0.18,
    p1: float = 0.22,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Wald's sequential probability ratio test (Wald 1945) — the
    peeking-safe way to monitor an online experiment: a fixed-horizon
    test read daily inflates false positives, while the SPRT's
    log-likelihood-ratio walk with Wald bounds holds (alpha, beta)
    at EVERY look. One row per (arm, period) with the cumulative
    trial/success counts, the LLR, and the running verdict.

    For Bernoulli H0: p=p0 vs H1: p=p1, LLR after (n, k) is
    k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0)); both log constants and the
    Wald bounds ln((1-beta)/alpha), ln(beta/(1-alpha)) are computed
    ONCE driver-side and embedded as literals, so each engine
    evaluates the identical k*C1 + (n-k)*C0 over exact integer
    cumulative counts — engine-exact with no libm call in either
    plan. Shape: one (arm, period) aggregate with map-side combine,
    then a window cumsum over the dimension-sized period table."""
    import math

    c1 = math.log(p1 / p0)
    c0 = math.log((1 - p1) / (1 - p0))
    upper = math.log((1 - beta) / alpha)
    lower = math.log(beta / (1 - alpha))
    per = subjects.groupBy(arm_col, period_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(success_col).cast("long")).alias("k"),
    )
    w = (
        Window.partitionBy(arm_col)
        .orderBy(period_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_n = F.sum("n").over(w)
    cum_k = F.sum("k").over(w)
    llr = F.round(
        cum_k.cast("double") * F.lit(c1)
        + (cum_n - cum_k).cast("double") * F.lit(c0),
        6,
    )
    return per.select(
        arm_col,
        period_col,
        cum_n.alias("cum_n"),
        cum_k.alias("cum_k"),
        llr.alias("llr"),
        F.when(llr >= F.lit(round(upper, 6)), F.lit("accept_h1"))
        .when(llr <= F.lit(round(lower, 6)), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("verdict"),
    ).orderBy(arm_col, period_col)


def q_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing SPRT monitor over events: arms by user-id parity
    (the deterministic assignment hash), success = purchase event,
    one look per day."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("long").alias("arm"),
        F.to_date("ts").alias("day"),
        (F.col("event_type") == "purchase").alias("success"),
    )
    return sprt_monitor(ev)


def sprt_ab_oracle_sql(
    p0: float = 0.18,
    p1: float = 0.22,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> str:
    """DuckDB twin of q_sprt_ab: identical literal constants, integer
    cumulative counts, identical expression shape."""
    import math

    c1 = repr(math.log(p1 / p0))
    c0 = repr(math.log((1 - p1) / (1 - p0)))
    upper = round(math.log((1 - beta) / alpha), 6)
    lower = round(math.log(beta / (1 - alpha)), 6)
    return f"""
        WITH per AS (
            SELECT user_id % 2 AS arm,
                   CAST(ts AS DATE) AS day,
                   count(*) AS n,
                   sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS k
            FROM events GROUP BY 1, 2
        ), cums AS (
            SELECT arm, day,
                   sum(n) OVER w AS cum_n,
                   sum(k) OVER w AS cum_k
            FROM per
            WINDOW w AS (PARTITION BY arm ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT arm, day,
               CAST(cum_n AS BIGINT) AS cum_n,
               CAST(cum_k AS BIGINT) AS cum_k,
               round(CAST(cum_k AS DOUBLE) * {c1}
                     + CAST(cum_n - cum_k AS DOUBLE) * {c0}, 6) AS llr,
               CASE WHEN round(CAST(cum_k AS DOUBLE) * {c1}
                     + CAST(cum_n - cum_k AS DOUBLE) * {c0}, 6)
                         >= {upper} THEN 'accept_h1'
                    WHEN round(CAST(cum_k AS DOUBLE) * {c1}
                     + CAST(cum_n - cum_k AS DOUBLE) * {c0}, 6)
                         <= {lower} THEN 'accept_h0'
                    ELSE 'continue' END AS verdict
        FROM cums
        ORDER BY arm, day
    """


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------

def benford_audit(
    df: DataFrame,
    value: Column,
    chi2_cut: float = 15.507,
) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881 / Benford 1938;
    Nigrini's fraud-screening form): naturally-grown multiplicative
    quantities put digit d first with probability log10(1 + 1/d), and
    fabricated or mechanically-generated figures visibly don't — the
    classic one-pass data-forensics read over any monetary column.
    One row per leading digit with observed vs expected counts, the
    chi-square contribution, and the dataset-level verdict against
    the df=8, alpha=0.05 cut.

    Exactness: the nine expected probabilities are Python literals
    shared by both engines; the first digit is floor(x / 10^floor(
    log10 x)) over the identical doubles; chi-square terms round to 6
    and sum as DECIMAL so the 9-term fold is order-independent. One
    fact shuffle (digit groupBy, map-side combined), then 9-row
    parameter work."""
    import math

    digit = F.floor(
        value / F.pow(F.lit(10.0), F.floor(F.log10(value)))
    ).cast("int")
    obs = (
        df.where(value > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").alias("n_total"))
    p = F.element_at(
        F.array(*[F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)]),
        F.col("digit"),
    )
    expected = F.col("n_total").cast("double") * p
    term = F.round(
        (F.col("n_obs").cast("double") - expected)
        * (F.col("n_obs").cast("double") - expected)
        / expected,
        6,
    ).cast("decimal(18,6)")
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = (
        obs.crossJoin(F.broadcast(total))
        .withColumn("p_expected", F.round(p, 6))
        .withColumn("expected_n", F.round(expected, 4))
        .withColumn("chi2_term", term.cast("double"))
        .withColumn(
            "chi2", F.sum(term).over(w).cast("double")
        )
    )
    return scored.select(
        "digit",
        "n_obs",
        "p_expected",
        "expected_n",
        "chi2_term",
        "chi2",
        (F.col("chi2") > F.lit(chi2_cut)).alias("deviates"),
    ).orderBy("digit")


def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing Benford audit of order total prices. TPC-H
    totals are sums of bounded uniforms, NOT multiplicative growth, so
    the audit correctly flags them — the non-vacuous verdict path."""
    o = load(spark, sf_dir, "orders")
    return benford_audit(o, F.col("o_totalprice"))


def benford_oracle_sql(chi2_cut: float = 15.507) -> str:
    """DuckDB twin of q_benford_totalprice: identical literal
    probabilities and the identical rounded-decimal chi-square fold."""
    import math

    probs = ", ".join(repr(math.log10(1 + 1 / d)) for d in range(1, 10))
    return f"""
        WITH obs AS (
            SELECT CAST(floor(o_totalprice
                       / pow(10, floor(log10(o_totalprice)))) AS INT)
                       AS digit,
                   count(*) AS n_obs
            FROM orders WHERE o_totalprice > 0
            GROUP BY 1
        ), tot AS (
            SELECT sum(n_obs) AS n_total FROM obs
        ), scored AS (
            SELECT digit, n_obs,
                   CAST(([{probs}])[digit] AS DOUBLE) AS p,
                   CAST(n_total AS DOUBLE)
                       * CAST(([{probs}])[digit] AS DOUBLE) AS expected
            FROM obs CROSS JOIN tot
        ), terms AS (
            SELECT digit, n_obs, p, expected,
                   CAST(round((CAST(n_obs AS DOUBLE) - expected)
                              * (CAST(n_obs AS DOUBLE) - expected)
                              / expected, 6) AS DECIMAL(18,6)) AS term
            FROM scored
        )
        SELECT digit,
               CAST(n_obs AS BIGINT) AS n_obs,
               round(p, 6) AS p_expected,
               round(expected, 4) AS expected_n,
               CAST(term AS DOUBLE) AS chi2_term,
               CAST(sum(term) OVER () AS DOUBLE) AS chi2,
               CAST(sum(term) OVER () AS DOUBLE) > {chi2_cut} AS deviates
        FROM terms
        ORDER BY digit
    """


# --------------------------------------------------------------------------
# HBOS multivariate outlier scoring
# --------------------------------------------------------------------------

def q_hbos_outliers(
    spark: SparkSession, sf_dir: str, bins: int = 10
) -> DataFrame:
    """Histogram-based outlier score (Goldstein & Dengel 2012) over
    events: the linear-time multivariate anomaly read next to the
    trailing-window z-score/MAD family — per feature, bin the value
    and score -log10(p_bin); an event's HBOS is the SUM over
    features, so a point is anomalous when it is jointly rare across
    independent histograms (a cheap naive-Bayes density estimate,
    no pair work, no model).

    Features: equal-width value bin (global min/max via a 1-row
    broadcast), hour of day, and the event type (categorical bins as
    themselves). Each histogram is one map-side-combined groupBy;
    scoring is three broadcast joins of parameter-sized histograms
    back onto one fact scan. Exactness: probabilities are exact
    integer ratios, each -log10 term rounds to 6 and the per-event
    sum folds as DECIMAL (order-independent); the outlier flag cuts
    at the exact p99 of the scores (the percentile idiom
    q_percentiles pinned cross-engine)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").cast("double").alias("v"),
        F.hour("ts").alias("hour"),
        "event_type",
    )
    stats = ev.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n_total"),
    )
    binned = ev.crossJoin(F.broadcast(stats)).withColumn(
        "vbin",
        F.least(
            F.lit(bins - 1),
            F.floor(
                (F.col("v") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(float(bins)))
            ).cast("int"),
        ),
    )

    def hist(col: str):
        return binned.groupBy(col).agg(F.count(F.lit(1)).alias(f"c_{col}"))

    term = lambda c: F.round(  # noqa: E731
        -F.log10(F.col(c).cast("double") / F.col("n_total").cast("double")),
        6,
    ).cast("decimal(18,6)")
    scored = (
        binned.join(F.broadcast(hist("vbin")), "vbin")
        .join(F.broadcast(hist("hour")), "hour")
        .join(F.broadcast(hist("event_type")), "event_type")
        .withColumn(
            "hbos",
            (term("c_vbin") + term("c_hour") + term("c_event_type"))
            .cast("double"),
        )
    )
    cut = scored.agg(
        F.percentile("hbos", F.lit(0.99)).alias("p99")
    )
    return (
        scored.crossJoin(F.broadcast(cut))
        .select(
            "event_id",
            F.col("vbin"),
            F.col("hour"),
            "event_type",
            F.round("hbos", 6).alias("hbos"),
            (F.col("hbos") >= F.col("p99")).alias("is_outlier"),
        )
        .orderBy("event_id")
    )


def hbos_oracle_sql(bins: int = 10) -> str:
    """DuckDB twin of q_hbos_outliers: identical binning, identical
    rounded-decimal -log10 fold, identical exact-percentile cut."""
    b = float(bins)
    return f"""
        WITH ev AS (
            SELECT event_id, CAST(value AS DOUBLE) AS v,
                   EXTRACT(hour FROM ts) AS hour, event_type
            FROM events
        ), stats AS (
            SELECT min(v) AS lo, max(v) AS hi, count(*) AS n_total
            FROM ev
        ), binned AS (
            SELECT event_id, hour, event_type, n_total,
                   least({bins} - 1, CAST(floor(
                       (v - lo) / ((hi - lo) / {b})) AS INT)) AS vbin
            FROM ev CROSS JOIN stats
        ), hv AS (
            SELECT vbin, count(*) AS c_vbin FROM binned GROUP BY 1
        ), hh AS (
            SELECT hour, count(*) AS c_hour FROM binned GROUP BY 1
        ), ht AS (
            SELECT event_type, count(*) AS c_event_type
            FROM binned GROUP BY 1
        ), scored AS (
            SELECT b.event_id, b.vbin, b.hour, b.event_type,
                   CAST(
                     CAST(round(-log10(CAST(c_vbin AS DOUBLE)
                         / CAST(n_total AS DOUBLE)), 6) AS DECIMAL(18,6))
                   + CAST(round(-log10(CAST(c_hour AS DOUBLE)
                         / CAST(n_total AS DOUBLE)), 6) AS DECIMAL(18,6))
                   + CAST(round(-log10(CAST(c_event_type AS DOUBLE)
                         / CAST(n_total AS DOUBLE)), 6) AS DECIMAL(18,6))
                   AS DOUBLE) AS hbos
            FROM binned b
            JOIN hv USING (vbin) JOIN hh USING (hour)
            JOIN ht USING (event_type)
        ), cut AS (
            SELECT quantile_cont(hbos, 0.99) AS p99 FROM scored
        )
        SELECT event_id, vbin, hour, event_type,
               round(hbos, 6) AS hbos,
               hbos >= p99 AS is_outlier
        FROM scored CROSS JOIN cut
        ORDER BY event_id
    """


# --------------------------------------------------------------------------
# Post-stratified average treatment effect
# --------------------------------------------------------------------------

def stratified_ate(
    df: DataFrame,
    treatment_col: str = "treated",
    outcome_col: str = "y",
    stratum_col: str = "stratum",
) -> DataFrame:
    """Post-stratified average-treatment-effect estimate (Cochran
    1968 — the adjustment behind every observational A/B readout):
    when treatment assignment correlates with a confounder, the naive
    treated-vs-control rate difference is biased; stratifying on the
    confounder and size-weighting the within-stratum differences
    removes the confounding the strata capture. Emits one row per
    stratum (rates, difference, weight) with the dataset-level ATE
    and the naive contrast side by side — the gap between the two IS
    the measured confounding.

    One (stratum, treatment) aggregate with map-side combine, then
    parameter-sized stratum work. Exactness: every rate is one double
    division of exact integer counts, the weighted per-stratum terms
    round to 6 and fold as DECIMAL, so both engines report the
    identical ATE."""
    t = F.col(treatment_col).cast("long")
    y = F.col(outcome_col).cast("long")
    per = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum(t).alias("n1"),
        F.sum(t * y).alias("k1"),
        F.sum(1 - t).alias("n0"),
        F.sum((1 - t) * y).alias("k0"),
    )
    tot = per.agg(
        F.sum("n_s").alias("n_total"),
        F.sum("n1").alias("n1_t"),
        F.sum("k1").alias("k1_t"),
        F.sum("n0").alias("n0_t"),
        F.sum("k0").alias("k0_t"),
    )
    rate1 = F.col("k1").cast("double") / F.col("n1").cast("double")
    rate0 = F.col("k0").cast("double") / F.col("n0").cast("double")
    diff = rate1 - rate0
    term = F.round(
        diff * (F.col("n_s").cast("double") / F.col("n_total").cast("double")),
        6,
    ).cast("decimal(18,6)")
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    naive = (
        F.col("k1_t").cast("double") / F.col("n1_t").cast("double")
        - F.col("k0_t").cast("double") / F.col("n0_t").cast("double")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            stratum_col,
            "n_s",
            "n1",
            "n0",
            F.round(rate1, 6).alias("rate_treated"),
            F.round(rate0, 6).alias("rate_control"),
            F.round(diff, 6).alias("diff"),
            F.sum(term).over(w).cast("double").alias("ate"),
            F.round(naive, 6).alias("naive_diff"),
        )
        .orderBy(stratum_col)
    )


def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing post-stratified ATE over events: treatment =
    user-id parity, outcome = purchase, strata = four six-hour
    day-part bands (the time-of-day confounder every engagement
    readout must adjust for)."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 0).alias("treated"),
        (F.col("event_type") == "purchase").alias("y"),
        F.floor(F.hour("ts") / 6).cast("int").alias("stratum"),
    )
    return stratified_ate(ev)


def stratified_ate_oracle_sql() -> str:
    """DuckDB twin of q_stratified_ate: identical counts, divisions,
    and rounded-decimal weighted fold."""
    return """
        WITH base AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                   CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS stratum
            FROM events
        ), per AS (
            SELECT stratum,
                   count(*) AS n_s,
                   sum(t) AS n1, sum(t * y) AS k1,
                   sum(1 - t) AS n0, sum((1 - t) * y) AS k0
            FROM base GROUP BY 1
        ), tot AS (
            SELECT sum(n_s) AS n_total, sum(n1) AS n1_t, sum(k1) AS k1_t,
                   sum(n0) AS n0_t, sum(k0) AS k0_t
            FROM per
        ), scored AS (
            SELECT p.stratum, p.n_s, p.n1, p.n0,
                   CAST(p.k1 AS DOUBLE) / CAST(p.n1 AS DOUBLE) AS rate1,
                   CAST(p.k0 AS DOUBLE) / CAST(p.n0 AS DOUBLE) AS rate0,
                   CAST(round((CAST(p.k1 AS DOUBLE) / CAST(p.n1 AS DOUBLE)
                        - CAST(p.k0 AS DOUBLE) / CAST(p.n0 AS DOUBLE))
                        * (CAST(p.n_s AS DOUBLE)
                           / CAST(t.n_total AS DOUBLE)), 6)
                        AS DECIMAL(18,6)) AS term,
                   CAST(t.k1_t AS DOUBLE) / CAST(t.n1_t AS DOUBLE)
                   - CAST(t.k0_t AS DOUBLE) / CAST(t.n0_t AS DOUBLE)
                       AS naive
            FROM per p CROSS JOIN tot t
        )
        SELECT stratum,
               CAST(n_s AS BIGINT) AS n_s,
               CAST(n1 AS BIGINT) AS n1,
               CAST(n0 AS BIGINT) AS n0,
               round(rate1, 6) AS rate_treated,
               round(rate0, 6) AS rate_control,
               round(rate1 - rate0, 6) AS diff,
               CAST(sum(term) OVER () AS DOUBLE) AS ate,
               round(naive, 6) AS naive_diff
        FROM scored
        ORDER BY stratum
    """


# --------------------------------------------------------------------------
# Split-conformal prediction intervals
# --------------------------------------------------------------------------

def q_conformal_interval(
    spark: SparkSession, sf_dir: str, alpha: float = 0.1
) -> DataFrame:
    """Split-conformal prediction interval (Vovk et al. 2005; the
    Lei et al. 2018 split form) over events: distribution-free
    uncertainty for ANY point predictor — here the hour-of-day mean
    fitted on a training split — by taking the (1-alpha) quantile of
    absolute residuals on a held-out CALIBRATION split; the
    guarantee (coverage >= 1-alpha on exchangeable data) holds no
    matter how bad the predictor is. Emits one row per hour with the
    fitted center and the dataset-level interval half-width q_alpha,
    plus the measured coverage on a third TEST split — the
    finite-sample check of the guarantee.

    Splits are md5-coin thirds (replay-stable, the dataset-split
    discipline). Exactness: the center is one division of exact
    centi-unit integer sums; residuals are identical doubles; the
    calibration quantile is the exact-percentile idiom
    (q_percentiles); coverage is an integer count ratio. Two
    aggregates + one broadcast join on a single fact scan per
    split."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.hour("ts").alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).alias(
            "coin"
        ),
    )
    split = (
        F.when(F.col("coin") < "6", F.lit("train"))
        .when(F.col("coin") < "b", F.lit("calib"))
        .otherwise(F.lit("test"))
    )
    ev = ev.withColumn("split", split)
    centers = (
        ev.where(F.col("split") == "train")
        .groupBy("hour")
        .agg(
            (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double")
             / F.lit(100.0)).alias("center"),
            F.count(F.lit(1)).alias("n_train"),
        )
    )
    resid = F.abs(
        F.col("cents").cast("double") / F.lit(100.0) - F.col("center")
    )
    calib = (
        ev.where(F.col("split") == "calib")
        .join(F.broadcast(centers), "hour")
        .agg(
            F.percentile(resid, F.lit(1.0 - alpha)).alias("q_alpha"),
            F.count(F.lit(1)).alias("n_calib"),
        )
    )
    test = (
        ev.where(F.col("split") == "test")
        .join(F.broadcast(centers), "hour")
        .crossJoin(F.broadcast(calib))
        .agg(
            F.max("q_alpha").alias("q_alpha"),
            F.max("n_calib").alias("n_calib"),
            F.count(F.lit(1)).alias("n_test"),
            F.sum((resid <= F.col("q_alpha")).cast("long")).alias("n_in"),
        )
    )
    return (
        centers.crossJoin(F.broadcast(test))
        .select(
            "hour",
            "n_train",
            F.round("center", 6).alias("center"),
            F.round("q_alpha", 6).alias("q_alpha"),
            "n_calib",
            "n_test",
            F.round(
                F.col("n_in").cast("double") / F.col("n_test").cast("double"),
                6,
            ).alias("test_coverage"),
            F.lit(1.0 - alpha).alias("target_coverage"),
        )
        .orderBy("hour")
    )


def conformal_interval_oracle_sql(alpha: float = 0.1) -> str:
    """DuckDB twin of q_conformal_interval: identical md5 thirds,
    centi-unit centers, exact residual quantile, count-ratio
    coverage."""
    return f"""
        WITH ev AS (
            SELECT event_id,
                   EXTRACT(hour FROM ts) AS hour,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CASE WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
                             < '6' THEN 'train'
                        WHEN substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
                             < 'b' THEN 'calib'
                        ELSE 'test' END AS split
            FROM events
        ), centers AS (
            SELECT hour,
                   CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       / 100.0 AS center,
                   count(*) AS n_train
            FROM ev WHERE split = 'train' GROUP BY hour
        ), calib AS (
            SELECT quantile_cont(
                       abs(CAST(e.cents AS DOUBLE) / 100.0 - c.center),
                       {1.0 - alpha}) AS q_alpha,
                   count(*) AS n_calib
            FROM ev e JOIN centers c USING (hour)
            WHERE e.split = 'calib'
        ), test AS (
            SELECT max(q.q_alpha) AS q_alpha,
                   max(q.n_calib) AS n_calib,
                   count(*) AS n_test,
                   sum(CASE WHEN abs(CAST(e.cents AS DOUBLE) / 100.0
                                     - c.center) <= q.q_alpha
                            THEN 1 ELSE 0 END) AS n_in
            FROM ev e JOIN centers c USING (hour) CROSS JOIN calib q
            WHERE e.split = 'test'
        )
        SELECT c.hour,
               CAST(c.n_train AS BIGINT) AS n_train,
               round(c.center, 6) AS center,
               round(t.q_alpha, 6) AS q_alpha,
               CAST(t.n_calib AS BIGINT) AS n_calib,
               CAST(t.n_test AS BIGINT) AS n_test,
               round(CAST(t.n_in AS DOUBLE) / CAST(t.n_test AS DOUBLE), 6)
                   AS test_coverage,
               CAST({1.0 - alpha} AS DOUBLE) AS target_coverage
        FROM centers c CROSS JOIN test t
        ORDER BY c.hour
    """


# --------------------------------------------------------------------------
# Experiment power sizing (minimum detectable effect)
# --------------------------------------------------------------------------

def q_mde_power(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Minimum detectable effect per event type at the CURRENT sample
    sizes — the pre-registration read an experimentation platform
    shows before anyone launches: with arms split by user parity and
    the conversion defined per event type, the two-proportion MDE at
    alpha=0.05 / power=0.8 is (z_{1-a/2} + z_{1-b}) *
    sqrt(p(1-p)(1/n1+1/n0)). Effects smaller than this are
    undetectable at the planned test; the relative column says it in
    percent-of-baseline terms.

    One (type, arm) aggregate with map-side combine, then
    parameter-sized rows. Exactness: counts are exact integers, the
    z constants are shared Python literals, and IEEE-754 specifies
    sqrt as correctly rounded — so the one sqrt per row is
    bit-identical across engines (unlike exp/ln, sqrt needs no
    rounding discipline)."""
    z_a = 1.959963984540054  # Phi^-1(0.975)
    z_b = 0.8416212335729143  # Phi^-1(0.8)
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2 == 0).cast("long").alias("t"),
        F.lit(1).alias("one"),
    )
    per = ev.groupBy("event_type").agg(
        F.sum("t").alias("n1"),
        F.sum(1 - F.col("t")).alias("n0"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = ev.agg(
        F.count(F.lit(1)).alias("n_all"),
    )
    p = F.col("n").cast("double") / F.col("n_all").cast("double")
    mde = (
        F.lit(z_a + z_b)
        * F.sqrt(
            p * (F.lit(1.0) - p)
            * (
                F.lit(1.0) / F.col("n1").cast("double")
                + F.lit(1.0) / F.col("n0").cast("double")
            )
        )
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n1",
            "n0",
            F.round(p, 6).alias("p_baseline"),
            F.round(mde, 6).alias("mde_abs"),
            F.round(mde / p, 6).alias("mde_rel"),
        )
        .orderBy("event_type")
    )


def mde_power_oracle_sql() -> str:
    """DuckDB twin of q_mde_power: identical literals and the
    identical IEEE sqrt expression."""
    z = repr(1.959963984540054 + 0.8416212335729143)
    return f"""
        WITH ev AS (
            SELECT event_type,
                   CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t
            FROM events
        ), per AS (
            SELECT event_type, sum(t) AS n1, sum(1 - t) AS n0,
                   count(*) AS n
            FROM ev GROUP BY 1
        ), tot AS (
            SELECT count(*) AS n_all FROM ev
        )
        SELECT event_type,
               CAST(n1 AS BIGINT) AS n1,
               CAST(n0 AS BIGINT) AS n0,
               round(CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
                   AS p_baseline,
               round(CAST({z} AS DOUBLE) * sqrt(
                   (CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE))
                   * (1.0 - CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE))
                   * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE))
               ), 6) AS mde_abs,
               round(CAST({z} AS DOUBLE) * sqrt(
                   (CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE))
                   * (1.0 - CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE))
                   * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE))
               ) / (CAST(n AS DOUBLE) / CAST(n_all AS DOUBLE)), 6)
                   AS mde_rel
        FROM per CROSS JOIN tot
        ORDER BY event_type
    """


# --------------------------------------------------------------------------
# Categorical association: chi-square independence + Cramér's V
# --------------------------------------------------------------------------

def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test + Cramér's V between event type
    and day-part band — the categorical-association read behind
    feature screening and segmentation sanity checks (V is the
    scale-free effect size the raw chi-square statistic is not: it
    answers "does WHAT users do depend on WHEN they do it" without
    growing with N). One row per contingency cell with observed vs
    expected counts and the dataset-level statistic, V, and the
    V >= 0.1 association flag.

    One (type, band) aggregate with map-side combine, then
    parameter-sized cell work (marginals join back by broadcast).
    The contingency table is COMPLETED to the full r x c grid before
    scoring — unobserved cells contribute (0 - E)^2 / E, and dropping
    them silently understates the statistic (a perfectly diagonal
    table would read chi2 = 2N/3 instead of 2N; caught by the V = 1
    closed-form pin). Exactness: expected counts are exact integer
    products over one division, chi-square terms fold as rounded
    DECIMALs, and V's square root is IEEE-correctly-rounded —
    oracle-exact end to end."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.hour("ts") / 6).cast("int").alias("band"),
    )
    observed = ev.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    rowm = observed.groupBy("event_type").agg(
        F.sum("n_obs").alias("row_tot")
    )
    colm = observed.groupBy("band").agg(F.sum("n_obs").alias("col_tot"))
    cells = (
        rowm.crossJoin(F.broadcast(colm))
        .join(observed, ["event_type", "band"], "left")
        .na.fill({"n_obs": 0})
    )
    tot = observed.agg(
        F.sum("n_obs").alias("n_total"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("band").alias("c"),
    )
    expected = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n_total").cast("double")
    )
    term = F.round(
        (F.col("n_obs").cast("double") - expected)
        * (F.col("n_obs").cast("double") - expected)
        / expected,
        6,
    ).cast("decimal(18,6)")
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chi2 = F.sum(term).over(w).cast("double")
    v = F.sqrt(
        chi2
        / (
            F.col("n_total").cast("double")
            * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
        )
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "band",
            "n_obs",
            F.round(expected, 4).alias("expected_n"),
            F.round(chi2, 6).alias("chi2"),
            F.round(v, 6).alias("cramers_v"),
            (F.round(v, 6) >= 0.1).alias("associated"),
        )
        .orderBy("event_type", "band")
    )


def chi2_independence_oracle_sql() -> str:
    """DuckDB twin of q_chi2_independence."""
    return """
        WITH ev AS (
            SELECT event_type,
                   CAST(floor(EXTRACT(hour FROM ts) / 6) AS INT) AS band
            FROM events
        ), observed AS (
            SELECT event_type, band, count(*) AS n_obs
            FROM ev GROUP BY 1, 2
        ), rowm AS (
            SELECT event_type, sum(n_obs) AS row_tot
            FROM observed GROUP BY 1
        ), colm AS (
            SELECT band, sum(n_obs) AS col_tot FROM observed GROUP BY 1
        ), cells AS (
            SELECT r.event_type, c.band, r.row_tot, c.col_tot,
                   coalesce(o.n_obs, 0) AS n_obs
            FROM rowm r
            CROSS JOIN colm c
            LEFT JOIN observed o
              ON o.event_type = r.event_type AND o.band = c.band
        ), tot AS (
            SELECT sum(n_obs) AS n_total,
                   count(DISTINCT event_type) AS r,
                   count(DISTINCT band) AS c
            FROM observed
        ), scored AS (
            SELECT cells.event_type, cells.band, cells.n_obs,
                   CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                       / CAST(n_total AS DOUBLE) AS expected,
                   CAST(round(
                       (CAST(n_obs AS DOUBLE)
                        - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                          / CAST(n_total AS DOUBLE))
                       * (CAST(n_obs AS DOUBLE)
                          - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                            / CAST(n_total AS DOUBLE))
                       / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                          / CAST(n_total AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) AS term,
                   n_total, r, c
            FROM cells
            CROSS JOIN tot
        )
        SELECT event_type, band,
               CAST(n_obs AS BIGINT) AS n_obs,
               round(expected, 4) AS expected_n,
               round(CAST(sum(term) OVER () AS DOUBLE), 6) AS chi2,
               round(sqrt(CAST(sum(term) OVER () AS DOUBLE)
                     / (CAST(n_total AS DOUBLE)
                        * CAST(least(r - 1, c - 1) AS DOUBLE))), 6)
                   AS cramers_v,
               round(sqrt(CAST(sum(term) OVER () AS DOUBLE)
                     / (CAST(n_total AS DOUBLE)
                        * CAST(least(r - 1, c - 1) AS DOUBLE))), 6) >= 0.1
                   AS associated
        FROM scored
        ORDER BY event_type, band
    """


# --------------------------------------------------------------------------
# Peak detection and Theil-Sen robust trend
# --------------------------------------------------------------------------

def q_peak_detection(
    spark: SparkSession, sf_dir: str, w: int = 3
) -> DataFrame:
    """Windowed peak detection over per-type daily totals: a day is a
    PEAK when it is the maximum of its +/-``w``-day window AND at
    least twice the window's average — the margin floor that
    separates campaign spikes from ordinary wiggle (a bare local-max
    test flags half the series). The alerting read next to the
    z-score/CUSUM family: those find level SHIFTS, this finds
    isolated spikes.

    Exactness: daily totals are exact centi-unit integers, the window
    max is integer, and the margin test v >= 2*avg is evaluated as
    the INTEGER cross-product v*n >= 2*sum — no division anywhere.
    One fact aggregate, then one RANGE-framed window per type over
    the dimension-sized daily table."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("cents").alias("v")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-w * 86400, w * 86400)
    )
    scored = daily.select(
        "event_type",
        "day",
        "v",
        F.max("v").over(win).alias("w_max"),
        F.sum("v").over(win).alias("w_sum"),
        F.count(F.lit(1)).over(win).alias("w_n"),
    )
    return scored.select(
        "event_type",
        "day",
        F.round(F.col("v").cast("double") / 100.0, 2).alias("daily_total"),
        (
            (F.col("v") == F.col("w_max"))
            & (F.col("v") * F.col("w_n") >= 2 * F.col("w_sum"))
        ).alias("is_peak"),
    ).orderBy("event_type", "day")


def peak_detection_oracle_sql(w: int = 3) -> str:
    """DuckDB twin of q_peak_detection: identical integer window
    tests."""
    secs = w * 86400
    return f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS v
            FROM events GROUP BY 1, 2
        ), scored AS (
            SELECT event_type, day, v,
                   max(v) OVER win AS w_max,
                   sum(v) OVER win AS w_sum,
                   count(*) OVER win AS w_n
            FROM daily
            WINDOW win AS (
                PARTITION BY event_type
                ORDER BY epoch(CAST(day AS TIMESTAMP))
                RANGE BETWEEN {secs} PRECEDING AND {secs} FOLLOWING)
        )
        SELECT event_type, day,
               round(CAST(v AS DOUBLE) / 100.0, 2) AS daily_total,
               (v = w_max AND v * w_n >= 2 * w_sum) AS is_peak
        FROM scored
        ORDER BY event_type, day
    """


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all
    pairwise day-to-day slopes — the robust partner of
    q_series_ols_trend (one campaign-spike day drags an OLS slope;
    the median slope shrugs it off, tolerating ~29% outliers). Pair
    work is WITHIN each type's dimension-sized daily series (~days^2
    per type, the documented bounded-cell contract — the fact table
    is aggregated to days before any pairing), so the self-join never
    touches event rows.

    Exactness: each slope is one double division of exact integer
    (cents, days) differences; the median is the exact-percentile
    idiom over identical doubles."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("cents").alias("v")
    )
    a = daily.select(
        "event_type",
        F.col("day").alias("d1"),
        F.col("v").alias("v1"),
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("d2"),
        F.col("v").alias("v2"),
    )
    slopes = (
        a.join(b, "event_type")
        .where(F.col("d2") > F.col("d1"))
        .select(
            "event_type",
            (
                (F.col("v2") - F.col("v1")).cast("double")
                / F.datediff("d2", "d1").cast("double")
                / F.lit(100.0)
            ).alias("slope"),
        )
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.percentile("slope", F.lit(0.5)), 4).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


def theil_sen_oracle_sql() -> str:
    """DuckDB twin of q_theil_sen_trend."""
    return """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS v
            FROM events GROUP BY 1, 2
        ), slopes AS (
            SELECT a.event_type,
                   CAST(b.v - a.v AS DOUBLE)
                   / CAST(date_diff('day', a.day, b.day) AS DOUBLE)
                   / 100.0 AS slope
            FROM daily a
            JOIN daily b
              ON a.event_type = b.event_type AND b.day > a.day
        )
        SELECT event_type,
               count(*) AS n_pairs,
               round(quantile_cont(slope, 0.5), 4) AS theil_sen_slope
        FROM slopes
        GROUP BY event_type
        ORDER BY event_type
    """


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test (Mantel 1966) between two repeat-purchase
    survival curves — the hypothesis-test companion of
    q_kaplan_meier: do machinery-segment customers reorder on a
    different clock than everyone else, accounting for censoring?
    At each event time the observed arm-1 events compare against the
    hypergeometric expectation from the shared risk set; the summed
    (O - E) over the summed variance is chi-square(1).

    Same subject construction as q_kaplan_meier (second distinct
    order date = event, censored at the horizon) with arm =
    (mktsegment = MACHINERY). One subject shuffle folds to the
    dimension-sized per-duration table; per-time expectation and
    variance terms are exact integer rationals evaluated identically
    and folded through rounded DECIMALs; the final statistic is one
    shared expression."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"), F.col("o_orderdate").alias("dt")
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust"),
        (F.col("c_mktsegment") == "MACHINERY").cast("long").alias("arm"),
    )
    dd = o.distinct()
    w = Window.partitionBy("cust").orderBy("dt")
    ranked = dd.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 2
    )
    per_cust = ranked.groupBy("cust").agg(
        F.min(F.when(F.col("rn") == 1, F.col("dt"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("dt"))).alias("d2"),
    )
    maxd = o.agg(F.max("dt").alias("dmax"))
    subjects = (
        per_cust.crossJoin(F.broadcast(maxd))
        .join(cust, "cust")
        .select(
            "arm",
            F.when(
                F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
            )
            .otherwise(F.datediff(F.col("dmax"), F.col("d1")))
            .cast("long")
            .alias("t"),
            F.col("d2").isNotNull().cast("long").alias("event"),
        )
    )
    per_t = subjects.groupBy("t").agg(
        F.sum("event").alias("d"),
        F.sum(F.col("event") * F.col("arm")).alias("d1a"),
        F.count(F.lit(1)).alias("arrivals"),
        F.sum("arm").alias("arrivals1"),
    )
    tot = subjects.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("arm").alias("n_arm1"),
    )
    wt = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "d1a",
        (
            F.col("n_all") - (F.sum("arrivals").over(wt) - F.col("arrivals"))
        ).alias("n"),
        (
            F.col("n_arm1")
            - (F.sum("arrivals1").over(wt) - F.col("arrivals1"))
        ).alias("n1"),
    ).where(F.col("d") > 0)
    nd = F.col("n").cast("double")
    n1d = F.col("n1").cast("double")
    dd_ = F.col("d").cast("double")
    e_term = F.round(dd_ * n1d / nd, 6).cast("decimal(18,6)")
    v_term = F.round(
        F.when(
            F.col("n") > 1,
            dd_
            * (n1d / nd)
            * (1 - n1d / nd)
            * (nd - dd_)
            / (nd - 1),
        ).otherwise(F.lit(0.0)),
        6,
    ).cast("decimal(18,6)")
    agg = risk.agg(
        F.sum("d1a").alias("o1"),
        F.sum(e_term).cast("double").alias("e1"),
        F.sum(v_term).cast("double").alias("v"),
        F.count(F.lit(1)).alias("n_event_times"),
    )
    chi2 = (
        (F.col("o1").cast("double") - F.col("e1"))
        * (F.col("o1").cast("double") - F.col("e1"))
        / F.col("v")
    )
    return agg.select(
        "n_event_times",
        "o1",
        F.round("e1", 4).alias("e1"),
        F.round("v", 4).alias("variance"),
        F.round(chi2, 4).alias("chi2"),
        (F.round(chi2, 4) > 3.841).alias("curves_differ"),
    )


def logrank_oracle_sql() -> str:
    """DuckDB twin of q_logrank_test."""
    return """
        WITH dd AS (
            SELECT DISTINCT o_custkey AS cust, o_orderdate AS dt
            FROM orders
        ), ranked AS (
            SELECT cust, dt,
                   row_number() OVER (PARTITION BY cust ORDER BY dt) AS rn
            FROM dd
        ), per_cust AS (
            SELECT cust,
                   min(CASE WHEN rn = 1 THEN dt END) AS d1,
                   min(CASE WHEN rn = 2 THEN dt END) AS d2
            FROM ranked WHERE rn <= 2 GROUP BY cust
        ), maxd AS (
            SELECT max(o_orderdate) AS dmax FROM orders
        ), subjects AS (
            SELECT CASE WHEN c.c_mktsegment = 'MACHINERY'
                        THEN 1 ELSE 0 END AS arm,
                   CASE WHEN p.d2 IS NOT NULL
                        THEN date_diff('day', p.d1, p.d2)
                        ELSE date_diff('day', p.d1, m.dmax) END AS t,
                   CASE WHEN p.d2 IS NOT NULL THEN 1 ELSE 0 END AS event
            FROM per_cust p
            CROSS JOIN maxd m
            JOIN customer c ON c.c_custkey = p.cust
        ), per_t AS (
            SELECT t, sum(event) AS d,
                   sum(event * arm) AS d1a,
                   count(*) AS arrivals,
                   sum(arm) AS arrivals1
            FROM subjects GROUP BY t
        ), tot AS (
            SELECT count(*) AS n_all, sum(arm) AS n_arm1 FROM subjects
        ), risk AS (
            SELECT t, d, d1a,
                   n_all - (sum(arrivals) OVER wt - arrivals) AS n,
                   n_arm1 - (sum(arrivals1) OVER wt - arrivals1) AS n1
            FROM per_t CROSS JOIN tot
            WINDOW wt AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)
        ), terms AS (
            SELECT d1a, 
                   CAST(round(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
                              / CAST(n AS DOUBLE), 6)
                        AS DECIMAL(18,6)) AS e_term,
                   CAST(round(CASE WHEN n > 1 THEN
                       CAST(d AS DOUBLE)
                       * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1)
                       ELSE 0.0 END, 6) AS DECIMAL(18,6)) AS v_term
            FROM risk WHERE d > 0
        )
        SELECT count(*) AS n_event_times,
               CAST(sum(d1a) AS BIGINT) AS o1,
               round(CAST(sum(e_term) AS DOUBLE), 4) AS e1,
               round(CAST(sum(v_term) AS DOUBLE), 4) AS variance,
               round((CAST(sum(d1a) AS DOUBLE)
                      - CAST(sum(e_term) AS DOUBLE))
                     * (CAST(sum(d1a) AS DOUBLE)
                        - CAST(sum(e_term) AS DOUBLE))
                     / CAST(sum(v_term) AS DOUBLE), 4) AS chi2,
               round((CAST(sum(d1a) AS DOUBLE)
                      - CAST(sum(e_term) AS DOUBLE))
                     * (CAST(sum(d1a) AS DOUBLE)
                        - CAST(sum(e_term) AS DOUBLE))
                     / CAST(sum(v_term) AS DOUBLE), 4) > 3.841
                   AS curves_differ
        FROM terms
    """


def q_winsorized_stats(
    spark: SparkSession, sf_dir: str, lo_q: float = 0.05, hi_q: float = 0.95
) -> DataFrame:
    """Winsorized and trimmed means per event type — the robust
    location estimates a metrics pipeline publishes next to the raw
    mean when heavy tails are suspected: winsorizing CLIPS values to
    the [p05, p95] band (keeps the row count), trimming DROPS the
    tails (changes it), and the spread between the three numbers is
    itself the tail-heaviness read. Completes the robust-stats row
    next to MAD anomalies and the Theil-Sen slope.

    Two passes over one fact table: exact per-type percentiles (the
    pinned cross-engine idiom), broadcast back, then one aggregate.
    Exactness: raw and trimmed means are divisions of exact
    centi-unit integer sums; clipped values round to 6 and fold as
    DECIMAL (clip bounds are interpolated doubles, identical on both
    engines)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    bounds = ev.groupBy("event_type").agg(
        F.percentile(F.col("cents").cast("double"), F.lit(lo_q)).alias("lo"),
        F.percentile(F.col("cents").cast("double"), F.lit(hi_q)).alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clipped = F.round(
        F.least(
            F.greatest(F.col("cents").cast("double"), F.col("lo")),
            F.col("hi"),
        ),
        6,
    ).cast("decimal(28,6)")
    in_band = (F.col("cents").cast("double") >= F.col("lo")) & (
        F.col("cents").cast("double") <= F.col("hi")
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("lo") / 100.0, 4).alias("p_lo"),
            F.round(F.max("hi") / 100.0, 4).alias("p_hi"),
            F.round(
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 100.0,
                4,
            ).alias("raw_mean"),
            F.round(
                F.sum(clipped).cast("double")
                / F.count(F.lit(1)).cast("double")
                / 100.0,
                4,
            ).alias("winsorized_mean"),
            F.sum(in_band.cast("long")).alias("n_kept"),
            F.round(
                F.sum(F.when(in_band, F.col("cents")).otherwise(0)).cast(
                    "double"
                )
                / F.sum(in_band.cast("long")).cast("double")
                / 100.0,
                4,
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


def winsorized_stats_oracle_sql(
    lo_q: float = 0.05, hi_q: float = 0.95
) -> str:
    """DuckDB twin of q_winsorized_stats."""
    return f"""
        WITH ev AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ), bounds AS (
            SELECT event_type,
                   quantile_cont(CAST(cents AS DOUBLE), {lo_q}) AS lo,
                   quantile_cont(CAST(cents AS DOUBLE), {hi_q}) AS hi
            FROM ev GROUP BY event_type
        )
        SELECT e.event_type,
               count(*) AS n,
               round(max(b.lo) / 100.0, 4) AS p_lo,
               round(max(b.hi) / 100.0, 4) AS p_hi,
               round(CAST(sum(e.cents) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) / 100.0, 4) AS raw_mean,
               round(CAST(sum(CAST(round(least(greatest(
                         CAST(e.cents AS DOUBLE), b.lo), b.hi), 6)
                         AS DECIMAL(28,6))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) / 100.0, 4)
                   AS winsorized_mean,
               CAST(sum(CASE WHEN CAST(e.cents AS DOUBLE) >= b.lo
                              AND CAST(e.cents AS DOUBLE) <= b.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               round(CAST(sum(CASE WHEN CAST(e.cents AS DOUBLE) >= b.lo
                                    AND CAST(e.cents AS DOUBLE) <= b.hi
                                   THEN e.cents ELSE 0 END) AS DOUBLE)
                     / CAST(sum(CASE WHEN CAST(e.cents AS DOUBLE) >= b.lo
                                      AND CAST(e.cents AS DOUBLE) <= b.hi
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                     / 100.0, 4) AS trimmed_mean
        FROM ev e JOIN bounds b USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """


def q_ks_test(
    spark: SparkSession,
    sf_dir: str,
    type_a: str = "click",
    type_b: str = "purchase",
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between two event types'
    value distributions — the classic distribution-equality check a
    data pipeline runs before pooling sources or after a dial change
    (the drift family's nonparametric sibling: PSI/JSD bin first, KS
    uses the full empirical CDFs and needs no binning choice).

    Plan: one groupBy(value) per-side count aggregate (map-side
    combine; the distinct-value table is DIMENSION-sized, ~100
    distinct cents values here), then an ordered cumulative sum over
    distinct values and a global max — the supremum of |F_a - F_b|
    lands exactly on a distinct observed value, so the grouped scan
    is exact, never a sample. At 100 TB the shuffle carries only
    distinct values; the single-partition cumulative window is over
    the dimension table (the repo's established CDF shape).

    Exactness: D's numerator folds as max |ca*nB - cb*nA| over exact
    DECIMAL(38,0)s — the cross products multiply two corpus-scale
    counts, so at ~1e12 rows a BIGINT fold would overflow (~1e24)
    under the ANSI driver mirror; DECIMAL(38,0) holds to ~1e38, the
    same guard q_spearman_corr uses for this product shape. ONE
    double division at the end (rounded 6). The
    alpha=0.05 critical value is c(alpha)*sqrt((nA+nB)/(nA*nB)) with
    c = 1.358 — IEEE sqrt + one multiply, rounded 6 — and the reject
    flag compares the two rounded doubles, identically in both
    engines."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    sides = ev.where(F.col("event_type").isin([type_a, type_b])).select(
        "value",
        (F.col("event_type") == type_a).cast("long").alias("is_a"),
        (F.col("event_type") == type_b).cast("long").alias("is_b"),
    )
    per_v = sides.groupBy("value").agg(
        F.sum("is_a").alias("na_v"), F.sum("is_b").alias("nb_v")
    )
    wcum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_v.select(
        F.sum("na_v").over(wcum).alias("ca"),
        F.sum("nb_v").over(wcum).alias("cb"),
        F.sum("na_v").over(wall).alias("n_a"),
        F.sum("nb_v").over(wall).alias("n_b"),
    )
    dec = "decimal(38,0)"
    d_num = F.max(
        F.abs(
            F.col("ca").cast(dec) * F.col("n_b").cast(dec)
            - F.col("cb").cast(dec) * F.col("n_a").cast(dec)
        )
    )
    out = cum.groupBy("n_a", "n_b").agg(d_num.alias("d_num"))
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    ks_d = F.round(F.col("d_num").cast("double") / (nad * nbd), 6)
    crit = F.round(
        F.lit(1.358) * F.sqrt((nad + nbd) / (nad * nbd)), 6
    )
    return out.select(
        F.lit(type_a).alias("type_a"),
        F.lit(type_b).alias("type_b"),
        F.col("n_a"),
        F.col("n_b"),
        ks_d.alias("ks_d"),
        crit.alias("critical_005"),
        (ks_d > crit).alias("reject_h0"),
    )


def ks_test_oracle_sql(type_a: str = "click", type_b: str = "purchase") -> str:
    return f"""
        WITH sides AS (
            SELECT value,
                   CAST(event_type = '{type_a}' AS BIGINT) AS is_a,
                   CAST(event_type = '{type_b}' AS BIGINT) AS is_b
            FROM events
            WHERE event_type IN ('{type_a}', '{type_b}')
        ), per_v AS (
            SELECT value, sum(is_a) AS na_v, sum(is_b) AS nb_v
            FROM sides GROUP BY value
        ), cum AS (
            SELECT sum(na_v) OVER (ORDER BY value) AS ca,
                   sum(nb_v) OVER (ORDER BY value) AS cb,
                   sum(na_v) OVER () AS n_a,
                   sum(nb_v) OVER () AS n_b
            FROM per_v
        ), agg AS (
            -- DECIMAL(38,0) cross products, mirroring the Spark fold:
            -- BIGINT*BIGINT overflows at corpus scale (~1e24).
            SELECT n_a, n_b,
                   max(abs(CAST(ca AS DECIMAL(38,0))
                           * CAST(n_b AS DECIMAL(38,0))
                           - CAST(cb AS DECIMAL(38,0))
                           * CAST(n_a AS DECIMAL(38,0)))) AS d_num
            FROM cum GROUP BY n_a, n_b
        )
        SELECT '{type_a}' AS type_a, '{type_b}' AS type_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               round(CAST(d_num AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
                   AS ks_d,
               round(1.358 * sqrt((CAST(n_a AS DOUBLE)
                                   + CAST(n_b AS DOUBLE))
                                  / (CAST(n_a AS DOUBLE)
                                     * CAST(n_b AS DOUBLE))), 6)
                   AS critical_005,
               round(CAST(d_num AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
               > round(1.358 * sqrt((CAST(n_a AS DOUBLE)
                                     + CAST(n_b AS DOUBLE))
                                    / (CAST(n_a AS DOUBLE)
                                       * CAST(n_b AS DOUBLE))), 6)
                   AS reject_h0
        FROM agg
    """


def q_mannwhitney_u(
    spark: SparkSession,
    sf_dir: str,
    type_a: str = "click",
    type_b: str = "purchase",
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two event
    types' value distributions — the location-shift companion of
    q_ks_test (KS reacts to ANY distributional difference; the
    rank-sum is the standard "is one systematically larger" read,
    robust where the t-test's normality assumption fails).

    Plan: identical dimension-sized shape to q_ks_test — groupBy
    distinct value, ordered cumulative rank assignment, one global
    fold. Ties get midranks; with midranks DOUBLED every rank
    quantity is an exact integer (the repo's integer-scaling
    discipline), and the corpus-scale products — R1's na_v*r2_v and
    the tie term t^3 - t — fold as DECIMAL(38,0) (int64 overflows
    at ~1e12 rows under the ANSI driver mirror, the q_spearman_corr
    guard for this product shape); the z-score's normal
    approximation runs as a handful of double ops rounded 4, with
    the two-sided alpha=0.05 flag on |z| > 1.96."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    sides = ev.where(F.col("event_type").isin([type_a, type_b])).select(
        "value",
        (F.col("event_type") == type_a).cast("long").alias("is_a"),
        (F.col("event_type") == type_b).cast("long").alias("is_b"),
    )
    per_v = sides.groupBy("value").agg(
        F.sum("is_a").alias("na_v"), F.sum("is_b").alias("nb_v")
    )
    wcum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t_v = F.col("na_v") + F.col("nb_v")
    ranked = per_v.select(
        "na_v",
        t_v.alias("t_v"),
        # doubled midrank: 2*(#strictly below) + t + 1 — exact BIGINT
        (
            F.lit(2) * (F.sum(t_v).over(wcum) - t_v) + t_v + F.lit(1)
        ).alias("r2_v"),
    )
    # Corpus-scale product folds run as DECIMAL(38,0): na_v*r2_v and
    # t_v^3 both exceed int64 at ~1e12 rows (the q_spearman_corr
    # guard for this product shape); every term is still an exact
    # integer, just in a wider register.
    dec = "decimal(38,0)"
    agg = ranked.agg(
        F.sum(F.col("na_v").cast(dec) * F.col("r2_v").cast(dec)).alias(
            "r1_x2"
        ),
        F.sum("na_v").alias("n_a"),
        F.sum(F.col("t_v") - F.col("na_v")).alias("n_b"),
        F.sum(
            F.col("t_v").cast(dec) * F.col("t_v").cast(dec)
            * F.col("t_v").cast(dec)
            - F.col("t_v").cast(dec)
        ).alias("tie_t3"),
    )
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    nd = nad + nbd
    u1_x2 = F.col("r1_x2") - F.col("n_a").cast(dec) * (
        F.col("n_a") + 1
    ).cast(dec)
    u1 = F.round(u1_x2.cast("double") / 2.0, 1)
    mu = nad * nbd / 2.0
    sigma = F.sqrt(
        nad * nbd / 12.0
        * ((nd + 1.0) - F.col("tie_t3").cast("double") / (nd * (nd - 1.0)))
    )
    z = F.round((u1_x2.cast("double") / 2.0 - mu) / sigma, 4)
    return agg.select(
        F.lit(type_a).alias("type_a"),
        F.lit(type_b).alias("type_b"),
        F.col("n_a"),
        F.col("n_b"),
        u1.alias("u_stat"),
        z.alias("z_score"),
        (F.abs(z) > F.lit(1.96)).alias("reject_h0"),
    )


def mannwhitney_oracle_sql(
    type_a: str = "click", type_b: str = "purchase"
) -> str:
    return f"""
        WITH sides AS (
            SELECT value,
                   CAST(event_type = '{type_a}' AS BIGINT) AS is_a,
                   CAST(event_type = '{type_b}' AS BIGINT) AS is_b
            FROM events
            WHERE event_type IN ('{type_a}', '{type_b}')
        ), per_v AS (
            SELECT value, sum(is_a) AS na_v, sum(is_b) AS nb_v
            FROM sides GROUP BY value
        ), ranked AS (
            SELECT na_v, na_v + nb_v AS t_v,
                   2 * (sum(na_v + nb_v) OVER (ORDER BY value)
                        - (na_v + nb_v)) + (na_v + nb_v) + 1 AS r2_v
            FROM per_v
        ), agg AS (
            -- DECIMAL(38,0) product folds, mirroring the Spark side's
            -- corpus-scale overflow guard.
            SELECT sum(CAST(na_v AS DECIMAL(38,0))
                       * CAST(r2_v AS DECIMAL(38,0))) AS r1_x2,
                   sum(na_v) AS n_a,
                   sum(t_v - na_v) AS n_b,
                   sum(CAST(t_v AS DECIMAL(38,0))
                       * CAST(t_v AS DECIMAL(38,0))
                       * CAST(t_v AS DECIMAL(38,0))
                       - CAST(t_v AS DECIMAL(38,0))) AS tie_t3
            FROM ranked
        )
        SELECT '{type_a}' AS type_a, '{type_b}' AS type_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               round(CAST(r1_x2 - n_a * (n_a + 1) AS DOUBLE) / 2.0, 1)
                   AS u_stat,
               round((CAST(r1_x2 - n_a * (n_a + 1) AS DOUBLE) / 2.0
                      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
                     / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                            / 12.0
                            * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                                + 1.0)
                               - CAST(tie_t3 AS DOUBLE)
                                 / ((CAST(n_a AS DOUBLE)
                                     + CAST(n_b AS DOUBLE))
                                    * (CAST(n_a AS DOUBLE)
                                       + CAST(n_b AS DOUBLE) - 1.0)))),
                     4) AS z_score,
               abs(round((CAST(r1_x2 - n_a * (n_a + 1) AS DOUBLE) / 2.0
                      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
                     / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                            / 12.0
                            * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                                + 1.0)
                               - CAST(tie_t3 AS DOUBLE)
                                 / ((CAST(n_a AS DOUBLE)
                                     + CAST(n_b AS DOUBLE))
                                    * (CAST(n_a AS DOUBLE)
                                       + CAST(n_b AS DOUBLE) - 1.0)))),
                     4)) > 1.96 AS reject_h0
        FROM agg
    """


def q_bradley_terry(
    spark: SparkSession, sf_dir: str, n_iters: int = 3
) -> DataFrame:
    """Bradley-Terry preference-strength fit (Bradley & Terry 1952,
    via the Zermelo/MM iteration) — the model behind pairwise
    preference data everywhere from ranking dashboards to RLHF
    reward-model sanity checks: given head-to-head win counts,
    recover item strengths s_i with P(i beats j) = s_i/(s_i+s_j).

    Comparisons are derived from the corpus: within each user, every
    pair of event types the user touched is one head-to-head match,
    won by the type with the larger total spend (exact integer
    cents; ties are no-contests). The per-user pair derivation is
    the only corpus-sized work — one groupBy(user, type) aggregate,
    then a per-user self-join whose width is the TYPE dimension
    (<= 5x5 per user, linear overall). The fit itself runs
    ``n_iters`` MM updates over the parameter-sized item table:
    s_i' = W_i / sum_j N_ij / (s_i + s_j), sum-normalized at the
    end.

    Exactness: the MM denominator folds per-opponent terms rounded
    to 6 as DECIMAL(18,6) (order-independent), one double division
    per update — so the whole iteration chain is engine-identical
    and the DuckDB oracle unrolls the same ``n_iters`` CTEs."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.sum("cents").alias("total")
    )
    a = per_ut.select(
        "user_id",
        F.col("event_type").alias("i"),
        F.col("total").alias("ti"),
    )
    b = per_ut.select(
        "user_id",
        F.col("event_type").alias("j"),
        F.col("total").alias("tj"),
    )
    duels = a.join(b, "user_id").where(F.col("i") != F.col("j"))
    pair = duels.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n_met"),
        F.sum((F.col("ti") > F.col("tj")).cast("long")).alias("n_wins"),
        F.sum(
            ((F.col("ti") > F.col("tj")) | (F.col("tj") > F.col("ti")))
            .cast("long")
        ).alias("n_games"),  # ties are no-contests
    ).localCheckpoint()  # consumed once per MM iteration
    items = pair.groupBy("i").agg(
        F.sum("n_wins").alias("wins"), F.sum("n_games").alias("games")
    )
    s = items.select("i", F.lit(1.0).alias("s"))
    for _ in range(n_iters):
        sj = s.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
        denom = (
            pair.join(F.broadcast(s), "i")
            .join(F.broadcast(sj), "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(
                        F.col("n_games").cast("double")
                        / (F.col("s") + F.col("s_j")),
                        6,
                    ).cast("decimal(18,6)")
                ).alias("den")
            )
        )
        s = (
            items.join(denom, "i")
            .select(
                "i",
                (
                    F.col("wins").cast("double")
                    / F.col("den").cast("double")
                ).alias("s"),
            )
        )
    wnorm = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total_s = F.sum(F.round(F.col("s"), 6).cast("decimal(18,6)")).over(
        wnorm
    )
    return (
        s.join(items, "i")
        .select(
            F.col("i").alias("item"),
            "wins",
            "games",
            F.round(F.col("s") / total_s.cast("double"), 6).alias(
                "strength"
            ),
        )
        .orderBy(F.desc("strength"), "item")
    )


def bradley_terry_oracle_sql(n_iters: int = 3) -> str:
    parts = ["""
        WITH per_ut AS (
            SELECT user_id, event_type,
                   sum(CAST(round(value * 100, 0) AS BIGINT)) AS total
            FROM events GROUP BY user_id, event_type
        ), pair AS (
            SELECT a.event_type AS i, b.event_type AS j,
                   count(*) AS n_met,
                   sum(CAST(a.total > b.total AS BIGINT)) AS n_wins,
                   sum(CAST(a.total <> b.total AS BIGINT)) AS n_games
            FROM per_ut a JOIN per_ut b
              ON a.user_id = b.user_id AND a.event_type <> b.event_type
            GROUP BY 1, 2
        ), items AS (
            SELECT i, sum(n_wins) AS wins, sum(n_games) AS games
            FROM pair GROUP BY i
        ), s0 AS (
            SELECT i, CAST(1.0 AS DOUBLE) AS s FROM items
        )"""]
    for k in range(1, n_iters + 1):
        parts.append(f"""
        , s{k} AS (
            SELECT items.i,
                   CAST(items.wins AS DOUBLE)
                   / CAST((SELECT sum(CAST(round(
                             CAST(p.n_games AS DOUBLE)
                             / (si.s + sj.s), 6) AS DECIMAL(18,6)))
                           FROM pair p
                           JOIN s{k - 1} si ON si.i = p.i
                           JOIN s{k - 1} sj ON sj.i = p.j
                           WHERE p.i = items.i) AS DOUBLE) AS s
            FROM items
        )""")
    parts.append(f"""
        SELECT s.i AS item,
               CAST(items.wins AS BIGINT) AS wins,
               CAST(items.games AS BIGINT) AS games,
               round(s.s / CAST((SELECT sum(CAST(round(s2.s, 6)
                                 AS DECIMAL(18,6))) FROM s{n_iters} s2)
                                AS DOUBLE), 6) AS strength
        FROM s{n_iters} s JOIN items ON items.i = s.i
        ORDER BY strength DESC, item
    """)
    return "".join(parts)


def q_cuped(
    spark: SparkSession, sf_dir: str, split_date: str = "2024-01-15"
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, the industry-
    standard pre-experiment covariate adjustment): per-user PRE-
    period spend X predicts POST-period spend Y, and the adjusted
    metric Y' = Y - theta (X - mean X) with theta = cov(X, Y)/var(X)
    strips the between-user variance an A/B readout wastes power on.
    Completes the experimentation family: Welch tests the raw means,
    SPRT sequences them, MDE sizes them — CUPED is how real
    platforms make all three sharper without more traffic.

    Arms reuse the q_ab_test_welch md5 coin (replay-stable). Users
    missing a period contribute 0 for it (standard). Exactness:
    per-user X/Y are exact centi-integer sums; one conditional-
    aggregation scan folds n, Sx, Sy, Sxy, Sxx per arm as BIGINTs;
    theta, the adjusted means, and the variance-reduction identity
    1 - rho^2 (exact algebra: var(Y - theta X) = var(Y)(1 - rho^2)
    at the optimal theta) are then single double expressions in
    identical order on both engines — no per-row double folds
    anywhere."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts") < F.lit(split_date).cast("timestamp")).alias("pre"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("pre"), F.col("cents")).otherwise(0)).alias("x"),
        F.sum(F.when(~F.col("pre"), F.col("cents")).otherwise(0)).alias(
            "y"
        ),
    )
    arm_b = (
        F.substring(
            F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
            1,
            1,
        )
        >= "8"
    )
    tagged = per_user.select(
        F.when(arm_b, F.lit("B")).otherwise(F.lit("A")).alias("arm"),
        "x",
        "y",
    )
    per_arm = tagged.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    tot = tagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("tsx"),
        F.sum("y").alias("tsy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    j = per_arm.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    mx = F.col("tsx").cast("double") / nd
    my = F.col("tsy").cast("double") / nd
    cov = F.col("sxy").cast("double") / nd - mx * my
    varx = F.col("sxx").cast("double") / nd - mx * mx
    vary = F.col("syy").cast("double") / nd - my * my
    theta = cov / varx
    rho2 = cov * cov / (varx * vary)
    nad = F.col("n_users").cast("double")
    mean_y = F.col("sy").cast("double") / nad / 100.0
    mean_x_arm = F.col("sx").cast("double") / nad
    mean_y_cuped = (
        F.col("sy").cast("double") / nad
        - theta * (mean_x_arm - mx)
    ) / 100.0
    return j.select(
        "arm",
        "n_users",
        F.round(mean_y, 4).alias("mean_post"),
        F.round(mean_y_cuped, 4).alias("mean_post_cuped"),
        F.round(theta, 6).alias("theta"),
        F.round(rho2, 6).alias("rho2"),
        F.round(F.lit(100.0) * rho2, 4).alias("var_reduction_pct"),
    ).orderBy("arm")


def cuped_oracle_sql(split_date: str = "2024-01-15") -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN ts < TIMESTAMP '{split_date}'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS x,
                   sum(CASE WHEN ts >= TIMESTAMP '{split_date}'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ), tagged AS (
            SELECT CASE WHEN substring(md5('ab:' || CAST(user_id
                            AS VARCHAR)), 1, 1) >= '8'
                        THEN 'B' ELSE 'A' END AS arm,
                   x, y
            FROM per_user
        ), per_arm AS (
            SELECT arm, count(*) AS n_users, sum(x) AS sx, sum(y) AS sy
            FROM tagged GROUP BY arm
        ), tot AS (
            SELECT count(*) AS n, sum(x) AS tsx, sum(y) AS tsy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx,
                   sum(y * y) AS syy
            FROM tagged
        )
        SELECT arm, CAST(n_users AS BIGINT) AS n_users,
               round(CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE)
                     / 100.0, 4) AS mean_post,
               round((CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE)
                      - ((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE)))
                         / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                            - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                              * (CAST(tsx AS DOUBLE)
                                 / CAST(n AS DOUBLE))))
                        * (CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE)
                           - CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE)))
                     / 100.0, 4) AS mean_post_cuped,
               round((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE)))
                     / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))),
                     6) AS theta,
               round((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE)))
                     * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE)))
                     / ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE)))
                        * (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(tsy AS DOUBLE)
                                / CAST(n AS DOUBLE)))),
                     6) AS rho2,
               round(100.0 * ((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE)))
                     * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE)))
                     / ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(tsx AS DOUBLE) / CAST(n AS DOUBLE)))
                        * (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(tsy AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(tsy AS DOUBLE)
                                / CAST(n AS DOUBLE))))), 4)
                   AS var_reduction_pct
        FROM per_arm, tot
        ORDER BY arm
    """


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-user click and purchase
    spend — the monotone-association read ("do heavy browsers buy
    more") that Pearson gets wrong under heavy tails and the OLS
    trend can't give across users. Completes the correlation family:
    Theil-Sen is the robust trend IN TIME, Spearman is the robust
    association ACROSS entities.

    Tie-aware: the textbook 1 - 6*sum(d^2)/(n(n^2-1)) formula is
    WRONG under ties, so this computes Pearson over midranks — and
    with DOUBLED midranks (the q_mannwhitney_u discipline) every
    rank, product, and sum is an exact integer. Sums fold as
    DECIMAL(38,0): sum of n products of two 2n-scale ranks is
    O(n^3), past BIGINT at ~10^9 users but inside decimal128 to
    ~10^12. One sqrt + one division at the end, identical order on
    both engines.

    Plan: one groupBy(user) conditional aggregate (corpus touched
    once), two dimension-sized distinct-value rank tables joined
    back by value, one global fold."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents")).otherwise(
                0
            )
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("cents")
            ).otherwise(0)
        ).alias("y"),
    )

    def rank2(col_name):
        per_v = per_user.groupBy(col_name).agg(
            F.count(F.lit(1)).alias("t")
        )
        wcum = Window.orderBy(col_name).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return per_v.select(
            col_name,
            (
                F.lit(2) * (F.sum("t").over(wcum) - F.col("t"))
                + F.col("t")
                + F.lit(1)
            ).alias(f"r_{col_name}"),
        )

    ranked = per_user.join(rank2("x"), "x").join(rank2("y"), "y")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("r_x"))).alias("sx"),
        F.sum(dec(F.col("r_y"))).alias("sy"),
        F.sum(dec(F.col("r_x") * F.col("r_y"))).alias("sxy"),
        F.sum(dec(F.col("r_x") * F.col("r_x"))).alias("sxx"),
        F.sum(dec(F.col("r_y") * F.col("r_y"))).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    rho = (nd * sxy - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx) * (nd * syy - sy * sy)
    )
    return agg.select(
        F.col("n").alias("n_users"),
        F.round(rho, 6).alias("spearman_rho"),
        # Large-sample significance: z = rho * sqrt(n - 1).
        F.round(rho * F.sqrt(nd - 1.0), 4).alias("z_score"),
        (F.abs(F.round(rho * F.sqrt(nd - 1.0), 4)) > F.lit(1.96)).alias(
            "significant"
        ),
    )


def spearman_oracle_sql() -> str:
    return """
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS x,
                   sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ), rx AS (
            SELECT x,
                   2 * (sum(t) OVER (ORDER BY x) - t) + t + 1 AS r_x
            FROM (SELECT x, count(*) AS t FROM per_user GROUP BY x)
        ), ry AS (
            SELECT y,
                   2 * (sum(t) OVER (ORDER BY y) - t) + t + 1 AS r_y
            FROM (SELECT y, count(*) AS t FROM per_user GROUP BY y)
        ), ranked AS (
            SELECT r_x, r_y FROM per_user
            JOIN rx USING (x) JOIN ry USING (y)
        ), agg AS (
            SELECT count(*) AS n,
                   sum(CAST(r_x AS DECIMAL(38,0))) AS sx,
                   sum(CAST(r_y AS DECIMAL(38,0))) AS sy,
                   sum(CAST(r_x * r_y AS DECIMAL(38,0))) AS sxy,
                   sum(CAST(r_x * r_x AS DECIMAL(38,0))) AS sxx,
                   sum(CAST(r_y * r_y AS DECIMAL(38,0))) AS syy
            FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)
                                 * CAST(sy AS DOUBLE))), 6)
                   AS spearman_rho,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)
                                 * CAST(sy AS DOUBLE)))
                     * sqrt(CAST(n AS DOUBLE) - 1.0), 4) AS z_score,
               abs(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)
                                 * CAST(sy AS DOUBLE)))
                     * sqrt(CAST(n AS DOUBLE) - 1.0), 4)) > 1.96
                   AS significant
        FROM agg
    """


def q_hill_tail_index(
    spark: SparkSession, sf_dir: str, k: int = 200
) -> DataFrame:
    """Hill tail-index estimator (Hill 1975) over order totals — the
    heavy-tail read that tells you whether means/variances of a
    metric can be trusted at all: alpha_hat = k / sum ln(x_(i)/x_(k))
    over the top-k order statistics; alpha < 2 means infinite
    variance (sample means never stabilize), alpha < 1 means even
    the mean diverges. The quantitative companion to the Zipf/Gini/
    Benford forensics row: those say "skewed", Hill says HOW heavy
    the tail is in the units that decide which estimators are safe
    (it is why robust rollups like the winsorized mean exist).

    Plan: the top-(k+1) order statistics come from a TakeOrdered
    (parameter-sized, no global sort — the q_topk_newest shape);
    the ln-ratio terms fold as rounded-6 DECIMALs over the k-row
    grid, one division at the end. Exactness: cents are exact
    integers, each ln(x_i/x_threshold) is one libm call on the
    identical double ratio, rounded before the order-independent
    DECIMAL sum."""
    o = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents")
    )
    top = o.orderBy(F.desc("cents")).limit(k + 1)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    thr = F.min("cents").over(wall)  # the (k+1)-th order statistic
    terms = top.select(
        "cents",
        thr.alias("thr"),
        F.when(
            F.col("cents") > thr,
            F.round(
                F.log(
                    F.col("cents").cast("double")
                    / thr.cast("double")
                ),
                6,
            ).cast("decimal(18,6)"),
        ).alias("term"),
    )
    agg = terms.agg(
        F.count("term").alias("n_terms"),
        F.sum("term").alias("lnsum"),
        F.max("thr").alias("thr"),
        F.max("cents").alias("max_cents"),
    )
    alpha = F.col("n_terms").cast("double") / F.col("lnsum").cast(
        "double"
    )
    return agg.select(
        F.col("n_terms").alias("k_used"),
        F.round(F.col("thr").cast("double") / 100.0, 2).alias(
            "threshold"
        ),
        F.round(F.col("max_cents").cast("double") / 100.0, 2).alias(
            "max_value"
        ),
        F.round(alpha, 6).alias("hill_alpha"),
        (F.round(alpha, 6) < F.lit(2.0)).alias("infinite_variance"),
    )


def hill_tail_index_oracle_sql(k: int = 200) -> str:
    return f"""
        WITH top AS (
            SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
            ORDER BY cents DESC LIMIT {k} + 1
        ), terms AS (
            SELECT cents, min(cents) OVER () AS thr,
                   CASE WHEN cents > min(cents) OVER ()
                        THEN CAST(round(ln(CAST(cents AS DOUBLE)
                                  / CAST(min(cents) OVER () AS DOUBLE)),
                                  6) AS DECIMAL(18,6))
                   END AS term
            FROM top
        ), agg AS (
            SELECT count(term) AS n_terms, sum(term) AS lnsum,
                   max(thr) AS thr, max(cents) AS max_cents
            FROM terms
        )
        SELECT CAST(n_terms AS BIGINT) AS k_used,
               round(CAST(thr AS DOUBLE) / 100.0, 2) AS threshold,
               round(CAST(max_cents AS DOUBLE) / 100.0, 2) AS max_value,
               round(CAST(n_terms AS DOUBLE) / CAST(lnsum AS DOUBLE), 6)
                   AS hill_alpha,
               round(CAST(n_terms AS DOUBLE) / CAST(lnsum AS DOUBLE), 6)
                   < 2.0 AS infinite_variance
        FROM agg
    """


def q_kendall_tau(
    spark: SparkSession, sf_dir: str, bucket_cents: int = 50000
) -> DataFrame:
    """Kendall tau-b between per-user click and purchase spend —
    the concordance companion of q_spearman_corr (Spearman measures
    monotone association through ranks; tau-b is the probability-
    scale "pick two users: does the ordering agree" read, the
    statistic preferred when the pair interpretation matters).

    Exact pairwise concordance is O(n^2); the scalable form is
    tau-b over a FIXED contingency grid (spend buckets of
    ``bucket_cents``): one groupBy(bucket_x, bucket_y) pass over
    users, then concordant/discordant pairs fold over the grid's
    self-join — the grid is parameter-sized (<= 21 x 21 cells), so
    the quadratic lives on a broadcast table, never on the corpus
    (the q_chi2_independence shape). Tie corrections (tau-b's
    denominator) come from the same marginals.

    Exactness: C, D, and the tie terms are sums of products of
    corpus-scale cell counts — DECIMAL(38,0) folds (n(n-1)/2 alone
    is ~1e24 at 1e12 users); ONE double division after the sqrt.

    100 TB: corpus touched once (user fold + grid count); the
    self-join moves <= 441 rows.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents"))
            .otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(0)
        ).alias("y"),
    )
    cells = per_user.groupBy(
        F.least(
            F.floor(F.col("x") / F.lit(bucket_cents)), F.lit(20)
        ).alias("bx"),
        F.least(
            F.floor(F.col("y") / F.lit(bucket_cents)), F.lit(20)
        ).alias("by"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = cells.select(
        F.col("bx").alias("ax"), F.col("by").alias("ay"),
        F.col("cnt").alias("an"),
    )
    b = cells.select(
        F.col("bx").alias("cx"), F.col("by").alias("cy"),
        F.col("cnt").alias("bn"),
    )
    dec = "decimal(38,0)"
    pairs = a.join(F.broadcast(b))
    conc = pairs.agg(
        F.sum(
            F.when(
                (F.col("cx") > F.col("ax")) & (F.col("cy") > F.col("ay")),
                F.col("an").cast(dec) * F.col("bn").cast(dec),
            ).otherwise(F.lit(0).cast(dec))
        ).alias("c2"),
        F.sum(
            F.when(
                (F.col("cx") > F.col("ax")) & (F.col("cy") < F.col("ay")),
                F.col("an").cast(dec) * F.col("bn").cast(dec),
            ).otherwise(F.lit(0).cast(dec))
        ).alias("d2"),
    )
    margx = cells.groupBy("bx").agg(F.sum("cnt").alias("tx")).agg(
        F.sum(F.col("tx").cast(dec) * (F.col("tx") - 1).cast(dec)).alias(
            "tiex2"
        ),
        F.sum("tx").alias("n"),
    )
    margy = cells.groupBy("by").agg(F.sum("cnt").alias("ty")).agg(
        F.sum(F.col("ty").cast(dec) * (F.col("ty") - 1).cast(dec)).alias(
            "tiey2"
        )
    )
    agg = conc.join(F.broadcast(margx)).join(F.broadcast(margy))
    # c2/d2 count each unordered pair ONCE (strict dominance is
    # asymmetric); the tie terms are DOUBLED (t*(t-1) = 2*C(t,2)), so
    # the denominator is 2*sqrt((n0-n1)(n0-n2)) and the trailing
    # *2.0 restores tau-b exactly.
    n0x2 = F.col("n").cast(dec) * (F.col("n") - 1).cast(dec)
    tau = (
        (F.col("c2") - F.col("d2")).cast("double")
        / F.sqrt(
            (n0x2 - F.col("tiex2")).cast("double")
            * (n0x2 - F.col("tiey2")).cast("double")
        )
        * 2.0
    )
    return agg.select(
        F.col("n").alias("n_users"),
        F.col("c2").cast("long").alias("concordant"),
        F.col("d2").cast("long").alias("discordant"),
        F.round(tau, 6).alias("kendall_tau_b"),
    )


def kendall_tau_oracle_sql(bucket_cents: int = 50000) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS x,
                   sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ), cells AS (
            SELECT least(CAST(floor(x / {bucket_cents}) AS BIGINT), 20)
                       AS bx,
                   least(CAST(floor(y / {bucket_cents}) AS BIGINT), 20)
                       AS by,
                   count(*) AS cnt
            FROM per_user GROUP BY 1, 2
        ), conc AS (
            SELECT sum(CASE WHEN b.bx > a.bx AND b.by > a.by
                       THEN CAST(a.cnt AS DECIMAL(38,0))
                            * CAST(b.cnt AS DECIMAL(38,0))
                       ELSE CAST(0 AS DECIMAL(38,0)) END) AS c2,
                   sum(CASE WHEN b.bx > a.bx AND b.by < a.by
                       THEN CAST(a.cnt AS DECIMAL(38,0))
                            * CAST(b.cnt AS DECIMAL(38,0))
                       ELSE CAST(0 AS DECIMAL(38,0)) END) AS d2
            FROM cells a, cells b
        ), margx AS (
            SELECT sum(CAST(tx AS DECIMAL(38,0))
                       * CAST(tx - 1 AS DECIMAL(38,0))) AS tiex2,
                   sum(tx) AS n
            FROM (SELECT bx, sum(cnt) AS tx FROM cells GROUP BY bx)
        ), margy AS (
            SELECT sum(CAST(ty AS DECIMAL(38,0))
                       * CAST(ty - 1 AS DECIMAL(38,0))) AS tiey2
            FROM (SELECT by, sum(cnt) AS ty FROM cells GROUP BY by)
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               CAST(c2 AS BIGINT) AS concordant,
               CAST(d2 AS BIGINT) AS discordant,
               round(CAST(c2 - d2 AS DOUBLE)
                     / sqrt(CAST(CAST(n AS DECIMAL(38,0))
                                 * CAST(n - 1 AS DECIMAL(38,0))
                                 - tiex2 AS DOUBLE)
                            * CAST(CAST(n AS DECIMAL(38,0))
                                   * CAST(n - 1 AS DECIMAL(38,0))
                                   - tiey2 AS DOUBLE)) * 2.0, 6)
                   AS kendall_tau_b
        FROM conc, margx, margy
    """


def q_effect_sizes(
    spark: SparkSession,
    sf_dir: str,
    type_a: str = "click",
    type_b: str = "purchase",
) -> DataFrame:
    """Standardized effect sizes between two event types' value
    distributions — Cohen's d, Hedges' g (small-sample-corrected d),
    and Cliff's delta — the "HOW BIG is the difference" companion of
    the q_mannwhitney_u / q_ks_test significance pair (at corpus
    scale everything is significant; effect size is the number that
    decides whether anyone should care).

    Cohen's d = (mean_a - mean_b) / s_pooled from exact integer
    moments (cents sums and squared sums fold as DECIMAL(38,0) —
    cents^2 x 1e12 rows is ~1e20). Hedges' g applies the
    J = 1 - 3/(4 df - 1) bias correction (df = n_a + n_b - 2, i.e.
    1 - 3/(4(n_a + n_b) - 9)). Cliff's delta comes
    from the SAME doubled-midrank machinery as q_mannwhitney_u via
    the rank-sum identity delta = 2 U1/(n_a n_b) - 1 — no second
    pass over the data.

    Plan: one groupBy(value) dimension-sized aggregate feeds both
    the moment folds and the midrank CDF; one global fold each.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    sides = ev.where(
        F.col("event_type").isin([type_a, type_b])
    ).select(
        "cents",
        (F.col("event_type") == type_a).cast("long").alias("is_a"),
    )
    per_v = sides.groupBy("cents").agg(
        F.sum("is_a").alias("na_v"),
        F.sum(F.lit(1) - F.col("is_a")).alias("nb_v"),
    )
    dec = "decimal(38,0)"
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t_v = F.col("na_v") + F.col("nb_v")
    ranked = per_v.select(
        "cents",
        "na_v",
        "nb_v",
        (
            F.lit(2) * (F.sum(t_v).over(wcum) - t_v) + t_v + F.lit(1)
        ).alias("r2_v"),
    )
    agg = ranked.agg(
        F.sum("na_v").alias("n_a"),
        F.sum("nb_v").alias("n_b"),
        F.sum(F.col("na_v").cast(dec) * F.col("cents").cast(dec)).alias(
            "sa"
        ),
        F.sum(F.col("nb_v").cast(dec) * F.col("cents").cast(dec)).alias(
            "sb"
        ),
        F.sum(
            F.col("na_v").cast(dec) * F.col("cents").cast(dec)
            * F.col("cents").cast(dec)
        ).alias("saa"),
        F.sum(
            F.col("nb_v").cast(dec) * F.col("cents").cast(dec)
            * F.col("cents").cast(dec)
        ).alias("sbb"),
        F.sum(F.col("na_v").cast(dec) * F.col("r2_v").cast(dec)).alias(
            "r1_x2"
        ),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("sa").cast("double")
    sb = F.col("sb").cast("double")
    # Sample variances from exact sums: (n*sxx - sx^2) / (n*(n-1)).
    var_a = (na * F.col("saa").cast("double") - sa * sa) / (
        na * (na - 1.0)
    )
    var_b = (nb * F.col("sbb").cast("double") - sb * sb) / (
        nb * (nb - 1.0)
    )
    s_pooled = F.sqrt(
        ((na - 1.0) * var_a + (nb - 1.0) * var_b) / (na + nb - 2.0)
    )
    d = (sa / na - sb / nb) / s_pooled
    jcorr = 1.0 - 3.0 / (4.0 * (na + nb) - 9.0)
    u1_x2 = F.col("r1_x2") - F.col("n_a").cast(dec) * (
        F.col("n_a") + 1
    ).cast(dec)
    cliffs = u1_x2.cast("double") / (na * nb) - 1.0
    return agg.select(
        F.lit(type_a).alias("type_a"),
        F.lit(type_b).alias("type_b"),
        F.col("n_a"),
        F.col("n_b"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * jcorr, 6).alias("hedges_g"),
        F.round(cliffs, 6).alias("cliffs_delta"),
    )


def effect_sizes_oracle_sql(
    type_a: str = "click", type_b: str = "purchase"
) -> str:
    return f"""
        WITH sides AS (
            SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
                   CAST(event_type = '{type_a}' AS BIGINT) AS is_a
            FROM events
            WHERE event_type IN ('{type_a}', '{type_b}')
        ), per_v AS (
            SELECT cents, sum(is_a) AS na_v, sum(1 - is_a) AS nb_v
            FROM sides GROUP BY cents
        ), ranked AS (
            SELECT cents, na_v, nb_v,
                   2 * (sum(na_v + nb_v) OVER (ORDER BY cents)
                        - (na_v + nb_v)) + (na_v + nb_v) + 1 AS r2_v
            FROM per_v
        ), agg AS (
            SELECT sum(na_v) AS n_a, sum(nb_v) AS n_b,
                   sum(CAST(na_v AS DECIMAL(38,0))
                       * CAST(cents AS DECIMAL(38,0))) AS sa,
                   sum(CAST(nb_v AS DECIMAL(38,0))
                       * CAST(cents AS DECIMAL(38,0))) AS sb,
                   sum(CAST(na_v AS DECIMAL(38,0))
                       * CAST(cents AS DECIMAL(38,0))
                       * CAST(cents AS DECIMAL(38,0))) AS saa,
                   sum(CAST(nb_v AS DECIMAL(38,0))
                       * CAST(cents AS DECIMAL(38,0))
                       * CAST(cents AS DECIMAL(38,0))) AS sbb,
                   sum(CAST(na_v AS DECIMAL(38,0))
                       * CAST(r2_v AS DECIMAL(38,0))) AS r1_x2
            FROM ranked
        )
        SELECT '{type_a}' AS type_a, '{type_b}' AS type_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               round(((CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
                       - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))
                      / sqrt(((CAST(n_a AS DOUBLE) - 1.0)
                              * ((CAST(n_a AS DOUBLE)
                                  * CAST(saa AS DOUBLE)
                                  - CAST(sa AS DOUBLE)
                                    * CAST(sa AS DOUBLE))
                                 / (CAST(n_a AS DOUBLE)
                                    * (CAST(n_a AS DOUBLE) - 1.0)))
                              + (CAST(n_b AS DOUBLE) - 1.0)
                              * ((CAST(n_b AS DOUBLE)
                                  * CAST(sbb AS DOUBLE)
                                  - CAST(sb AS DOUBLE)
                                    * CAST(sb AS DOUBLE))
                                 / (CAST(n_b AS DOUBLE)
                                    * (CAST(n_b AS DOUBLE) - 1.0))))
                             / (CAST(n_a AS DOUBLE)
                                + CAST(n_b AS DOUBLE) - 2.0))), 6)
                   AS cohens_d,
               round((CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))
                     / sqrt(((CAST(n_a AS DOUBLE) - 1.0)
                             * ((CAST(n_a AS DOUBLE)
                                 * CAST(saa AS DOUBLE)
                                 - CAST(sa AS DOUBLE)
                                   * CAST(sa AS DOUBLE))
                                / (CAST(n_a AS DOUBLE)
                                   * (CAST(n_a AS DOUBLE) - 1.0)))
                             + (CAST(n_b AS DOUBLE) - 1.0)
                             * ((CAST(n_b AS DOUBLE)
                                 * CAST(sbb AS DOUBLE)
                                 - CAST(sb AS DOUBLE)
                                   * CAST(sb AS DOUBLE))
                                / (CAST(n_b AS DOUBLE)
                                   * (CAST(n_b AS DOUBLE) - 1.0))))
                            / (CAST(n_a AS DOUBLE)
                               + CAST(n_b AS DOUBLE) - 2.0))
                     * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE)
                                            + CAST(n_b AS DOUBLE))
                                     - 9.0)), 6) AS hedges_g,
               round(CAST(r1_x2 - CAST(n_a AS DECIMAL(38,0))
                          * CAST(n_a + 1 AS DECIMAL(38,0)) AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                     - 1.0, 6) AS cliffs_delta
        FROM agg
    """


def q_mutual_information(
    spark: SparkSession, sf_dir: str, bucket_cents: int = 500
) -> DataFrame:
    """Mutual information (and normalized MI) between event type and
    value bucket — the model-free association read for categorical x
    binned data: "how many nats does knowing the event type tell you
    about the spend bracket". Completes the association family:
    chi-square tests INDEPENDENCE, Cramér's V scales it, MI is the
    information-theoretic magnitude the feature-selection and
    leakage-audit passes actually rank on (a near-duplicate column
    shows up as NMI ~ 1 regardless of dtype).

    Plan: one groupBy(type, bucket) corpus fold to a <= 5 x 20 cell
    table; marginals and the MI fold are broadcast-sized. Exactness:
    every probability ratio is a ratio of exact BIGINT counts; each
    cell term (p * ln(N * n_tb / (n_t * n_b))) is ONE libm ln on an
    identical double (the corpus-scale product N*n_tb folds as
    DECIMAL(38,0) before the ONE division), rounded 6 and summed as
    DECIMAL(18,6) — order-independent, engine-identical. Entropies
    use the same discipline; NMI = MI / sqrt(H_t * H_b) is one final
    division on already-rounded terms."""
    dec = "decimal(38,0)"
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.least(
            F.floor(
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                / F.lit(bucket_cents)
            ),
            F.lit(19),
        ).cast("long").alias("bucket"),
    )
    cells = e.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_tb")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wt = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wb = Window.partitionBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = cells.select(
        "event_type",
        "bucket",
        "n_tb",
        F.sum("n_tb").over(wt).alias("n_t"),
        F.sum("n_tb").over(wb).alias("n_b"),
        F.sum("n_tb").over(wall).alias("n"),
        # Entropy terms must fold once per MARGINAL value: tag the
        # first cell of each marginal group (deterministic min-bucket
        # / min-type representative).
        F.min("bucket").over(wt).alias("first_b"),
        F.min("event_type").over(wb).alias("first_t"),
    )
    nd = F.col("n").cast("double")
    mi_term = F.round(
        F.col("n_tb").cast("double") / nd
        * F.log(
            (F.col("n_tb").cast(dec) * F.col("n").cast(dec)).cast("double")
            / (F.col("n_t").cast(dec) * F.col("n_b").cast(dec)).cast(
                "double"
            )
        ),
        6,
    ).cast("decimal(18,6)")
    ht_term = F.when(
        F.col("bucket") == F.col("first_b"),
        F.round(
            -(F.col("n_t").cast("double") / nd)
            * F.log(F.col("n_t").cast("double") / nd),
            6,
        ).cast("decimal(18,6)"),
    )
    hb_term = F.when(
        F.col("event_type") == F.col("first_t"),
        F.round(
            -(F.col("n_b").cast("double") / nd)
            * F.log(F.col("n_b").cast("double") / nd),
            6,
        ).cast("decimal(18,6)"),
    )
    terms = g.select(
        "n",
        mi_term.alias("mi_term"),
        ht_term.alias("ht_term"),
        hb_term.alias("hb_term"),
    )
    agg = terms.agg(
        F.max("n").alias("n_events"),
        F.sum("mi_term").alias("mi"),
        F.sum("ht_term").alias("h_type"),
        F.sum("hb_term").alias("h_bucket"),
    )
    return agg.select(
        F.col("n_events"),
        F.col("mi").cast("double").alias("mi_nats"),
        F.col("h_type").cast("double").alias("h_type"),
        F.col("h_bucket").cast("double").alias("h_bucket"),
        F.round(
            F.col("mi").cast("double")
            / F.sqrt(
                F.col("h_type").cast("double")
                * F.col("h_bucket").cast("double")
            ),
            6,
        ).alias("nmi"),
    )


def mutual_information_oracle_sql(bucket_cents: int = 500) -> str:
    return f"""
        WITH e AS (
            SELECT event_type,
                   least(CAST(floor(CAST(floor(value * 100.0 + 0.5)
                                         AS BIGINT)
                                    / {bucket_cents}) AS BIGINT), 19)
                       AS bucket
            FROM events
        ), cells AS (
            SELECT event_type, bucket, count(*) AS n_tb
            FROM e GROUP BY 1, 2
        ), g AS (
            SELECT event_type, bucket, n_tb,
                   sum(n_tb) OVER (PARTITION BY event_type) AS n_t,
                   sum(n_tb) OVER (PARTITION BY bucket) AS n_b,
                   sum(n_tb) OVER () AS n,
                   min(bucket) OVER (PARTITION BY event_type)
                       AS first_b,
                   min(event_type) OVER (PARTITION BY bucket)
                       AS first_t
            FROM cells
        ), agg AS (
            SELECT max(n) AS n_events,
                   sum(CAST(round(CAST(n_tb AS DOUBLE)
                                  / CAST(n AS DOUBLE)
                                  * ln(CAST(CAST(n_tb AS DECIMAL(38,0))
                                            * CAST(n AS DECIMAL(38,0))
                                            AS DOUBLE)
                                       / CAST(CAST(n_t AS DECIMAL(38,0))
                                              * CAST(n_b
                                                     AS DECIMAL(38,0))
                                              AS DOUBLE)), 6)
                            AS DECIMAL(18,6))) AS mi,
                   sum(CASE WHEN bucket = first_b THEN
                       CAST(round(-(CAST(n_t AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                  * ln(CAST(n_t AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 6)
                            AS DECIMAL(18,6)) END) AS h_type,
                   sum(CASE WHEN event_type = first_t THEN
                       CAST(round(-(CAST(n_b AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                  * ln(CAST(n_b AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 6)
                            AS DECIMAL(18,6)) END) AS h_bucket
            FROM g
        )
        SELECT CAST(n_events AS BIGINT) AS n_events,
               CAST(mi AS DOUBLE) AS mi_nats,
               CAST(h_type AS DOUBLE) AS h_type,
               CAST(h_bucket AS DOUBLE) AS h_bucket,
               round(CAST(mi AS DOUBLE)
                     / sqrt(CAST(h_type AS DOUBLE)
                            * CAST(h_bucket AS DOUBLE)), 6) AS nmi
        FROM agg
    """


def q_gumbel_block_maxima(
    spark: SparkSession, sf_dir: str, return_period: int = 365
) -> DataFrame:
    """Extreme-value analysis via Gumbel block maxima — fit the
    Gumbel (EV type I) distribution to DAILY maxima of event values
    by the method of moments and report the ``return_period``-day
    return level: the value exceeded on average once per period.
    The capacity-planning read of the tail family (Hill says HOW
    heavy the tail is; the return level says what peak to provision
    for), and the classical EVT result for maxima of light-tailed
    data (Fisher-Tippett-Gnedenko).

    Method of moments: beta = s * sqrt(6) / pi,
    mu = xbar - gamma * beta (gamma = Euler-Mascheroni), return
    level x_T = mu - beta * ln(-ln(1 - 1/T)).

    Plan: one groupBy(day) max fold over the corpus (map-side
    combine), then the moment fold over the DAY-COUNT-sized block
    table — blocks stay dimension-sized at any corpus scale.
    Exactness: block maxima are exact cents; mean/variance come
    from exact integer sums (DECIMAL(38,0) squares); the constants
    are double literals, the transcendentals one libm call each on
    identical doubles, rounded 6."""
    dec = "decimal(38,0)"
    e = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    blocks = e.groupBy("day").agg(F.max("cents").alias("mx"))
    agg = blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("mx").cast(dec)).alias("sx"),
        F.sum(F.col("mx").cast(dec) * F.col("mx").cast(dec)).alias("sxx"),
    )
    nd = F.col("n_blocks").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    mean = sx / nd / 100.0
    sd = F.sqrt(
        (nd * sxx - sx * sx) / (nd * (nd - 1.0))
    ) / 100.0
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = mean - F.lit(0.5772156649015329) * beta
    t = float(return_period)
    rl = mu - beta * F.log(-F.log(F.lit(1.0 - 1.0 / t)))
    return agg.select(
        F.col("n_blocks"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(rl, 6).alias(f"return_level_{return_period}d"),
    )


def gumbel_block_maxima_oracle_sql(return_period: int = 365) -> str:
    t = float(return_period)
    return f"""
        WITH blocks AS (
            SELECT CAST(ts AS DATE) AS day,
                   max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS mx
            FROM events GROUP BY 1
        ), agg AS (
            SELECT count(*) AS n_blocks,
                   sum(CAST(mx AS DECIMAL(38,0))) AS sx,
                   sum(CAST(mx AS DECIMAL(38,0))
                       * CAST(mx AS DECIMAL(38,0))) AS sxx
            FROM blocks
        )
        SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
               round(CAST(sx AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                     / 100.0
                     - 0.5772156649015329
                       * (sqrt((CAST(n_blocks AS DOUBLE)
                                * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE)
                                  * CAST(sx AS DOUBLE))
                               / (CAST(n_blocks AS DOUBLE)
                                  * (CAST(n_blocks AS DOUBLE) - 1.0)))
                          / 100.0 * sqrt(6.0) / 3.141592653589793), 6)
                   AS gumbel_mu,
               round(sqrt((CAST(n_blocks AS DOUBLE)
                           * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n_blocks AS DOUBLE)
                             * (CAST(n_blocks AS DOUBLE) - 1.0)))
                     / 100.0 * sqrt(6.0) / 3.141592653589793, 6)
                   AS gumbel_beta,
               round((CAST(sx AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                      / 100.0
                      - 0.5772156649015329
                        * (sqrt((CAST(n_blocks AS DOUBLE)
                                 * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE)
                                   * CAST(sx AS DOUBLE))
                                / (CAST(n_blocks AS DOUBLE)
                                   * (CAST(n_blocks AS DOUBLE)
                                      - 1.0)))
                           / 100.0 * sqrt(6.0) / 3.141592653589793))
                     - (sqrt((CAST(n_blocks AS DOUBLE)
                              * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE)
                                * CAST(sx AS DOUBLE))
                             / (CAST(n_blocks AS DOUBLE)
                                * (CAST(n_blocks AS DOUBLE) - 1.0)))
                        / 100.0 * sqrt(6.0) / 3.141592653589793)
                       * ln(-ln({1.0 - 1.0 / t!r})), 6)
                   AS return_level_{return_period}d
        FROM agg
    """


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix — the product-analytics
    staple: users cohorted by first-seen week, each later week's
    active share of the cohort. The triangle whose diagonal decay is
    the single most-watched growth metric; the funnel family's
    longitudinal sibling (q_funnel_stages is within-session, this is
    across weeks).

    Plan: ONE corpus scan to the distinct (user, week) activity set,
    localCheckpointed at the multi-consumer point (three consumers —
    the retention join, the cohort derivation, the size table — would
    otherwise each rescan the corpus; the checkpoint is users x weeks
    rows of two narrow columns, tiny next to events). The cohort
    table derives FROM that set (min week per user — the same value
    as min over raw events, since distinct preserves per-user week
    minima). Exactness: week arithmetic is pure integer date math
    from a fixed epoch; retention is ONE division rounded 4."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    week = (F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) / 7)
    activity = (
        e.select(
            "user_id", F.floor(week).cast("long").alias("active_week")
        )
        .distinct()
        .localCheckpoint()
    )
    cohorts = activity.groupBy("user_id").agg(
        F.min("active_week").alias("cohort_week")
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    ret = (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
    )
    return ret.select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        F.round(
            F.col("n_active").cast("double")
            / F.col("n_cohort").cast("double"),
            4,
        ).alias("retention"),
    ).orderBy("cohort_week", "week_offset")


def retention_cohorts_oracle_sql() -> str:
    return """
        WITH e AS (
            SELECT user_id, CAST(ts AS DATE) AS day FROM events
        ), cohorts AS (
            SELECT user_id,
                   CAST(floor(min(datediff('day', DATE '2024-01-01',
                                           day)) / 7.0) AS BIGINT)
                       AS cohort_week
            FROM e GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id,
                   CAST(floor(datediff('day', DATE '2024-01-01', day)
                              / 7.0) AS BIGINT) AS active_week
            FROM e
        ), sizes AS (
            SELECT cohort_week, count(*) AS n_cohort
            FROM cohorts GROUP BY cohort_week
        ), ret AS (
            SELECT c.cohort_week,
                   a.active_week - c.cohort_week AS week_offset,
                   count(*) AS n_active
            FROM activity a JOIN cohorts c USING (user_id)
            GROUP BY 1, 2
        )
        SELECT cohort_week, week_offset,
               CAST(n_active AS BIGINT) AS n_active,
               CAST(n_cohort AS BIGINT) AS n_cohort,
               round(CAST(n_active AS DOUBLE)
                     / CAST(n_cohort AS DOUBLE), 4) AS retention
        FROM ret JOIN sizes USING (cohort_week)
        ORDER BY cohort_week, week_offset
    """


def q_burstiness_fano(
    spark: SparkSession, sf_dir: str, n_hours: int = 720
) -> DataFrame:
    """Fano factor (index of dispersion) per event type over hourly
    buckets — the burstiness read: 1.0 is Poisson, >> 1 is bursty
    (thundering herds, bot storms, replay floods), << 1 is
    metronomic (schedulers, heartbeats). What capacity planning and
    bot-detection actually look at before any model; the temporal
    sibling of the AMS F2 concentration read.

    Fano = var/mean over the FULL hour grid including empty hours:
    with N events in H hours and sxx = sum of squared hourly counts
    (empty hours add zero), population var/mean collapses to the
    integer-rational (H * sxx - N^2) / (H * N) — exact DECIMAL(38,0)
    products, ONE division rounded 6.

    Plan: one groupBy(type, hour) corpus fold (map-side combine;
    the cell table is H x types, dimension-sized), one per-type
    fold. H is a parameter of the corpus window (720 = 30 days).
    A corpus spanning MORE active hours than n_hours would flip
    H*sxx - N^2 negative and silently report a nonsense Fano factor,
    so the plan embeds a raise_error guard (the Boruvka
    convergence-guard pattern, per round-10 advice): executors fail
    loud on n_active_hours > n_hours instead of returning garbage."""
    dec = "decimal(38,0)"
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(3600)).alias("hour"),
    )
    cells = e.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = cells.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_active_hours"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("sxx"),
    )
    fano = (
        (
            F.lit(n_hours).cast(dec) * F.col("sxx")
            - F.col("n_events").cast(dec) * F.col("n_events").cast(dec)
        ).cast("double")
        / (F.lit(n_hours).cast(dec) * F.col("n_events").cast(dec)).cast(
            "double"
        )
    )
    guarded_fano = F.when(
        F.col("n_active_hours") <= F.lit(n_hours), F.round(fano, 6)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "q_burstiness_fano: corpus spans more active hours "
                    f"than the n_hours={n_hours} grid for event_type="
                ),
                F.col("event_type"),
                F.lit(" (n_active_hours="),
                F.col("n_active_hours").cast("string"),
                F.lit(") — widen n_hours to cover the corpus window"),
            )
        ).cast("double")
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_active_hours",
        guarded_fano.alias("fano_factor"),
        (guarded_fano > F.lit(1.0)).alias("overdispersed"),
    ).orderBy("event_type")


def burstiness_fano_oracle_sql(n_hours: int = 720) -> str:
    return f"""
        WITH cells AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        ), agg AS (
            SELECT event_type,
                   sum(c) AS n_events,
                   count(*) AS n_active_hours,
                   sum(CAST(c AS DECIMAL(38,0))
                       * CAST(c AS DECIMAL(38,0))) AS sxx
            FROM cells GROUP BY event_type
        )
        SELECT event_type,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(n_active_hours AS BIGINT) AS n_active_hours,
               round(CAST(CAST({n_hours} AS DECIMAL(38,0)) * sxx
                          - CAST(n_events AS DECIMAL(38,0))
                            * CAST(n_events AS DECIMAL(38,0))
                          AS DOUBLE)
                     / CAST(CAST({n_hours} AS DECIMAL(38,0))
                            * CAST(n_events AS DECIMAL(38,0))
                            AS DOUBLE), 6) AS fano_factor,
               round(CAST(CAST({n_hours} AS DECIMAL(38,0)) * sxx
                          - CAST(n_events AS DECIMAL(38,0))
                            * CAST(n_events AS DECIMAL(38,0))
                          AS DOUBLE)
                     / CAST(CAST({n_hours} AS DECIMAL(38,0))
                            * CAST(n_events AS DECIMAL(38,0))
                            AS DOUBLE), 6) > 1.0 AS overdispersed
        FROM agg ORDER BY event_type
    """


def q_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression by normal equations, solved in
    closed form with Cramer's rule — purchase spend per user
    regressed on click count and view count. The workhorse "does
    engagement predict spend, holding browsing constant" read, and
    the template for ANY distributed k-feature OLS: the corpus folds
    to the 9 moment sums of [1, x1, x2] x [y], the 3x3 solve is
    pure arithmetic on that one row — no iteration, no driver-side
    linear algebra library (the q_series_ols_trend shape, one
    feature up; the PCA/gram trainer is this family's big sibling).

    Exactness: the moment sums fold as DECIMAL(38,0) over exact
    integer counts/cents (sum x1*y at 1e12 users passes int64); the
    determinants expand as IDENTICAL-order double expressions on
    those exact sums in both engines (det products pass decimal128,
    so the solve runs in doubles — deterministic, same IEEE ops),
    with betas and R^2 rounded 6. R^2 comes from the algebraic
    identity SSE = Syy - b'X'y (no second pass).

    100 TB: ONE corpus fold (map-side combine to 10 numbers), then
    literally a single row of arithmetic."""
    dec = "decimal(38,0)"
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(0)
        ).alias("y"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("x1"),
        F.sum((F.col("event_type") == "view").cast("long")).alias("x2"),
    )
    c = lambda n: F.col(n).cast(dec)  # noqa: E731
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c("x1")).alias("s1"),
        F.sum(c("x2")).alias("s2"),
        F.sum(c("x1") * c("x1")).alias("s11"),
        F.sum(c("x1") * c("x2")).alias("s12"),
        F.sum(c("x2") * c("x2")).alias("s22"),
        F.sum(c("y")).alias("sy"),
        F.sum(c("x1") * c("y")).alias("s1y"),
        F.sum(c("x2") * c("y")).alias("s2y"),
        F.sum(c("y") * c("y")).alias("syy"),
    )
    d = lambda n: F.col(n).cast("double")  # noqa: E731
    n, s1, s2 = d("n"), d("s1"), d("s2")
    s11, s12, s22 = d("s11"), d("s12"), d("s22")
    sy, s1y, s2y, syy = d("sy"), d("s1y"), d("s2y"), d("syy")
    # X'X = [[n s1 s2], [s1 s11 s12], [s2 s12 s22]]; X'y = [sy s1y s2y].
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    b0 = det0 / det
    b1 = det1 / det
    b2 = det2 / det
    sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = syy - sy * sy / n
    return s.select(
        F.col("n").alias("n_users"),
        F.round(b0 / 100.0, 6).alias("intercept"),
        F.round(b1 / 100.0, 6).alias("beta_clicks"),
        F.round(b2 / 100.0, 6).alias("beta_views"),
        F.round(1.0 - sse / sst, 6).alias("r_squared"),
    )


def ols_normal_equations_oracle_sql() -> str:
    return """
        WITH per_user AS (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS y,
                   sum(CAST(event_type = 'click' AS BIGINT)) AS x1,
                   sum(CAST(event_type = 'view' AS BIGINT)) AS x2
            FROM events GROUP BY user_id
        ), s AS (
            SELECT count(*) AS n,
                   sum(CAST(x1 AS DECIMAL(38,0))) AS s1,
                   sum(CAST(x2 AS DECIMAL(38,0))) AS s2,
                   sum(CAST(x1 AS DECIMAL(38,0))
                       * CAST(x1 AS DECIMAL(38,0))) AS s11,
                   sum(CAST(x1 AS DECIMAL(38,0))
                       * CAST(x2 AS DECIMAL(38,0))) AS s12,
                   sum(CAST(x2 AS DECIMAL(38,0))
                       * CAST(x2 AS DECIMAL(38,0))) AS s22,
                   sum(CAST(y AS DECIMAL(38,0))) AS sy,
                   sum(CAST(x1 AS DECIMAL(38,0))
                       * CAST(y AS DECIMAL(38,0))) AS s1y,
                   sum(CAST(x2 AS DECIMAL(38,0))
                       * CAST(y AS DECIMAL(38,0))) AS s2y,
                   sum(CAST(y AS DECIMAL(38,0))
                       * CAST(y AS DECIMAL(38,0))) AS syy
            FROM per_user
        ), dd AS (
            SELECT CAST(n AS DOUBLE) AS n,
                   CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
                   CAST(s11 AS DOUBLE) AS s11,
                   CAST(s12 AS DOUBLE) AS s12,
                   CAST(s22 AS DOUBLE) AS s22,
                   CAST(sy AS DOUBLE) AS sy,
                   CAST(s1y AS DOUBLE) AS s1y,
                   CAST(s2y AS DOUBLE) AS s2y,
                   CAST(syy AS DOUBLE) AS syy
            FROM s
        ), solved AS (
            SELECT n, sy, s1y, s2y, syy,
                   (n * (s11 * s22 - s12 * s12)
                    - s1 * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s12 - s11 * s2)) AS det,
                   (sy * (s11 * s22 - s12 * s12)
                    - s1 * (s1y * s22 - s12 * s2y)
                    + s2 * (s1y * s12 - s11 * s2y)) AS det0,
                   (n * (s1y * s22 - s12 * s2y)
                    - sy * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s2y - s1y * s2)) AS det1,
                   (n * (s11 * s2y - s1y * s12)
                    - s1 * (s1 * s2y - s1y * s2)
                    + sy * (s1 * s12 - s11 * s2)) AS det2
            FROM dd
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               round(det0 / det / 100.0, 6) AS intercept,
               round(det1 / det / 100.0, 6) AS beta_clicks,
               round(det2 / det / 100.0, 6) AS beta_views,
               round(1.0 - (syy - ((det0 / det) * sy
                                   + (det1 / det) * s1y
                                   + (det2 / det) * s2y))
                     / (syy - sy * sy / n), 6) AS r_squared
        FROM solved
    """


# --------------------------------------------------------------------
# Round-11 coda: inequality / association / distribution-distance /
# randomization statistics. Same exactness discipline as the round-10
# block: integer and DECIMAL(38,0) folds, libm calls on
# identical-integer-derived doubles, rounded-6 terms summed as
# DECIMAL(18,6), ONE final division per output.


def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the
    inequality read of the corpus-balance family (Simpson/HHI say how
    concentrated TOKEN usage is; Gini says how unequally SIZE is
    distributed across documents). A source whose Gini drifts up is
    turning into a few mega-pages plus stubs — exactly what length
    filters and packing planners need to know before they run.

    Exactness: with per-source lengths sorted ascending and ranked
    1..n, G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) — both
    rank-weighted folds are DECIMAL(38,0) (rank * length at 1e12 docs
    x 1e6 chars = 1e18/term), ONE double division rounded 6. Ties:
    equal lengths commute inside sum(i*x_i), so the deterministic
    (n_chars, doc_id) rank order is tie-invariant.

    Plan: one per-source sort (the rank window), two folds — the
    same shuffle shape as any per-key rank statistic; no joins. At
    100 TB the window partitions by source (thousands of cells), and
    a skewed mega-source salts into the two-level rank fold the rank
    family already uses."""
    dec = "decimal(38,0)"
    d = load(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("i"),
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.col("i").cast(dec) * F.col("n_chars").cast(dec)).alias(
            "s_ix"
        ),
    )
    gini = (
        (
            F.lit(2).cast(dec) * F.col("s_ix")
            - (F.col("n_docs") + 1).cast(dec)
            * F.col("total_chars").cast(dec)
        ).cast("double")
        / (
            F.col("n_docs").cast(dec) * F.col("total_chars").cast(dec)
        ).cast("double")
    )
    return agg.select(
        "source",
        "n_docs",
        F.col("total_chars").cast("long").alias("total_chars"),
        F.round(gini, 6).alias("gini"),
    ).orderBy("source")


def gini_coefficient_oracle_sql() -> str:
    return """
        WITH ranked AS (
            SELECT source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id) AS i
            FROM documents
        ), agg AS (
            SELECT source,
                   count(*) AS n_docs,
                   sum(n_chars) AS total_chars,
                   sum(CAST(i AS DECIMAL(38,0))
                       * CAST(n_chars AS DECIMAL(38,0))) AS s_ix
            FROM ranked GROUP BY source
        )
        SELECT source,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(total_chars AS BIGINT) AS total_chars,
               round(CAST(CAST(2 AS DECIMAL(38,0)) * s_ix
                          - CAST(n_docs + 1 AS DECIMAL(38,0))
                            * CAST(total_chars AS DECIMAL(38,0))
                          AS DOUBLE)
                     / CAST(CAST(n_docs AS DECIMAL(38,0))
                            * CAST(total_chars AS DECIMAL(38,0))
                            AS DOUBLE), 6) AS gini
        FROM agg ORDER BY source
    """


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between document source and language — the scaled
    chi-square association read for categorical x categorical (the
    chi-square family's third dial: q_chi2_independence TESTS,
    q_mutual_information measures in nats, V normalizes to [0, 1] so
    associations are comparable across tables). The curation use:
    V(source, lang) near 1 means language is source-determined and
    per-language mixture targets can't be tuned independently.

    Exactness: the cell table is (n_sources x n_langs)-sized. Each
    cell's deviation o*n - rt*ct folds as DECIMAL(38,0) (EXACT — the
    square would hit 1e48 at web scale, so the square happens in
    DOUBLE after one exact-decimal cast, identically ordered in both
    engines); per-cell terms dev^2 / (n*rt*ct) are rounded 6 and
    summed as DECIMAL(18,6); V = sqrt(chi2 / (n*min(r-1,c-1))) is
    ONE final division + sqrt.

    Plan: one groupBy(source, lang) corpus fold; marginals via
    windows over the dimension-sized cell table; no corpus joins."""
    dec = "decimal(38,0)"
    d = load(spark, sf_dir, "documents").select("source", "lang")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("o")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ws = Window.partitionBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wl = Window.partitionBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = cells.select(
        "o",
        F.sum("o").over(ws).alias("rt"),
        F.sum("o").over(wl).alias("ct"),
        F.sum("o").over(wall).alias("n"),
        F.size(F.collect_set("source").over(wall)).alias("r"),
        F.size(F.collect_set("lang").over(wall)).alias("c"),
    )
    dev = (
        F.col("o").cast(dec) * F.col("n").cast(dec)
        - F.col("rt").cast(dec) * F.col("ct").cast(dec)
    ).cast("double")
    term = F.round(
        dev * dev
        / (
            F.col("n").cast(dec)
            * F.col("rt").cast(dec)
            * F.col("ct").cast(dec)
        ).cast("double"),
        6,
    ).cast("decimal(18,6)")
    agg = g.agg(
        F.max("n").alias("n"),
        F.max("r").alias("n_sources"),
        F.max("c").alias("n_langs"),
        F.sum(term).alias("chi2"),
    )
    v = F.sqrt(
        F.col("chi2").cast("double")
        / (
            F.col("n")
            * F.least(F.col("n_sources") - 1, F.col("n_langs") - 1)
        ).cast("double")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("n_langs").cast("long").alias("n_langs"),
        F.col("chi2").cast("double").alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def cramers_v_oracle_sql() -> str:
    return """
        WITH cells AS (
            SELECT source, lang, count(*) AS o
            FROM documents GROUP BY source, lang
        ), g AS (
            SELECT o,
                   sum(o) OVER (PARTITION BY source) AS rt,
                   sum(o) OVER (PARTITION BY lang) AS ct,
                   sum(o) OVER () AS n,
                   count(DISTINCT source) OVER () AS r,
                   count(DISTINCT lang) OVER () AS c
            FROM cells
        ), agg AS (
            SELECT max(n) AS n, max(r) AS r, max(c) AS c,
                   sum(CAST(round(
                       CAST(CAST(o AS DECIMAL(38,0))
                            * CAST(n AS DECIMAL(38,0))
                            - CAST(rt AS DECIMAL(38,0))
                              * CAST(ct AS DECIMAL(38,0)) AS DOUBLE)
                       * CAST(CAST(o AS DECIMAL(38,0))
                              * CAST(n AS DECIMAL(38,0))
                              - CAST(rt AS DECIMAL(38,0))
                                * CAST(ct AS DECIMAL(38,0)) AS DOUBLE)
                       / CAST(CAST(n AS DECIMAL(38,0))
                              * CAST(rt AS DECIMAL(38,0))
                              * CAST(ct AS DECIMAL(38,0)) AS DOUBLE),
                       6) AS DECIMAL(18,6))) AS chi2
            FROM g
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
               CAST(r AS BIGINT) AS n_sources,
               CAST(c AS BIGINT) AS n_langs,
               CAST(chi2 AS DOUBLE) AS chi2,
               round(sqrt(CAST(chi2 AS DOUBLE)
                          / CAST(n * least(r - 1, c - 1) AS DOUBLE)),
                     6) AS cramers_v
        FROM agg
    """


def q_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(lang | source) and
    U(source | lang) — the ASYMMETRIC association read the symmetric
    pair (Cramér's V, NMI) can't give: "knowing the source removes
    X% of the uncertainty about the language" is a different claim
    from its converse, and mixture planning needs the direction
    (source->lang near 1: language targets are implied by source
    caps; lang->source near 1: deduping by language silently dedupes
    sources).

    U(X|Y) = (H(X) - H(X|Y)) / H(X) with H(X|Y) = H(X,Y) - H(Y).
    Exactness: the q_mutual_information discipline verbatim — every
    entropy term is count/n * ln(count/n) on identical
    integer-derived doubles, rounded 6, summed as DECIMAL(18,6);
    marginal terms fold once via first-cell tagging; the two U
    values are single divisions on already-rounded entropies.

    Plan: one groupBy(source, lang) corpus fold; everything after is
    windows over the dimension-sized cell table."""
    d = load(spark, sf_dir, "documents").select("source", "lang")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_sl")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ws = Window.partitionBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wl = Window.partitionBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = cells.select(
        "n_sl",
        F.sum("n_sl").over(ws).alias("n_s"),
        F.sum("n_sl").over(wl).alias("n_l"),
        F.sum("n_sl").over(wall).alias("n"),
        F.min("lang").over(ws).alias("first_l"),
        F.min("source").over(wl).alias("first_s"),
        "source",
        "lang",
    )
    nd = F.col("n").cast("double")
    d186 = "decimal(18,6)"

    def ent_term(cnt: Column) -> Column:
        p = cnt.cast("double") / nd
        return F.round(-p * F.log(p), 6).cast(d186)

    hj_term = ent_term(F.col("n_sl"))
    hs_term = F.when(F.col("lang") == F.col("first_l"),
                     ent_term(F.col("n_s")))
    hl_term = F.when(F.col("source") == F.col("first_s"),
                     ent_term(F.col("n_l")))
    agg = g.agg(
        F.max("n").alias("n"),
        F.sum(hj_term).alias("h_joint"),
        F.sum(hs_term).alias("h_source"),
        F.sum(hl_term).alias("h_lang"),
    )
    u_l_given_s = (
        F.col("h_lang") + F.col("h_source") - F.col("h_joint")
    ).cast("double") / F.col("h_lang").cast("double")
    u_s_given_l = (
        F.col("h_lang") + F.col("h_source") - F.col("h_joint")
    ).cast("double") / F.col("h_source").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("h_source").cast("double").alias("h_source"),
        F.col("h_lang").cast("double").alias("h_lang"),
        F.col("h_joint").cast("double").alias("h_joint"),
        F.round(u_l_given_s, 6).alias("u_lang_given_source"),
        F.round(u_s_given_l, 6).alias("u_source_given_lang"),
    )


def theils_u_oracle_sql() -> str:
    return """
        WITH cells AS (
            SELECT source, lang, count(*) AS n_sl
            FROM documents GROUP BY source, lang
        ), g AS (
            SELECT n_sl, source, lang,
                   sum(n_sl) OVER (PARTITION BY source) AS n_s,
                   sum(n_sl) OVER (PARTITION BY lang) AS n_l,
                   sum(n_sl) OVER () AS n,
                   min(lang) OVER (PARTITION BY source) AS first_l,
                   min(source) OVER (PARTITION BY lang) AS first_s
            FROM cells
        ), agg AS (
            SELECT max(n) AS n,
                   sum(CAST(round(-(CAST(n_sl AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                  * ln(CAST(n_sl AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 6)
                            AS DECIMAL(18,6))) AS h_joint,
                   sum(CASE WHEN lang = first_l THEN
                       CAST(round(-(CAST(n_s AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                  * ln(CAST(n_s AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 6)
                            AS DECIMAL(18,6)) END) AS h_source,
                   sum(CASE WHEN source = first_s THEN
                       CAST(round(-(CAST(n_l AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                  * ln(CAST(n_l AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 6)
                            AS DECIMAL(18,6)) END) AS h_lang
            FROM g
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
               CAST(h_source AS DOUBLE) AS h_source,
               CAST(h_lang AS DOUBLE) AS h_lang,
               CAST(h_joint AS DOUBLE) AS h_joint,
               round(CAST(h_lang + h_source - h_joint AS DOUBLE)
                     / CAST(h_lang AS DOUBLE), 6)
                   AS u_lang_given_source,
               round(CAST(h_lang + h_source - h_joint AS DOUBLE)
                     / CAST(h_source AS DOUBLE), 6)
                   AS u_source_given_lang
        FROM agg
    """


def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth-mover) distance between each source's
    document-length distribution and the pooled REST of the corpus —
    the drift family's metric completion: KS reads the worst single
    CDF gap, PSI reads binned log-drift, W1 integrates the WHOLE CDF
    gap in character units ("moving this source's length profile to
    the corpus profile costs 37 chars of mass-distance per doc").
    Scale-free of binning choices; the standard two-sample
    distribution distance in data-shift monitoring.

    W1 = sum_k |F_a(x_k) - F_b(x_k)| * (x_{k+1} - x_k) over the
    merged support grid. Exactness: with cumulative counts cumA/cumB
    and totals nA/nB, each term is |cumA*nB - cumB*nA| * gap — pure
    DECIMAL(38,0) products (1e12 * 1e12 * 1e6 = 1e30) — summed
    exactly, ONE final division by nA*nB rounded 6.

    Plan: one groupBy(source, n_chars) corpus fold to a value grid,
    a dimension-sized (sources x values) completion cross join, two
    window cumsums, one fold per source. The corpus is read once; at
    100 TB the grid is bounded by the length cap (~1e6 values), so
    everything after the first fold is dimension-sized."""
    dec = "decimal(38,0)"
    d = load(spark, sf_dir, "documents").select("source", "n_chars")
    cnt = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("c")
    )
    # The max value keeps a zero gap (F(max)=1 on both sides, so its
    # term is 0) rather than being dropped: dropping it would truncate
    # the per-source totals for sources owning max-length docs.
    vals = (
        d.select(F.col("n_chars").alias("v")).distinct()
        .select(
            "v",
            F.coalesce(
                F.lead("v").over(Window.orderBy("v")) - F.col("v"),
                F.lit(0),
            ).alias("gap"),
        )
    )
    srcs = d.select("source").distinct()
    grid = srcs.crossJoin(vals)
    filled = grid.join(
        cnt,
        (grid["source"] == cnt["source"]) & (grid["v"] == cnt["n_chars"]),
        "left",
    ).select(
        grid["source"], grid["v"], grid["gap"],
        F.coalesce(cnt["c"], F.lit(0)).alias("c"),
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = filled.select(
        "source", "v", "gap",
        F.sum("c").over(wcum).alias("cum_a"),
        F.sum("c").over(
            Window.orderBy("v").rangeBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum_all"),
        F.sum("c").over(
            Window.partitionBy("source").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_a"),
        F.sum("c").over(wall).alias("n"),
    )
    term = (
        F.abs(
            F.col("cum_a").cast(dec) * (F.col("n") - F.col("n_a")).cast(dec)
            - (F.col("cum_all") - F.col("cum_a")).cast(dec)
            * F.col("n_a").cast(dec)
        )
        * F.col("gap").cast(dec)
    )
    agg = cum.groupBy("source").agg(
        F.max("n_a").alias("n_docs"),
        F.max(F.col("n") - F.col("n_a")).alias("n_rest"),
        F.sum(term).alias("num"),
    )
    w1 = F.col("num").cast("double") / (
        F.col("n_docs").cast(dec) * F.col("n_rest").cast(dec)
    ).cast("double")
    return agg.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_rest").cast("long").alias("n_rest"),
        F.round(w1, 6).alias("w1_chars"),
    ).orderBy("source")


def wasserstein_1d_oracle_sql() -> str:
    return """
        WITH cnt AS (
            SELECT source, n_chars, count(*) AS c
            FROM documents GROUP BY source, n_chars
        ), vals AS (
            SELECT v, coalesce(lead(v) OVER (ORDER BY v) - v, 0) AS gap
            FROM (SELECT DISTINCT n_chars AS v FROM documents)
        ), grid AS (
            SELECT s.source, vals.v, vals.gap
            FROM (SELECT DISTINCT source FROM documents) s
            CROSS JOIN vals
        ), filled AS (
            SELECT grid.source, grid.v, grid.gap,
                   coalesce(cnt.c, 0) AS c
            FROM grid LEFT JOIN cnt
              ON grid.source = cnt.source AND grid.v = cnt.n_chars
        ), cum AS (
            SELECT source, v, gap,
                   sum(c) OVER (PARTITION BY source ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum_a,
                   sum(c) OVER (ORDER BY v
                                RANGE UNBOUNDED PRECEDING) AS cum_all,
                   sum(c) OVER (PARTITION BY source) AS n_a,
                   sum(c) OVER () AS n
            FROM filled
        ), agg AS (
            SELECT source,
                   max(n_a) AS n_docs,
                   max(n - n_a) AS n_rest,
                   sum(abs(CAST(cum_a AS DECIMAL(38,0))
                           * CAST(n - n_a AS DECIMAL(38,0))
                           - CAST(cum_all - cum_a AS DECIMAL(38,0))
                             * CAST(n_a AS DECIMAL(38,0)))
                       * CAST(gap AS DECIMAL(38,0))) AS num
            FROM cum GROUP BY source
        )
        SELECT source,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_rest AS BIGINT) AS n_rest,
               round(CAST(num AS DOUBLE)
                     / CAST(CAST(n_docs AS DECIMAL(38,0))
                            * CAST(n_rest AS DECIMAL(38,0)) AS DOUBLE),
                     6) AS w1_chars
        FROM agg ORDER BY source
    """


def q_permutation_test(
    spark: SparkSession, sf_dir: str, n_perms: int = 200
) -> DataFrame:
    """Paired sign-flip permutation test: does a user's purchase
    value run higher than their click value, beyond what chance
    assignment explains? The experimentation family's
    distribution-free member — Welch assumes normals, the rank tests
    assume exchangeable POOLED samples; the sign-flip test only
    assumes the per-user contrast is sign-symmetric under H0, and it
    is the standard randomization check behind A/B readouts.

    Per user u with both event types: the integer contrast
    d_u = sumP_u * cntC_u - sumC_u * cntP_u (cents x counts — the
    cross-multiplied mean difference, exact). T_obs = sum d_u.
    Each permutation p flips signs with the md5 coin
    parity(md5("pt:" || u || ":" || p)): T_p = sum s(u,p) * d_u.
    p_value = (1 + #{|T_p| >= |T_obs|}) / (n_perms + 1) — the
    add-one Monte-Carlo form, exact integer rational.

    Exactness: d_u and every T are DECIMAL(38,0) folds; the md5 coin
    is engine-portable (established countmin/DSIR idiom); ONE final
    division. Plan: one groupBy(user) corpus fold, an n_perms-way
    explode of the USER-sized contrast table (n_perms is the dial —
    the replicated table is users x 200, never events x 200), one
    groupBy(perm) fold, one broadcast-sized comparison."""
    dec = "decimal(38,0)"
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "user_id",
        F.col("event_type"),
        cents.alias("cents"),
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase",
                         F.col("cents"))).alias("sum_p"),
            F.count(F.when(F.col("event_type") == "purchase",
                           F.lit(1))).alias("cnt_p"),
            F.sum(F.when(F.col("event_type") == "click",
                         F.col("cents"))).alias("sum_c"),
            F.count(F.when(F.col("event_type") == "click",
                           F.lit(1))).alias("cnt_c"),
        )
        .where((F.col("cnt_p") > 0) & (F.col("cnt_c") > 0))
        .select(
            "user_id",
            (
                F.col("sum_p").cast(dec) * F.col("cnt_c").cast(dec)
                - F.col("sum_c").cast(dec) * F.col("cnt_p").cast(dec)
            ).alias("d"),
        )
        # Feeds T_obs, the permutation explode, and the user count —
        # three consumers, one computation.
        .localCheckpoint()
    )
    obs = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.abs(F.sum("d")).alias("t_abs"),
        F.sum("d").alias("t_obs"),
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("pt"),
                        F.col("user_id").cast("string"),
                        F.col("p").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    perms = (
        per_user.select(
            "user_id",
            "d",
            F.explode(
                F.sequence(F.lit(1), F.lit(n_perms))
            ).alias("p"),
        )
        .select(
            "p",
            F.when(coin == 0, F.col("d")).otherwise(-F.col("d")).alias(
                "sd"
            ),
        )
        .groupBy("p")
        .agg(F.abs(F.sum("sd")).alias("t_p"))
    )
    extreme = perms.crossJoin(F.broadcast(obs)).where(
        F.col("t_p") >= F.col("t_abs")
    ).agg(F.count(F.lit(1)).alias("n_extreme"))
    return (
        obs.crossJoin(F.broadcast(extreme))
        .select(
            "n_users",
            F.col("t_obs").cast("double").alias("t_obs"),
            F.lit(n_perms).cast("long").alias("n_perms"),
            F.col("n_extreme").cast("long").alias("n_extreme"),
            F.round(
                (F.col("n_extreme") + 1).cast("double")
                / F.lit(float(n_perms + 1)),
                6,
            ).alias("p_value"),
        )
    )


def permutation_test_oracle_sql(n_perms: int = 200) -> str:
    return f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN cents END) AS DECIMAL(38,0))
                   * CAST(count(CASE WHEN event_type = 'click'
                                THEN 1 END) AS DECIMAL(38,0))
                   - CAST(sum(CASE WHEN event_type = 'click'
                              THEN cents END) AS DECIMAL(38,0))
                     * CAST(count(CASE WHEN event_type = 'purchase'
                                  THEN 1 END) AS DECIMAL(38,0)) AS d
            FROM (
                SELECT user_id, event_type,
                       CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                           AS cents
                FROM events
                WHERE event_type IN ('purchase', 'click')
            )
            GROUP BY user_id
            HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END)
                       > 0
               AND count(CASE WHEN event_type = 'click' THEN 1 END) > 0
        ), obs AS (
            SELECT count(*) AS n_users,
                   abs(sum(d)) AS t_abs,
                   sum(d) AS t_obs
            FROM per_user
        ), perms AS (
            SELECT p.p,
                   abs(sum(CASE WHEN
                       ('0x' || substr(md5('pt:' || CAST(user_id AS
                                VARCHAR) || ':' || CAST(p.p AS
                                VARCHAR)), 1, 8))::BIGINT % 2 = 0
                       THEN d ELSE -d END)) AS t_p
            FROM per_user
            CROSS JOIN (SELECT unnest(generate_series(1, {n_perms}))
                        AS p) p
            GROUP BY p.p
        ), extreme AS (
            SELECT count(*) AS n_extreme
            FROM perms, obs WHERE perms.t_p >= obs.t_abs
        )
        SELECT CAST(n_users AS BIGINT) AS n_users,
               CAST(t_obs AS DOUBLE) AS t_obs,
               CAST({n_perms} AS BIGINT) AS n_perms,
               CAST(n_extreme AS BIGINT) AS n_extreme,
               round(CAST(n_extreme + 1 AS DOUBLE)
                     / CAST({n_perms + 1} AS DOUBLE), 6) AS p_value
        FROM obs, extreme
    """


def q_mann_kendall_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Kendall nonparametric trend test on daily revenue per
    event type — the distribution-free answer to "is this series
    actually trending?": S = sum of sign(x_j - x_i) over day pairs
    i < j, with the tie-corrected normal approximation. Theil-Sen
    (in the registry) estimates the SLOPE; Mann-Kendall tests the
    HYPOTHESIS — together they are the standard monotonic-trend kit
    for irregular, outlier-heavy operational series.

    Exactness: daily cells are exact integer cent sums; the pair
    fold is confined to the DAY-GRID self-join per type (n days
    choose 2 — dimension-sized, the q_kendall_tau confinement
    pattern, never a corpus join); S and the tie spectrum are
    integers, Var(S) = (n(n-1)(2n+5) - sum t(t-1)(2t+5)) / 18 folds
    as DECIMAL(38,0) with ONE division by 18 in double; z applies
    the standard +-1 continuity correction and is ONE division
    rounded 4.

    Plan: one groupBy(type, day) corpus fold; everything after runs
    on the <= types x days cell table."""
    dec = "decimal(38,0)"
    cents = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            cents.alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x"))
        .localCheckpoint()  # feeds the pair fold AND the tie spectrum
    )
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("x").alias("x1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("x").alias("x2")
    )
    s_fold = (
        a.join(b, "event_type")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("x2") - F.col("x1"))).cast("long").alias(
                "s"
            )
        )
    )
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("t").alias("n"),
            F.sum(
                F.col("t").cast(dec)
                * (F.col("t") - 1).cast(dec)
                * (2 * F.col("t") + 5).cast(dec)
            ).alias("tie_term"),
        )
    )
    j = s_fold.join(ties, "event_type")
    var_s = (
        F.col("n").cast(dec)
        * (F.col("n") - 1).cast(dec)
        * (2 * F.col("n") + 5).cast(dec)
        - F.col("tie_term")
    ).cast("double") / 18.0
    z = F.when(
        F.col("s") > 0,
        (F.col("s") - 1).cast("double") / F.sqrt(var_s),
    ).when(
        F.col("s") < 0,
        (F.col("s") + 1).cast("double") / F.sqrt(var_s),
    ).otherwise(F.lit(0.0))
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        "s",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 4).alias("z"),
        (F.abs(F.round(z, 4)) > F.lit(1.96)).alias("trending"),
    ).orderBy("event_type")


def mann_kendall_trend_oracle_sql() -> str:
    return """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS x
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), s_fold AS (
            SELECT a.event_type,
                   CAST(sum(sign(b.x - a.x)) AS BIGINT) AS s
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY a.event_type
        ), ties AS (
            SELECT event_type,
                   count(*) AS n_groups,
                   sum(t) AS n,
                   sum(CAST(t AS DECIMAL(38,0))
                       * CAST(t - 1 AS DECIMAL(38,0))
                       * CAST(2 * t + 5 AS DECIMAL(38,0))) AS tie_term
            FROM (SELECT event_type, x, count(*) AS t
                  FROM daily GROUP BY event_type, x)
            GROUP BY event_type
        ), j AS (
            SELECT s_fold.event_type, s, n,
                   CAST(CAST(n AS DECIMAL(38,0))
                        * CAST(n - 1 AS DECIMAL(38,0))
                        * CAST(2 * n + 5 AS DECIMAL(38,0))
                        - tie_term AS DOUBLE) / 18.0 AS var_s
            FROM s_fold JOIN ties ON s_fold.event_type = ties.event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               s,
               round(var_s, 6) AS var_s,
               round(CASE WHEN s > 0
                          THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
                          WHEN s < 0
                          THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
                          ELSE 0.0 END, 4) AS z,
               abs(round(CASE WHEN s > 0
                          THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
                          WHEN s < 0
                          THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
                          ELSE 0.0 END, 4)) > 1.96 AS trending
        FROM j ORDER BY event_type
    """


def q_seasonality_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day uniformity chi-square per event type — the
    seasonality detector that runs BEFORE any seasonal model is
    fitted: under "no daily rhythm" the 24 hour-of-day buckets are
    uniform, and chi2 = sum (o_h - n/24)^2 / (n/24) says how far the
    type deviates. Organic traffic fails uniformity with a smooth
    diurnal curve; scheduled jobs fail it on one spike; true Poisson
    noise passes. The Fano factor (in-window twin) reads VARIANCE
    burstiness on the hour grid; this reads the 24-phase PROFILE.

    Exactness: chi2 over integer counts folds as
    sum((24*o_h - n)^2) / (24*n) — the per-cell deviation 24*o - n
    is DECIMAL(38,0) exact, its square stays within DECIMAL(38,0)
    through web scale (24e12^2 ~ 6e26), the cell sum is exact, and
    the statistic is ONE division rounded 6. Missing hours
    contribute n^2 each: the fold adds (24 - observed_hours) * n^2
    in closed form rather than completing the grid.

    Plan: one groupBy(type, hour24) corpus fold; the rest is a
    24-cell-per-type table."""
    dec = "decimal(38,0)"
    e = load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("h")
    )
    wt = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cells = (
        e.groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("o"))
        .select("event_type", "o", F.sum("o").over(wt).alias("nt"))
    )
    dev = 24 * F.col("o").cast(dec) - F.col("nt").cast(dec)
    agg = cells.groupBy("event_type").agg(
        F.max("nt").alias("n"),
        F.count(F.lit(1)).alias("hours_seen"),
        F.sum(dev * dev).alias("dev2"),
    )
    chi2 = (
        F.col("dev2")
        + (24 - F.col("hours_seen")).cast(dec)
        * F.col("n").cast(dec)
        * F.col("n").cast(dec)
    ).cast("double") / (24.0 * F.col("n").cast("double"))
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("hours_seen").cast("long").alias("hours_seen"),
        F.round(chi2, 6).alias("chi2"),
        (F.round(chi2, 6) > F.lit(35.172)).alias("seasonal"),
    ).orderBy("event_type")


def seasonality_chi2_oracle_sql() -> str:
    return """
        WITH cells0 AS (
            SELECT event_type, extract(hour FROM ts) AS h,
                   count(*) AS o
            FROM events GROUP BY event_type, extract(hour FROM ts)
        ), cells AS (
            SELECT event_type, o,
                   sum(o) OVER (PARTITION BY event_type) AS nt
            FROM cells0
        ), agg AS (
            SELECT event_type,
                   max(nt) AS n,
                   count(*) AS hours_seen,
                   sum((24 * CAST(o AS DECIMAL(38,0))
                        - CAST(nt AS DECIMAL(38,0)))
                       * (24 * CAST(o AS DECIMAL(38,0))
                          - CAST(nt AS DECIMAL(38,0)))) AS dev2
            FROM cells GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_events,
               CAST(hours_seen AS BIGINT) AS hours_seen,
               round(CAST(dev2 + CAST(24 - hours_seen AS DECIMAL(38,0))
                          * CAST(n AS DECIMAL(38,0))
                          * CAST(n AS DECIMAL(38,0)) AS DOUBLE)
                     / (24.0 * CAST(n AS DOUBLE)), 6) AS chi2,
               round(CAST(dev2 + CAST(24 - hours_seen AS DECIMAL(38,0))
                          * CAST(n AS DECIMAL(38,0))
                          * CAST(n AS DECIMAL(38,0)) AS DOUBLE)
                     / (24.0 * CAST(n AS DOUBLE)), 6) > 35.172
                   AS seasonal
        FROM agg ORDER BY event_type
    """
