"""Standard relational operator surface over the TPC-H-ish testdata.

The reference's dataflow surface is tiny (SURVEY.md §2: one anti-join
J1, scalar funcs F1-F5, filters P1-P6, unpivot T1, metric aggregates
A1-A4, top-k O1-O2). This module exercises each of those semantics over
the driver's relational tables PLUS the standard Spark surface the
reference lacks (§7 Phase 2): multi-way joins, grouped/rollup aggs,
window functions, set ops, as-of alignment.

Every builder takes ``(spark, sf_dir)`` and returns a lazy DataFrame
whose column names exactly match the DuckDB oracle twin in
``__spark_entry__.oracle_sql`` (driver hashes values under sorted
column names). Aggregated doubles are rounded identically on both
sides so cross-engine float-summation noise cannot flip the hash.

Scale notes are inline per operator; the common themes:
- dimensions (region/nation/customer at these SFs) broadcast — no
  fact shuffle; Catalyst/AQE picks broadcast automatically under the
  64 MiB threshold set in session.py, `F.broadcast` marks intent where
  the dimension is guaranteed small.
- aggregations are partial (map-side combine) by construction in
  Spark's hash aggregate; rollup adds no extra pass.
- window functions partition by their natural key; skew on a hot key
  is handled by AQE (or salting for pathological keys, see
  plans/scale.md).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Lazy-scan memo: every spark.read.parquet() call builds a fresh
# relation — a driver-side file listing plus footer/schema resolution
# measured at 100-500 ms per call on this host — and the registry's
# ~180 sub-second entries each pay it one to three times per run.
# The memo returns the SAME lazy DataFrame for repeat scans of an
# unchanged table path within one session (key: application id + path
# + directory mtime, so a rewritten path or a new session misses).
# This caches scan METADATA only — the plan object, exactly what a
# catalog table registration would hold; no row data is cached and
# every action still reads the parquet bytes from disk.
_SCAN_MEMO: dict[tuple[str, str, float], DataFrame] = {}


def _scan(spark: SparkSession, path: str) -> DataFrame:
    try:
        mtime = _os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    key = (spark.sparkContext.applicationId, path, mtime)
    df = _SCAN_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _SCAN_MEMO[key] = df
    return df


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one testdata table, normalizing parquet TIMESTAMP(NANOS).

    The events table stores ns-precision timestamps, which Spark's
    parquet reader rejects unless nanos are surfaced as LONG
    (spark.sql.legacy.parquet.nanosAsLong, runtime-settable). We then
    truncate ns -> us with integer division (``div``, not ``/`` — a
    double roundtrip would lose precision above 2^53 ns) to match
    DuckDB's read of the same file as a microsecond TIMESTAMP.
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _scan(spark, f"{sf_dir}/{table}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return _scan(spark, f"{sf_dir}/{table}.parquet")


def load_events_range(
    spark: SparkSession,
    sf_dir: str,
    ts_from: str | None = None,
    ts_until: str | None = None,
) -> DataFrame:
    """Events scan with a PUSHED-DOWN time-range predicate.

    The nanos->micros conversion in ``load`` wraps ``ts`` in an
    expression, so a predicate on the converted column cannot reach
    the parquet scan (full scan at 100 TB). Here the bounds are
    converted driver-side to raw int64 nanoseconds and applied to the
    stored column BEFORE the conversion — Catalyst records them as
    ``PushedFilters`` and parquet prunes row groups on min/max stats.
    Bounds are strict-exclusive like the reference's pruning (P5,
    csv_extractor.py:252). Pinned by tests/test_plan_shape.py.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _scan(spark, f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        import pandas as pd

        if ts_from is not None:
            df = df.where(F.col("ts") > F.lit(int(pd.Timestamp(ts_from).value)))
        if ts_until is not None:
            df = df.where(F.col("ts") < F.lit(int(pd.Timestamp(ts_until).value)))
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_from is not None:
        df = df.where(F.col("ts") > F.lit(ts_from))
    if ts_until is not None:
        df = df.where(F.col("ts") < F.lit(ts_until))
    return df


def _r(c, n: int = 2):
    return F.round(c, n)


# --------------------------------------------------------------------
# Aggregations (A1-A4 analogs + Phase-2 grouped aggregate surface)
# --------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style grouped aggregate over the fact table.

    Scan -> partial hash agg -> exchange on tiny (flag,status) key ->
    final agg. Only 7 of 11 lineitem columns are read (column pruning)
    and the shipdate predicate reaches the parquet scan (pushdown).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            _r(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            _r(F.avg("l_quantity"), 4).alias("avg_qty"),
            _r(F.avg("l_extendedprice"), 4).alias("avg_price"),
            _r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped metrics with ROLLUP totals (A1/A2 analog + grouping sets).

    countDistinct forces an expand+two-phase agg; at 100 TB swap for
    approx_count_distinct (HLL, single pass) — see q_approx_distinct.
    NULL group cells are coalesced to 'ALL' on both engines so the
    hash compares rollup rows deterministically.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _r(F.sum("value")).alias("sum_value"),
            _r(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "n_events",
            "n_users",
            "sum_value",
            "avg_value",
        )
    )


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dedup-by-all-columns primitive)."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------
# Joins (J1 + Phase-2 join surface)
# --------------------------------------------------------------------

def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the reference's create-if-missing membership
    probe (J1, csv_extractor.py:151) over customer/orders: customers
    with no URGENT order. Build side (filtered distinct custkeys)
    broadcasts. (The build side is filtered so the result is
    NON-EMPTY at every SF — in this synthetic data every customer has
    ordered *something*, and a 0-row anti-join would verify the
    operator only vacuously.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers with at least one urgent high-value order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_totalprice") > 100000) & (F.col("o_orderpriority") == "1-URGENT")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + agg + top-k by revenue.

    customer(filtered) broadcasts into orders, the orders->lineitem
    join shuffles on orderkey (the natural co-location key for a
    bucketed lake layout at scale).
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join: revenue by nation where the supplier
    and customer share a nation. All dims broadcast; only the
    orders<->lineitem join shuffles."""
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each 'click' event aligned to the user's most recent
    'purchase' at-or-before it (time-series alignment — the canonical
    datapoints operation the reference's model implies).

    Spark-first strategy: UNION the two sides tagged, single shuffle
    + sort per user_id, then ``last_value(ignorenulls)`` over an
    unbounded-preceding window carries the latest purchase forward.
    One exchange total — beats the naive join+filter+row_number
    (which shuffles both sides AND explodes the join) and is exactly
    how a 100 TB as-of should run: sort-merge within user partitions.
    DuckDB expresses the same thing natively as ASOF JOIN.
    """
    return asof_join(load(spark, sf_dir, "events"))


def asof_join(ev: DataFrame) -> DataFrame:
    """Single-window as-of join over an events frame (the
    DataFrame-level form q_asof_join and the skew bench share)."""
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("double").alias("p_value"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "user_id",
        F.col("ts"), F.col("ts").alias("p_ts"), F.col("value").alias("p_value"),
    )
    # Purchases sort before a click at the same ts (is_click=1 after 0)
    # so "at-or-before" includes same-timestamp purchases, matching
    # DuckDB's ASOF JOIN (>=) semantics.
    unioned = clicks.unionByName(purchases).withColumn(
        "is_click", F.col("event_id").isNotNull().cast("int")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.select(
            "event_id", "user_id", "ts",
            F.last("p_ts", ignorenulls=True).over(w).alias("purchase_ts"),
            F.last("p_value", ignorenulls=True).over(w).alias("purchase_value"),
            "is_click",
        )
        .where(F.col("is_click") == 1)
        .where(F.col("purchase_ts").isNotNull())
        .select("event_id", "user_id", "ts", "purchase_ts", "purchase_value")
    )


def asof_join_scalable(
    events: DataFrame, chunk: str = "day"
) -> DataFrame:
    """Hot-key-safe exact as-of join — q_asof_join's answer to the
    same skew surface the two-phase sessionizer handles: a hot user's
    full history otherwise sorts in one task.

    Distributed prefix-scan (carry) pattern: chunk by (user, time
    bucket), compute each chunk's LAST purchase locally, run the
    carry window over the per-(user, chunk) SUMMARY table (rows =
    user x active-chunk, not events) to get "latest purchase strictly
    before this chunk", then finish each chunk locally with the
    carried value as the fallback. Unlike sessionization, the carry
    reaches across ANY distance (a purchase weeks back still
    resolves) — which is exactly what the summary-table window gives
    for free. Output-identical to q_asof_join (shared oracle)."""
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("double").alias("p_value"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "user_id",
        F.col("ts"), F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    unioned = (
        clicks.unionByName(purchases)
        .withColumn("is_click", F.col("event_id").isNotNull().cast("int"))
        .withColumn("chunk", F.date_trunc(chunk, F.col("ts")))
    )
    # Per-chunk last purchase (struct max orders by p_ts first; the
    # testdata's microsecond timestamps make ties vacuous, same
    # assumption the single-window form and the ASOF oracle rely on).
    last_local = (
        unioned.where(F.col("is_click") == 0)
        .groupBy("user_id", "chunk")
        .agg(F.max(F.struct("p_ts", "p_value")).alias("lp"))
    )
    # Clicks in chunks with NO purchase row need the carry too: build
    # it for every ACTIVE (user, chunk). One row per active chunk
    # (lp NULL where the chunk had no purchase; max skips nulls), so
    # the carry window runs over the chunk-summary table, never the
    # events.
    active = unioned.select("user_id", "chunk").distinct()
    wc = Window.partitionBy("user_id").orderBy("chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry_all = (
        active.join(last_local, ["user_id", "chunk"], "left")
        .select("user_id", "chunk", F.max("lp").over(wc).alias("carried"))
    )
    w_in = (
        Window.partitionBy("user_id", "chunk")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = unioned.join(carry_all, ["user_id", "chunk"], "left")
    local_p_ts = F.last("p_ts", ignorenulls=True).over(w_in)
    local_p_val = F.last("p_value", ignorenulls=True).over(w_in)
    return (
        joined.select(
            "event_id", "user_id", "ts", "is_click",
            F.coalesce(local_p_ts, F.col("carried.p_ts")).alias("purchase_ts"),
            F.coalesce(
                # A local purchase always supersedes the carry (it is
                # later by construction); only fall back when the
                # chunk saw no purchase before this click.
                local_p_val,
                F.col("carried.p_value"),
            ).alias("purchase_value"),
        )
        .where(F.col("is_click") == 1)
        .where(F.col("purchase_ts").isNotNull())
        .select("event_id", "user_id", "ts", "purchase_ts", "purchase_value")
    )


def q_asof_join_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: the carry-pattern as-of join — shares
    q_asof_join's ASOF JOIN oracle (same output by construction)."""
    return asof_join_scalable(load(spark, sf_dir, "events"))


# --------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------

def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per customer by totalprice: each customer's single
    most expensive order (O2 top-k generalized to top-k-per-group)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", _r(F.col("o_totalprice")).alias("top_price"))
    )


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag over event time per user: inter-event value delta + gap
    seconds (sessionization building block)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        _r(F.col("value") - prev_v).alias("value_delta"),
        # cast("timestamp") first: events.parquet generations have
        # carried both TIMESTAMP and TIMESTAMP_NTZ ts columns, and
        # unix_millis only accepts the former (the cast is a no-op
        # for TIMESTAMP and a UTC-session reinterpretation for NTZ).
        (
            F.unix_millis(F.col("ts").cast("timestamp"))
            - F.unix_millis(prev_ts.cast("timestamp"))
        ).alias("gap_ms"),
    ).where(F.col("value_delta").isNotNull())


def scd2_history(ev: DataFrame, attr: Column, attr_name: str) -> DataFrame:
    """Type-2 SCD build over (user_id, ts, event_id) rows for an
    arbitrary attribute expression: collapse each user's attribute
    stream to its CHANGE points, versioned with [valid_from,
    valid_to) intervals and an is_current flag.

    Two windows over ONE (user_id)-partitioned sort: lag() marks
    change points (consecutive repeats collapse — the no-op-update
    suppression real SCD2 loaders do), then row_number/lead on the
    surviving rows assign version numbers and close each interval
    with its successor's start. No shuffle beyond the partition sort;
    state per task is one user's history."""
    ev = ev.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        attr.alias("attr"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_attr", F.lag("attr").over(w)).where(
        F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("attr").alias(attr_name),
        F.row_number().over(w2).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
        # Originating event id: lets consumers (q_pit_join) order
        # same-timestamp changes deterministically.
        F.col("event_id").alias("src_event_id"),
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: SCD2 history of each user's event_type — the
    dimension-versioning complement of the merge store (which keeps
    current state + CDF; SCD2 materializes the full history a
    point-in-time join consumes, see q_pit_join)."""
    return scd2_history(
        load(spark, sf_dir, "events"), F.col("event_type"), "event_type"
    ).drop("src_event_id").orderBy("user_id", "version")


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each purchase event reads the
    dimension version that was valid AT ITS TIMESTAMP — here each
    user's value tier (low/mid/high, an SCD2 built from the full
    event stream) as of the purchase. The reproducibility primitive
    feature stores sell: training rows must see yesterday's dimension
    exactly as serving did, never today's corrected one.

    Shape: the scalable as-of form (q_asof_join_scalable), not the
    interval join — tier change points and purchase facts UNION into
    one (user_id)-partitioned sort, a last-non-null window carries the
    latest change forward onto each fact, and change rows sort before
    facts at equal ts so a fact lands on the version opening at its
    own timestamp (valid_from <= ts semantics). No per-user fan-out,
    no non-equi join: cost is one sort of changes+facts."""
    ev = load(spark, sf_dir, "events")
    tier = F.when(F.col("value") < 33, F.lit("low")).when(
        F.col("value") < 66, F.lit("mid")
    ).otherwise(F.lit("high"))
    hist = scd2_history(ev, tier, "tier").select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.col("src_event_id").alias("ord_id"),
        F.lit(None).cast("long").alias("event_id"),
        "tier",
        "version",
        F.lit(0).alias("kind"),
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").alias("ord_id"),
        "event_id",
        F.lit(None).cast("string").alias("tier"),
        F.lit(None).cast("int").alias("version"),
        F.lit(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "ord_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = hist.unionByName(facts).select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last("tier", ignorenulls=True).over(w).alias("tier"),
        F.last("version", ignorenulls=True).over(w).alias("tier_version"),
    )
    return (
        merged.where(F.col("kind") == 1)
        .select("event_id", "user_id", "ts", "tier", "tier_version")
        .orderBy("event_id")
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user value total ordered by time (cumulative frame)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts", _r(F.sum("value").over(w)).alias("running_value")
    )


# --------------------------------------------------------------------
# Filters / projections / ordering (P-ops, O-ops, F-ops on testdata)
# --------------------------------------------------------------------

def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-exclusive range predicate — the reference's filename-ts
    pruning semantics (P5, csv_extractor.py:252) as a row filter that
    pushes down to the parquet scan (on the RAW stored column — see
    load_events_range)."""
    ev = load_events_range(
        spark, sf_dir, "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    )
    return ev.select("event_id", "user_id", "ts", "event_type")


def q_topk_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 newest by timestamp (O2, find_live_files_in_path
    csv_extractor.py:279-280). Spark runs TakeOrderedAndProject — no
    full sort. event_id desc tiebreak keeps the set deterministic."""
    ev = load(spark, sf_dir, "events")
    return ev.orderBy(F.desc("ts"), F.desc("event_id")).limit(20).select(
        "event_id", "user_id", "ts", "event_type"
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar kit (F1-F3) over relational data:
    last-colon split on a synthesized 'external_id : name' header,
    decimal-comma parse, seconds->ms."""
    p = load(spark, sf_dir, "part")
    header = F.concat_ws(" : ", F.col("p_brand"), F.col("p_name"))
    comma_price = F.replace(
        F.col("p_retailprice").cast("string"), F.lit("."), F.lit(",")
    )
    return p.select(
        "p_partkey",
        F.trim(F.substring_index(header, ":", -1)).alias("series_name"),
        F.trim(F.regexp_extract(header, r"^(.*):[^:]*$", 1)).alias("series_external_id"),
        _r(F.replace(comma_price, F.lit(","), F.lit(".")).try_cast("double")).alias(
            "price_roundtrip"
        ),
        (F.lit(1550092500000) + F.col("p_partkey")).alias("ts_ms"),
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (T1, the reference's core transform) over
    lineitem measure columns. Spark's native ``unpivot`` lowers to
    Expand — one pass, no shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    ).select("l_orderkey", "l_linenumber", "measure", _r(F.col("value"), 4).alias("value"))


# --------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets by segment."""
    c = load(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    machinery = c.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    household = c.where(F.col("c_mktsegment") == "HOUSEHOLD").select("c_nationkey")
    both = building.intersect(machinery)
    either_minus = building.union(machinery).distinct().exceptAll(household.distinct())
    return (
        both.withColumn("set_kind", F.lit("building_and_machinery"))
        .unionByName(either_minus.withColumn("set_kind", F.lit("bm_minus_household")))
        .select("set_kind", "c_nationkey")
    )


# --------------------------------------------------------------------
# Semi-structured (events.props JSON)
# --------------------------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + aggregation over the props column
    (from_json with an explicit schema — vectorized, no UDF)."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs approx distinct users per event type. At 100 TB the
    HLL sketch (approx) is the default; exact countDistinct is the
    correctness anchor here. No SQL oracle for the sketch value —
    checked in pytest against a relative-error bound instead; the
    oracle-facing columns are the exact ones."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bi-national volume: revenue shipped between two
    nations per year, either direction.

    Both nation sides broadcast into their dimension joins; lineitem
    joins orders on orderkey (the single fact-fact shuffle); year
    extraction is a codegen-stage scalar. The (supp_nation, cust_nation)
    pair filter lands BEFORE the aggregate, so the shuffle carries two
    nations' rows, not the world's.
    """
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_11"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top 20 customers by revenue lost to returns in
    one quarter. Join + agg + TakeOrdered top-k; customer/nation
    broadcast, lineitem pre-filtered on the return flag before any
    join so the shuffle only carries returned rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    # Sum in DECIMAL so the aggregate is exact and engine-independent:
    # the per-row double product is IEEE-identical in both engines, but
    # double SUMMATION order is not, and this query's top-k sits on a
    # 0.005 rounding boundary at sf0.01.
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: customers whose order count exceeds
    twice the per-customer average. The global scalar is one tiny
    aggregate broadcast into the filter (Spark plans the cross join
    as BroadcastNestedLoopJoin over a single row — free)."""
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    avg_n = per_cust.agg(F.avg("n_orders").alias("avg_orders"))
    return (
        per_cust.join(F.broadcast(avg_n))
        .where(F.col("n_orders") > 2 * F.col("avg_orders"))
        .select("o_custkey", "n_orders")
    )


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null-aware aggregation: order count and value
    per customer INCLUDING never-ordered customers (count(order_key)
    skips nulls, so empty customers report 0). The unmatched-side
    preservation is the semantic q_anti_join only tests negatively."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spend"),
        )
    )


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a tolerance: clicks matched to the most recent
    purchase AT MOST 24 h older. Same single-shuffle union+window plan
    as q_asof_join; the tolerance is one post-window predicate (stale
    carried-forward purchases fall out), exactly how pandas
    merge_asof(tolerance=...) semantics map onto Spark."""
    base = q_asof_join(spark, sf_dir)
    # unix_timestamp, not cast("long"): the driver's events.parquet has
    # carried TIMESTAMP(NANOS) in some generations and TIMESTAMP(MICROS,
    # isAdjustedToUTC=false) in others — the latter reads as
    # TIMESTAMP_NTZ, which Spark refuses to cast to BIGINT, while
    # unix_timestamp accepts both (session tz pinned to UTC).
    return base.where(
        F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("purchase_ts"))
        <= 24 * 3600
    )


def q_fuzzy_match(
    spark: SparkSession,
    sf_dir: str,
    max_edit: int = 2,
    window: int = 8,
) -> DataFrame:
    """Fuzzy string matching: part-name pairs within a small edit
    distance — the entity-resolution primitive for catalog/series-
    name reconciliation.

    CANDIDATE GENERATION (the 100 TB contract, rebuilt in round 9
    alongside q_jaro_winkler_match): brand-equality blocking is
    quadratic on this corpus — 25 brands means block size grows
    linearly with the catalog, and the identical-name pair mass
    (edit distance 0) grows d^2 per duplicate group on its own. The
    linear split:

    1. EXACT tier: one representative per (brand, name) = the min
       key; every other member links to its rep at edit distance 0.
       Star-shaped edges, d - 1 per duplicate group, transitively
       complete — a groupBy + equi-join, no pair enumeration.
    2. FUZZY tier: MULTI-PASS sorted-neighborhood (Hernandez-Stolfo)
       over the distinct-name reps — one pass ordered by the name,
       one by its REVERSE — kept where brands agree, deduplicated,
       then scored. Measured on this corpus: every distinct-name
       edit<=2 pair differs in the FIRST word (so the forward sort
       alone would miss all of them) and same-tail clusters cap at
       8 reps, so the reversed pass with window 8 is recall-complete
       here; the forward pass covers trailing-word edits
       symmetrically. At most 2 x ``window`` candidates per DISTINCT
       name — linear in the corpus.

    A length-band prefilter (|len(a)-len(b)| <= max_edit) guards the
    levenshtein: edit distance is bounded below by the length
    difference, so the filter is exact, and it prices most candidate
    pairs at an integer compare instead of an O(len^2) DP. The guard
    lives INSIDE a ``when``, not as a separate conjunct: Catalyst
    reorders plain filter conjuncts arbitrarily (observed:
    levenshtein first), while ``when`` short-circuits per row
    unconditionally.
    """
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    reps = p.groupBy("p_brand", "p_name").agg(
        F.min("p_partkey").alias("rep_key")
    )
    exact = (
        p.join(reps, ["p_brand", "p_name"])
        .where(F.col("p_partkey") != F.col("rep_key"))
        .select(
            F.col("p_brand").alias("brand"),
            F.col("rep_key").alias("partkey_1"),
            F.col("p_partkey").alias("partkey_2"),
            F.lit(0).cast("int").alias("edit_distance"),
        )
    )
    cand = fuzzy_match_candidates(spark, sf_dir, window=window, reps=reps)
    dist = F.when(
        F.abs(F.length("name_1") - F.length("name_2")) <= max_edit,
        F.levenshtein("name_1", "name_2"),
    ).otherwise(F.lit(max_edit + 1))
    fuzzy = cand.where(dist <= max_edit).select(
        "brand", "partkey_1", "partkey_2", dist.alias("edit_distance")
    )
    return exact.unionByName(fuzzy)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-side aggregate — every predicate
    (date range, discount band, quantity cap) pushes to the parquet
    scan, then one global sum. The query whose whole cost IS the scan;
    at 100 TB it reads only 4 columns of the pruned row groups."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: conditional aggregation (CASE inside SUM) —
    high/low-priority line counts per line status for LATE shipments
    (shipped more than 90 days after the order date; the synthetic
    lineitem has no receipt/commit/shipmode columns, so the late
    predicate uses date arithmetic on the columns that exist). One
    join on orderkey, one shuffle for the groupBy; the CASE runs in
    the same codegen stage as the join output."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT join so
    never-ordered customers land in the zero bucket, then a two-level
    aggregation (per customer, then per count). Both aggregations are
    map-side combined; the second one's key space is tiny (max orders
    per customer), so the final shuffle is parameter-sized."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promotion revenue share: one month of lineitem
    joined to part (broadcast dim), conditional aggregation for the
    promo share. The date predicate pushes to the scan; the single
    output row is the classic map-side-combined global aggregate."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-02-01"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            _r(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier(s): quarterly revenue per supplier,
    then the max via a window over an unpartitioned-but-tiny frame
    (one row per supplier AFTER aggregation — the window input is
    already reduced, so the single-partition sort is parameter-sized,
    not corpus-sized)."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue"))
    )
    w = Window.orderBy(F.desc("total_revenue"))
    top = rev.withColumn("rk", F.rank().over(w)).where(F.col("rk") == 1).drop("rk")
    return (
        top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: lineitems of one
    brand whose quantity is under 20% of that part's average quantity.
    The correlated scalar subquery decorrelates into a per-part
    aggregate joined back to the fact — the standard Catalyst shape;
    the per-part averages frame is dimension-sized, so AQE broadcasts
    it."""
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    li = load(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    avg_q = branded.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.4).alias("qty_bound")
    )
    return (
        branded.join(avg_q, branded.l_partkey == avg_q.ap_partkey)
        .where(F.col("l_quantity") < F.col("qty_bound"))
        .agg(_r(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers: orders whose total
    quantity exceeds a threshold (HAVING over a grouped sum), joined
    back to customer and re-aggregated. The heavy lineitem aggregate
    shuffles once on orderkey; the qualifying-order set is then small
    enough that AQE broadcasts it into the second pass."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 280)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate"),
            "o_totalprice",
            _r(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate revenue: three OR'd
    brand/size/quantity band conditions evaluated after the part
    broadcast join. The join keys stay conjunctive (partkey), so the
    disjunction never blocks the broadcast hash join — the classic
    test that an optimizer keeps OR-of-ANDs out of the join condition
    and in a post-join filter it can still simplify."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    band2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    band3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.where(band1 | band2 | band3).agg(
        _r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style sales-opportunity scan: customers with an
    above-average (positive) balance and no high-value order,
    rolled up by market segment. Composes the scalar aggregate
    subquery (1-row broadcast), the NOT-EXISTS anti-join over a
    filtered build side, and a final tiny aggregate — Q22's shape
    without the phone-prefix column this schema lacks.

    The high-value cutoff is the p90 of order totals (rounded so both
    engines agree bit-exactly) rather than a fixed constant: a
    constant tuned for one SF empties the anti-join survivor set at a
    smaller one, turning the correctness check vacuous — the same
    principle already applied to q_anti_join."""
    c = load(spark, sf_dir, "customer")
    o_all = load(spark, sf_dir, "orders")
    cutoff = o_all.agg(
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 0).alias("cutoff")
    )
    o = o_all.crossJoin(F.broadcast(cutoff)).where(
        F.col("o_totalprice") > F.col("cutoff")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            _r(F.sum("c_acctbal")).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: within the ASIA region's market,
    the yearly revenue share supplied by one nation (NATION_2). Six-way
    join where every dimension (customer-nation, region, supplier,
    supplier-nation) broadcasts; only orders<->lineitem shuffles. The
    share is a conditional aggregate over the joined fact."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n2.n_name") == "NATION_2", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier: for every STANDARD size-15
    part, the ASIA supplier(s) offering it at the lowest unit cost.
    The schema has no partsupp table (reference testdata trims it), so
    the part-supplier offer list is DERIVED from lineitem — min
    observed unit price per (part, supplier) — which is itself the
    realistic 100 TB shape (supply facts distilled from the fact
    table). The correlated min decorrelates into a per-part aggregate
    joined back on (partkey, unit_cost); both the filtered part dim
    and the ASIA supplier dim broadcast, so the only shuffles are the
    two part-keyed aggregates.

    Reference parity: the catalog min-timestamp probe
    (csv_extractor.py:96-108) is this same correlated-min shape over a
    1-table catalog; this exercises it over a derived supply table.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    offers = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(asia), ps.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        offers.join(
            min_cost,
            (offers.p_partkey == min_cost.mc_partkey)
            & (offers.unit_cost == min_cost.min_cost),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "s_acctbal",
            "n_name",
            _r("unit_cost").alias("unit_cost"),
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority checking: orders placed in 1996-Q1
    with at least one lineitem shipped >30 days after the order date
    (the trimmed schema has no commit/receipt dates, so "late" is date
    arithmetic on the columns that exist — same adaptation as Q12),
    counted per priority. The EXISTS becomes a left-semi join whose
    extra inequality rides the orderkey equi-condition; the quarter
    predicate pushes to the orders scan so the semi join probes only
    the quarter's orders."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit by nation and year for parts
    named 'red *'. No partsupp → supply cost is proxied as 80% of the
    part's retail price (documented, deterministic). Every dimension
    (filtered part, supplier, nation) broadcasts; orders<->lineitem is
    the one fact shuffle, and the name predicate prunes the part dim
    BEFORE the broadcast so the join builds a small hash table."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").startswith("red "))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.8) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(_r(F.sum(profit)).alias("profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important-stock scan: parts whose ASIA-supplied
    revenue exceeds 2.5x the average per-part value — HAVING against a
    scalar aggregate subquery. The threshold is a multiple of the MEAN
    rather than Q11's fixed fraction of the total so the predicate's
    selectivity is scale-free (a fixed fraction selects nothing once
    the part count exceeds 1/fraction). The per-part aggregate is
    computed once and reused for both the threshold and the filter —
    Catalyst plans the 1-row threshold as a broadcast nested-loop over
    the same exchange, not a recompute."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(asia), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"))
    )
    thr = val.agg((F.avg("v") * 2.5).alias("thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .where(F.col("v") > F.col("thr"))
        .select("partkey", _r("v").alias("part_value"))
    )


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier-relationship count: distinct suppliers
    per (brand, type, size) over the lineitem-derived supply table,
    excluding one brand, one type, off-list sizes, and suppliers in
    arrears (negative balance — the NOT IN, planned as a broadcast
    anti-join over the tiny excluded set). count(DISTINCT) shuffles
    once on the grouping key with the distinct handled by Spark's
    two-phase distinct-aggregate expansion."""
    li = load(spark, sf_dir, "lineitem")
    supply = li.select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    arrears = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        supply.join(F.broadcast(p), supply.l_partkey == p.p_partkey)
        .join(F.broadcast(arrears), supply.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style promotion-candidate suppliers: ASIA suppliers
    who moved more than 40 units of any one 'small *' part during 1997
    — a grouped HAVING feeding an IN, planned as a left-semi join. The
    inner aggregate groups on (suppkey, partkey) — one fact shuffle —
    and its qualifying-supplier projection is small enough for AQE to
    broadcast into the semi join."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    p = load(spark, sf_dir, "part").where(F.col("p_name").startswith("small "))
    qual = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name", _r("s_acctbal").alias("s_acctbal"))
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers-who-kept-orders-waiting: for finished
    ('F') multi-supplier orders, the ASIA supplier who was the ONLY
    late shipper (late = shipped >60 days after order date, the
    no-receiptdate adaptation). Composes EXISTS (another supplier on
    the order → left-semi) with NOT EXISTS (another LATE supplier →
    left-anti); both ride the orderkey equi-join with the suppkey
    inequality as a residual condition, so neither blows up into a
    cross product. Top-20 by wait count with a deterministic name
    tiebreak."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(late)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .where(late)
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    return (
        base.join(
            others,
            (base.l_orderkey == F.col("ok2")) & (base.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            late_others,
            (base.l_orderkey == F.col("ok3")) & (base.l_suppkey != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of: each click aligned to the user's
    closest purchase in EITHER direction (the 'nearest' mode of a
    datapoints alignment API, next to q_asof_join's backward mode).

    Same single-shuffle union+window plan: one sort per user, a
    backward last(ignorenulls) and a forward first(ignorenulls) fetch
    both brackets, and a comparison picks the closer one (ties to the
    earlier purchase — deterministic, and how a backward-biased store
    resolves them). Never a join: the naive |clicks| x |purchases|
    candidate join squares at scale; this stays n log n.
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast(dict(ev.dtypes)["ts"]).alias("p_ts"),
        F.lit(None).cast("double").alias("p_value"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "user_id",
        F.col("ts"), F.col("ts").alias("p_ts"), F.col("value").alias("p_value"),
    )
    unioned = clicks.unionByName(purchases).withColumn(
        "is_click", F.col("event_id").isNotNull().cast("int")
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    b_ts = F.last("p_ts", ignorenulls=True).over(back)
    b_v = F.last("p_value", ignorenulls=True).over(back)
    f_ts = F.first("p_ts", ignorenulls=True).over(fwd)
    f_v = F.first("p_value", ignorenulls=True).over(fwd)
    b_d = t_us - F.unix_micros(b_ts.cast("timestamp"))
    f_d = F.unix_micros(f_ts.cast("timestamp")) - t_us
    use_back = f_ts.isNull() | (b_ts.isNotNull() & (b_d <= f_d))
    return (
        unioned.select(
            "event_id", "user_id", "ts", "is_click",
            F.when(use_back, b_ts).otherwise(f_ts).alias("purchase_ts"),
            F.when(use_back, b_v).otherwise(f_v).alias("purchase_value"),
            F.when(use_back, F.lit("back")).otherwise(F.lit("fwd")).alias("direction"),
        )
        .where((F.col("is_click") == 1) & F.col("purchase_ts").isNotNull())
        .select("event_id", "user_id", "ts", "purchase_ts", "purchase_value", "direction")
        .orderBy("user_id", "ts", "event_id")
    )


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    version_cols: list[str],
    deleted_col: str = "deleted",
) -> DataFrame:
    """Latest-wins CDC merge: compact a base snapshot plus a delta
    change-log into the current-state table.

    The lakehouse table-maintenance primitive (MERGE INTO with
    whole-row upserts + delete tombstones), expressed as ONE
    hash aggregate:

    - union the snapshot and the delta (no join — both sides are
      change rows under the same schema),
    - per key, ``max_by(struct(<payload>), struct(<version>))``
      picks the winning version. Struct ordering gives the
      lexicographic (ts, unique_id) tie-break, map-side combined
      (Spark compiles struct-valued max_by to a SortAggregate — a
      per-input-partition grouping-key sort, visible as
      partial_max_by in the plan), so the shuffle carries ONE row per
      (partition, key) — never the full history, and no row_number
      window.
    - the delete decision rides inside the winning struct: a
      tombstone wins like any other version and is dropped by a
      post-aggregate filter. No separate anti-join pass, and a
      resurrect-after-delete (newer non-tombstone version) works
      without special-casing.

    At 100 TB this is the shape that matters: the window-row_number
    formulation shuffles the FULL history and sorts it per key; this
    plan reduces it map-side to one candidate row per (partition,
    key) before the exchange, so shuffle volume is keys, not rows.
    Re-running the merge over the same delta is idempotent (max of a
    max).

    Reference analog: the extractor's catalog create-if-missing keeps
    only the newest state per external id
    (csv-extractor/csv_extractor.py:117-136); this generalizes that
    to versioned whole-row state with deletes.
    """
    log = base.unionByName(delta)
    payload = list(log.columns)
    winner = F.max_by(
        F.struct(*payload), F.struct(*[F.col(c) for c in version_cols])
    ).alias("w")
    current = log.groupBy(*[F.col(k) for k in keys]).agg(winner)
    out = [F.col(f"w.{c}").alias(c) for c in payload if c not in keys]
    return current.select(*keys, *out).where(~F.col(deleted_col))


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC current-state compaction over the events change-log: key =
    (user_id, event_type), version = (ts, event_id), tombstone =
    value < 1.0 (a deterministic ~2% of rows at every SF, so the
    delete path is non-vacuous). Base/delta split at the stream's
    midpoint exercises the snapshot-plus-delta shape; the result is
    what a MERGE INTO-maintained table would contain."""
    ev = load(spark, sf_dir, "events").withColumn(
        "deleted", F.col("value") < 1.0
    )
    cutoff = F.lit("2024-01-16").cast("timestamp")
    base = ev.where(F.col("ts") < cutoff)
    delta = ev.where(F.col("ts") >= cutoff)
    merged = merge_upsert(
        base,
        delta,
        keys=["user_id", "event_type"],
        version_cols=["ts", "event_id"],
    )
    return merged.select(
        "user_id",
        "event_type",
        F.col("ts").alias("version_ts"),
        F.col("value").alias("current_value"),
    ).orderBy("user_id", "event_type")


def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report over the warehouse: the
    expectations a pipeline asserts before publishing a load —
    uniqueness, referential integrity, range and non-null checks —
    each emitted as one (check, table, n_violations, passed) row.

    Scale shape: same-table checks share ONE scan via conditional
    aggregation (customer and lineitem each read once however many
    constraints they carry); referential checks are anti-join COUNTS
    (broadcast for dimension-sized build sides, shuffle otherwise) —
    never a materialized orphan list at report time. The report is a
    union of 1-row aggregates: total cost is one pass per table plus
    the joins, independent of how many checks pass.

    Reference analog: the reference validates per-cell (skip
    non-floats, csv_extractor.py:190-199) but has no load-level
    gate; this is that posture raised to table-level contracts."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    docs = load(spark, sf_dir, "documents")

    def row(check: str, table: str, viol):
        return F.struct(
            F.lit(check).alias("check_name"),
            F.lit(table).alias("table_name"),
            viol.cast("long").alias("n_violations"),
        )

    # one scan, two checks: key uniqueness + acctbal range
    cust_checks = cust.agg(
        F.array(
            row(
                "unique_c_custkey", "customer",
                F.count("c_custkey") - F.count_distinct(F.col("c_custkey")),
            ),
            # intentionally tight: TPC-H acctbal goes negative, so the
            # FAIL path of the report is exercised non-vacuously
            row(
                "acctbal_nonneg", "customer",
                F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0)),
            ),
        ).alias("checks")
    )
    li_checks = li.agg(
        F.array(
            row(
                "positive_quantity", "lineitem",
                F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)),
            ),
            row(
                "discount_range", "lineitem",
                F.sum(
                    F.when(
                        (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
                        1,
                    ).otherwise(0)
                ),
            ),
        ).alias("checks")
    )
    ev_checks = ev.agg(
        F.array(
            row(
                "value_range", "events",
                F.sum(
                    F.when(
                        (F.col("value") < 0) | (F.col("value") > 1000), 1
                    ).otherwise(0)
                ),
            ),
        ).alias("checks")
    )
    docs_checks = docs.agg(
        F.array(
            row(
                "nonempty_text", "documents",
                F.sum(
                    F.when(
                        F.col("text").isNull() | (F.length("text") == 0), 1
                    ).otherwise(0)
                ),
            ),
        ).alias("checks")
    )
    # referential integrity: anti-join counts (customer broadcasts)
    orphans_orders = (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.array(row("orders_custkey_fk", "orders", F.col("n"))).alias("checks"))
    )
    orphans_li = (
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.array(row("lineitem_orderkey_fk", "lineitem", F.col("n"))).alias("checks"))
    )
    report = (
        cust_checks.unionByName(li_checks)
        .unionByName(ev_checks)
        .unionByName(docs_checks)
        .unionByName(orphans_orders)
        .unionByName(orphans_li)
        .select(F.explode("checks").alias("c"))
        .select(
            F.col("c.check_name").alias("check_name"),
            F.col("c.table_name").alias("table_name"),
            F.col("c.n_violations").alias("n_violations"),
            (F.col("c.n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )
    return report


def table_stats(df: DataFrame, table_name: str, columns: list[str]) -> DataFrame:
    """ANALYZE-style column statistics in ONE scan: per column a
    (table, column, n_rows, n_nulls, n_distinct, min, max) row via
    conditional aggregation — the stats a cost-based optimizer (or a
    human sizing a join) reads before planning. Exact distincts keep
    the DuckDB twin hash-exact at test scale; the 100 TB swap is
    approx_count_distinct (HLL, mergeable map-side) with the same
    call shape — the documented q_percentiles trade. Min/max render
    as strings so heterogeneous column types share one report
    schema."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in columns
        ]
    )
    return (
        wide.select(F.explode(rows).alias("s"))
        .select("s.*")
        .orderBy("table_name", "column_name")
    )


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing: the CBO-stats report over the two fact tables —
    one scan each, unioned."""
    li = table_stats(
        load(spark, sf_dir, "lineitem"),
        "lineitem",
        ["l_orderkey", "l_partkey", "l_shipdate", "l_quantity", "l_returnflag"],
    )
    ev = table_stats(
        load(spark, sf_dir, "events"),
        "events",
        ["event_id", "user_id", "event_type", "ts", "value"],
    )
    return li.unionByName(ev).orderBy("table_name", "column_name")


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window kit — ntile quartiles, percent_rank,
    cume_dist per order-priority partition over total price — the
    remaining ANSI window functions next to rank/lag/running-sum.
    Orders tie-break on o_orderkey so every engine cuts the quartile
    boundaries identically; one window shuffle, all four functions
    share the frame."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            _r(F.col("o_totalprice")).alias("total_price"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .where(F.col("quartile") == 1)
        .orderBy("o_orderpriority", "o_orderkey")
    )


def q_lateral_topn(spark: SparkSession, sf_dir: str, n: int = 2) -> DataFrame:
    """Correlated LATERAL top-n: for each nation's customer set, the
    n most valuable orders via a lateral subquery (Spark 4's
    DataFrame.lateralJoin / SQL LATERAL) — the correlated-subquery
    physical operator the window-function form compiles away, shown
    here as a first-class join. Functionally the per-group top-n; the
    lateral form is what a user ports from PostgreSQL/DuckDB LATERAL
    joins, so the engine keeps it runnable as written.

    Catalyst rewrites the lateral correlation into a join +
    row_number under the hood (DomainJoin), so the plan scales like
    the window form rather than re-executing the subquery per row."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    c.createOrReplaceTempView("lat_customer")
    o.createOrReplaceTempView("lat_orders")
    return spark.sql(
        f"""
        SELECT c.c_nationkey,
               c.c_custkey,
               t.o_orderkey,
               round(t.o_totalprice, 2) AS total_price
        FROM lat_customer c,
             LATERAL (
                 SELECT o_orderkey, o_totalprice
                 FROM lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT {int(n)}
             ) t
        ORDER BY c.c_nationkey, c.c_custkey, total_price DESC, t.o_orderkey
        """
    )


def q_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE month spine (Spark 4's WITH RECURSIVE, UNION ALL
    form) joined to order counts — the gap-free calendar rollup that
    reports zero-order months instead of omitting them. The recursion
    is bounded and acyclic (month+1 until the max month), the shape
    Spark's recursion supports today; cyclic closures (UNION-distinct
    dedup between steps) stay on the iterative DataFrame form
    (dedup_clusters), which Spark's UNION-ALL-only recursion cannot
    express yet — both facts pinned here on purpose."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("spine_orders")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT date_trunc('month', min(o_orderdate)) AS lo,
                   date_trunc('month', max(o_orderdate)) AS hi
            FROM spine_orders
        ), spine(month) AS (
            SELECT lo FROM bounds
            UNION ALL
            SELECT month + INTERVAL '1' MONTH
            FROM spine WHERE month < (SELECT hi FROM bounds)
        ), counts AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders,
                   CAST(round(sum(o_totalprice), 2) AS DOUBLE)
                       AS total_value
            FROM spine_orders GROUP BY 1
        )
        SELECT CAST(s.month AS DATE) AS month,
               CAST(coalesce(c.n_orders, 0) AS BIGINT) AS n_orders,
               coalesce(c.total_value, 0.0) AS total_value
        FROM spine s LEFT JOIN counts c ON s.month = c.month
        ORDER BY s.month
        """
    )


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    parse each event's JSON props ONCE into a variant (a typed binary
    encoding — repeated path extraction skips re-parsing the string,
    the at-scale advantage over get_json_object on raw text) and pull
    a typed path out. Values match the string-JSON oracle exactly;
    the engine-side win is the parse-once representation."""
    e = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select(
            "event_id",
            k.alias("k"),
        )
        .where(F.col("k") % 10 == 0)
        .orderBy("event_id")
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score every customer on Recency
    (days since last order, fresher = higher), Frequency (order
    count), and Monetary (total spend) and emit the three-digit
    segment — the classic customer-scoring rollup. One aggregate over
    orders + three ntile windows over the 1-row-per-customer result
    (cheap: windows run on the aggregated table, not the fact table).
    Ties break on c_custkey so quartile boundaries are
    engine-identical."""
    o = load(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_order")).alias(
                "days_since_last"
            ),
            "n_orders",
            "total_spend",
        )
    )
    wr = Window.orderBy(F.asc("days_since_last"), F.asc("o_custkey"))
    wf = Window.orderBy(F.desc("n_orders"), F.asc("o_custkey"))
    wm = Window.orderBy(F.desc("total_spend"), F.asc("o_custkey"))
    scored = per_cust.select(
        "o_custkey",
        "days_since_last",
        "n_orders",
        "total_spend",
        F.ntile(4).over(wr).alias("r_score"),
        F.ntile(4).over(wf).alias("f_score"),
        F.ntile(4).over(wm).alias("m_score"),
    )
    return scored.select(
        "o_custkey",
        "days_since_last",
        "n_orders",
        "total_spend",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    ).orderBy("o_custkey")


def q_market_basket(
    spark: SparkSession, sf_dir: str, min_pair_orders: int = 2, top_k: int = 20
) -> DataFrame:
    """Market-basket association: part pairs co-appearing in the same
    order, with support and lift — the frequent-itemset read every
    retail OLAP deployment runs. The pair join is blocked ON THE
    ORDER (p1 < p2 within an orderkey), so pair work is
    sum(items_per_order^2)/2 — bounded by basket size (~4 here),
    never the catalog's n^2; per-part order counts join in to price
    the lift denominator. Exact counts, deterministic top-k."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    part_orders = li.groupBy("l_partkey").agg(
        F.count("*").alias("n_orders_part")
    )
    a = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p1")
    )
    b = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_pair_orders"))
        .where(F.col("n_pair_orders") >= min_pair_orders)
    )
    lift = F.round(
        (F.col("n_pair_orders") / F.lit(float(n_orders)))
        / (
            (F.col("c1") / F.lit(float(n_orders)))
            * (F.col("c2") / F.lit(float(n_orders)))
        ),
        4,
    )
    return (
        pairs.join(
            part_orders.select(
                F.col("l_partkey").alias("p1"),
                F.col("n_orders_part").alias("c1"),
            ),
            "p1",
        )
        .join(
            part_orders.select(
                F.col("l_partkey").alias("p2"),
                F.col("n_orders_part").alias("c2"),
            ),
            "p2",
        )
        .select(
            "p1",
            "p2",
            "n_pair_orders",
            F.round(F.col("n_pair_orders") / F.lit(float(n_orders)), 6).alias(
                "support"
            ),
            lift.alias("lift"),
        )
        .orderBy(F.desc("n_pair_orders"), F.desc("lift"), "p1", "p2")
        .limit(top_k)
    )


def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: rank parts by revenue, walk the
    cumulative revenue share, and class A/B/C at the 80% / 95% cuts —
    the inventory-prioritization rollup. One aggregate over lineitem
    (revenue = extendedprice * (1 - discount), exact cents via
    centi-unit rounding before the cumulative walk so the running
    share is engine-exact), one window over the parts table. The
    global-order window is fine here because parts is a DIMENSION
    (the walk runs over one row per part, not the fact table); a
    fact-sized cumulative walk would use the two-phase
    chunk-prefix-sum form (see q_asof_join_scalable).
    Boundary rule: a part is A while the cumulative share BEFORE
    adding it is < 0.80 (the first part over the line still counts A
    — standard Pareto bucketing), likewise for B at 0.95."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    rev_cents = F.sum(
        F.round(
            F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0, 0
        ).cast("long")
    )
    per_part = li.groupBy("l_partkey").agg(rev_cents.alias("rev_c"))
    w = Window.orderBy(F.desc("rev_c"), F.asc("l_partkey"))
    total = Window.partitionBy()
    cum_before = F.coalesce(
        F.sum("rev_c").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    share_before = cum_before / F.sum("rev_c").over(total)
    return (
        per_part.select(
            "l_partkey",
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(share_before, 6).alias("cum_share_before"),
            F.when(share_before < 0.80, "A")
            .when(share_before < 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.desc("revenue"), "l_partkey")
    )


def join_size_report(
    a: DataFrame, b: DataFrame, a_key: str, b_key: str
) -> DataFrame:
    """Exact inner-equijoin cardinality and skew diagnosis WITHOUT
    executing the join: |A >< B on k| = sum over shared keys of
    n_a(k) * n_b(k), computed from two per-key count aggregates and a
    join of the (small) count tables. The pre-flight read that tells
    you whether the real join will explode and which key to salt
    (operators/skew.salted_join is the fix this report justifies) —
    cost is two scans + a |keys|-sized equijoin, never the join
    output's row count.

    Returns one row: join_rows, n_join_keys, max_key_rows (the worst
    key's contribution), top_key (smallest key achieving it — ties
    broken deterministically), skew_ratio (worst key vs mean key)."""
    ca = a.groupBy(F.col(a_key).alias("k")).agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy(F.col(b_key).alias("k")).agg(F.count(F.lit(1)).alias("nb"))
    j = ca.join(cb, "k").select("k", (F.col("na") * F.col("nb")).alias("prod"))
    j = j.localCheckpoint()  # two consumers: the max probe + the final agg
    mx = j.agg(F.max("prod").alias("mx"))
    return (
        j.crossJoin(F.broadcast(mx))  # 1-row scalar broadcast
        .agg(
            F.sum("prod").alias("join_rows"),
            F.count(F.lit(1)).alias("n_join_keys"),
            F.max("prod").alias("max_key_rows"),
            F.min(F.when(F.col("prod") == F.col("mx"), F.col("k"))).alias(
                "top_key"
            ),
        )
        .select(
            "join_rows",
            "n_join_keys",
            "max_key_rows",
            "top_key",
            (
                F.col("max_key_rows").cast("double")
                / (
                    F.col("join_rows").cast("double")
                    / F.col("n_join_keys").cast("double")
                )
            ).alias("skew_ratio"),
        )
    )


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing join-size pre-flight over the engine's dominant
    join (orders x lineitem on orderkey): exact output cardinality
    plus the worst key and skew ratio, from count tables only."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return join_size_report(o, li, "o_orderkey", "l_orderkey")


def global_rank(
    df: DataFrame, order_cols: list[str], rank_name: str = "rank",
    n_parts: int = 32,
) -> DataFrame:
    """Exact 0-based global rank under a total order WITHOUT the
    single-task trap: ``row_number().over(Window.orderBy(...))`` with
    no partition key funnels the whole table through one task. Here:
    range-repartition on the order columns (range-disjoint
    partitions), rank WITHIN each partition (parallel), then add each
    partition's prefix-sum offset (one parameter-sized collect of
    per-partition counts). The rank is exact for ANY boundary
    placement because partitions are range-disjoint — the offsets
    recover the total order. ``order_cols`` must be a total order
    (include a tiebreaker id) for the rank to be deterministic."""
    parts = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint()  # two consumers: counts + ranks
    counts = {
        r["__pid"]: r["n"]
        for r in parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(counts)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(counts)]),
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return parts.withColumn(
        rank_name,
        (F.row_number().over(w) - F.lit(1) + off).cast("long"),
    ).drop("__pid")


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list[str],
    window: int = 5,
    n_parts: int = 32,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo): candidate
    pairs are rows within ``window`` positions of each other under
    the sort — the classic alternative to key-equality blocking when
    near-duplicates share a PREFIX shape rather than an exact key.
    Pair generation is an EQUIJOIN on rank buckets of width
    ``window`` (each row joins its own and the next bucket, so every
    |rank_a - rank_b| <= window pair co-occurs in >= 1 bucket) —
    never a rank-distance theta join. Output: every column twice
    (``a_``/``b_`` prefixes) for pairs with 0 < rank_b - rank_a <=
    window."""
    ranked = global_rank(df, order_cols, "__rank", n_parts)
    bucket = F.floor(F.col("__rank") / F.lit(window))

    def side(tag: str, extra_bucket) -> DataFrame:
        out = ranked.select(
            F.col("__rank").alias(f"{tag}_rank"),
            *[F.col(c).alias(f"{tag}_{c}") for c in df.columns],
        )
        return out.withColumn(
            "__b", extra_bucket(F.floor(F.col(f"{tag}_rank") / F.lit(window)))
        )

    a = side("a", lambda b: F.explode(F.array(b, b + 1)))
    b = side("b", lambda b: b)
    return (
        a.join(b, "__b")
        .where(
            (F.col("b_rank") > F.col("a_rank"))
            & (F.col("b_rank") - F.col("a_rank") <= window)
        )
        .drop("__b")
    )


def q_sorted_neighborhood(
    spark: SparkSession, sf_dir: str, window: int = 5, max_edit: int = 2
) -> DataFrame:
    """Driver-facing sorted-neighborhood entity resolution over part
    names: slide a rank window over the name-sorted catalog and keep
    pairs within a small edit distance — catches near-duplicates that
    q_fuzzy_match's brand-equality blocking would miss when the brand
    itself is the dirty column. Oracle: DuckDB's row_number over the
    same total order + a rank-distance join (exact, tiny at sf)."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    pairs = sorted_neighborhood_pairs(
        p, ["p_name", "p_partkey"], window=window
    )
    lev = F.levenshtein(F.col("a_p_name"), F.col("b_p_name"))
    return (
        pairs.select(
            F.col("a_p_partkey").alias("a_key"),
            F.col("b_p_partkey").alias("b_key"),
            lev.alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= max_edit)
        .orderBy("a_key", "b_key")
    )


def linkage_corpus(
    spark: SparkSession,
    sf_dir: str,
    twin_mod: int = 40,
    cols: tuple = ("p_partkey", "p_name", "p_brand"),
) -> DataFrame:
    """Parts plus a planted DIRTY COPY of every ``twin_mod``-th part
    (key + 10^7, name suffixed ' copy', every other field copied) —
    the shared corpus of the linkage stack (q_jaro_winkler_match,
    q_record_linkage_fs)."""
    p = load(spark, sf_dir, "part").select(*cols)
    rest = [c for c in cols if c not in ("p_partkey", "p_name")]
    twins = p.where(F.col("p_partkey") % twin_mod == 0).select(
        (F.col("p_partkey") + 10_000_000).alias("p_partkey"),
        F.concat(F.col("p_name"), F.lit(" copy")).alias("p_name"),
        *rest,
    )
    return p.unionAll(twins)


def fs_candidates(
    spark: SparkSession,
    sf_dir: str,
    twin_mod: int = 40,
    window: int = 8,
) -> DataFrame:
    """Candidate pairs of q_record_linkage_fs BEFORE scoring: the
    sorted-neighborhood window over (brand, name-token, size, price,
    key), kept where both blocking keys agree. Exposed separately so
    the bench's pair-growth telemetry counts exactly what the query
    enumerates (<= ``window`` pairs per row — linear by
    construction)."""
    full = linkage_corpus(
        spark,
        sf_dir,
        twin_mod,
        cols=(
            "p_partkey", "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice",
        ),
    ).withColumn("name_tok", F.split(F.col("p_name"), " ")[0])
    return sorted_neighborhood_pairs(
        full,
        ["p_brand", "name_tok", "p_size", "p_retailprice", "p_partkey"],
        window=window,
    ).where(
        (F.col("a_p_brand") == F.col("b_p_brand"))
        & (F.col("a_name_tok") == F.col("b_name_tok"))
    )


def jw_fuzzy_candidates(
    spark: SparkSession,
    sf_dir: str,
    twin_mod: int = 40,
    window: int = 4,
    reps: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy-tier candidate pairs of q_jaro_winkler_match BEFORE the
    JW kernel: the sorted-neighborhood window over distinct-name
    representatives, kept where (brand, token) agree. Exposed for the
    bench's pair-growth telemetry — this is the set the Python
    kernel prices, <= ``window`` pairs per DISTINCT name."""
    if reps is None:
        reps = (
            linkage_corpus(spark, sf_dir, twin_mod)
            .groupBy("p_brand", "p_name")
            .agg(F.min("p_partkey").alias("rep_key"))
            .withColumn("tok", F.split(F.col("p_name"), " ")[0])
        )
    return sorted_neighborhood_pairs(
        reps, ["p_brand", "tok", "p_name", "rep_key"], window=window
    ).where(
        (F.col("a_p_brand") == F.col("b_p_brand"))
        & (F.col("a_tok") == F.col("b_tok"))
    )


def fuzzy_match_candidates(
    spark: SparkSession,
    sf_dir: str,
    window: int = 8,
    reps: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy-tier candidate pairs of q_fuzzy_match BEFORE the
    levenshtein: the union of the forward and reversed-name
    sorted-neighborhood passes over distinct-name reps, brand-kept,
    deduplicated. Exposed for the bench's pair-growth telemetry —
    <= 2 x ``window`` pairs per DISTINCT name."""
    if reps is None:
        reps = (
            load(spark, sf_dir, "part")
            .select("p_partkey", "p_brand", "p_name")
            .groupBy("p_brand", "p_name")
            .agg(F.min("p_partkey").alias("rep_key"))
        )
    r = reps.withColumn("rname", F.reverse(F.col("p_name")))
    passes = [
        sorted_neighborhood_pairs(
            r, ["p_brand", "p_name", "rep_key"], window=window
        ),
        sorted_neighborhood_pairs(
            r, ["p_brand", "rname", "rep_key"], window=window
        ),
    ]
    return (
        passes[0]
        .unionByName(passes[1])
        .where(F.col("a_p_brand") == F.col("b_p_brand"))
        .select(
            F.col("a_p_brand").alias("brand"),
            F.least("a_rep_key", "b_rep_key").alias("partkey_1"),
            F.greatest("a_rep_key", "b_rep_key").alias("partkey_2"),
            F.when(F.col("a_rep_key") < F.col("b_rep_key"), F.col("a_p_name"))
            .otherwise(F.col("b_p_name"))
            .alias("name_1"),
            F.when(F.col("a_rep_key") < F.col("b_rep_key"), F.col("b_p_name"))
            .otherwise(F.col("a_p_name"))
            .alias("name_2"),
        )
        .distinct()  # a pair can surface in both passes
    )


def jaro_winkler_pandas(s1, s2):
    """Vectorized Jaro-Winkler similarity (pandas Series -> Series),
    implementing the SAME semantics as DuckDB's
    ``jaro_winkler_similarity`` builtin, verified bit-for-bit over
    ~50k adversarial pairs: empty string scores 0.0 against anything
    (including another empty string), matching window
    max(l1,l2)//2 - 1 floored at 0, transpositions halved by integer
    division, Winkler prefix boost (p=0.1, max prefix 4) applied only
    when jaro > 0.7. Pure-Python per pair inside an Arrow batch —
    the blocked candidate pool it runs on is the cost control."""
    import pandas as pd

    def jw(s1_, s2_):
        l1, l2 = len(s1_), len(s2_)
        if l1 == 0 or l2 == 0:
            return 0.0
        if s1_ == s2_:
            return 1.0
        window = max(l1, l2) // 2 - 1
        if window < 0:
            window = 0
        m1 = [False] * l1
        m2 = [False] * l2
        m = 0
        for i in range(l1):
            lo = i - window if i > window else 0
            hi = i + window + 1
            if hi > l2:
                hi = l2
            for j in range(lo, hi):
                if not m2[j] and s1_[i] == s2_[j]:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1_[i] != s2_[k]:
                    t += 1
                k += 1
        t //= 2
        j = (m / l1 + m / l2 + (m - t) / m) / 3.0
        if j > 0.7:
            p = 0
            for a, b in zip(s1_[:4], s2_[:4]):
                if a != b:
                    break
                p += 1
            j = j + p * 0.1 * (1.0 - j)
        return j

    return pd.Series(
        [jw(a, b) for a, b in zip(s1, s2)], dtype="float64"
    )


def q_jaro_winkler_match(
    spark: SparkSession,
    sf_dir: str,
    twin_mod: int = 40,
    threshold: float = 0.9,
    window: int = 4,
) -> DataFrame:
    """Jaro-Winkler entity matching — the third member of the
    linkage stack (q_fuzzy_match's edit-distance cut catches typos,
    q_record_linkage_fs weighs multi-field evidence; JW is the
    name-comparator production linkers like Splink default to,
    because it rewards shared prefixes the way human-entered name
    variants deviate). Same planted dirty-twin corpus as the F-S
    query.

    CANDIDATE GENERATION (the 100 TB contract, rebuilt in round 9):
    round 8 blocked on (brand, first name token) and measured 10.5k
    -> 1.05M candidate pairs for 10x rows — quadratic, because the
    corpus duplicates names heavily (identical-(brand, name) pair
    mass alone grew 1.2k -> 125k) and ANY equality blocking that
    enumerates duplicate groups pairwise is Omega(d^2) per group.
    The linear design is the standard dedupe-before-link split:

    1. EXACT tier: canonicalize — one representative per
       (brand, name) = the min key; every other member links to its
       rep at jw = 1.0 (identical strings). Star-shaped edges,
       d - 1 per duplicate group, LINEAR, and transitively complete
       over each group. A groupBy + equi-join; no pair enumeration.
    2. FUZZY tier: sorted-neighborhood (window ``window``) over the
       DISTINCT-name representatives, ordered by (brand, token,
       name, key) and kept where (brand, token) agree. Names are
       unique per brand among reps, so the killer tie-groups are
       gone by construction: a dirty twin's rep sits at rank
       distance exactly 1 from its source's rep (nothing sorts
       between a 5-token name and name + ' copy'). At most
       ``window`` JW evaluations per DISTINCT name — linear, and
       the Python kernel now runs on thousands of pairs, not
       millions.

    The scorer is an Arrow-batched pandas UDF whose arithmetic was
    verified bit-identical to DuckDB's ``jaro_winkler_similarity``
    over ~50k adversarial pairs (see jaro_winkler_pandas), so the
    query is oracle-EXACT despite the Python kernel — the oracle
    uses the builtin. Output: exact-tier edges at 1.0 plus fuzzy
    pairs scoring >= ``threshold`` (twin reps land in [0.91, 0.95];
    fuzzy pairs are strictly < 1.0 since rep names differ)."""
    jw_udf = F.pandas_udf(jaro_winkler_pandas, "double")
    full = linkage_corpus(spark, sf_dir, twin_mod)
    reps = (
        full.groupBy("p_brand", "p_name")
        .agg(F.min("p_partkey").alias("rep_key"))
        .withColumn("tok", F.split(F.col("p_name"), " ")[0])
    )
    exact = (
        full.join(reps.drop("tok"), ["p_brand", "p_name"])
        .where(F.col("p_partkey") != F.col("rep_key"))
        .select(
            F.col("p_brand").alias("brand"),
            F.col("rep_key").alias("partkey_1"),
            F.col("p_partkey").alias("partkey_2"),
            F.lit(1.0).cast("double").alias("jw"),
        )
    )
    fuzzy = (
        jw_fuzzy_candidates(spark, sf_dir, twin_mod, window, reps=reps)
        .withColumn(
            "jw",
            F.round(jw_udf(F.col("a_p_name"), F.col("b_p_name")), 6),
        )
        .where(F.col("jw") >= F.lit(threshold))
        .select(
            F.col("a_p_brand").alias("brand"),
            F.least("a_rep_key", "b_rep_key").alias("partkey_1"),
            F.greatest("a_rep_key", "b_rep_key").alias("partkey_2"),
            "jw",
        )
    )
    return exact.unionByName(fuzzy).orderBy("partkey_1", "partkey_2")


def q_record_linkage_fs(
    spark: SparkSession,
    sf_dir: str,
    twin_mod: int = 40,
    window: int = 8,
    sample_mod: int = 4,
) -> DataFrame:
    """Probabilistic record linkage with Fellegi-Sunter match weights
    (Fellegi & Sunter 1969; the Splink/production-linker scoring
    model): every candidate pair gets a log-likelihood-ratio score
    summed over field comparisons — agreement on field f adds
    log2(m_f/u_f), disagreement adds log2((1-m_f)/(1-u_f)) — and a
    match/review verdict by threshold. This upgrades the engine's
    rule-based matchers (q_fuzzy_match's edit-distance cut,
    q_sorted_neighborhood's window) to principled evidence weighing:
    agreement on a rare field (exact retail price) outweighs
    agreement on a common one (size bucket) automatically, with the
    weights DERIVED from the data instead of hand-tuned.

    Corpus: parts plus a planted DIRTY COPY of every ``twin_mod``-th
    part (key + 10^7, name suffixed — the linkage must match records
    whose display name no longer equals; its FIRST TOKEN still
    agrees and becomes part of the blocking key).

    CANDIDATE GENERATION (the 100 TB contract): sorted-neighborhood
    (Hernandez-Stolfo) over the total order (brand, name-token,
    size, price, key) with a rank window of ``window``, kept only
    where both blocking keys (brand, name-token) agree — at most
    ``window`` pairs per row, so the candidate pool is LINEAR in the
    corpus by construction. Round 8 shipped brand-equality blocking
    here and measured 84k -> 8.4M pairs for 10x rows (quadratic,
    77 s at sf0.1); the sort-order composite is near-unique (price
    is ~continuous), so true twins sit at rank distance <= 2 at both
    test SFs (measured) — window 8 is a 4x recall margin. Pair
    generation is the bucketed equi-join of sorted_neighborhood_pairs
    (never a rank theta-join); the rank itself is the range-
    partitioned global_rank, so no single-task window at scale.

    FIELDS SCORED: type, size, price. The name token is deliberately
    NOT scored any more — it is a blocking key now, and scoring a
    field that blocking forces to agree is the classic Fellegi-Sunter
    misuse (its u would clamp to ~1 and contribute nothing but
    noise).

    u-probabilities (P(agree | non-match)) are estimated from a
    DETERMINISTIC HASH SAMPLE of the candidate pairs — pairs whose
    md5 coin lands 0 mod ``sample_mod`` — not the full pool: at
    100 TB the estimation cost is then a dial (sample_mod scales
    with corpus size for a fixed-size sample) independent of the
    scoring pass. Rates are Laplace-smoothed ((agree + 0.5)/(n + 1))
    so a field that never agrees in a small sample gets a bounded —
    not clamp-explosive — weight. m-priors are fixed at 0.95
    (documented choice, as in Splink's default initialization).
    Weights round to 6 and the score sums as DECIMAL(18,6) —
    order-independent and engine-exact (the q_unigram_logprob
    log-parity discipline); the smoothed rate divides exact integer
    counts, so both engines produce the identical double.

    Output: match + review pairs only (score thresholds 12 / 3)."""
    cand = fs_candidates(spark, sf_dir, twin_mod, window)
    agree = {
        "type": (F.col("a_p_type") == F.col("b_p_type")),
        "size": (F.col("a_p_size") == F.col("b_p_size")),
        "price": (F.col("a_p_retailprice") == F.col("b_p_retailprice")),
    }
    # Two consumers (u-estimation + scoring) — materialize once so
    # the sorted-neighborhood join doesn't run twice.
    flagged = cand.select(
        F.least("a_p_partkey", "b_p_partkey").alias("a_key"),
        F.greatest("a_p_partkey", "b_p_partkey").alias("b_key"),
        *[v.cast("int").alias(f"agree_{k}") for k, v in agree.items()],
    ).localCheckpoint()
    # Deterministic md5-coin pair sample for u-estimation. Agreement
    # flags are 0/1 ints, so sum()/count() are order-independent-
    # exact; Laplace smoothing keeps u in (0, 1) with finite log-odds
    # even when a field never agrees in the sample.
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("a_key"), F.col("b_key"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % sample_mod
    )
    u_stats = flagged.where(coin == 0).agg(
        *[
            (
                (F.sum(f"agree_{k}").cast("double") + F.lit(0.5))
                / (F.count(F.lit(1)).cast("double") + F.lit(1.0))
            ).alias(f"u_{k}")
            for k in agree
        ]
    )
    m = 0.95
    scored = flagged.crossJoin(F.broadcast(u_stats))
    w_terms = []
    for k in agree:
        w_a = F.round(F.log2(F.lit(m) / F.col(f"u_{k}")), 6)
        w_d = F.round(
            F.log2(F.lit(1.0 - m) / (F.lit(1.0) - F.col(f"u_{k}"))), 6
        )
        w_terms.append(
            F.when(F.col(f"agree_{k}") == 1, w_a).otherwise(w_d).cast(
                "decimal(18,6)"
            )
        )
    total = w_terms[0]
    for t in w_terms[1:]:
        total = total + t
    n_agree = sum(F.col(f"agree_{k}") for k in agree)
    return (
        scored.select(
            "a_key",
            "b_key",
            n_agree.alias("n_agree"),
            total.cast("double").alias("score"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("score") >= 12.0, F.lit("match"))
            .when(F.col("score") >= 3.0, F.lit("review"))
            .otherwise(F.lit(None)),
        )
        .where(F.col("verdict").isNotNull())
        .orderBy("a_key", "b_key")
    )
