"""Invariant tests for the temporal/OLAP analytic operators.

The DuckDB oracle pins exact values at sf0.01; these pin the
structural invariants fast at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators import analytic as A
from datapoints_csv_extractor_spark.operators.relational import load

SF = "/root/testdata/sf0.001"


def test_time_window_rollup_partitions_all_events(spark):
    e = load(spark, SF, "events")
    out = A.q_time_window_rollup(spark, SF)
    assert out.agg(F.sum("n_events")).first()[0] == e.count()
    # Tumbling windows: (window, type) keys are unique.
    assert out.count() == out.select("window_start", "event_type").distinct().count()


def test_session_window_invariants(spark):
    e = load(spark, SF, "events")
    out = A.q_session_window(spark, SF)
    # Every event lands in exactly one session.
    assert out.agg(F.sum("n_events")).first()[0] == e.count()
    # Session end = last event + 30 min => end - start >= 30 min.
    bad = out.where(
        F.col("session_end") < F.col("session_start") + F.expr("INTERVAL 30 MINUTES")
    )
    assert bad.count() == 0
    # Sessions of one user never overlap.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        out.withColumn("prev_end", F.lag("session_end").over(w))
        .where(F.col("prev_end").isNotNull() & (F.col("session_start") < F.col("prev_end")))
    )
    assert overlaps.count() == 0


def test_cube_totals_consistent(spark):
    out = {(r.o_orderstatus, r.o_orderpriority): r for r in A.q_cube(spark, SF).collect()}
    grand = out[("ALL", "ALL")]
    by_status = [v for (s, p), v in out.items() if p == "ALL" and s != "ALL"]
    assert sum(r.n_orders for r in by_status) == grand.n_orders
    assert abs(sum(r.sum_price for r in by_status) - grand.sum_price) < 1.0


def test_pivot_one_row_per_user(spark):
    e = load(spark, SF, "events")
    out = A.q_pivot(spark, SF)
    assert out.count() == e.select("user_id").distinct().count()
    assert set(out.columns) == {"user_id", *A.EVENT_TYPES}


def test_percentiles_ordered(spark):
    for r in A.q_percentiles(spark, SF).collect():
        assert r.p50 <= r.p90 <= r.p99


def test_range_join_buckets_cover_january(spark):
    e = load(spark, SF, "events")
    out = A.q_range_join(spark, SF)
    jan = e.where(
        (F.col("ts") >= F.lit("2024-01-01")) & (F.col("ts") < F.lit("2024-02-05"))
    )
    assert out.agg(F.sum("n_events")).first()[0] == jan.count()


def test_lttb_matches_python_reference_and_keeps_endpoints(spark):
    """LTTB parity: the distributed per-series pass must select the
    exact same points as a sequential pure-Python LTTB."""
    import math

    from datapoints_csv_extractor_spark.operators.analytic import lttb_downsample

    def py_lttb(pts, n_buckets):
        n = len(pts)
        if n <= n_buckets:
            return pts
        import numpy as np

        ts = np.array([p[0] for p in pts], dtype=float)
        vals = np.array([p[1] for p in pts], dtype=float)
        bounds = np.linspace(1, n - 1, n_buckets - 1).astype(int)
        keep, prev = [0], 0
        for b in range(n_buckets - 2):
            lo, hi = bounds[b], bounds[b + 1]
            nxt_lo, nxt_hi = hi, (bounds[b + 2] if b + 2 < len(bounds) else n)
            cx = ts[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else ts[-1]
            cy = vals[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else vals[-1]
            area = abs(
                (ts[prev] - cx) * (vals[lo:hi] - vals[prev])
                - (ts[prev] - ts[lo:hi]) * (cy - vals[prev])
            )
            choice = lo + int(area.argmax())
            keep.append(choice)
            prev = choice
        keep.append(n - 1)
        return [pts[i] for i in keep]

    rows = []
    series = {}
    for uid in (1, 2):
        pts = [
            (i * 1_000_000, math.sin(i / 7.0 + uid) * 10 + (i % 13))
            for i in range(200)
        ]
        series[uid] = pts
        rows += [(uid, t, v) for t, v in pts]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")

    out = lttb_downsample(df, n_buckets=25).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append((r.ts, r.value))
    for uid, pts in series.items():
        expect = py_lttb(pts, 25)
        assert sorted(got[uid]) == sorted(expect)
        assert len(got[uid]) == 25
        kept_ts = {t for t, _ in got[uid]}
        assert pts[0][0] in kept_ts and pts[-1][0] in kept_ts

    # Short series pass through untouched.
    short = spark.createDataFrame(
        [(9, i, float(i)) for i in range(10)], "user_id long, ts long, value double"
    )
    assert lttb_downsample(short, n_buckets=25).count() == 10
