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
