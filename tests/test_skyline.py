"""Skyline (Pareto frontier) operator: brute-force parity + edges.

The two-phase plan (bucket prefilter -> exact pass on survivors) must
return exactly the dominance-frontier of the input under
(min price, max size) semantics, including tied points, for any
bucket width.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.analytic import skyline2d


def brute_skyline(rows):
    out = []
    for p in rows:
        dominated = any(
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, rows, width):
    df = spark.createDataFrame(rows, "id long, price double, size int")
    got = skyline2d(df, "price", "size", bucket_width=width).collect()
    return sorted((r.id, r.price, r.size) for r in got)


@pytest.mark.parametrize("width", [0.5, 1.0, 10.0])
def test_skyline_matches_brute_force_random(spark, width):
    rng = random.Random(42)
    rows = [
        (i, round(rng.uniform(0, 20), 2), rng.randint(0, 50))
        for i in range(300)
    ]
    assert _run(spark, rows, width) == brute_skyline(rows)


def test_skyline_keeps_exact_ties_and_drops_same_price_dominated(spark):
    rows = [
        (1, 5.0, 10),  # frontier (tied pair)
        (2, 5.0, 10),  # frontier (tied pair — no strict inequality)
        (3, 5.0, 9),   # dominated by 1/2 (same price, smaller size)
        (4, 4.0, 10),  # dominates 1/2? same size, cheaper -> yes
        (5, 6.0, 11),  # frontier (bigger size, pricier)
    ]
    got = _run(spark, rows, 1.0)
    assert got == brute_skyline(rows)
    assert (4, 4.0, 10) in got and (5, 6.0, 11) in got
    assert all(r[0] not in (1, 2, 3) for r in got)


def test_skyline_single_point_and_monotone_chain(spark):
    assert _run(spark, [(1, 3.0, 3)], 1.0) == [(1, 3.0, 3)]
    # strictly improving chain: every point is on the frontier
    chain = [(i, float(i), i) for i in range(1, 8)]
    assert _run(spark, chain, 2.0) == sorted(chain)
    # strictly worsening chain: only the first point survives
    worse = [(i, float(i), 10 - i) for i in range(1, 8)]
    assert _run(spark, worse, 2.0) == [(1, 1.0, 9)]


def test_skyline_nulls_are_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 10), (2, None, 99), (3, 1.0, None)],
        "id long, price double, size int",
    )
    got = skyline2d(df, "price", "size").collect()
    assert [(r.id, r.price, r.size) for r in got] == [(1, 5.0, 10)]


def test_skyline_plan_is_broadcast_only(spark):
    """Both phase joins must broadcast their parameter-sized sides —
    no shuffle of the fact table beyond the bucket aggregate."""
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("price"),
        (F.col("id") % 53).cast("int").alias("size"),
    )
    sky = skyline2d(df, "price", "size")
    plan = sky._sc._jvm.PythonSQLUtils.explainString(
        sky._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [
        ln for ln in plan.splitlines() if "Join" in ln and "Broadcast" in ln
    ]
    assert len(joins) >= 2, plan
