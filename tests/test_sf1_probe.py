"""Smoke tests for the bench's sf1 scale probe plumbing.

Round-9 regression class: ``q_hill_tail_index`` entered
``SF1_REGISTERED_QUERIES`` reading a table (`orders`) that
``_make_scaled_sfdir`` never wrote, so the probe subprocess died with
PATH_NOT_FOUND and BENCH_r09 shipped with ZERO scale evidence — the
failure was a stderr-only message and a silently omitted JSON section.
These tests make that class impossible to ship again:

- every query registered for the probe must RESOLVE (Spark analysis,
  which checks table paths and columns) against the synthetic sf dir
  the probe itself generates — a registry entry whose table needs the
  generator doesn't cover turns the suite red at commit time, not at
  bench time;
- the probe's non-registry pipeline entries get the same resolution
  check;
- the Hill estimator's top-k fold is non-degenerate on the synthetic
  orders (the generator plants a real Pareto tail — a flat-price
  synthetic would satisfy path resolution while measuring nothing).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    import bench

    root = str(tmp_path_factory.mktemp("sf1_synth"))
    return bench._make_scaled_sfdir(spark, root, mult=1)


def test_registered_probe_queries_resolve_on_synth_dir(spark, synth_dir):
    """Every SF1_REGISTERED_QUERIES entry's plan must analyze against
    the probe's own synthetic dir: resolution walks the read paths
    and the column references, so a missing table or column fails
    HERE instead of killing the probe subprocess at bench time."""
    import bench
    import __spark_entry__ as E

    qs = E.queries()
    missing = [q for q in bench.SF1_REGISTERED_QUERIES if q not in qs]
    assert missing == [], f"probe registers unknown queries: {missing}"

    failures = {}
    for name in bench.SF1_REGISTERED_QUERIES:
        try:
            df = qs[name](spark, synth_dir)
            df.schema  # force analysis without execution
        except Exception as exc:  # noqa: BLE001 — report all at once
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert failures == {}, (
        "probe queries failed to resolve on the synthetic sf dir "
        f"(table/column needs the generator doesn't cover): {failures}"
    )


def test_probe_pipeline_entries_resolve_on_synth_dir(spark, synth_dir):
    """The probe also times three composites outside the registry;
    their table needs get the same commit-time resolution check."""
    from datapoints_csv_extractor_spark.operators.dedup import (
        minhash_dedup_pipeline,
    )
    from datapoints_csv_extractor_spark.operators.similarity import (
        q_semantic_dedup,
    )
    from datapoints_csv_extractor_spark.operators.textops import (
        q_curation_pipeline_full,
    )

    for fn in (minhash_dedup_pipeline, q_semantic_dedup,
               q_curation_pipeline_full):
        fn(spark, synth_dir).schema


def test_missing_table_is_loud(spark, synth_dir, tmp_path):
    """A synth dir missing a registered query's table must raise at
    plan construction — the exact round-9 failure, now pinned red."""
    import __spark_entry__ as E

    broken = str(tmp_path / "broken_synth")
    os.makedirs(broken)
    for t in os.listdir(synth_dir):
        if t != "orders.parquet":
            os.symlink(
                os.path.join(synth_dir, t), os.path.join(broken, t)
            )
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        E.queries()["q_hill_tail_index"](spark, broken).schema


def test_synth_orders_tail_is_nondegenerate(spark, synth_dir):
    """The planted Pareto tail must give the Hill fold real work:
    k_used == k and a strictly positive ln-ratio sum (alpha finite),
    with alpha in a loose band around the generator's 1/0.8 = 1.25
    design value — so the probe's 10x ratio measures a real fold."""
    import __spark_entry__ as E

    row = E.queries()["q_hill_tail_index"](spark, synth_dir).first()
    assert row["k_used"] == 200
    assert row["hill_alpha"] is not None
    assert 0.8 < float(row["hill_alpha"]) < 2.0
    assert row["infinite_variance"] is True

    o = spark.read.parquet(os.path.join(synth_dir, "orders.parquet"))
    assert o.count() == 150000
    mx, mn = o.agg(
        F.max("o_totalprice"), F.min("o_totalprice")
    ).first()
    assert mn >= 1000.0  # Pareto scale floor
    assert mx > 100 * mn  # a real tail, not a flat band
