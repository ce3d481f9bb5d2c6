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


def test_anomaly_mad_flags_planted_outlier_robustly(spark, tmp_path):
    # 30 inliers at ~10 plus two gross outliers: MAD flags exactly the
    # outliers, and (robustness) the flags don't move when the
    # outliers get 10x worse — the property mean/std z-scores lack.
    import datetime as dt

    def write(outlier_scale: float) -> None:
        rows = [
            (i, dt.datetime(2024, 1, 1, 0, i), 1, "a", 10.0 + (i % 5) * 0.1,
             "{}")
            for i in range(30)
        ]
        rows += [
            (100, dt.datetime(2024, 1, 2), 1, "a", 500.0 * outlier_scale, "{}"),
            (101, dt.datetime(2024, 1, 3), 1, "a", -400.0 * outlier_scale, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    write(1.0)
    got = {r.event_id for r in A.q_anomaly_mad(spark, str(tmp_path)).collect()}
    assert got == {100, 101}
    write(10.0)
    got10 = {r.event_id for r in A.q_anomaly_mad(spark, str(tmp_path)).collect()}
    assert got10 == {100, 101}


def test_pit_join_reads_version_valid_at_fact_time(spark, tmp_path):
    import datetime as dt

    from datapoints_csv_extractor_spark.operators import relational as R

    d = dt.datetime
    rows = [
        # user 1: tier low (v1) -> high (v2 at Jan 10) via value jumps.
        (1, d(2024, 1, 1), 1, "view", 10.0, "{}"),       # low, v1
        (2, d(2024, 1, 5), 1, "purchase", 20.0, "{}"),   # fact in v1 (low)
        (3, d(2024, 1, 10), 1, "view", 90.0, "{}"),      # high, v2 opens
        (4, d(2024, 1, 10), 1, "purchase", 70.0, "{}"),  # same ts, later id
        (5, d(2024, 1, 20), 1, "purchase", 80.0, "{}"),  # fact in v2? value 80 keeps high
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.event_id: (r.tier, r.tier_version)
           for r in R.q_pit_join(spark, str(tmp_path)).collect()}
    # Purchase 2 sees v1/low; purchase 4 (ts == v2's valid_from) sees
    # v2/high; purchase 5 sees high (its own value keeps the tier).
    assert got[2] == ("low", 1)
    assert got[4] == ("high", 2)
    assert got[5][0] == "high"


def test_feature_drift_ks_detects_planted_shift(spark, tmp_path):
    import datetime as dt

    n = 300
    rows = []
    for i in range(n):
        half = i % 2 == 0  # interleave so both halves populated
        ts = dt.datetime(2024, 1, 5) if half else dt.datetime(2024, 1, 25)
        # type 'a': identical distribution both halves.
        rows.append((i, ts, 1, "a", float(i % 50), "{}"))
        # type 'b': second half shifted by +40.
        rows.append(
            (10_000 + i, ts, 1, "b",
             float(i % 50) + (0.0 if half else 40.0), "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.event_type: r for r in A.q_feature_drift_ks(spark, str(tmp_path)).collect()}
    assert not got["a"].drifted and got["a"].ks_stat < 0.1
    assert got["b"].drifted and got["b"].ks_stat > 0.5
    for r in got.values():
        assert 0.0 <= r.ks_stat <= 1.0


def test_scd2_history_invariants(spark):
    from datapoints_csv_extractor_spark.operators import relational as R

    rows = R.q_scd2_history(spark, SF).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        # Versions are 1..n; intervals chain exactly; one current row.
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from and not a.is_current
            assert a.event_type != b.event_type  # no-op updates collapsed
        assert hist[-1].is_current and hist[-1].valid_to is None


def test_m4_downsample_invariants(spark):
    out = A.q_m4_downsample(spark, SF).collect()
    assert out
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault((r.event_type, r.bucket_start), {})[r.role] = r
    raw = load(spark, SF, "events").select(
        "event_type",
        (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 21600)
         * 21600).cast("long").alias("bucket_start"),
        "ts",
        "value",
    ).collect()
    bounds: dict = {}
    for r in raw:
        k = (r.event_type, r.bucket_start)
        lo_v, hi_v, lo_t, hi_t, n = bounds.get(
            k, (float("inf"), float("-inf"), None, None, 0)
        )
        bounds[k] = (
            min(lo_v, r.value), max(hi_v, r.value),
            min(lo_t, r.ts) if lo_t else r.ts,
            max(hi_t, r.ts) if hi_t else r.ts, n + 1,
        )
    # Exactly the non-empty buckets, exactly 4 roles each, and each
    # role's witness matches the true per-bucket extremum.
    assert set(by_bucket) == set(bounds)
    for k, roles in by_bucket.items():
        assert set(roles) == {"first", "last", "min", "max"}
        lo_v, hi_v, lo_t, hi_t, _ = bounds[k]
        assert roles["min"].value == lo_v and roles["max"].value == hi_v
        assert roles["first"].ts == lo_t and roles["last"].ts == hi_t


def test_stl_decompose_reconstructs_and_centers(spark):
    rows = A.q_stl_decompose(spark, SF).collect()
    assert rows
    for r in rows:
        # Additive identity up to the four display roundings.
        assert abs(r.day_mean - (r.trend + r.seasonal + r.residual)) < 5e-4
    # Seasonal is constant within (event_type, weekday).
    per_dow: dict = {}
    for r in rows:
        k = (r.event_type, r.day.weekday())
        per_dow.setdefault(k, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in per_dow.values())


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


def test_time_weighted_aggregates_closed_form(spark):
    """Hand-computed series with a midnight-spanning segment.

    user 1: (Jan-1 12:00, 10) -> (Jan-2 12:00, 20) -> (Jan-2 18:00, 14).
    Day 1 holds the clipped half-segment 10->15 (uniform slope, so
    tw_avg = 12.5 and cont_var = (15-10)^2/12 = 25/12); day 2 holds
    15->20 (12 h) then 20->14 (6 h).
    """
    rows = [
        (1, "2024-01-01 12:00:00", 10.0),
        (1, "2024-01-02 12:00:00", 20.0),
        (1, "2024-01-02 18:00:00", 14.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    out = {r["day"].day: r for r in A.time_weighted_aggregates(df).collect()}
    d1, d2 = out[1], out[2]
    assert d1["coverage_sec"] == 43200.0
    assert d1["tw_avg"] == 12.5
    assert d1["cont_var"] == round(25 / 12, 4)
    assert d1["total_variation"] == 5.0
    assert d2["coverage_sec"] == 64800.0
    # (17.5*43200 + 17*21600) / 64800 = 17.3333
    assert d2["tw_avg"] == 17.3333
    assert d2["total_variation"] == 11.0


def test_time_weighted_aggregates_degenerate_segments(spark):
    """Duplicate timestamps (zero-length segment) and single-point
    series must not divide by zero or emit rows with no coverage."""
    rows = [
        (1, "2024-01-01 06:00:00", 5.0),
        (1, "2024-01-01 06:00:00", 7.0),
        (1, "2024-01-01 18:00:00", 5.0),
        (2, "2024-01-03 00:00:00", 99.0),  # single point: no segment
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    out = A.time_weighted_aggregates(df).collect()
    assert [r["user_id"] for r in out] == [1]
    r = out[0]
    assert r["coverage_sec"] == 43200.0  # only the 06:00->18:00 span
    # flat 7->5 linear: tw_avg = 6.0; variation counts the 5->7 jump too
    assert r["tw_avg"] == 6.0
    assert r["total_variation"] == 4.0


def test_discrete_variance_small_bucket(spark):
    out = A.q_discrete_variance(spark, SF)
    row = out.where((F.col("n_points") >= 2)).first()
    assert row is not None and row["disc_var"] >= 0.0
    # var_pop identity: stddev^2 == var (within the 4-decimal floor)
    assert abs(row["disc_stddev"] ** 2 - row["disc_var"]) < 1e-2


def test_synthetic_datapoints_closed_form(spark):
    """a: 10@00:00 -> 20@02:00; b: 100@01:00 -> 200@03:00. The union
    instants inside BOTH ranges are 01:00 (a interpolates to 15) and
    02:00 (b interpolates to 150); the outer instants drop."""
    rows = [
        (1, 1, "2024-01-01 00:00:00", 10.0),
        (2, 1, "2024-01-01 02:00:00", 20.0),
        (3, 2, "2024-01-01 01:00:00", 100.0),
        (4, 2, "2024-01-01 03:00:00", 200.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, value double"
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    out = A.synthetic_datapoints(df, [(7, 1, 2)]).collect()
    assert [(r["pair_id"], r["ts"].hour, r["synth_value"]) for r in out] == [
        (7, 1, 115.0),
        (7, 2, 170.0),
    ]


def test_hll_rollup_merges_within_error_bound(spark):
    """Unioned daily sketches must estimate monthly distinct users
    within HLL's error envelope (lgConfigK=12 default: ~1.6% std
    error; 5% is a >3-sigma bound) — pinning that the rollup really
    MERGES sketches rather than re-counting."""
    approx = {
        r.event_type: r.approx_users
        for r in A.q_hll_distinct_rollup(spark, SF).collect()
    }
    e = load(spark, SF, "events")
    exact = {
        r.event_type: r.exact
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, est in approx.items():
        assert abs(est - exact[t]) <= max(1, 0.05 * exact[t]), (t, est, exact[t])


def test_time_weighted_aggregates_property_vs_python(spark):
    """Property parity: for arbitrary per-series point sets (random
    microsecond timestamps spanning multiple days, duplicate-instant
    collisions allowed), the Spark closed-form must match a pure
    Python trapezoid integrator to float tolerance on every bucket."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    DAY_US = 86_400_000_000

    def py_reference(points):
        """points: sorted [(ts_us, v)] for ONE series -> {day_start_us:
        (dur_sec, ivdt, tv)}."""
        out = {}
        for (t0, v0), (t1, v1) in zip(points, points[1:]):
            for d in range(t0 // DAY_US, t1 // DAY_US + 1):
                a, b = max(t0, d * DAY_US), min(t1, (d + 1) * DAY_US)
                if b < a:
                    continue
                if t1 == t0:
                    va, vb = v0, v1
                else:
                    va = v0 + (v1 - v0) * (a - t0) / (t1 - t0)
                    vb = v0 + (v1 - v0) * (b - t0) / (t1 - t0)
                dur = (b - a) / 1e6
                acc = out.setdefault(d * DAY_US, [0.0, 0.0, 0.0])
                acc[0] += dur
                acc[1] += (va + vb) / 2 * dur
                acc[2] += abs(vb - va)
        return {k: v for k, v in out.items() if v[0] > 0}

    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pts=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5 * DAY_US),
                st.floats(min_value=-100, max_value=100, allow_nan=False),
            ),
            min_size=2,
            max_size=25,
        )
    )
    def run(pts):
        import datetime as dt

        # Dedupe duplicate instants (keep one value): with 3+ distinct
        # values at one instant, |a-b|+|b-c| depends on the engine's
        # tie order — the operator is only order-independent when
        # instants are unique, which real series (and the strict
        # out-of-order drop in the streaming twin) guarantee.
        pts = sorted({int(t): float(v) for t, v in pts}.items())
        if len(pts) < 2:
            return
        base = dt.datetime(2024, 3, 1)
        rows = [
            (1, base + dt.timedelta(microseconds=int(t)), float(v))
            for t, v in pts
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
        got = {
            r["day"]: (r["coverage_sec"], r["tw_avg"], r["total_variation"])
            for r in A.time_weighted_aggregates(df).collect()
        }
        # Python reference over the points sorted the way the window
        # sorts them (ts; equal-instant order is irrelevant to the
        # integrals because zero-length segments contribute nothing
        # to dur/ivdt and their tv uses both endpoint values the same
        # way in either order only when values are equal — so dedupe
        # exact-duplicate instants to the LAST value like lag sees).
        pts_sorted = sorted((int(t), float(v)) for t, v in pts)
        base_us = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        shifted = [(base_us + t, v) for t, v in pts_sorted]
        expect = py_reference(shifted)
        assert set(got) == {
            dt.datetime.utcfromtimestamp(k / 1e6) for k in expect
        }
        for k, (dur, ivdt, tv) in expect.items():
            day = dt.datetime.utcfromtimestamp(k / 1e6)
            gdur, gavg, gtv = got[day]
            assert abs(gdur - round(dur, 6)) < 1e-6
            assert abs(gavg - round(ivdt / dur, 4)) < 2e-4
            assert abs(gtv - round(tv, 4)) < 2e-4

    run()


def test_synthetic_datapoints_property_vs_python(spark):
    """Property parity: for arbitrary two-series point sets with
    unique instants, the aligned sum must equal a pure-Python
    interpolate-at-union-instants reference."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def interp_at(points, t):
        """Linear interpolation of sorted [(t_us, v)] at t; None
        outside the observed range."""
        if not points or t < points[0][0] or t > points[-1][0]:
            return None
        for (t0, v0), (t1, v1) in zip(points, points[1:]):
            if t0 <= t <= t1:
                if t == t0:
                    return v0
                return v0 + (v1 - v0) * (t - t0) / (t1 - t0)
        return points[-1][1] if t == points[-1][0] else None

    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        a=st.lists(
            st.tuples(st.integers(0, 10**9), st.floats(-50, 50, allow_nan=False)),
            min_size=1, max_size=12,
        ),
        b=st.lists(
            st.tuples(st.integers(0, 10**9), st.floats(-50, 50, allow_nan=False)),
            min_size=1, max_size=12,
        ),
    )
    def run(a, b):
        import datetime as dt

        a = sorted({t: v for t, v in a}.items())
        b_ts = {t for t, _ in a}
        b = sorted({t: v for t, v in b if t not in b_ts}.items())
        base = dt.datetime(2024, 5, 1)
        rows = [
            (i, 1, base + dt.timedelta(microseconds=t), float(v))
            for i, (t, v) in enumerate(a)
        ] + [
            (1000 + i, 2, base + dt.timedelta(microseconds=t), float(v))
            for i, (t, v) in enumerate(b)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp_ntz, value double"
        )
        got = {
            r["ts"]: r["synth_value"]
            for r in A.synthetic_datapoints(df, [(9, 1, 2)]).collect()
        }
        expect = {}
        for t, _ in a + b:
            va, vb = interp_at(a, t), interp_at(b, t)
            if va is not None and vb is not None:
                expect[base + dt.timedelta(microseconds=t)] = round(va + vb, 2)
        assert set(got) == set(expect)
        for k in expect:
            assert abs(got[k] - expect[k]) < 5e-2, (k, got[k], expect[k])

    run()


def test_funnel_property_vs_python(spark):
    """Random event sequences: the JVM fold must match a pure-Python
    greedy earliest-accept walker for every user, including strict
    timestamp inequality between accepted stages."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    STAGES = ["view", "click", "purchase"]

    def py_walk(events):
        stage, last = 0, None
        for ts, et in sorted(events):
            if stage < len(STAGES) and et == STAGES[stage] and (
                last is None or ts > last
            ):
                stage += 1
                last = ts
        return stage

    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        evs=st.lists(
            st.tuples(
                st.integers(0, 9),  # user
                st.integers(0, 50),  # coarse ts (collisions likely)
                st.sampled_from(STAGES + ["error", "signup"]),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def run(evs):
        import datetime as dt

        base = dt.datetime(2024, 6, 1)
        rows = [
            (u, base + dt.timedelta(seconds=t), et) for u, t, et in evs
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, event_type string"
        )
        got = {
            r.user_id: r.funnel_stage
            for r in A.funnel_stages(df, STAGES).collect()
        }
        by_user = {}
        for u, t, et in evs:
            by_user.setdefault(u, []).append((t, et))
        assert got == {u: py_walk(e) for u, e in by_user.items()}

    run()


def test_read_api_modes(spark):
    """The unified read facade: every mode runs over a long datapoints
    frame with the ingest sink's column names, honoring the
    inclusive/exclusive window and the series filter."""
    import datetime as dt

    from datapoints_csv_extractor_spark.plans.read_api import read_datapoints

    base = dt.datetime(2024, 1, 1)
    rows = []
    for sid in ("a", "b"):
        for h in range(48):
            rows.append((sid, base + dt.timedelta(hours=h), float(h)))
    dp = spark.createDataFrame(rows, "external_id string, ts timestamp_ntz, value double")

    raw = read_datapoints(
        dp, series=["a"], start=base, end=base + dt.timedelta(hours=2), mode="raw"
    ).collect()
    assert [(r.external_id, r.value) for r in raw] == [("a", 0.0), ("a", 1.0)]

    agg = read_datapoints(dp, mode="aggregates", granularity="day").collect()
    assert {(r.external_id, r.day.day, r.n_points) for r in agg} == {
        ("a", 1, 24), ("a", 2, 24), ("b", 1, 24), ("b", 2, 24)
    }

    tw = read_datapoints(
        dp, series=["a"], mode="time_weighted", granularity="day"
    ).collect()
    # Hour-ramp 0..47: day-1 coverage is 23 h (no segment past 23:00
    # until the 24:00 point starts day 2's first piece at 0us... the
    # 23:00->24:00 segment IS clipped into day 1), so coverage 24h*3600
    # minus nothing = 86400? The 47th point ends day 2 at 23:00.
    d1 = [r for r in tw if r.day.day == 1][0]
    assert d1.coverage_sec == 24 * 3600.0
    assert d1.tw_avg == 12.0  # linear ramp 0->24 over the day

    latest = read_datapoints(dp, mode="latest", end=base + dt.timedelta(hours=30))
    got = {r.external_id: (r.latest_ts.hour, r.latest_value) for r in latest.collect()}
    assert got == {"a": (5, 29.0), "b": (5, 29.0)}  # hour 29 = day2 05:00

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown read mode"):
        read_datapoints(dp, mode="nope")


def test_derivative_matches_python(spark):
    """q_derivative on sf0.001 must equal a pandas lag computation
    per (user, ts) row — slope sign, magnitude, and the first-row /
    duplicate-instant drops."""
    import pandas as pd

    ev = load(spark, SF, "events").select("user_id", "ts", "value").toPandas()
    expect = {}
    for uid, g in ev.sort_values(["user_id", "ts"]).groupby("user_id"):
        prev_t, prev_v = None, None
        for _, row in g.iterrows():
            t_us = row.ts.value // 1000  # pandas ns -> us
            if prev_t is not None and t_us > prev_t:
                expect[(uid, row.ts)] = round(
                    (row.value - prev_v) / ((t_us - prev_t) / 1e6), 6
                ) + 0.0
            prev_t, prev_v = t_us, row.value
    got = {
        (r.user_id, pd.Timestamp(r.ts)): r.deriv_per_sec
        for r in A.q_derivative(spark, SF).collect()
    }
    assert got.keys() == expect.keys()
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9, (k, got[k], expect[k])


def test_read_api_quantiles_and_anomaly_modes(spark):
    """The facade's new modes must equal their standalone operators'
    semantics on the events table (columns renamed through the
    series_col parameter)."""
    from datapoints_csv_extractor_spark.operators.relational import load
    from datapoints_csv_extractor_spark.plans.read_api import read_datapoints

    ev = load(spark, SF, "events").select("user_id", "ts", "value")

    qrows = read_datapoints(
        ev, mode="quantiles", granularity="month", series_col="user_id"
    ).collect()
    assert qrows
    for r in qrows:
        assert r["p50_est"] <= r["p95_est"] <= r["p99_est"]
        assert r["n_points"] > 0

    arows = read_datapoints(
        ev, mode="anomaly", series_col="user_id"
    ).collect()
    assert arows
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_anomaly_zscore,
    )

    base = q_anomaly_zscore(spark, SF).collect()
    assert {(r["user_id"], r["ts"], r["zscore"]) for r in arows} == {
        (r["user_id"], r["ts"], r["zscore"]) for r in base
    }


def test_session_window_scalable_boundary_cases(spark):
    """The two-phase sessionizer must repair every chunk-boundary
    split: sessions crossing one boundary, continuous activity
    spanning many chunks, an exact-gap tie (<= merges, matching the
    oracle), and independence of unrelated users."""
    import datetime as dt

    from datapoints_csv_extractor_spark.operators.analytic import (
        session_window_scalable,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = []
    # user 1: events every 20 min for 5 hours -> ONE session spanning
    # 5 hourly chunks (the continuous-chain case).
    rows += [(1, at(20 * i), 1.0) for i in range(16)]  # 0..300 min
    # user 2: one event just before an hour boundary, one just after
    # (gap 10 min) -> one session; then a 31-min gap -> new session.
    rows += [(2, at(55), 2.0), (2, at(65), 2.0), (2, at(96), 2.0)]
    # user 3: exact 30-min gap -> MERGES (oracle's <= semantics).
    rows += [(3, at(0), 3.0), (3, at(30), 3.0)]
    # user 4: exact 30-min-plus-one-second gap -> splits.
    rows += [(4, at(0), 4.0), (4, at(0) + dt.timedelta(minutes=30, seconds=1), 4.0)]
    ev = spark.createDataFrame(
        [(u, t, v) for u, t, v in rows], "user_id long, ts timestamp, value double"
    )
    out = {
        (r.user_id, r.session_start): r
        for r in session_window_scalable(ev).collect()
    }
    per_user: dict[int, list] = {}
    for (u, _), r in sorted(out.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        per_user.setdefault(u, []).append(r)

    assert len(per_user[1]) == 1
    s = per_user[1][0]
    assert s.session_start == at(0) and s.n_events == 16
    assert s.session_end == at(300) + dt.timedelta(minutes=30)

    assert len(per_user[2]) == 2
    assert per_user[2][0].n_events == 2  # 55+65 merged across boundary
    assert per_user[2][1].session_start == at(96)

    assert len(per_user[3]) == 1 and per_user[3][0].n_events == 2
    assert len(per_user[4]) == 2

    # Equivalence against the oracle-backed single-window form on the
    # shared testdata (both are driver-registered; both hash-match the
    # same DuckDB oracle — spot-check the frames agree here too).
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_session_window,
        q_session_window_scalable,
    )

    a = {
        tuple(r)
        for r in q_session_window(spark, "/root/testdata/sf0.001").collect()
    }
    b = {
        tuple(r)
        for r in q_session_window_scalable(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert a == b


def test_asof_join_scalable_carry_cases(spark):
    """The carry-pattern as-of join must resolve purchases at ANY
    distance back (not just the adjacent chunk), prefer a same-chunk
    purchase over the carry, exclude clicks before any purchase, and
    include same-timestamp purchases (at-or-before)."""
    import datetime as dt

    from datapoints_csv_extractor_spark.operators.relational import (
        asof_join_scalable,
    )

    d0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def day(n, h=12):
        return dt.datetime(2024, 1, 1 + n, h, 0, 0)

    rows = [
        # user 1: purchase day 0; clicks day 3 and day 9 both resolve
        # to it across multi-day gaps (no purchases in between).
        (100, day(0), 1, "purchase", 10.0),
        (101, day(3), 1, "click", 0.0),
        (102, day(9), 1, "click", 0.0),
        # user 2: purchase day 0, purchase day 5 morning, click day 5
        # afternoon -> same-chunk purchase wins over the carry.
        (200, day(0), 2, "purchase", 20.0),
        (201, day(5, 9), 2, "purchase", 25.0),
        (202, day(5, 15), 2, "click", 0.0),
        # user 3: click BEFORE any purchase -> excluded.
        (300, day(0), 3, "click", 0.0),
        (301, day(1), 3, "purchase", 30.0),
        # user 4: purchase and click at the SAME timestamp -> included
        # (at-or-before, matching DuckDB ASOF >=).
        (400, day(2), 4, "purchase", 40.0),
        (401, day(2), 4, "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    got = {r.event_id: r for r in asof_join_scalable(ev).collect()}
    assert set(got) == {101, 102, 202, 401}
    assert got[101].purchase_value == 10.0 and got[102].purchase_value == 10.0
    assert got[202].purchase_value == 25.0  # same-chunk beats carry
    assert got[401].purchase_value == 40.0  # same-ts purchase counts

    # Whole-table equivalence with the single-window form.
    from datapoints_csv_extractor_spark.operators.relational import (
        q_asof_join,
        q_asof_join_scalable,
    )

    a = {tuple(r) for r in q_asof_join(spark, "/root/testdata/sf0.001").collect()}
    b = {
        tuple(r)
        for r in q_asof_join_scalable(spark, "/root/testdata/sf0.001").collect()
    }
    assert a == b


def test_scalable_twins_match_python_model_on_random_data(spark):
    """One seeded random event set, three-way agreement: the
    two-phase sessionizer and carry as-of join must match a pure
    Python reference model exactly — boundary placement is random
    here, so chunk-repair bugs that hand-picked cases miss would
    surface as any row diff."""
    import datetime as dt
    import random

    from datapoints_csv_extractor_spark.operators.analytic import (
        session_window_scalable,
    )
    from datapoints_csv_extractor_spark.operators.relational import (
        asof_join_scalable,
    )

    rng = random.Random(99)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(60):
        t = rng.uniform(0, 600)
        for _ in range(rng.randint(1, 40)):
            t += rng.choice([rng.uniform(0.1, 25), rng.uniform(35, 4000)])
            rows.append(
                (
                    eid,
                    t0 + dt.timedelta(minutes=t),
                    u,
                    rng.choice(["click", "purchase", "view"]),
                    round(rng.uniform(0, 100), 2),
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )

    # Python session model (<= 30 min merges).
    gap = dt.timedelta(minutes=30)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r[2], []).append(r)
    want_sessions = set()
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r[1])
        cur = [rs[0]]
        for r in rs[1:]:
            if r[1] <= cur[-1][1] + gap:
                cur.append(r)
            else:
                want_sessions.add(
                    (u, cur[0][1], cur[-1][1] + gap, len(cur),
                     round(sum(x[4] for x in cur), 2))
                )
                cur = [r]
        want_sessions.add(
            (u, cur[0][1], cur[-1][1] + gap, len(cur),
             round(sum(x[4] for x in cur), 2))
        )
    got_sessions = {tuple(r) for r in session_window_scalable(ev).collect()}
    assert got_sessions == want_sessions

    # Python as-of model (latest purchase at-or-before each click).
    want_asof = set()
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r[1])
        last_p = None
        for r in rs:
            if r[3] == "purchase":
                last_p = r
            elif r[3] == "click" and last_p is not None:
                want_asof.add((r[0], u, r[1], last_p[1], last_p[4]))
    got_asof = {tuple(r) for r in asof_join_scalable(ev).collect()}
    assert got_asof == want_asof


def test_holt_forecast_matches_python_replica(spark):
    """The JVM fold must replay the textbook Holt recurrence exactly
    (level/trend seeded from the first point, alpha=.5 beta=.3)."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_holt_forecast,
    )

    rows = {r.event_type: r for r in q_holt_forecast(spark, SF).collect()}
    ev = sorted(
        (
            (r.event_type, r.ts, r.event_id, float(r.value))
            for r in spark.read.parquet(f"{SF}/events.parquet").collect()
        ),
    )
    series: dict = {}
    for et, ts, eid, v in ev:
        series.setdefault(et, []).append(v)
    for et, vals in series.items():
        level, trend = vals[0], 0.0
        for v in vals[1:]:
            nl = 0.5 * v + 0.5 * (level + trend)
            trend = 0.3 * (nl - level) + 0.7 * trend
            level = nl
        r = rows[et]
        assert r.n_points == len(vals)
        assert abs(r.level - round(level, 4)) < 1e-9, et
        assert abs(r.trend - round(trend, 6)) < 1e-9, et
        assert abs(r.forecast_h24 - round(level + 24.0 * trend, 4)) < 1e-9


def test_cusum_changepoint_matches_python_replica(spark):
    """The CUSUM fold must replay the two-sided Page recurrence with
    alarm reset exactly (slack k=25, threshold h=200, mean from exact
    centi-unit sums)."""
    import math

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_cusum_changepoint,
    )

    rows = {
        r.event_type: r for r in q_cusum_changepoint(spark, SF).collect()
    }
    ev = sorted(
        (r.event_type, r.ts, r.event_id, float(r.value))
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    )
    series: dict = {}
    for et, _ts, _eid, v in ev:
        series.setdefault(et, []).append(v)
    assert set(rows) == set(series)
    for et, vals in series.items():
        mean = (
            sum(int(math.floor(v * 100.0 + 0.5)) for v in vals)
            / 100.0
            / len(vals)
        )
        sp = sn = msp = msn = 0.0
        alarms, first = 0, 0
        for i, x in enumerate(vals):
            sp = max(0.0, sp + (x - mean) - 25.0)
            sn = max(0.0, sn + (mean - x) - 25.0)
            msp, msn = max(msp, sp), max(msn, sn)
            if sp > 200.0 or sn > 200.0:
                alarms += 1
                if first == 0:
                    first = i + 1
                sp = sn = 0.0
        r = rows[et]
        assert r.n_points == len(vals)
        assert r.n_alarms == alarms, et
        assert r.first_alarm_i == first, et
        assert abs(r.mean_value - round(mean, 4)) < 1e-9
        assert abs(r.max_cusum_pos - round(msp, 4)) < 1e-9
        assert abs(r.max_cusum_neg - round(msn, 4)) < 1e-9


def test_cusum_fires_on_planted_level_shift(spark):
    """A flat series with a mid-stream level shift must alarm shortly
    after the shift and never before it."""
    from datetime import datetime, timedelta

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_cusum_changepoint,
    )
    import tempfile

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "flat",
         50.0 if i < 100 else 120.0, "{}")
        for i in range(200)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet", mode="overwrite")
        out = q_cusum_changepoint(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    # The global mean splits the difference (~85), so the LOW segment
    # drifts the negative accumulator at ~10/step: first alarm near
    # step 20. The HIGH segment then drives the positive side past h
    # — both tails must fire on a genuine level shift.
    assert r.n_alarms >= 2
    assert 15 <= r.first_alarm_i <= 30
    assert r.max_cusum_pos > 200.0
    assert r.max_cusum_neg > 200.0


def test_attribution_credit_invariants(spark):
    """Each touched conversion hands out exactly one first-touch and
    one last-touch credit, and linear credit totals the touched
    conversion count up to the documented floor(1e6/n) bias."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_attribution_credit,
    )

    rows = q_attribution_credit(spark, SF).collect()
    assert rows, "no attribution rows at sf0.001"
    total_first = sum(r.first_touch for r in rows)
    total_last = sum(r.last_touch for r in rows)
    assert total_first == total_last
    total_linear = sum(r.linear_credit for r in rows)
    # floor bias removes < n/1e6 per conversion — far below 1%.
    assert total_first * 0.99 <= total_linear <= total_first + 1e-6


def test_attribution_credit_planted_scenario(spark):
    """Hand-built journey: user 1 touches click(t1), view(t2),
    click(t3) then purchases; user 2 views once outside the 7-day
    lookback (no credit)."""
    from datetime import datetime, timedelta
    import tempfile

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_attribution_credit,
    )

    t0 = datetime(2024, 6, 10, 12, 0)
    rows = [
        (1, t0 + timedelta(hours=1), 1, "click", 1.0, "{}"),
        (2, t0 + timedelta(hours=2), 1, "view", 1.0, "{}"),
        (3, t0 + timedelta(hours=3), 1, "click", 1.0, "{}"),
        (4, t0 + timedelta(hours=4), 1, "purchase", 9.0, "{}"),
        (5, t0 - timedelta(days=9), 2, "view", 1.0, "{}"),
        (6, t0, 2, "purchase", 5.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet", mode="overwrite")
        got = {
            r.channel: r
            for r in q_attribution_credit(spark, d).collect()
        }
    assert set(got) == {"click", "view"}
    # click is both first (t1) and last (t3) touch; view is neither.
    assert got["click"].first_touch == 1
    assert got["click"].last_touch == 1
    assert got["view"].first_touch == 0
    assert got["view"].last_touch == 0
    assert got["click"].linear_credit == round(2 * 333333 / 1e6, 4)
    assert got["view"].linear_credit == round(333333 / 1e6, 4)
    # user 2's stale view earns nothing anywhere.
    assert got["view"].n_conversions == 1


def test_holt_winters_matches_python_replica(spark):
    """The triple-smoothing fold (level/trend/24-slot seasonal,
    hour-of-day indexed) must replay the textbook additive recurrence
    exactly, including the deterministic all-zero seasonal seed."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_holt_winters,
    )

    got = {}
    for r in q_holt_winters(spark, SF).collect():
        got.setdefault(r.event_type, {})[r.hour] = r
    ev = sorted(
        (r.event_type, r.ts, r.event_id, float(r.value), r.ts.hour)
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    )
    series: dict = {}
    for et, _ts, _eid, v, h in ev:
        series.setdefault(et, []).append((v, h))
    a, b, g = 0.3, 0.1, 0.2
    om_a, om_b, om_g = (
        float(repr(1.0 - a)), float(repr(1.0 - b)), float(repr(1.0 - g)),
    )
    for et, pts in series.items():
        level, trend, seasonal = pts[0][0], 0.0, [0.0] * 24
        for v, h in pts[1:]:
            elem = seasonal[h]
            nl = a * (v - elem) + om_a * (level + trend)
            trend = b * (nl - level) + om_b * trend
            seasonal[h] = g * (v - nl) + om_g * elem
            level = nl
        for h in range(24):
            r = got[et][h]
            assert r.n_points == len(pts)
            assert abs(r.level - round(level, 4)) < 1e-9, (et, h)
            assert abs(r.trend - round(trend, 6)) < 1e-9
            assert abs(r.seasonal_index - round(seasonal[h], 4)) < 1e-9


def test_holt_winters_learns_planted_diurnal_pattern(spark):
    """An hourly series with value = 100 + 30 at noon / -30 at
    midnight must end with positive noon and negative midnight
    seasonal indexes."""
    from datetime import datetime, timedelta
    import math
    import tempfile

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_holt_winters,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(24 * 30):
        ts = t0 + timedelta(hours=i)
        v = 100.0 + 30.0 * math.cos((ts.hour - 12) / 24.0 * 2 * math.pi)
        rows.append((i, ts, 1, "diurnal", v, "{}"))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet", mode="overwrite")
        out = {r.hour: r for r in q_holt_winters(spark, d).collect()}
    assert out[12].seasonal_index > 15.0
    assert out[0].seasonal_index < -15.0
    # level should sit near the 100 baseline once seasonality is
    # absorbed (wide tolerance: additive HW splits slowly from a
    # zero-seed seasonal state).
    assert 70.0 < out[0].level < 130.0


def test_series_ols_trend_recovers_planted_line(spark):
    """A perfectly linear series must recover its slope and intercept
    exactly (centi-unit grid) with r2 = 1."""
    from datetime import datetime, timedelta
    import tempfile

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_series_ols_trend,
    )

    t0 = datetime(2024, 3, 1)
    rows = [
        (i, t0 + timedelta(hours=i), 1, "lin", 10.0 + 2.4 * i, "{}")
        for i in range(100)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet", mode="overwrite")
        r = q_series_ols_trend(spark, d).collect()[0]
    # 2.4 per hour = 57.6 per day; intercept at the series start.
    assert r.n_points == 100
    assert abs(r.slope_per_day - 57.6) < 1e-6
    assert abs(r.intercept - 10.0) < 1e-4
    assert r.r2 == 1.0


def test_series_ols_trend_matches_numpy(spark):
    """Sufficient-statistic OLS on the real testdata must agree with
    numpy polyfit on the same centi-rounded series."""
    import numpy as np

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_series_ols_trend,
    )

    got = {r.event_type: r for r in q_series_ols_trend(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    series: dict = {}
    for r in ev:
        series.setdefault(r.event_type, []).append(
            (int(r.ts.timestamp()), float(r.value))
        )
    for et, pts in series.items():
        xs = np.array([p[0] for p in pts], dtype=np.float64)
        xs -= xs.min()
        ys = np.array(
            [np.floor(p[1] * 100.0 + 0.5) / 100.0 for p in pts]
        )
        slope, intercept = np.polyfit(xs, ys, 1)
        r = got[et]
        assert abs(r.slope_per_day - slope * 86400.0) < 1e-4, et
        assert abs(r.intercept - intercept) < 1e-2, et
        assert 0.0 <= r.r2 <= 1.0


def test_ab_test_welch_matches_python_replica(spark):
    """Per-arm exact sums -> Welch t/dof must equal a pure-Python
    computation over the same md5-coin assignment."""
    import hashlib
    import math

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_ab_test_welch,
    )

    got = {r.event_type: r for r in q_ab_test_welch(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    arms: dict = {}
    for r in ev:
        b = hashlib.md5(f"ab:{r.user_id}".encode()).hexdigest()[0] >= "8"
        y = int(math.floor(float(r.value) * 100.0 + 0.5))
        arms.setdefault(r.event_type, {"a": [], "b": []})[
            "b" if b else "a"
        ].append(y)
    for et, d in arms.items():
        na, nb = len(d["a"]), len(d["b"])
        sa, sb = sum(d["a"]), sum(d["b"])
        qa, qb = sum(y * y for y in d["a"]), sum(y * y for y in d["b"])
        ma, mb = sa / na / 100.0, sb / nb / 100.0
        va = (qa / 10000.0 - sa / 100.0 * sa / 100.0 / na) / (na - 1.0)
        vb = (qb / 10000.0 - sb / 100.0 * sb / 100.0 / nb) / (nb - 1.0)
        se2 = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se2)
        r = got[et]
        assert (r.n_a, r.n_b) == (na, nb), et
        assert abs(r.t_stat - round(t, 6)) < 1e-9, et
        assert r.significant_5pct == (abs(t) > 1.96)


def test_ab_test_welch_flags_planted_effect(spark):
    """Arm B shifted by +20 on a tight distribution must flag
    significant; identical arms must not."""
    import hashlib
    from datetime import datetime, timedelta
    import tempfile

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_ab_test_welch,
    )

    t0 = datetime(2024, 5, 1)
    rows = []
    for uid in range(400):
        in_b = hashlib.md5(f"ab:{uid}".encode()).hexdigest()[0] >= "8"
        base = 50.0 + (uid % 7)
        rows.append(
            (uid, t0 + timedelta(minutes=uid), uid, "shifted",
             base + (20.0 if in_b else 0.0), "{}")
        )
        rows.append(
            (10_000 + uid, t0 + timedelta(minutes=uid), uid, "flat",
             base, "{}")
        )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet", mode="overwrite")
        out = {r.event_type: r for r in q_ab_test_welch(spark, d).collect()}
    assert out["shifted"].significant_5pct
    assert abs(out["shifted"].mean_b - out["shifted"].mean_a - 20.0) < 1.0
    assert not out["flat"].significant_5pct


def test_forecast_backtest_matches_python_replica(spark):
    """Walk-forward Holt MAE + naive baseline must replay the exact
    sequential error accumulation."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_forecast_backtest,
    )

    got = {r.event_type: r for r in q_forecast_backtest(spark, SF).collect()}
    ev = sorted(
        (r.event_type, r.ts, r.event_id, float(r.value))
        for r in spark.read.parquet(f"{SF}/events.parquet").collect()
    )
    series: dict = {}
    for et, _ts, _eid, v in ev:
        series.setdefault(et, []).append(v)
    for et, vals in series.items():
        level, trend, prev = vals[0], 0.0, vals[0]
        esum = nsum = 0.0
        for v in vals[1:]:
            pred = level + trend
            esum += abs(v - pred)
            nsum += abs(v - prev)
            nl = 0.5 * v + 0.5 * pred
            trend = 0.3 * (nl - level) + 0.7 * trend
            level = nl
            prev = v
        r = got[et]
        assert r.n_points == len(vals)
        assert abs(r.mae_holt - round(esum / (len(vals) - 1), 4)) < 1e-9
        assert abs(r.mae_naive - round(nsum / (len(vals) - 1), 4)) < 1e-9
        assert abs(r.skill_vs_naive - round(1.0 - esum / nsum, 6)) < 1e-9


def test_forecast_backtest_skill_positive_on_trending_series(spark):
    """On a smooth trending series Holt must beat the naive baseline
    (positive skill); the random testdata should sit near zero."""
    from datetime import datetime, timedelta
    import tempfile

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_forecast_backtest,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(hours=i), 1, "trend", 100.0 + 3.0 * i, "{}")
        for i in range(200)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet", mode="overwrite")
        r = q_forecast_backtest(spark, d).collect()[0]
    # Naive lags a linear ramp by the full 3.0 step every point; Holt
    # learns the trend and closes most of that gap.
    assert r.mae_naive > 2.9
    assert r.mae_holt < r.mae_naive
    assert r.skill_vs_naive > 0.4


def test_markov_attribution_planted_journeys(spark):
    """Hand-solvable chain: 20 journeys a->b->CONV, 10 journeys
    z->b->NULL. First-order pooling gives P(CONV|b)=2/3 regardless of
    path, so p_full = 2/3; removing b kills every path (RE_b = 1);
    removing a drops P to (1/3)(2/3) = 2/9 (RE_a = 2/3); removing z
    sends z's START mass to NULL, P = 4/9 (RE_z = 1/3 — the standard
    removal-effect definition does NOT redistribute the removed
    channel's entry mass; a dead-end channel still 'carries' the
    journeys that started through it)."""
    from datetime import datetime, timedelta

    from datapoints_csv_extractor_spark.operators.analytic import (
        markov_attribution,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(u, i, typ):
        nonlocal eid
        rows.append((eid, t0 + timedelta(minutes=i), u, typ, 1.0, "{}"))
        eid += 1

    # 20 converting users: a -> b -> purchase
    for u in range(20):
        add(u, 0, "a"); add(u, 1, "b"); add(u, 2, "purchase")
    # 10 non-converting users: z -> b (journey dies)
    for u in range(100, 110):
        add(u, 0, "z"); add(u, 1, "b")
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    out = {r.channel: r for r in markov_attribution(ev).collect()}
    assert set(out) == {"a", "b", "z"}
    assert out["a"].p_conv_full == 0.666667
    assert out["b"].removal_effect == 1.0
    assert out["a"].removal_effect == 0.666667
    assert out["z"].removal_effect == 0.333333
    # shares normalize the effects: 2/3 : 1 : 1/3 -> 1/3 : 1/2 : 1/6
    assert out["a"].attribution_share == 0.333333
    assert out["b"].attribution_share == 0.5
    assert out["z"].attribution_share == 0.166667


def test_markov_attribution_matches_power_iteration_replica(spark):
    """On the real testdata the absorption solve must agree with an
    independent power-iteration replica of the same chain to 1e-9."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_markov_attribution,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    sf = "/root/testdata/sf0.001"
    got = {r.channel: r for r in q_markov_attribution(spark, sf).collect()}

    # Rebuild the transition counts independently (plain collect of
    # raw events, pure-Python journey walk).
    ev = (
        load(spark, sf, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.event_type)
    trans = {}

    def bump(a, b):
        trans.setdefault(a, {}).setdefault(b, 0)
        trans[a][b] += 1

    for types in by_user.values():
        prev = "START"
        for t in types:
            cur = "CONV" if t == "purchase" else t
            bump(prev, cur)
            prev = "START" if cur == "CONV" else cur
        if prev != "START":
            bump(prev, "NULL")

    def p_conv(removed):
        # power iteration: v[s] = P(absorb in CONV from s)
        states = [s for s in trans if s not in ("CONV", "NULL")]
        v = {s: 0.0 for s in states}
        for _ in range(4000):
            nv = {}
            for s in states:
                out = {
                    t: n for t, n in trans[s].items() if t != removed
                }
                tot = sum(trans[s].values())
                acc = 0.0
                for t, n in out.items():
                    if t == "CONV":
                        acc += n / tot
                    elif t in v:
                        acc += n / tot * v[t]
                nv[s] = acc
            v = nv
        return v.get("START", 0.0)

    p_full = p_conv(None)
    assert abs(got[next(iter(got))].p_conv_full - round(p_full, 6)) <= 1e-6
    for c, r in got.items():
        want = 0.0 if p_full == 0 else max(1.0 - p_conv(c) / p_full, 0.0)
        assert abs(r.removal_effect - want) < 1e-6, (c, r.removal_effect, want)


def test_kaplan_meier_textbook_curve(spark):
    # Classic hand-computed curve: events at t=1,3,4 with censoring at
    # t=2,5. S(1) = 4/5; S(3) = 4/5 * 2/3; S(4) = that * 1/2. Censored
    # subjects leave the risk set but contribute no factor.
    from datapoints_csv_extractor_spark.operators.analytic import (
        kaplan_meier,
    )

    subj = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 1), (5, 0)],
        "duration long, event long",
    )
    rows = {r.t: r for r in kaplan_meier(subj).collect()}
    assert set(rows) == {1, 3, 4}
    assert rows[1].n_risk == 5 and rows[1].n_events == 1
    assert rows[1].survival == 0.8
    assert rows[3].n_risk == 3
    assert rows[3].survival == round(0.8 * (2 / 3), 6)
    assert rows[4].n_risk == 2
    assert rows[4].survival == round(0.8 * (2 / 3) * 0.5, 6)
    assert rows[1].censored == 0 and rows[3].censored == 0


def test_sprt_crosses_both_wald_bounds(spark):
    # Arm 0 succeeds every trial -> the LLR walk climbs ~0.2007/trial
    # and must accept H1 within 50 trials; arm 1 never succeeds ->
    # drifts down ~-0.05/trial and must accept H0 within 100. Early
    # looks stay 'continue'. Cumulative counts are exact integers.
    import math

    from datapoints_csv_extractor_spark.operators.analytic import (
        sprt_monitor,
    )

    rows = []
    for day in range(1, 5):
        for i in range(25):
            rows.append((0, day, True))
            rows.append((1, day, False))
    df = spark.createDataFrame(rows, "arm long, day long, success boolean")
    out = {(r.arm, r.day): r for r in sprt_monitor(df).collect()}
    c1 = math.log(0.22 / 0.18)
    assert out[(0, 1)].cum_n == 25 and out[(0, 1)].cum_k == 25
    assert out[(0, 1)].llr == round(25 * c1, 6)
    assert out[(0, 1)].verdict == "accept_h1"  # 25*0.2007 > 2.77
    assert out[(1, 1)].verdict == "continue"  # 25*-0.05 > -1.558
    assert out[(1, 2)].verdict == "accept_h0"  # 50*-0.05 < -1.558
    assert out[(0, 4)].cum_n == 100


def test_benford_flags_uniform_but_passes_benford_data(spark):
    # 10^u for uniform-ish u is Benford-distributed (multiplicative
    # growth) -> must NOT deviate; uniform [10, 99) values start with
    # every digit equally -> must deviate. Digit extraction and the
    # chi-square verdict are pinned on both.
    from datapoints_csv_extractor_spark.operators.analytic import (
        benford_audit,
    )
    from pyspark.sql import functions as F

    n = 5000
    base = spark.range(n)
    benford = base.select(
        F.pow(F.lit(10.0), (F.col("id") % 1000).cast("double") / 1000.0
              + 1.0).alias("v")
    )
    out = benford_audit(benford, F.col("v")).collect()
    assert [r.digit for r in out] == list(range(1, 10))
    assert not out[0].deviates, out[0].chi2
    uniform = base.select(
        (F.lit(10.0) + (F.col("id") % 89).cast("double")).alias("v")
    )
    out_u = benford_audit(uniform, F.col("v")).collect()
    assert out_u[0].deviates, out_u[0].chi2
    assert sum(r.n_obs for r in out_u) == n


def test_hbos_scores_jointly_rare_point_highest(spark, tmp_path):
    # A point that is rare on EVERY feature must outscore points rare
    # on only one; the flag fires at the exact p99. Closed-form check
    # of one score from the histogram counts.
    import math

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_hbos_outliers,
    )

    rows = []
    eid = 0
    for i in range(99):
        rows.append((eid, "2024-01-01 10:00:00", 3, "click", 50.0, "{}"))
        eid += 1
    # the planted outlier: unique hour, unique type, extreme value
    rows.append((eid, "2024-01-01 03:00:00", 7, "error", 999.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q_hbos_outliers(spark, str(tmp_path)).collect()
    byid = {r.event_id: r for r in out}
    top = max(out, key=lambda r: r.hbos)
    assert top.event_id == 99 and top.is_outlier
    assert not byid[0].is_outlier
    # closed form: every feature of the outlier has count 1 of 100
    expect = 3 * round(-math.log10(1 / 100), 6)
    assert abs(byid[99].hbos - expect) < 1e-6


def test_stratified_ate_removes_planted_confounding(spark):
    # Simpson's-paradox construction: within EVERY stratum treatment
    # lifts the rate by exactly +0.1, but treated rows concentrate in
    # the low-baseline stratum, so the naive contrast is far from
    # +0.1 (here it is negative). The stratified ATE must recover 0.1
    # exactly; the naive column must show the bias.
    from datapoints_csv_extractor_spark.operators.analytic import (
        stratified_ate,
    )

    rows = []
    # stratum 0: baseline 0.1 -> treated 0.2; 200 treated, 20 control
    # stratum 1: baseline 0.6 -> treated 0.7; 20 treated, 200 control
    def add(stratum, treated, rate, n):
        k = int(rate * n)
        for i in range(n):
            rows.append((treated, i < k, stratum))

    add(0, True, 0.2, 200)
    add(0, False, 0.1, 20)
    add(1, True, 0.7, 20)
    add(1, False, 0.6, 200)
    df = spark.createDataFrame(rows, "treated boolean, y boolean, stratum int")
    out = stratified_ate(df).collect()
    assert len(out) == 2
    assert out[0].diff == 0.1 and out[1].diff == 0.1
    # weights 220/440 each -> ate = 0.1 exactly
    assert abs(out[0].ate - 0.1) < 1e-9
    assert out[0].naive_diff < 0  # the planted Simpson reversal


def test_conformal_coverage_holds_on_exchangeable_data(spark):
    # On exchangeable data the split-conformal guarantee must hold:
    # test coverage >= ~(1 - alpha) minus finite-sample slack. The
    # events slice at sf0.01 is hash-split into thirds, so this is a
    # real finite-sample check, not a tautology.
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_conformal_interval,
    )

    rows = q_conformal_interval(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 24
    r = rows[0]
    assert r.target_coverage == 0.9
    assert r.test_coverage >= 0.85, r.test_coverage
    assert r.q_alpha > 0
    assert r.n_train + 0 > 0 and r.n_calib > 0 and r.n_test > 0
    # all rows carry the same dataset-level interval and coverage
    assert len({x.q_alpha for x in rows}) == 1


def test_mde_power_closed_form_and_monotonicity(spark, tmp_path):
    # Closed form: equal arms of 5000 at p=0.5 give
    # mde = 2.8016 * sqrt(0.25 * (2/5000)); and more samples must
    # shrink the MDE.
    import math

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_mde_power,
    )

    rows = []
    eid = 0
    for n, typ in ((10000, "big"), (400, "small")):
        for i in range(n):
            rows.append(
                (eid, "2024-01-01 10:00:00", i, typ, 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in q_mde_power(spark, str(tmp_path)).collect()}
    big = out["big"]
    assert big.n1 == 5000 and big.n0 == 5000
    p = 10000 / 10400
    expect = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
        p * (1 - p) * (2 / 5000)
    )
    assert big.mde_abs == round(expect, 6)
    assert out["small"].mde_abs > big.mde_abs


def test_chi2_independence_planted_association(spark, tmp_path):
    # Perfectly dependent construction (each type occurs in exactly
    # one band) must give V = 1; a perfectly balanced table must give
    # chi2 = 0 and no association flag.
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_chi2_independence,
    )

    def write(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn(
            "ts", __import__("pyspark").sql.functions.to_timestamp("ts")
        ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    dep = []
    eid = 0
    for typ, hour in (("a", 1), ("b", 7), ("c", 13)):
        for i in range(50):
            dep.append((eid, f"2024-01-01 {hour:02d}:00:00", i, typ, 1.0, "{}"))
            eid += 1
    write(dep)
    out = q_chi2_independence(spark, str(tmp_path)).collect()
    assert out[0].cramers_v == 1.0 and out[0].associated

    bal = []
    eid = 0
    for typ in ("a", "b"):
        for hour in (1, 7):
            for i in range(50):
                bal.append(
                    (eid, f"2024-01-01 {hour:02d}:00:00", i, typ, 1.0, "{}")
                )
                eid += 1
    write(bal)
    out = q_chi2_independence(spark, str(tmp_path)).collect()
    assert out[0].chi2 == 0.0 and not out[0].associated


def test_peak_and_theil_sen_planted_signals(spark, tmp_path):
    # A flat series with one 5x spike day: the spike (and only the
    # spike) must flag as a peak, and the Theil-Sen slope must stay ~0
    # while an OLS-style mean of slopes would be dragged. A genuinely
    # trending series must yield the planted slope exactly (all
    # pairwise slopes equal -> median equals it).
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_peak_detection,
        q_theil_sen_trend,
    )

    rows = []
    eid = 0
    for d in range(1, 21):
        v = 500.0 if d == 10 else 100.0
        rows.append((eid, f"2024-01-{d:02d} 12:00:00", 1, "spiky", v, "{}"))
        eid += 1
    for d in range(1, 21):
        rows.append(
            (eid, f"2024-01-{d:02d} 12:00:00", 1, "trend", 10.0 * d, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    peaks = [
        r
        for r in q_peak_detection(spark, str(tmp_path)).collect()
        if r.event_type == "spiky" and r.is_peak
    ]
    assert [str(r.day) for r in peaks] == ["2024-01-10"]
    ts = {
        r.event_type: r for r in q_theil_sen_trend(spark, str(tmp_path)).collect()
    }
    assert ts["spiky"].theil_sen_slope == 0.0
    assert ts["trend"].theil_sen_slope == 10.0
    assert ts["trend"].n_pairs == 190


def test_logrank_separates_planted_fast_and_slow_arms(spark, tmp_path):
    # Arm 1 customers reorder after ~5 days, arm 0 after ~50; the
    # test must flag the curves as different. Identical arms must NOT
    # flag (chi2 ~ 0 by symmetry of the construction).
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_logrank_test,
    )

    def build(separated):
        orders, custs = [], []
        ok = 0
        for cid in range(200):
            arm = cid % 2
            custs.append(
                (cid, "MACHINERY" if arm else "BUILDING")
            )
            gap = (5 if arm else 50) if separated else 20
            gap += cid % 3  # within-arm variation
            orders.append((ok, cid, "2024-01-01"))
            ok += 1
            orders.append((ok, cid, f"2024-{1 + gap // 28:02d}-{1 + gap % 28:02d}"))
            ok += 1
        spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long, o_orderdate string"
        ).selectExpr(
            "o_orderkey", "o_custkey", "CAST(o_orderdate AS DATE) o_orderdate"
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        spark.createDataFrame(
            custs, "c_custkey long, c_mktsegment string"
        ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    build(True)
    r = q_logrank_test(spark, str(tmp_path)).collect()[0]
    assert r.curves_differ, r
    assert r.o1 == 100  # every arm-1 subject is an observed event
    build(False)
    r = q_logrank_test(spark, str(tmp_path)).collect()[0]
    assert not r.curves_differ, r


def test_winsorized_trimmed_means_tame_a_planted_outlier(spark, tmp_path):
    # 99 values of 10.00 plus one of 100000.00: the raw mean is
    # dragged to ~1009.9, while the winsorized mean clips the outlier
    # to p95 and the trimmed mean drops it entirely (back to 10.0).
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_winsorized_stats,
    )

    rows = []
    for i in range(99):
        rows.append((i, "2024-01-01 10:00:00", i, "steady", 10.0, "{}"))
    rows.append((99, "2024-01-01 11:00:00", 99, "steady", 100000.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = q_winsorized_stats(spark, str(tmp_path)).collect()[0]
    assert r.raw_mean > 1000
    assert r.trimmed_mean == 10.0
    assert r.winsorized_mean < r.raw_mean / 10
    assert r.n_kept == 99 and r.n == 100


def _write_two_sample_events(spark, tmp_path, b_vals):
    """Events table with 200 'click' values 0..199 and 200 'purchase'
    values from b_vals."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(200):
        rows.append((i, "2024-01-01 10:00:00", i, "click",
                     float(i), "{}"))
    for j, v in enumerate(b_vals):
        rows.append((1000 + j, "2024-01-01 11:00:00", j, "purchase",
                     float(v), "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_ks_and_mannwhitney_reject_a_planted_shift(spark, tmp_path):
    """A +100 location shift on one arm must reject under both tests;
    and the KS statistic has the closed form D = 0.5 for two
    half-overlapping uniform supports (0..199 vs 100..299: the CDFs
    differ most at x=99.5 where F_a = 0.5, F_b = 0)."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_ks_test,
        q_mannwhitney_u,
    )

    _write_two_sample_events(
        spark, tmp_path, [100 + i for i in range(200)]
    )
    ks = q_ks_test(spark, str(tmp_path)).collect()[0]
    assert ks.n_a == 200 and ks.n_b == 200
    assert ks.ks_d == 0.5
    assert ks.reject_h0 is True
    mw = q_mannwhitney_u(spark, str(tmp_path)).collect()[0]
    # Closed form: overlap region ties pairwise half-wins —
    # U1 counts pairs (a < b) + ties/2; here exactly 200*200 minus
    # the 100-choose-2-ish dominated block; assert direction + flag.
    assert mw.z_score < -1.96
    assert mw.reject_h0 is True


def test_ks_and_mannwhitney_accept_identical_samples(spark, tmp_path):
    """Identical samples: D = 0 exactly, U = n1*n2/2 exactly (every
    cross pair is a tie at midrank), z = 0 — neither test rejects."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_ks_test,
        q_mannwhitney_u,
    )

    _write_two_sample_events(spark, tmp_path, list(range(200)))
    ks = q_ks_test(spark, str(tmp_path)).collect()[0]
    assert ks.ks_d == 0.0
    assert ks.reject_h0 is False
    mw = q_mannwhitney_u(spark, str(tmp_path)).collect()[0]
    assert mw.u_stat == 200 * 200 / 2.0
    assert mw.z_score == 0.0
    assert mw.reject_h0 is False


def test_bradley_terry_recovers_a_planted_total_order(spark, tmp_path):
    """Users whose spend always ranks gold > silver > bronze must
    yield strictly ordered strengths, a clean sweep for gold's wins,
    and strengths summing to ~1."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_bradley_terry,
    )

    rows = []
    eid = 0
    for u in range(40):
        for t, v in (("gold", 30.0), ("silver", 20.0), ("bronze", 10.0)):
            rows.append(
                (eid, "2024-01-01 10:00:00", u, t, v + (u % 3), "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", __import__("pyspark").sql.functions.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q_bradley_terry(spark, str(tmp_path)).collect()
    by = {r.item: r for r in out}
    assert by["gold"].wins == 80  # beats both, 40 users each
    assert by["bronze"].wins == 0
    assert (
        by["gold"].strength > by["silver"].strength > by["bronze"].strength
    )
    assert abs(sum(r.strength for r in out) - 1.0) < 1e-4
    assert [r.item for r in out] == ["gold", "silver", "bronze"]


def test_cuped_strips_planted_preperiod_variance(spark, tmp_path):
    """Post = pre + small arm effect: theta ~ 1, rho^2 near 1, and
    the CUPED-adjusted arm means preserve the planted lift while the
    variance-reduction readout is large."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_cuped,
    )

    rows = []
    eid = 0
    for u in range(200):
        base = 10.0 + (u % 50)  # big between-user spread
        rows.append((eid, "2024-01-05 10:00:00", u, "click", base, "{}"))
        eid += 1
        arm_b = None  # arm comes from the md5 coin inside the operator
        rows.append(
            (eid, "2024-01-20 10:00:00", u, "click", base + 1.0, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.arm: r for r in q_cuped(spark, str(tmp_path)).collect()}
    assert set(out) == {"A", "B"}
    r = out["A"]
    # post = pre + 1 exactly -> cov = var -> theta = 1, rho^2 = 1.
    assert abs(r.theta - 1.0) < 1e-6
    assert abs(r.rho2 - 1.0) < 1e-6
    assert r.var_reduction_pct > 99.99
    # With theta = 1 the adjusted means collapse to mean(post - pre)
    # + grand mean(pre): both arms read the same adjusted value.
    assert abs(out["A"].mean_post_cuped - out["B"].mean_post_cuped) < 1e-9


def test_spearman_closed_forms(spark, tmp_path):
    """Perfect monotone (nonlinear) relation -> rho = 1 exactly;
    perfect inverse -> rho = -1; and a constant column yields no
    rank variance (rho NULL-guarded by the driver contract is not
    needed — we pin the +-1 cases)."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_spearman_corr,
    )

    def write(pairs):
        rows = []
        eid = 0
        for u, (x, y) in enumerate(pairs):
            rows.append((eid, "2024-01-01 10:00:00", u, "click",
                         float(x), "{}"))
            eid += 1
            rows.append((eid, "2024-01-01 11:00:00", u, "purchase",
                         float(y), "{}"))
            eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    # y = x^3-ish: monotone but wildly nonlinear — Spearman sees 1.
    write([(i, i * i * i % 97 + i * 1000) for i in range(60)])
    r = q_spearman_corr(spark, str(tmp_path)).collect()[0]
    assert r.n_users == 60
    assert r.spearman_rho == 1.0
    assert r.significant is True

    write([(i, 1000 - i) for i in range(60)])
    r = q_spearman_corr(spark, str(tmp_path)).collect()[0]
    assert r.spearman_rho == -1.0


def test_hill_tail_index_matches_python_replica(spark, tmp_path):
    """Pin the estimator against a pure-Python replica with the same
    cents/rounding arithmetic on a planted Pareto(alpha=1.5) sample —
    the estimate must land near 1.5 and flag infinite variance."""
    import math

    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_hill_tail_index,
    )

    # Deterministic Pareto(1.5): x = 100 * u^(-1/1.5) with a fixed
    # low-discrepancy u grid.
    vals = [100.0 * ((i + 0.5) / 5000.0) ** (-1.0 / 1.5)
            for i in range(5000)]
    rows = [(i, f"2024-01-{(i % 27) + 1:02d}", i, "O", v, 0)
            for i, v in enumerate(vals)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_custkey long,"
        " o_orderstatus string, o_totalprice double, o_shippriority int",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    k = 200
    cents = sorted(
        (math.floor(v * 100.0 + 0.5) for v in vals), reverse=True
    )[: k + 1]
    thr = cents[-1]
    terms = [round(math.log(c / thr), 6) for c in cents if c > thr]
    want = round(len(terms) / sum(terms), 6)

    r = q_hill_tail_index(spark, str(tmp_path), k=k).collect()[0]
    assert r.k_used == len(terms)
    assert abs(r.hill_alpha - want) < 1e-9
    assert 1.2 < r.hill_alpha < 1.8  # near the planted 1.5
    assert r.infinite_variance is True
