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
