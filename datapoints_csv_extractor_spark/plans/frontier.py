"""Crawl frontier: the persisted seen-URL set.

A crawler's core state is "which normalized URLs have we already
fetched" — consulted for every discovered URL (sitemap entries,
extracted links) and appended to after every fetch batch. At crawl
scale the set is billions of rows, so both operations must touch
O(batch) state, never the full set:

- ``frontier_filter`` uses the merge store's point-lookup read
  (``read_store_for_keys``): bucket the batch's URLs, scan ONLY the
  bucket generations they hash into, left-anti join. Cost is
  O(batch + touched buckets), independent of frontier size.
- ``frontier_commit`` is one ``upsert_into_store`` delta: rewrite
  only the affected buckets' generations, commit a manifest.
  Latest-wins on the ingest id makes replaying a crashed batch
  idempotent (the same URLs merge into the same state).

Both directions inherit the store layer's snapshot isolation,
time travel, vacuum, and stats — a frontier is just a current-state
table keyed by URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.sinks.merge_store import (
    latest_version,
    read_store_for_keys,
    upsert_into_store,
)


def frontier_filter(
    spark: SparkSession, urls: DataFrame, store_path: str
) -> DataFrame:
    """URLs from ``urls`` (any frame with a ``url`` column; pass
    NORMALIZED urls — the store is exact-match) not yet in the
    frontier. An empty/absent store passes everything through."""
    if latest_version(store_path) is None:
        return urls
    seen = read_store_for_keys(
        spark, store_path, urls.select("url"), ["url"]
    ).select("url")
    return urls.join(seen, "url", "left_anti")


def frontier_commit(
    spark: SparkSession,
    urls: DataFrame,
    store_path: str,
    ingest_id: str,
) -> list[int]:
    """Record a fetched batch in the frontier; returns the rewritten
    bucket ids (the O(affected) unit of work). Replaying the same
    (urls, ingest_id) pair converges to identical state."""
    delta = (
        urls.select("url")
        .distinct()
        .withColumn("ingest_id", F.lit(ingest_id))
        .withColumn("deleted", F.lit(False))
    )
    return upsert_into_store(
        spark, delta, store_path, keys=["url"], version_cols=["ingest_id"]
    )
