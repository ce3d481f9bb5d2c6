"""Bucketed-table co-located join: the paid-once-shuffle-never story.

Two tables bucketed on external_id must sort-merge join with no
Exchange in the plan — at 100 TB this is the difference between a
full-table shuffle per join and a local merge per bucket.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datapoints_csv_extractor_spark.sinks.datapoints import write_datapoints_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    rows = [
        (f"s{i % 50}", f"n{i % 50}", 1_550_092_560_000 + i, float(i), "f", 0)
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows,
        "external_id string, name string, ts_ms long, value double, "
        "source_file string, file_ts long",
    )
    spark.sql("DROP TABLE IF EXISTS dp_a")
    spark.sql("DROP TABLE IF EXISTS dp_b")
    write_datapoints_bucketed(df, "dp_a", n_buckets=4, mode="overwrite")
    write_datapoints_bucketed(df, "dp_b", n_buckets=4, mode="overwrite")

    a = spark.table("dp_a").groupBy("external_id").agg(F.avg("value").alias("avg_a"))
    b = spark.table("dp_b").groupBy("external_id").agg(F.max("value").alias("max_b"))
    # Force the shuffle-join path (broadcast would hide bucketing).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "external_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 50
        # Aggregations themselves also reused the bucket distribution:
        # no exchange anywhere means groupBy ran bucket-local too.
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS dp_a")
        spark.sql("DROP TABLE IF EXISTS dp_b")
