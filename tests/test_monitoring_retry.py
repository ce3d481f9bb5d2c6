"""S6 retry policy + C3 metrics listener."""

from __future__ import annotations

import pytest

from datapoints_csv_extractor_spark.sinks.catalog_store import (
    load_catalog_with_retry,
)
from datapoints_csv_extractor_spark.streaming.live import start_live_ingest
from datapoints_csv_extractor_spark.streaming.monitoring import (
    IngestMetricsListener,
)
from fixtures import write_tebis_csv


def test_load_catalog_with_retry_linear_backoff_then_exit(spark, tmp_path, monkeypatch):
    """A persistently broken store is retried max_attempts times with
    linear backoff then exits(1), mirroring csv_extractor.py:55-65."""
    sleeps: list[int] = []
    # A FILE (not directory) at the path makes the parquet read raise.
    broken = tmp_path / "catalog"
    broken.write_text("not parquet")

    with pytest.raises(SystemExit) as exc_info:
        load_catalog_with_retry(
            spark, broken, max_attempts=4, sleep=sleeps.append
        )
    assert exc_info.value.code == 1
    assert sleeps == [1, 2, 3]  # linear backoff, no sleep after last


def test_load_catalog_with_retry_succeeds_when_store_ok(spark, tmp_path):
    df = load_catalog_with_retry(spark, tmp_path / "absent", sleep=lambda s: None)
    assert df.count() == 0


def test_metrics_listener_captures_batch_progress(spark, tmp_path):
    folder = tmp_path / "in"
    folder.mkdir()
    write_tebis_csv(folder, file_ts=1550092560, n_series=2, n_rows=10, seed=3)

    listener = IngestMetricsListener()
    spark.streams.addListener(listener)
    try:
        q = start_live_ingest(
            spark, folder, tmp_path / "dp", tmp_path / "cat", tmp_path / "ckpt",
            available_now=True,
        )
        q.awaitTermination(120)
        # Listener delivery is asynchronous (separate event bus thread);
        # wait briefly for progress events to land.
        import time

        deadline = time.time() + 30
        while time.time() < deadline and not any(
            r["event"] == "progress" for r in listener.records
        ):
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)

    events = {r["event"] for r in listener.records}
    assert "started" in events and "progress" in events
    progress = [r for r in listener.records if r["event"] == "progress"]
    assert sum(r["num_input_rows"] for r in progress) > 0
    assert all("duration_ms" in r for r in progress)


def test_prometheus_exporter_exposition_format(tmp_path):
    """C3 parity: the exporter renders the reference's metric names
    (monitoring.py:49-80) in valid text exposition format and pushes
    through an injectable sender + textfile."""
    from datapoints_csv_extractor_spark.streaming.monitoring import (
        PrometheusExporter,
    )

    pushes: list[tuple[str, str]] = []
    textfile = tmp_path / "metrics.prom"
    exp = PrometheusExporter(
        live=True,
        project_name="proj1",
        sender=lambda job, body: pushes.append((job, body)),
        textfile=str(textfile),
    )
    exp.record_batch(
        {"files": 3, "datapoints": 1200, "series": 5, "new_series": 2,
         "deferred_unsettled": 1}
    )
    exp.record_batch({"files": 1, "datapoints": 300, "series": 4, "new_series": 0})
    exp.record_failure()
    exp.push()

    job, body = pushes[-1]
    assert job == "datapoints-csv-extractor"
    assert textfile.read_text() == body
    # Counters accumulate across batches; gauges hold the latest value.
    assert 'csv_live_posted_data_points_total{project_name="proj1"} 1500.0' in body
    assert 'csv_live_created_time_series_total{project_name="proj1"} 2.0' in body
    assert 'csv_live_failed_processing_files{project_name="proj1"} 1.0' in body
    assert 'csv_live_posted_time_series_count{project_name="proj1"} 4.0' in body
    assert 'csv_live_successfully_processed_files{project_name="proj1"} 1.0' in body
    # Exposition structure: every metric has HELP and TYPE lines.
    for line in body.splitlines():
        assert line.startswith(("# HELP csv_live_", "# TYPE csv_live_", "csv_live_"))
    assert "# TYPE csv_live_posted_data_points_total counter" in body
    assert "# TYPE csv_live_unprocessed_files gauge" in body

    # Historical mode swaps the namespace, like the reference.
    hist = PrometheusExporter(live=False, sender=lambda j, b: None)
    assert hist.render().startswith("# HELP csv_hist_")


def test_prometheus_exporter_push_never_raises():
    from datapoints_csv_extractor_spark.streaming.monitoring import (
        PrometheusExporter,
    )

    def broken_sender(job, body):
        raise ConnectionError("gateway down")

    exp = PrometheusExporter(sender=broken_sender)
    exp.push()  # must log, not raise (metrics never take down ingest)


def test_prometheus_label_escaping_and_row_gauge():
    """Exposition-spec escaping: quote/backslash/newline in the project
    label must render escaped; numInputRows feeds the rows gauge, not
    the file-count gauge (whose HELP text promises csv files)."""
    from datapoints_csv_extractor_spark.streaming.monitoring import (
        PrometheusExporter,
    )

    pushes: list[str] = []
    exp = PrometheusExporter(
        project_name='we"ird\\proj\nname',
        sender=lambda job, body: pushes.append(body),
    )
    exp.publish({"event": "progress", "num_input_rows": 7})
    body = pushes[-1]
    assert 'project_name="we\\"ird\\\\proj\\nname"' in body
    assert "\nname" not in body.split("# HELP")[0]  # no raw newline in labels
    for line in body.splitlines():
        assert line.startswith("#") or "{" in line  # every sample line parses
    assert 'input_rows_last_batch{project_name="we\\"ird\\\\proj\\nname"} 7.0' in body
    # available_csv_files untouched by row counts...
    assert 'available_csv_files{project_name="we\\"ird\\\\proj\\nname"} 0.0' in body
    # ...and fed only by a real file count.
    exp.record_batch({"files": 2, "available_files": 5})
    assert "available_csv_files" in exp.values
    assert exp.values["available_csv_files"] == 5.0
