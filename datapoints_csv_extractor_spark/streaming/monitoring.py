"""Operational metrics (C3 / A4 parity, monitoring.py:49-100).

The reference pushes Prometheus counters after each file and batch
(files started/finished/failed, datapoint totals, timing gauges).
Spark-first, the same signals come from TWO built-in channels — no
hand-rolled counters in the data path:

- ``IngestMetricsListener``: a ``StreamingQueryListener`` that turns
  every micro-batch's progress event (rows/sec, batch duration, state
  size) into a metrics record handed to a pluggable ``publish``
  callable (Prometheus pushgateway, StatsD, a log line — deployment
  concern, exactly like the reference's CollectorRegistry wiring).
- per-batch business counters (datapoints, series, new series) ride
  the write job itself via ``Observation`` (see streaming/live.py) —
  they cost zero extra scans.

The reference's gauges map as: files_started/finished -> batch
``numInputRows``/progress events; unprocessed_files -> source backlog
(``latestOffset - endOffset`` in progress); failed files -> the
quarantine counter in plans/pipeline metrics.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


class IngestMetricsListener(StreamingQueryListener):
    """Publishes one flat record per micro-batch progress event."""

    def __init__(self, publish: Callable[[dict], None] | None = None) -> None:
        self._publish = publish or (lambda rec: None)
        self.records: list[dict] = []

    def onQueryStarted(self, event) -> None:
        rec = {"event": "started", "id": str(event.id), "name": event.name}
        self.records.append(rec)
        self._publish(rec)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "event": "progress",
            "name": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs) if p.durationMs else {},
        }
        self.records.append(rec)
        self._publish(rec)

    def onQueryTerminated(self, event) -> None:
        rec = {
            "event": "terminated",
            "id": str(event.id),
            "exception": event.exception,
        }
        self.records.append(rec)
        self._publish(rec)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass


def log_publisher(logger) -> Callable[[dict], None]:
    """Publish metrics records as structured log lines (the in-container
    stand-in for the reference's Prometheus pushgateway at
    monitoring.py:96-100)."""

    def publish(rec: dict) -> None:
        logger.info("ingest_metrics %s", json.dumps(rec, default=str))

    return publish
