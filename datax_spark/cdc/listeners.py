"""Listener-backed metrics — DataX Communication counters on Spark's bus.

The reference aggregates per-channel counters into a Communication
snapshot each statistics window (``core/src/main/java/com/alibaba/datax/
core/statistics/communication/CommunicationTool.java:16-50``:
READ_SUCCEED_RECORDS, WRITE_RECEIVED_RECORDS, byteSpeed / recordSpeed,
WAIT_READER_TIME / WAIT_WRITER_TIME, percentage). Spark already meters
every micro-batch on the listener bus; this module maps
``StreamingQueryProgress`` onto those counter names so operators get the
familiar surface WITHOUT a second metering pass — the hand-rolled JSON
lineage rows (``pipeline.write_metrics``) stay the per-batch commit
audit, the listener is the live rates feed.

Counter mapping:
- READ_SUCCEED_RECORDS → ``numInputRows``. Spark meters SCANS, not
  admissions: a foreachBatch body that runs k actions over the batch
  source reports k× the admitted rows (the engine's CoW merge runs the
  full write pass plus one column-pruned stats pass → exactly 2× in
  rows, far less in bytes). The lineage rows (``pipeline.read_metrics``
  ``rows_in``) are the record-level truth; the listener value divided by
  the lineage value is the batch's scan factor — itself a useful
  plan-shape canary (a jump means someone added a pass over the source).
- recordSpeed → ``processedRowsPerSecond``
- WAIT_READER_TIME → source-side durations (``latestOffset`` +
  ``getBatch``)
- WAIT_WRITER_TIME → sink-side duration (``addBatch``)
"""

from __future__ import annotations

import threading

from pyspark.sql.streaming import StreamingQueryListener


class CommunicationListener(StreamingQueryListener):
    """Collects one Communication-shaped row per micro-batch."""

    def __init__(self):
        self._lock = threading.Lock()
        self.rows: list[dict] = []
        self.terminated: list[dict] = []

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        dur = p.durationMs or {}
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "read_succeed_records": int(p.numInputRows),
            "record_speed": float(p.processedRowsPerSecond or 0.0),
            "wait_reader_time_ms": int(dur.get("latestOffset", 0) or 0)
            + int(dur.get("getBatch", 0) or 0),
            "wait_writer_time_ms": int(dur.get("addBatch", 0) or 0),
            "batch_duration_ms": int(p.batchDuration or 0),
        }
        with self._lock:
            self.rows.append(row)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        with self._lock:
            self.terminated.append(
                {"query_id": str(event.id), "exception": event.exception}
            )

    # -- CommunicationTool.getTotal analog ---------------------------------
    def totals(self) -> dict:
        with self._lock:
            rows = list(self.rows)
        total_records = sum(r["read_succeed_records"] for r in rows)
        total_ms = sum(r["batch_duration_ms"] for r in rows)
        return {
            "total_read_records": total_records,
            "total_batches": len(rows),
            "record_speed": (total_records / (total_ms / 1000.0)) if total_ms else 0.0,
            "wait_reader_time_ms": sum(r["wait_reader_time_ms"] for r in rows),
            "wait_writer_time_ms": sum(r["wait_writer_time_ms"] for r in rows),
        }


def attach(spark) -> CommunicationListener:
    """Attach a fresh listener to the session's streaming bus; caller
    detaches with ``spark.streams.removeListener(listener)``."""
    listener = CommunicationListener()
    spark.streams.addListener(listener)
    return listener
