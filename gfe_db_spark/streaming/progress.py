"""ST5: streaming heartbeat/progress (ref: the pipeline's CloudWatch
heartbeat + Step Functions execution events, `pipeline.asl.json` /
`invoke_pipeline/app.py` logging).

Spark-native form: a StreamingQueryListener that appends one NDJSON line
per micro-batch progress event — the same append-only, machine-readable
shape the reference emits, usable as a liveness probe (`tail -f`) or
ingested back as a table."""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressHeartbeat(StreamingQueryListener):
    """Append-only NDJSON heartbeat: one line per progress event with the
    fields a monitor needs (query id, batch, rows, duration, timestamp).
    Thread-safe append (listener callbacks arrive on a listener-bus
    thread); file I/O is driver-side by definition — listeners are a
    driver construct."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _append(self, doc: dict) -> None:
        with self._lock, open(self.path, "a") as fh:
            fh.write(json.dumps(doc) + "\n")

    def onQueryStarted(self, event) -> None:
        self._append({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._append(
            {
                "event": "progress",
                "id": str(p.id),
                "batch_id": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": (p.batchDuration if hasattr(p, "batchDuration") else None),
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        self._append({"event": "idle", "id": str(event.id)})

    def onQueryTerminated(self, event) -> None:
        self._append(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )


def attach_heartbeat(spark, path: str) -> ProgressHeartbeat:
    """Register a heartbeat listener on the session; returns it so callers
    can detach with `spark.streams.removeListener(hb)`."""
    hb = ProgressHeartbeat(path)
    spark.streams.addListener(hb)
    return hb
