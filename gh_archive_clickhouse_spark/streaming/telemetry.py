"""Observability — the engine's version of the reference's metrics.

The reference exposes OTel counters/gauges (events_fetched_count,
fetch_miss, rate-limit gauges — cmd/gh-archived/main.go:30-37,218-267)
and a 3 s rows/s progress ticker (cmd/gh-load/main.go:270-300). Spark
equivalents, both driver-side and zero-overhead on executors:

- batch: the ``Observation`` API attaches named aggregates to a plan
  and reports them with the action — rows parsed vs dropped, bytes.
- streaming: a ``StreamingQueryListener`` receives per-batch progress
  (rows/s, batch duration, state size) — the progress ticker for free.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed_parse(parsed: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach ingest counters to a parsed (id, ts, raw) DataFrame.

    After an action runs, ``observation.get`` yields
    {rows, raw_bytes} — the events_fetched_count / bytes analog.
    """
    obs = Observation("ingest")
    observed = parsed.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.octet_length("raw")).alias("raw_bytes"),
    )
    return observed, obs


class ProgressLogger(StreamingQueryListener):
    """Logs one JSON line per micro-batch: rows/s in, batch duration —
    the reference's 3 s ticker, event-driven instead of polled."""

    def __init__(self, emit=print):
        self._emit = emit

    def onQueryStarted(self, event) -> None:
        self._emit(json.dumps({"event": "started", "id": str(event.id)}))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._emit(
            json.dumps(
                {
                    "event": "progress",
                    "batch": p.batchId,
                    "rows": p.numInputRows,
                    "rows_per_sec": p.processedRowsPerSecond,
                    "duration_ms": p.durationMs.get("triggerExecution"),
                }
            )
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._emit(json.dumps({"event": "terminated", "id": str(event.id)}))


class MetricsExporter(StreamingQueryListener):
    """OTel-shaped metrics export — the engine's analog of the
    reference's OTLP meters (events_fetched_count, fetch-miss counter,
    rate-limit gauges: cmd/gh-archived/main.go:30-37,218-267).

    Counter/gauge updates derive from streaming progress events:
      - ``events_ingested_count``  (counter)  ← numInputRows
      - ``ingest_rows_per_sec``    (gauge)    ← processedRowsPerSecond
      - ``batch_duration_ms``      (gauge)    ← triggerExecution

    If ``opentelemetry`` is installed, instruments are created on the
    provided (or global) MeterProvider and updates flow to whatever
    OTLP exporter the host app configured — identical posture to the
    reference, which also leaves endpoint wiring to the environment.
    Without it (this container), the same updates go to an in-process
    dict, so the metric surface stays testable.
    """

    def __init__(self, meter_provider=None):
        self.fallback: dict[str, float] = {}
        self._counter = self._rows_gauge = self._dur_gauge = None
        try:  # pragma: no cover - opentelemetry absent in container
            from opentelemetry import metrics as otel_metrics

            provider = meter_provider or otel_metrics.get_meter_provider()
            meter = provider.get_meter("gh_archive_clickhouse_spark")
            self._counter = meter.create_counter(
                "events_ingested_count", unit="1"
            )
            self._rows_gauge = meter.create_gauge("ingest_rows_per_sec")
            self._dur_gauge = meter.create_gauge("batch_duration_ms")
        except ImportError:
            pass

    # -- metric updates ------------------------------------------------
    def _record(self, rows: float, rows_per_sec: float, dur_ms: float):
        if self._counter is not None:  # pragma: no cover - needs otel
            self._counter.add(rows)
            self._rows_gauge.set(rows_per_sec)
            self._dur_gauge.set(dur_ms)
        else:
            self.fallback["events_ingested_count"] = (
                self.fallback.get("events_ingested_count", 0.0) + rows
            )
            self.fallback["ingest_rows_per_sec"] = rows_per_sec
            self.fallback["batch_duration_ms"] = dur_ms

    # -- listener protocol ---------------------------------------------
    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._record(
            float(p.numInputRows or 0),
            float(p.processedRowsPerSecond or 0.0),
            float(p.durationMs.get("triggerExecution") or 0.0),
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass
