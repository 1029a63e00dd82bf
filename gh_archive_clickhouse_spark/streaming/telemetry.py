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
