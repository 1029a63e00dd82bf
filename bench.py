#!/usr/bin/env python3
"""Benchmark harness: times every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
   "batch_total": N_b, "stream_total": N_s,
   "queries": {name: sec, ...}, "sf": 0.1}

``value`` = batch_total + stream_total. The split matters for reading
rounds against each other: stream_total is dominated by stream-startup
machinery (checkpoint dirs, state-store commits, memory-sink
round-trips), not engine throughput, and the round-2/3 comparison
showed the combined number carries >=15% environment variance on
byte-identical code — keep regressions analyses on batch_total.

Each query is materialized with the `noop` sink (full execution, no
driver-side collect) — the number measures the engine, not pandas
conversion. Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 2)
and reports the fastest: the first run pays one-time whole-stage-
codegen compilation, which at target scale amortizes to zero, so
steady-state is the honest per-query number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gh_archive_clickhouse_spark.session import get_spark
from gh_archive_clickhouse_spark.plans.registry import QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    # Warm the JVM/session and every input table (page cache + parquet
    # footer parsing) so timings measure the engine, not cold I/O —
    # the steady state a resident deployment runs in.
    from gh_archive_clickhouse_spark.plans.common import read as _read

    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        try:
            _read(spark, sf_dir, t).count()
        except Exception:
            pass
    # Untimed warm-up QUERY: one representative join+agg pipeline to
    # JIT the whole-stage-codegen/compiler paths before any timed run
    # (proven round-2/3 hazard: the first queries of a cold JVM run
    # ~2x slow, which masqueraded as per-query regressions).
    for warm in ("qt1_pricing_summary", "qt2_regional_revenue"):
        if warm in QUERIES:
            try:
                QUERIES[warm].builder(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
            except Exception:
                pass

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        best = float("inf")
        # Streaming queries run the whole stream (checkpoint, state
        # store, memory sink) inside the builder. They get the SAME
        # min-of-N treatment as batch queries: the r4→r5 comparison
        # showed single-run stream numbers swing ±45% on byte-identical
        # code (fresh-checkpoint/state-store startup jitter), which
        # would eventually mask a real regression; min-of-two is the
        # repeatable machinery cost.
        for _ in range(runs):
            t0 = time.perf_counter()
            q.builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # The driver snapshots only the LAST 2000 chars of stdout; full
    # registry names blow that budget and decapitate the JSON line
    # (BENCH_r01 "parsed": null). Key by the short qNN prefix, falling
    # back to the full name only on prefix collisions (qt3/qt6/qt11
    # variants), and emit with compact separators.
    prefix_counts: dict[str, int] = {}
    for name in timings:
        p = name.split("_", 1)[0]
        prefix_counts[p] = prefix_counts.get(p, 0) + 1
    short = {
        (name.split("_", 1)[0]
         if prefix_counts[name.split("_", 1)[0]] == 1 else name): t
        for name, t in timings.items()
    }
    total = round(sum(timings.values()), 3)
    stream_total = round(
        sum(
            t for n, t in timings.items()
            if "streaming" in QUERIES[n].tags
        ),
        3,
    )
    def _render(qmap: dict[str, float], omitted: int = 0) -> str:
        payload = {
            "metric": "total_query_wall_sec",
            "value": total,
            "unit": "sec",
            "batch_total": round(total - stream_total, 3),
            "stream_total": stream_total,
            "queries": qmap,
            "sf": sf,
        }
        if omitted:
            # sibling field, NOT a fake entry inside the timing map
            payload["queries_omitted"] = omitted
        return json.dumps(payload, separators=(",", ":"))

    line = _render(short)
    # Keep the one-line JSON inside the driver's 2000-char stdout
    # snapshot as the registry grows: first shave timing precision to
    # 2 dp, then keep only the slowest queries (totals above are
    # computed from the FULL set either way) with an explicit count of
    # what was dropped — never silently truncate mid-JSON.
    if len(line) > 1900:
        line = _render({k: round(v, 2) for k, v in short.items()})
    n_keep = len(short)
    while len(line) > 1900 and n_keep > 10:
        n_keep = max(10, n_keep - 10)
        slowest = {
            k: round(v, 2)
            for k, v in sorted(short.items(), key=lambda kv: -kv[1])[
                :n_keep
            ]
        }
        line = _render(slowest, omitted=len(short) - n_keep)
    print(line)


if __name__ == "__main__":
    main()
