"""Round-16 optimization instrument: isolated min-of-N timing +
plan capture + per-invocation Spark JOB COUNT census for named
registry queries.

Usage:
    python scripts/profile_r16.py --queries qx53_budget_selection,qx42_preprocess_pipeline \
        --sf-dir /root/testdata/sf0.1 --runs 6 [--plans-dir plans/r16 --suffix before]

Per query: warm-up run (codegen compile), then N timed runs through
the noop sink (guide §1.4), min + all samples printed as one JSON
line. With --plans-dir the builder's result frame is
explain("formatted")-dumped to <plans-dir>/<query>_<suffix>.txt BEFORE
the timed runs.

New over profile_r15: ``jobs`` — the number of Spark jobs one
invocation submits, counted via the driver UI's REST status API
(covers jobs submitted from stream-execution/driver threads, which a
thread-local job group would miss). The r15 verdict asked for a
job-census record wherever an optimization lives behind a
``materialize`` barrier (plan dumps can't see the materialization
job); this makes that census part of the standard measurement.

Same methodology as bench.py (same sink, same warm tables), scoped to
a target list so A/B comparisons are same-session and isolated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _job_count(spark) -> int:
    """Total jobs submitted so far in this application, from the UI
    REST API (counts every thread's jobs, unlike job groups)."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return -1
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs?status=succeeded",
            timeout=10,
        ) as r:
            succeeded = len(json.load(r))
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs?status=failed",
            timeout=10,
        ) as r:
            failed = len(json.load(r))
        return succeeded + failed
    except Exception:
        return -1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gh_archive_clickhouse_spark.plans.common import read as _read
    from gh_archive_clickhouse_spark.plans.registry import QUERIES
    from gh_archive_clickhouse_spark.session import get_spark

    # UI re-enabled for THIS measurement session only (session.py
    # disables it): the REST status API is the one job counter that
    # sees jobs submitted from stream-execution/driver threads.
    spark = get_spark(
        app_name="profile_r16",
        extra_conf={
            "spark.ui.enabled": "true",
            # The census diffs job counts across a whole profile
            # session; the default 1000-job retention evicts earlier
            # jobs and makes the diff go negative.
            "spark.ui.retainedJobs": "1000000",
        },
    )
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        try:
            _read(spark, args.sf_dir, t).count()
        except Exception:
            pass
    # JIT warm-up (bench.py's protocol)
    for warm in ("qt1_pricing_summary", "qt2_regional_revenue"):
        if warm in QUERIES:
            QUERIES[warm].builder(spark, args.sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    results = {}
    for name in names:
        q = QUERIES[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            import contextlib
            import io

            df = q.builder(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(
                    args.plans_dir, f"{name}_{args.suffix}.txt"
                ),
                "w",
            ) as f:
                f.write(buf.getvalue())
        samples = []
        jobs = -1
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for i in range(args.runs + 1):  # +1 warm-up
            j0 = _job_count(spark)
            t0 = time.perf_counter()
            q.builder(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            if i > 0:
                samples.append(round(dt, 3))
            if i == args.runs:  # steady-state (last) run's job count
                j1 = _job_count(spark)
                if j0 >= 0 and j1 >= 0:
                    jobs = j1 - j0
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "min": min(samples),
            "samples": samples,
            "jobs": jobs,
        }
        print(json.dumps({name: results[name]}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
