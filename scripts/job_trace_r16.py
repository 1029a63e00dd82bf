"""Per-job trace for one registry query: run it once (after warm-up)
and print every Spark job the invocation submitted — id, description,
duration, stage/task counts — from the UI REST API. The drill-down
companion to profile_r16.py's job *count*.

Usage:
    python scripts/job_trace_r16.py --query qx32_semantic_dedup \
        [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _jobs(spark) -> list:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    out = []
    for status in ("succeeded", "failed", "running"):
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs?status={status}",
            timeout=10,
        ) as r:
            out.extend(json.load(r))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--query", required=True)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from gh_archive_clickhouse_spark.plans.common import read as _read
    from gh_archive_clickhouse_spark.plans.registry import QUERIES
    from gh_archive_clickhouse_spark.session import get_spark

    spark = get_spark(
        app_name="job_trace_r16",
        extra_conf={
            "spark.ui.enabled": "true",
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
    q = QUERIES[args.query]
    if not args.no_warm:
        q.builder(spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    before = {j["jobId"] for j in _jobs(spark)}
    q.builder(spark, args.sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    import datetime

    new = sorted(
        (j for j in _jobs(spark) if j["jobId"] not in before),
        key=lambda j: j["jobId"],
    )
    def _stage_names(job) -> str:
        names = []
        for sid in job.get("stageIds", []):
            try:
                with urllib.request.urlopen(
                    f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
                    f"{spark.sparkContext.applicationId}/stages/{sid}",
                    timeout=10,
                ) as r:
                    info = json.load(r)
                if info:
                    nm = info[0].get("name", "")[:70]
                    names.append(f"s{sid}:{nm}")
            except Exception:
                pass
        return " | ".join(names)

    total_ms = 0
    for j in new:
        t0 = datetime.datetime.fromisoformat(
            j["submissionTime"].replace("GMT", "+00:00")
        )
        t1 = datetime.datetime.fromisoformat(
            j["completionTime"].replace("GMT", "+00:00")
        )
        ms = int((t1 - t0).total_seconds() * 1000)
        total_ms += ms
        desc = (j.get("description") or j.get("name") or "")[:110]
        print(
            f"job {j['jobId']:>5}  {ms:>6} ms  tasks={j['numTasks']:>4}  "
            f"{desc}"
        )
        if ms >= 100:
            print(f"      stages: {_stage_names(j)}")
    print(f"-- {len(new)} jobs, sum {total_ms} ms (wall may overlap)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
