"""Round-15 optimization instrument: isolated min-of-N timing +
plan capture for named registry queries (or ad-hoc stage probes).

Usage:
    python scripts/profile_r15.py --queries qx9_lsh_candidates,qx26_dedup_clusters \
        --sf-dir /root/testdata/sf0.1 --runs 4 [--plans-dir plans/r15 --suffix before]

Per query: warm-up run (codegen compile), then N timed runs through
the noop sink (guide §1.4), min + all samples printed as one JSON
line. With --plans-dir the builder's result frame is explain("formatted")-
dumped to <plans-dir>/<query>_<suffix>.txt BEFORE the timed runs.

Same methodology as bench.py (same sink, same warm tables), but scoped
to a target list so A/B comparisons are same-session and isolated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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

    spark = get_spark(app_name="profile_r15")
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
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for i in range(args.runs + 1):  # +1 warm-up
            t0 = time.perf_counter()
            q.builder(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            if i > 0:
                samples.append(round(dt, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: results[name]}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
