"""Registry-vs-DuckDB-oracle sweep at an arbitrary scale / conf.

The per-round driver gate runs at sf0.01; pytest's mirror runs at
sf0.001. The larger-scale verification sweeps recorded in SURVEY.md
(sf0.1, sf1, TZ / shuffle-count stress) were previously ad-hoc — this
is the committed form, so a sweep is one command:

    python scripts/sweep_oracle.py --sf-dir /tmp/sf1 \
        --queries qs4_stream_incremental_lsh,qs13_stream_dedup_survivors
    python scripts/sweep_oracle.py --sf-dir /root/testdata/sf0.01 \
        --queries all --shuffle 5 --no-aqe

Comparison is the driver's: row count, sorted column names, and
order-insensitive exact values (tests/conftest.assert_frames_match —
imported, not copied, so the sweep and pytest can never diverge).
Emits one JSON line per query and a final summary line; exit code 1
on any mismatch/error.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--queries",
        default="all",
        help="comma list of registry names, 'all', 'window' (driver "
        "head), 'streaming' (qs*), or a 'prefix:qs,qm' family filter",
    )
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument("--no-aqe", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--driver-memory",
        default=None,
        help="JVM heap for the sweep's driver (e.g. 8g). Local mode "
        "defaults to 1g, which sf1 memory-sink queries (qs8 holds "
        "~1M rows driver-side by design — it IS a memory-sink "
        "contract test) overflow; effective because the sweep "
        "process starts its own JVM.",
    )
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    import duckdb

    from gh_archive_clickhouse_spark.schemas import FIXTURE_TABLES
    from gh_archive_clickhouse_spark.session import get_spark
    from gh_archive_clickhouse_spark.plans.registry import QUERIES
    from tests.conftest import assert_frames_match

    extra = {}
    if args.shuffle is not None:
        extra["spark.sql.shuffle.partitions"] = str(args.shuffle)
    if args.no_aqe:
        extra["spark.sql.adaptive.enabled"] = "false"
    if args.driver_memory:
        extra["spark.driver.memory"] = args.driver_memory
    spark = get_spark(
        app_name="oracle-sweep", master=args.master, extra_conf=extra
    )

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    sel = args.queries.strip()
    if sel == "all":
        names = [n for n, q in QUERIES.items() if q.oracle is not None]
    elif sel == "window":
        from gh_archive_clickhouse_spark.plans.registry import WINDOW

        names = [
            n
            for n, q in list(QUERIES.items())[:WINDOW]
            if q.oracle is not None
        ]
    elif sel == "streaming":
        names = [
            n
            for n, q in QUERIES.items()
            if n.startswith("qs") and q.oracle is not None
        ]
    elif sel.startswith("prefix:"):
        pfx = tuple(p.strip() for p in sel[len("prefix:"):].split(","))
        names = [
            n
            for n, q in QUERIES.items()
            if n.startswith(pfx) and q.oracle is not None
        ]
    else:
        names = [n.strip() for n in sel.split(",") if n.strip()]
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    if not names:
        # a typo'd family selector must not read as a green sweep
        raise SystemExit(f"selector {sel!r} matched no oracle queries")

    results: dict[str, dict] = {}
    fails = 0
    for name in names:
        q = QUERIES[name]
        rec: dict = {}
        try:
            t0 = time.monotonic()
            spark_pdf = q.builder(spark, args.sf_dir).toPandas()
            rec["spark_s"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            oracle_pdf = con.execute(q.oracle).fetchdf()
            rec["oracle_s"] = round(time.monotonic() - t0, 2)
            rec["rows"] = len(spark_pdf)
            assert_frames_match(spark_pdf, oracle_pdf, name)
            rec["match"] = True
        except Exception as e:  # noqa: BLE001 - sweep must continue
            rec["match"] = False
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            traceback.print_exc()
            fails += 1
        results[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)

    summary = {
        "sf_dir": args.sf_dir,
        "n": len(names),
        "fails": fails,
        "conf": extra,
    }
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "results": results}, f, indent=1)
    # explicit teardown: a streaming query's leftover non-daemon
    # machinery can keep the JVM (and a CPU's worth of spin) alive
    # after main() returns — observed on the first sf0.1 run
    con.close()
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
