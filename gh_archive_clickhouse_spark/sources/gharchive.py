"""GHArchive backfill — the reference's ``gh-load`` re-expressed as a
distributed Spark job (cmd/gh-load/main.go:166-331).

The reference hand-rolls: an hour-key generator (:301-314), a bounded
worker pool (:239-269), per-file exponential-backoff retry (:250-263),
gunzip + line scanning (:80-99), and batched inserts (:120-153). Here:

- hour keys become a small DataFrame, ``repartition(jobs)`` is the
  worker pool, and Spark's scheduler + ``spark.task.maxFailures`` is
  the retry isolation;
- the per-hour HTTP fetch + gunzip runs in ``mapInPandas`` (Arrow
  batches out, no Python row objects), with the same
  404-tolerated / retry-on-5xx policy (:67-78);
- parsing and the partitioned write reuse ndjson.py / sinks.py — the
  batched-INSERT machinery disappears into the DataFrame writer.

At cluster scale each task streams one hour file (~100 MB compressed)
— the reference's measured ~340 MB/job RAM envelope (README.md:51-53)
maps to ordinary executor memory; 1000 executors backfill years of
archive in one job.
"""

from __future__ import annotations

import gzip
import io
import time
import urllib.error
import urllib.request
from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gh_archive_clickhouse_spark.sources.ndjson import parse_raw_events

DEFAULT_BASE_URL = "https://data.gharchive.org"


def hour_keys(start: str, end: str) -> list[str]:
    """Hour keys 'YYYY-MM-DD-H' in [start, end), args 'YYYY-MM-DDTH'
    — same format and half-open range as the reference (:210-217,
    :301-314; hour is not zero-padded)."""
    t0 = datetime.strptime(start, "%Y-%m-%dT%H")
    t1 = datetime.strptime(end, "%Y-%m-%dT%H")
    out = []
    t = t0
    while t < t1:
        out.append(f"{t:%Y-%m-%d}-{t.hour}")
        t += timedelta(hours=1)
    return out


def _fetch_one(
    url: str, max_retries: int, backoff_s: float
) -> bytes | None:
    """GET with exponential backoff; None for 404 (skip the hour, the
    archive has gaps — reference :67-70); raises after max_retries."""
    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(url) as resp:
                return resp.read()
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                return None
            attempt += 1
            if attempt >= max_retries:
                raise
            time.sleep(backoff_s * (2 ** (attempt - 1)))
        except urllib.error.URLError:
            attempt += 1
            if attempt >= max_retries:
                raise
            time.sleep(backoff_s * (2 ** (attempt - 1)))


def fetch_hours(
    spark: SparkSession,
    keys: list[str],
    base_url: str = DEFAULT_BASE_URL,
    jobs: int = 8,
    max_retries: int = 5,
    backoff_s: float = 0.5,
) -> DataFrame:
    """Distributed fetch: hour keys → one NDJSON line per row.

    Output columns: key (hour key), value (raw JSON line).
    """
    keys_df = spark.createDataFrame(
        [(k,) for k in keys], schema="key string"
    ).repartition(jobs)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for key in pdf["key"]:
                blob = _fetch_one(
                    f"{base_url}/{key}.json.gz", max_retries, backoff_s
                )
                if blob is None:
                    continue
                with gzip.open(io.BytesIO(blob), "rt", encoding="utf-8") as fh:
                    lines = [ln for ln in fh.read().splitlines() if ln]
                if lines:
                    yield pd.DataFrame({"key": key, "value": lines})

    return keys_df.mapInPandas(_fetch, schema="key string, value string")


def backfill(
    spark: SparkSession,
    start: str,
    end: str,
    base_url: str = DEFAULT_BASE_URL,
    jobs: int = 8,
    max_retries: int = 5,
    backoff_s: float = 0.5,
) -> DataFrame:
    """End-to-end backfill read: hour range → parsed (id, ts, raw).

    Compose with ``sinks.write_events`` for the full gh-load analog.
    """
    lines = fetch_hours(
        spark, hour_keys(start, end), base_url, jobs, max_retries, backoff_s
    )
    return parse_raw_events(lines)
