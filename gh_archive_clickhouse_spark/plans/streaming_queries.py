"""Qs: Structured-Streaming queries surfaced through the driver
contract.

These run a real micro-batch stream (file source → watermark →
windowed/stateful aggregation → memory sink, availableNow trigger)
and return the materialized result. They have NO oracle_sql — the
semantics (watermarks, incremental state) are not SQL-expressible —
so the driver records rows-only checks; the batch-equivalent shapes
(qe4) are oracle-checked separately, and tests/test_streaming_analytics
asserts stream == batch on the same data.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.plans.common import Query, read, ts_fmt
from gh_archive_clickhouse_spark.streaming.analytics import (
    hourly_type_counts,
    running_user_totals,
    session_aggregates,
)

_SEQ = itertools.count()


def _events_stream(spark: SparkSession, sf_dir: str):
    """The events fixture as a file-source STREAM (micro-batch input)."""
    read(spark, sf_dir, "events")  # sets nanos/tz session confs
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # FileStreamSource wants a directory; a glob over the fixture dir
    # keeps the base path a directory while selecting the one file.
    stream = spark.readStream.schema(raw_schema).parquet(
        f"{sf_dir}/events*.parquet"
    )
    ts_dtype = dict(stream.dtypes).get("ts")
    if ts_dtype == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_dtype == "timestamp_ntz":
        # tz-less fixture parquet: reinterpret as UTC instant so the
        # watermark (which requires TIMESTAMP) accepts it.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_table(agg, prefix: str):
    name = f"{prefix}_{next(_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)


def qs1_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type event counts computed BY A STREAM over the
    events fixture: one-file file-source, availableNow trigger, memory
    sink, complete mode. Returns the final materialized table.
    """
    agg = hourly_type_counts(_events_stream(spark, sf_dir))
    out = _run_to_table(agg, "qs1_hourly")
    return out.select(
        ts_fmt("hour_start").alias("hour_s"),
        "event_type",
        "n",
    )


def qs2_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30 min gap) computed BY A STREAM with
    native ``session_window`` state merging — the streaming twin of
    qe7's batch sessionization."""
    agg = session_aggregates(_events_stream(spark, sf_dir))
    out = _run_to_table(agg, "qs2_sessions")
    return out.select(
        "user_id",
        ts_fmt("sess_start").alias("start_s"),
        ts_fmt("sess_end").alias("end_s"),
        "n_events",
    )


def qs3_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator BY A STREAM: per-user running
    (count, sum) via ``applyInPandasWithState`` — explicit Arrow-batched
    state, the template for any bespoke streaming accumulator. The
    fixture arrives as one availableNow micro-batch, so the update-mode
    memory sink holds exactly the final state row per user."""
    agg = running_user_totals(_events_stream(spark, sf_dir))
    name = f"qs3_totals_{next(_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    return out.select(
        "user_id", "n", F.round(F.col("total"), 6).alias("total_r")
    )


QUERIES = [
    Query(
        "qs1_stream_hourly_counts",
        "Structured Streaming: watermarked hourly windowed counts "
        "(availableNow micro-batch run over the fixture)",
        qs1_stream_hourly_counts,
        oracle=None,
        tags=("streaming",),
    ),
    Query(
        "qs2_stream_session_windows",
        "Structured Streaming: native session windows per user "
        "(availableNow micro-batch run over the fixture)",
        qs2_stream_session_windows,
        oracle=None,
        tags=("streaming",),
    ),
    Query(
        "qs3_stream_running_totals",
        "Structured Streaming: custom stateful per-user totals "
        "(applyInPandasWithState, update mode)",
        qs3_stream_running_totals,
        oracle=None,
        tags=("streaming",),
    ),
]
