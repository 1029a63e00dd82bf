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
from gh_archive_clickhouse_spark.streaming.analytics import hourly_type_counts

_SEQ = itertools.count()


def qs1_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type event counts computed BY A STREAM over the
    events fixture: one-file file-source, availableNow trigger, memory
    sink, complete mode. Returns the final materialized table.
    """
    read(spark, sf_dir, "events")  # sets nanos/tz session confs
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # FileStreamSource wants a directory; a glob over the fixture dir
    # keeps the base path a directory while selecting the one file.
    stream = spark.readStream.schema(raw_schema).parquet(
        f"{sf_dir}/events*.parquet"
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    agg = hourly_type_counts(stream)
    name = f"qs1_hourly_{next(_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    return out.select(
        ts_fmt("hour_start").alias("hour_s"),
        "event_type",
        "n",
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
]
