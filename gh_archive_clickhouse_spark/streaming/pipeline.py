"""Streaming ingestion pipeline — the ``gh-archived`` dataflow
(SURVEY.md §3.1) as Structured Streaming:

    poll source → (id, ts, raw) → watermark + stateful dedup →
    foreachBatch partitioned write

The reference's producer/consumer split over a bounded channel
(cmd/gh-archived/main.go:28, :249) becomes Spark's trigger loop; the
5 s idle flush / 60 s insert restart (:55, :81-83) become the trigger
interval plus the compaction job (sinks.compact); the in-flight seen-id
dedup (:152-162) is re-checked durably by
``dropDuplicatesWithinWatermark`` so restarts can't double-write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gh_archive_clickhouse_spark.sources import github_events
from gh_archive_clickhouse_spark.sources.sinks import write_events


def poll_stream(
    spark: SparkSession, **options: str
) -> DataFrame:
    """Unbounded (id, ts, raw) stream from the GitHub poll source."""
    github_events.register(spark)
    reader = spark.readStream.format("github_events")
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load()
    return raw.select(
        "id",
        F.date_trunc("second", F.to_timestamp("created_at")).alias("ts"),
        "raw",
    ).filter(F.col("id").isNotNull() & F.col("ts").isNotNull())


def deduped_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Durable cross-batch dedup: state bounded by the watermark, keyed
    on id — the streaming equivalent of the reference's latestMet set,
    but restart-safe."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["id"]
    )


def start_archive(
    spark: SparkSession,
    out_path: str,
    checkpoint: str,
    trigger_seconds: int = 5,
    watermark: str = "10 minutes",
    **source_options: str,
) -> StreamingQuery:
    """Run the full archive pipeline; returns the StreamingQuery."""
    # Stateful dedup creates one state store per shuffle partition, and
    # the count is frozen into the checkpoint on first run. A bare
    # session's default (200) is wildly oversized for a poll feed —
    # every micro-batch would commit 200 state files. Right-size to the
    # cluster's parallelism before the first trigger.
    if int(spark.conf.get("spark.sql.shuffle.partitions")) > 64:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
    stream = deduped_stream(poll_stream(spark, **source_options), watermark)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.isEmpty():
            write_events(batch_df, out_path)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
