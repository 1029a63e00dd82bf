"""Small shared utilities for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Fan out compute-heavy per-row operators when the input arrives
    under-partitioned (e.g. one small parquet file → one task, so 31 of
    32 local cores idle).

    Only repartitions when the source has fewer partitions than half
    the cluster's default parallelism — a well-partitioned 100 TB input
    passes through untouched (no extra shuffle)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 1):
        return df.repartition(target)
    return df
