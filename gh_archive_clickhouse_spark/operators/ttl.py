"""Event-time retention — the engine's analog of MergeTree TTL.

The reference contracts `TTL ts + INTERVAL 3 DAY`
(/root/reference/README.md:17): rows expire 3 days after event time.
Spark-side this is (a) a filter view for reads, and (b) a partition-
drop job for storage: because the table is laid out
``partitionBy(yyyyMMdd(ts))`` (sources/sinks.py), expiry deletes whole
date partitions — an O(partitions) metadata operation at any scale,
never a row-level rewrite.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def expire_older_than(
    df: DataFrame, ts_col: str = "ts", days: int = 3, now: Column | None = None
) -> DataFrame:
    """Retention read-view: rows younger than ``days`` relative to
    ``now``.

    Production callers should pass ``now`` explicitly (e.g.
    ``F.current_timestamp()`` or the job's logical date): that keeps
    the view a single pushed-down filter. The ``now=None`` default
    anchors at the dataset's own max(ts) — deterministic for tests and
    oracles — at the cost of one extra aggregate scan to find it, so
    it is a fixture convenience, not the retention-job path."""
    if now is None:
        mx = df.agg(F.max(ts_col).alias("__now"))
        return df.crossJoin(F.broadcast(mx)).filter(
            F.col(ts_col) >= F.col("__now") - F.expr(f"INTERVAL {days} DAYS")
        ).drop("__now")
    return df.filter(F.col(ts_col) >= now - F.expr(f"INTERVAL {days} DAYS"))


def drop_expired_partitions(
    table_path: str, cutoff_yyyymmdd: str, partition_col: str = "dt"
) -> list[str]:
    """Storage-side TTL: drop whole date partitions older than cutoff.

    Returns the dropped partition names. Mirrors ClickHouse dropping
    expired parts: no data rewrite, just partition removal.
    """
    dropped = []
    root = Path(table_path)
    if not root.exists():
        return dropped
    for child in sorted(root.iterdir()):
        if not child.name.startswith(f"{partition_col}="):
            continue
        value = child.name.split("=", 1)[1]
        if value < cutoff_yyyymmdd:
            shutil.rmtree(child)
            dropped.append(child.name)
    return dropped


def drop_expired_partitions_catalog(
    spark: SparkSession,
    table: str,
    cutoff_yyyymmdd: str,
    partition_col: str = "dt",
) -> list[str]:
    """Catalog-native TTL: enumerate via ``SHOW PARTITIONS`` and drop
    expired ones with ``ALTER TABLE ... DROP PARTITION``.

    This is the object-store-safe form of ``drop_expired_partitions``:
    partition discovery and removal go through the catalog/manifest
    layer (Hive metastore, or table-format metadata on Delta/Iceberg),
    never a filesystem walk — the only form that works when the table
    root is ``s3://...`` and "directories" are a fiction. Still an
    O(expired-partitions) metadata operation, no data rewrite.
    """
    dropped = []
    for row in spark.sql(f"SHOW PARTITIONS {table}").collect():
        spec = row[0]  # e.g. 'dt=20240101'
        col, _, value = spec.partition("=")
        if col == partition_col and value < cutoff_yyyymmdd:
            spark.sql(
                f"ALTER TABLE {table} "
                f"DROP IF EXISTS PARTITION ({partition_col}='{value}')"
            )
            dropped.append(spec)
    return dropped
