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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expire_older_than(
    df: DataFrame, ts_col: str = "ts", days: int = 3, now: Column | None = None
) -> DataFrame:
    """Retention read-view: rows younger than ``days`` relative to
    ``now`` (default: the dataset's own max(ts), which makes the view
    deterministic for tests and oracles)."""
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
