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

import re
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

    Contract guards (all inputs end up inside SQL text, so they are
    validated, not trusted):

    - ``table`` and ``partition_col`` must be plain (optionally
      dot-qualified) identifiers — raises ``ValueError`` otherwise.
    - ``cutoff_yyyymmdd`` must be an 8-digit date string.
    - A multi-column partition spec (``dt=20240101/hour=05``) raises
      ``ValueError``: this function's TTL contract is single-column
      date partitioning, and naively splitting the spec on the first
      ``=`` would compare (and DROP by) the corrupt value
      ``'20240101/hour=05'``.
    - Partition values that are not 8-digit dates are SKIPPED, never
      interpolated into the DROP statement.
    """
    ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")
    if not ident.match(table):
        raise ValueError(f"not a valid table identifier: {table!r}")
    if not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", partition_col):
        raise ValueError(f"not a valid column identifier: {partition_col!r}")
    if not re.match(r"^\d{8}$", cutoff_yyyymmdd):
        raise ValueError(f"cutoff must be yyyyMMdd: {cutoff_yyyymmdd!r}")
    dropped = []
    for row in spark.sql(f"SHOW PARTITIONS {table}").collect():
        spec = row[0]  # e.g. 'dt=20240101'
        parts = spec.split("/")
        if len(parts) != 1:
            raise ValueError(
                f"multi-column partition spec {spec!r}: catalog TTL "
                "requires a table partitioned by the single date "
                f"column {partition_col!r}"
            )
        col, _, value = parts[0].partition("=")
        if col != partition_col or not re.match(r"^\d{8}$", value):
            continue
        if value < cutoff_yyyymmdd:
            spark.sql(
                f"ALTER TABLE {table} "
                f"DROP IF EXISTS PARTITION ({partition_col}='{value}')"
            )
            dropped.append(spec)
    return dropped
