"""Fixture-table catalog: load and register the driver's parquet tables.

Reads stay declarative (``spark.read.parquet``) so Catalyst keeps
predicate pushdown / column pruning against the files; registering temp
views additionally makes the whole surface reachable from plain SQL —
the engine's analog of the reference's "archive into ClickHouse, then
query with SQL" contract (SURVEY.md §3.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from gh_archive_clickhouse_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One fixture table as a DataFrame (schema from parquet footers)."""
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table under its bare name as a temp view."""
    for name in FIXTURE_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
