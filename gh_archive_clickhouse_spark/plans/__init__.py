"""Declared query library (SURVEY.md §2.5) + oracle SQL registry."""

from gh_archive_clickhouse_spark.plans.registry import QUERIES, Query, get_queries

__all__ = ["QUERIES", "Query", "get_queries"]
