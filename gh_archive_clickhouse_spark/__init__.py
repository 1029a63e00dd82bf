"""gh_archive_clickhouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
go-faster/gh-archive-clickhouse (reference studied at /root/reference),
re-expressed Spark-first:

- The reference's Go ingestion dataflow (GitHub event poll + GHArchive
  backfill) becomes a custom Python streaming ``DataSource`` plus a
  distributed batch fetch pipeline (``sources/``).
- The ClickHouse MergeTree storage contract (ReplacingMergeTree dedup,
  daily partitioning, ORDER BY clustering, TTL, ZSTD) becomes
  partitioned/sorted Parquet writes plus engine-defined dedup views and
  retention jobs (``operators/``, ``sinks``).
- All relational processing the reference delegates to ClickHouse is
  served natively by Spark SQL / Catalyst (``plans/``).
- LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) are first-class operators designed for
  100 TB scale (``operators/``, ``functions/``).

Everything is declared through the DataFrame/SQL API so Catalyst keeps
predicate pushdown, column pruning, partition pruning, and AQE; Python
UDFs appear only where built-ins cannot express the semantics.
"""

from gh_archive_clickhouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
