"""NDJSON event parsing — the engine's version of the reference's P1
projection (internal/gh/gh.go:92-125): from each raw JSON event extract
exactly ``id`` (number **or** string → int64) and ``created_at``
(RFC3339 → timestamp, second precision), keep the raw bytes verbatim,
skip every other key.

Spark reads ``.json.gz`` transparently (the reference hand-rolls
gunzip + a 100 MB line scanner, cmd/gh-load/main.go:80-99; Spark's
text reader has no such line cap by default) and ``get_json_object``
runs JVM-side — the projection is a map-only codegen stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_raw_events(lines: DataFrame, raw_col: str = "value") -> DataFrame:
    """(id, ts, raw) from a DataFrame of NDJSON lines.

    - ``id``: GitHub sends event ids as JSON strings; some producers
      use numbers. ``get_json_object`` yields the lexical token either
      way; cast handles both (gh.go:104-114 does the same dance).
    - ``ts``: RFC3339 ``created_at``; truncated to whole seconds to
      match the reference's DateTime32 column (README.md:12).
    - rows with unparseable id/created_at are dropped (the reference
      errors the whole batch; at scale, dropping + counting via an
      observation is the operable choice).
    """
    raw = F.col(raw_col)
    # try_cast / try_to_timestamp: malformed rows become NULL and are
    # filtered (ANSI mode would abort the whole job on one bad row).
    parsed = lines.select(
        F.get_json_object(raw, "$.id").try_cast("long").alias("id"),
        F.date_trunc(
            "second",
            F.try_to_timestamp(F.get_json_object(raw, "$.created_at")),
        ).alias("ts"),
        raw.alias("raw"),
    )
    return parsed.filter(F.col("id").isNotNull() & F.col("ts").isNotNull())


def read_ndjson(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Raw NDJSON(.gz) lines as a one-column DataFrame."""
    return spark.read.text(paths)


def load_events(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Full P1 path: NDJSON(.gz) files → (id, ts, raw)."""
    return parse_raw_events(read_ndjson(spark, paths))
