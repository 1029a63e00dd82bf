"""Schemas: the raw-event table contract plus fixture-table schemas.

The reference projects the dynamic GitHub event schema down to a fixed
3-column table (id, ts, raw) — /root/reference/README.md:9-17 and the
column builders at cmd/gh-archived/main.go:57-61 — and defers the rest
to schema-on-read. We pin the same contract here, plus a minimal typed
JSON schema for the schema-on-read view (only the fields the reference
itself ever parses, internal/gh/gh.go:92-125, widened with the standard
GitHub envelope for query-time use).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's `github_events_raw` (README.md:9-17): Int64 id,
# DateTime32 ts (second precision), String raw (ZSTD at rest).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("ts", T.TimestampType(), nullable=False),
        T.StructField("raw", T.StringType(), nullable=False),
    ]
)

# Schema-on-read shape of the GitHub event envelope (FIXTURES.md §2).
# Only what queries need — from_json prunes the rest at parse time.
GH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField(
            "actor",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("login", T.StringType()),
                    T.StructField("display_login", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "repo",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType())),
        T.StructField("public", T.BooleanType()),
        T.StructField("created_at", T.StringType()),
    ]
)

# Driver fixture tables (TESTDATA.md / FIXTURES.md §3-5).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
