"""Assembles the declared query registry (SURVEY.md §2.5 + §2.6)."""

from __future__ import annotations

from gh_archive_clickhouse_spark.plans import (
    events_queries,
    ext_queries,
    relational_queries,
    streaming_queries,
    tpch2_queries,
    tpch_queries,
)
from gh_archive_clickhouse_spark.plans.common import Query

# Order matters operationally: the round driver verifies the first ~50
# oracle-checkable entries in enumeration order. Families whose queries
# have never had a driver-verified correctness row come FIRST (round 1
# verified the first 50 and left the entire ext/multimodal surface —
# the LLM-pipeline mandate — unverified); the TPC-H batteries, fully
# verified in round 1, sit at the tail.
_ALL: list[Query] = [
    *ext_queries.QUERIES,
    *streaming_queries.QUERIES,  # newly oracle-backed (round 2)
    *events_queries.QUERIES,  # contains round-2 additions (qe13)
    *relational_queries.QUERIES,
    *tpch_queries.QUERIES,
    *tpch2_queries.QUERIES,
]

QUERIES: dict[str, Query] = {q.name: q for q in _ALL}

if len(QUERIES) != len(_ALL):  # pragma: no cover - registry sanity
    raise AssertionError("duplicate query names in registry")


def get_queries() -> dict[str, Query]:
    return QUERIES
