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
# Round-2 additions in round-1-verified families have no driver row
# yet; hoist them ahead of the fully-verified batteries.
_R2_NEW = (
    "qt30_waiting_suppliers",
    "qt31_top_revenue_supplier",
    "qe13_funnel",
    "qe14_cohort_retention",
)

_ALL: list[Query] = [
    *ext_queries.QUERIES,
    *streaming_queries.QUERIES,  # newly oracle-backed (round 2)
    *[q for q in tpch2_queries.QUERIES if q.name in _R2_NEW],
    *[q for q in events_queries.QUERIES if q.name in _R2_NEW],
    *[q for q in events_queries.QUERIES if q.name not in _R2_NEW],
    *relational_queries.QUERIES,
    *tpch_queries.QUERIES,
    *[q for q in tpch2_queries.QUERIES if q.name not in _R2_NEW],
]

QUERIES: dict[str, Query] = {q.name: q for q in _ALL}

if len(QUERIES) != len(_ALL):  # pragma: no cover - registry sanity
    raise AssertionError("duplicate query names in registry")


def get_queries() -> dict[str, Query]:
    return QUERIES
