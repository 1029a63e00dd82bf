"""Assembles the declared query registry (SURVEY.md §2.5 + §2.6)."""

from __future__ import annotations

from gh_archive_clickhouse_spark.plans import (
    events_queries,
    ext_queries,
    relational_queries,
    streaming_queries,
    tpch2_queries,
    tpch3_queries,
    tpch_queries,
)
from gh_archive_clickhouse_spark.plans.common import Query

# Order matters operationally: the round driver verifies the first ~50
# oracle-checkable entries in enumeration order. Rotation policy, by
# how much a fresh driver row is worth:
#   1. queries whose CODE CHANGED this round — their existing green
#      rows describe old code, i.e. are effectively no rows;
#   2. queries NEW this round — never driver-verified at all;
#   3. the 39 round-1-verified qt/qe families (green, unchanged, but
#      two rounds stale) — as many as fit the remaining window;
#   4. everything verified green in round 3 and unchanged.
# With 6 changed + 25 new this round, a 50-entry window still
# refreshes ~19 of the stale set; the rest keep their (valid,
# unchanged-code) round-1 rows and lead the rotation next round.
_R1_STALE_EVENTS = (
    "qe5_ttl_survivors",
    "qe6_topk_users",
    "qe7_sessionization",
    "qe12_variant_projection",
)
_R2_NEW_TPCH2 = ("qt30_waiting_suppliers", "qt31_top_revenue_supplier")
# Never driver-verified (created this round), all locally
# oracle-green; ordered oldest-written first so a window cut drops the
# ones with the most local soak time last.
_NEW_R4 = (
    "qx33_sequence_packing",
    "qx34_pq_encode",
    "qx35_pq_adc_topk",
    "qx36_passage_dedup",
    "qx37_containment_neardup",
    "qx38_model_scored_filter",
    "qx39_vocab_heavy_hitters",
    "qs6_stream_stream_join",
    "qs7_incremental_mv",
    "qs8_stream_exactly_once_dedup",
    "qs9_stream_static_enrich",
    "qt32_cheapest_supplier",
    "qt33_nation_year_profit",
    "qt34_important_parts",
    "qt35_dominant_suppliers",
    "qx40_ivfpq_search",
    "qx41_batched_topk",
    "qx42_preprocess_pipeline",
    "qx31_dedup_survivors",
    "qx32_semantic_dedup",
    "qm6_real_image_decode",
    "qm7_image_dedup_ahash",
    "qx43_lsh_recall_probe",
    "qx44_data_quality_audit",
    "qe15_hourly_anomaly",
)
# Code changed this round — the prior green rows describe old code,
# so these carry the highest re-verification value and lead the
# registry.
_CHANGED_R4 = (
    "qx30_repetition_ratio",
    "qx23_ngram_contamination",
    "qx22_tfidf_top_terms",
    "qx26_dedup_clusters",
    "qs4_stream_incremental_lsh",
    "qe14_cohort_retention",
)


def _named(queries: list[Query], names: tuple[str, ...]) -> list[Query]:
    return [q for q in queries if q.name in names]


def _except_named(queries: list[Query], names: tuple[str, ...]) -> list[Query]:
    return [q for q in queries if q.name not in names]


_BY_NAME: dict[str, Query] = {
    q.name: q
    for mod in (
        events_queries,
        ext_queries,
        relational_queries,
        streaming_queries,
        tpch2_queries,
        tpch3_queries,
        tpch_queries,
    )
    for q in mod.QUERIES
}

_PRIORITIZED = _CHANGED_R4 + _NEW_R4

_ALL: list[Query] = [
    # --- changed this round (6, rows invalid), then new this round
    # (25, no rows), in the exact priority order declared above ---
    *[_BY_NAME[n] for n in _PRIORITIZED],
    # --- two-rounds-stale round-1 families (39) ---
    *_named(events_queries.QUERIES, _R1_STALE_EVENTS),
    *relational_queries.QUERIES,
    *tpch_queries.QUERIES,
    *_except_named(tpch2_queries.QUERIES, _R2_NEW_TPCH2),
    # --- verified green in round 3, unchanged ---
    *_except_named(ext_queries.QUERIES, _PRIORITIZED),
    *_except_named(streaming_queries.QUERIES, _PRIORITIZED),
    *_except_named(tpch3_queries.QUERIES, _PRIORITIZED),
    *_named(tpch2_queries.QUERIES, _R2_NEW_TPCH2),
    *_except_named(
        events_queries.QUERIES, _R1_STALE_EVENTS + _PRIORITIZED
    ),
]

QUERIES: dict[str, Query] = {q.name: q for q in _ALL}

if len(QUERIES) != len(_ALL):  # pragma: no cover - registry sanity
    raise AssertionError("duplicate query names in registry")


def get_queries() -> dict[str, Query]:
    return QUERIES
