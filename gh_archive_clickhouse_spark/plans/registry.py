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
#   3. the stalest green-but-unchanged rows (round-1 rows are now
#      three rounds old — the 20 below);
#   4. as many of the next-stalest (round-3 rows) as fit.
# The policy is enforced structurally by
# tests/test_registry_rotation.py, which simulates this window against
# the recorded CORRECTNESS_r*.json rounds and fails if any query would
# exceed the staleness budget.

# Code changed in round 5 (existing green rows invalidated):
_CHANGED_R5 = (
    "qt32_cheapest_supplier",   # zero-quantity division guard
    "qx33_sequence_packing",    # pack_coordinates broadcast removal
    "qx35_pq_adc_topk",         # single-query limit(1) contract
    "qx40_ivfpq_search",        # inherits pq_adc_topk change
    "qm7_image_dedup_ahash",    # perceptual_ahash id_col schema
    "qx32_semantic_dedup",      # near_duplicate_pairs block cap
    "qx10_embedding_neardup",   # near_duplicate_pairs block cap
)
# New in round 5 (never driver-verified):
_NEW_R5 = (
    "qm8_real_audio_decode",
    "qs10_incremental_ivfpq",
    "qx45_packed_sequences",
    "qx46_densified_packing",
    "qx47_ivf_blocked_neardup",
    "qx48_embedding_decontamination",
    "qx49_corpus_split",
    "qx50_long_gram_overlap",
    "qs11_stream_quality_gate",
)
# Round-1 rows, three driver rounds stale — the oldest official signal
# in the repo; every one of these must land in the round-5 window.
_R1_STALE = (
    "qt3_semi_join",
    "qt4_top_orders_per_customer",
    "qt5_rollup",
    "qt6_union",
    "qt6_intersect",
    "qt6_except",
    "qt7_approx_distinct",
    "qt8_scalar_strings",
    "qt9_scalar_dates",
    "qt19_forecast_revenue",
    "qt20_volume_shipping",
    "qt21_market_share",
    "qt22_returned_items",
    "qt23_promo_revenue",
    "qt24_small_qty_revenue",
    "qt25_large_volume_customers",
    "qt26_disjunctive_revenue",
    "qt27_late_shipment_priority",
    "qt28_idle_rich_customers",
    "qt29_array_map_battery",
)
# Round-3 rows refreshed with the remaining window slots — exactly
# filling the 50-entry window together with the three groups above
# (len asserted below); the rest of the round-3 cohort leads the
# round-6 rotation.
_R3_REFRESH = (
    "qm5_audio_features",
    "qe1_dedup_latest",
    "qe2_daily_rollup",
    "qe3_json_projection",
    "qe4_hourly_type_series",
    "qe10_salted_type_totals",
    "qe11_json_battery",
    "qe13_funnel",
    "qm1_multimodal_meta",
    "qm2_image_features",
    "qm3_frame_sample",
    "qm4_resize_plumbing",
    "qs1_stream_hourly_counts",
    "qs2_stream_session_windows",
)


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

_HEAD = _CHANGED_R5 + _NEW_R5 + _R1_STALE + _R3_REFRESH

if len(_HEAD) != 50:  # pragma: no cover - registry sanity
    raise AssertionError(
        f"priority head must exactly fill the 50-entry driver window, "
        f"got {len(_HEAD)}"
    )

_ALL: list[Query] = [
    # Strict indexing: a misspelled head entry must raise, not
    # silently fall out of the verification window.
    *[_BY_NAME[n] for n in _HEAD],
    # --- tail: round-4-verified and the rest of the round-3 cohort,
    # in module order ---
    *[q for q in ext_queries.QUERIES if q.name not in _HEAD],
    *[q for q in streaming_queries.QUERIES if q.name not in _HEAD],
    *[q for q in events_queries.QUERIES if q.name not in _HEAD],
    *[q for q in relational_queries.QUERIES if q.name not in _HEAD],
    *[q for q in tpch_queries.QUERIES if q.name not in _HEAD],
    *[q for q in tpch2_queries.QUERIES if q.name not in _HEAD],
    *[q for q in tpch3_queries.QUERIES if q.name not in _HEAD],
]

QUERIES: dict[str, Query] = {q.name: q for q in _ALL}

if len(QUERIES) != len(_ALL):  # pragma: no cover - registry sanity
    raise AssertionError("duplicate query names in registry")


def get_queries() -> dict[str, Query]:
    return QUERIES
