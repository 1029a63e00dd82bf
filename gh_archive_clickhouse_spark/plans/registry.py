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

# NOTE (driver-artifact coupling): the _HEAD below is built for the
# round AFTER the newest committed CORRECTNESS_r*.json. Landing a new
# driver results file therefore REQUIRES rotating this head in the
# SAME commit, or tests/test_registry_rotation.py goes red — that
# coupling is deliberate (the red test prints the exact list to
# rotate in).

# Code changed in round 7 (existing green rows invalidated):
_CHANGED_R7 = (
    "qs4_stream_incremental_lsh",  # crash-atomic fold manifest write
    "qs10_incremental_ivfpq",      # inherits the fold manifest change
    "qm3_frame_sample",            # Y4M magic-byte dispatch precedence
    "qm9_real_video_decode",       # stdlib-first Y4M decode routing
    "qx53_budget_selection",       # budget_select weight-contract assert
    "qx52_bpe_encode",             # encode tail refactored into _bpe_join_back
)
# New in round 7 (never driver-verified): appended as they are built;
# each addition here displaces the tail _R5_REFRESH entry so the head
# stays exactly 50.
_NEW_R7 = (
    "qx58_bpe_encode_kernel",
    "qs13_stream_dedup_survivors",
    "qx59_seeded_shuffle",
    "qx60_mixture_resample",
)
# Round-4 rows, two driver rounds stale — the oldest official signal
# in the repo; every one of these must land in the round-7 window
# (the rotation tripwire test enumerates exactly this set).
_R4_STALE = (
    "qe15_hourly_anomaly",
    "qm6_real_image_decode",
    "qs6_stream_stream_join",
    "qs7_incremental_mv",
    "qs8_stream_exactly_once_dedup",
    "qs9_stream_static_enrich",
    "qt1_pricing_summary",
    "qt2_regional_revenue",
    "qt3_anti_join",
    "qt10_window_battery",
    "qt11_cube",
    "qt11_grouping_sets",
    "qt12_shipping_priority",
    "qt13_order_count_distribution",
    "qt14_pivot",
    "qt15_percentiles",
    "qt16_correlated_scalar",
    "qt17_approx_percentile",
    "qt18_sorted_array_agg",
    "qt33_nation_year_profit",
    "qt34_important_parts",
    "qt35_dominant_suppliers",
    "qx22_tfidf_top_terms",
    "qx23_ngram_contamination",
    "qx26_dedup_clusters",
    "qx30_repetition_ratio",
    "qx31_dedup_survivors",
    "qx34_pq_encode",
    "qx36_passage_dedup",
    "qx37_containment_neardup",
    "qx38_model_scored_filter",
    "qx39_vocab_heavy_hitters",
    "qx41_batched_topk",
    "qx42_preprocess_pipeline",
    "qx43_lsh_recall_probe",
    "qx44_data_quality_audit",
)
# Round-5 rows refreshed with the remaining window slots — filling the
# 50-entry window together with the three groups above (len asserted
# below); the rest of the round-5 cohort leads the round-8 rotation.
# ROUND-8 BUDGET NOTE: 42 round-5 rows remain outside this window and
# must ALL take round-8 slots (they go 3-stale otherwise), leaving ~8
# slots for round-8 changed+new work. At 136 queries and a 50-slot
# window the steady state is ~45 maintenance slots per round — scope
# future rounds to ≤5-8 changed+new queries, or widen the driver
# window.
_R5_REFRESH = (
    "qe1_dedup_latest",
    "qe2_daily_rollup",
    "qm7_image_dedup_ahash",
    "qm8_real_audio_decode",
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

_HEAD = _CHANGED_R7 + _NEW_R7 + _R4_STALE + _R5_REFRESH

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
