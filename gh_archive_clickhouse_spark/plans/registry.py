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

# Code changed in round 6 (existing green rows invalidated):
_CHANGED_R6 = (
    "qs4_stream_incremental_lsh",  # size-tiered epoch fold, parallel fold write
    "qs10_incremental_ivfpq",      # parallel per-batch append + fold change
    "qx35_pq_adc_topk",            # multi-row query frame now raises
    "qx40_ivfpq_search",           # inherits pq_adc_topk change
    "qm3_frame_sample",            # sample_frames gained Y4M/binary dispatch
)
# New in round 6 (never driver-verified): appended as they are built;
# each addition here displaces the tail _R4_REFRESH entry so the head
# stays exactly 50.
_NEW_R6 = (
    "qm9_real_video_decode",
    "qx51_bpe_vocab_build",
    "qx52_bpe_encode",
    "qx53_budget_selection",
    "qx54_subdivided_neardup",
    "qx55_rarity_score",
    "qs12_stream_budget_admission",
    "qx56_quality_dedup_cut",
    "qx57_split_leakage_cut",
)
# Round-3 rows, two driver rounds stale — the oldest official signal
# in the repo; every one of these must land in the round-6 window
# (the rotation tripwire test enumerates exactly this set).
_R3_STALE = (
    "qs3_stream_running_totals",
    "qs5_stream_sliding_rates",
    "qt30_waiting_suppliers",
    "qt31_top_revenue_supplier",
    "qx1_exact_dedup",
    "qx2_cosine_topk",
    "qx3_token_lang_stats",
    "qx4_language_id",
    "qx5_quality_score",
    "qx6_fingerprint",
    "qx7_simhash",
    "qx8_minhash_signature",
    "qx9_lsh_candidates",
    "qx11_ivf_assign",
    "qx12_ivf_topk",
    "qx13_simhash_neardup",
    "qx14_srp_buckets",
    "qx15_srp_topk",
    "qx16_token_quantiles",
    "qx17_user_event_ranks",
    "qx18_udtf_bigrams",
    "qx19_bpe_token_stats",
    "qx20_chargram_jaccard",
    "qx21_deterministic_sample",
    "qx24_embedding_quantize",
    "qx25_kmeans_ivf_build",
    "qx27_pii_scrub",
    "qx28_mixture_weights",
    "qx29_sketch_rollup",
)
# Round-4 rows refreshed with the remaining window slots — filling the
# 50-entry window together with the three groups above (len asserted
# below); the rest of the round-4 cohort leads the round-7 rotation.
_R4_REFRESH = (
    "qe5_ttl_survivors",
    "qe6_topk_users",
    "qe7_sessionization",
    "qe8_asof_click_before_purchase",
    "qe9_range_join_errors",
    "qe12_variant_projection",
    "qe14_cohort_retention",
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

_HEAD = _CHANGED_R6 + _NEW_R6 + _R3_STALE + _R4_REFRESH

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
