"""Reusable DataFrame -> DataFrame operators.

Each operator is a plain function over DataFrames: declarative Catalyst
plans in, declarative plans out. Query builders in ``plans/`` compose
these; pipelines in ``sources/``/``streaming/`` reuse them unchanged.
"""

from gh_archive_clickhouse_spark.operators.asof import (
    asof_join,
    range_join_count,
)
from gh_archive_clickhouse_spark.operators.dedup import (
    connected_components,
    containment_pairs,
    dedup_exact_text,
    latest_by_key,
    latest_by_key_agg,
    long_gram_overlap_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    passage_dup_stats,
    simhash,
)
from gh_archive_clickhouse_spark.operators.packing import (
    budget_select,
    densify_order,
    emit_packed_sequences,
    mixture_gate,
    mixture_rates,
    mixture_rates_from_counts,
    mixture_resample,
    pack_coordinates,
    seeded_shuffle,
    sequence_fill_stats,
    shard_assignments,
    source_counts,
    verify_training_shards,
    write_training_shards,
)
from gh_archive_clickhouse_spark.operators.sessionize import sessionize
from gh_archive_clickhouse_spark.operators.similarity import (
    build_ivfpq_index,
    cosine_topk,
    ivf_assign,
    kmeans_fit,
    near_duplicate_pairs,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
    probe_ivfpq_index,
    quantize_int8,
)
from gh_archive_clickhouse_spark.operators.topk import top_k_per_group
from gh_archive_clickhouse_spark.operators.ttl import expire_older_than

__all__ = [
    "asof_join",
    "range_join_count",
    "connected_components",
    "containment_pairs",
    "dedup_exact_text",
    "latest_by_key",
    "latest_by_key_agg",
    "long_gram_overlap_pairs",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "passage_dup_stats",
    "simhash",
    "budget_select",
    "densify_order",
    "emit_packed_sequences",
    "pack_coordinates",
    "seeded_shuffle",
    "sequence_fill_stats",
    "shard_assignments",
    "write_training_shards",
    "verify_training_shards",
    "mixture_resample",
    "mixture_rates",
    "mixture_rates_from_counts",
    "mixture_gate",
    "source_counts",
    "sessionize",
    "build_ivfpq_index",
    "cosine_topk",
    "ivf_assign",
    "kmeans_fit",
    "near_duplicate_pairs",
    "pq_adc_topk",
    "pq_codebook",
    "pq_encode",
    "probe_ivfpq_index",
    "quantize_int8",
    "top_k_per_group",
    "expire_older_than",
]
