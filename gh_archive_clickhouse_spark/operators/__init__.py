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
    dedup_exact_text,
    latest_by_key,
    latest_by_key_agg,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from gh_archive_clickhouse_spark.operators.sessionize import sessionize
from gh_archive_clickhouse_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    near_duplicate_pairs,
)
from gh_archive_clickhouse_spark.operators.topk import top_k_per_group
from gh_archive_clickhouse_spark.operators.ttl import expire_older_than

__all__ = [
    "asof_join",
    "range_join_count",
    "dedup_exact_text",
    "latest_by_key",
    "latest_by_key_agg",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "simhash",
    "sessionize",
    "cosine_topk",
    "ivf_assign",
    "near_duplicate_pairs",
    "top_k_per_group",
    "expire_older_than",
]
