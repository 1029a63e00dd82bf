"""Column-expression building blocks shared by operators and queries.

Everything here returns Spark ``Column`` expressions built from
``pyspark.sql.functions`` — JVM-side, codegen-eligible, no Python UDFs —
so they stay inside WholeStageCodegen at any scale.
"""

from gh_archive_clickhouse_spark.functions.hashing import (
    md5_long,
    minhash_param_hash,
    word_hash31,
)
from gh_archive_clickhouse_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)
from gh_archive_clickhouse_spark.functions.time import ts_micros
from gh_archive_clickhouse_spark.functions.text import (
    token_count,
    tokens,
)

__all__ = [
    "md5_long",
    "minhash_param_hash",
    "word_hash31",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "token_count",
    "ts_micros",
    "tokens",
]
