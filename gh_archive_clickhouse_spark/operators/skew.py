"""Skew-aware aggregation: salted two-stage aggregates.

A ``groupBy(k)`` over a low-cardinality or power-law key degenerates
at scale: one reducer per hot key receives the whole key's partition.
Map-side partial aggregation already absorbs most of this for
sum-decomposable aggregates, but any plan stage that materializes
per-key groups before reducing (collect/grouped-map/exact distinct)
— or a straggling hot reducer — needs salting: aggregate on
``(k, salt)`` first (fan-out = salt_buckets reducers per key), then
re-aggregate the partials on ``k``.

Deterministic salt: derived from a row hash, not ``rand()``, so
retried tasks produce identical partials (exactly-once safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_totals(
    df: DataFrame,
    key: str,
    value_col: str,
    salt_buckets: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage count + sum per key via salting.

    Stage 1 shuffles on ``(key, salt)`` — ``salt_buckets`` uniform
    sub-keys per hot key; stage 2 shuffles ``n_keys * salt_buckets``
    partial rows, which is negligible. Result is identical to
    ``groupBy(key).agg(count, sum)``; only the physical shuffle shape
    changes. The sum runs in DECIMAL(18,6): re-aggregating partials
    changes float accumulation order, but decimal addition is exact
    and therefore order-independent — any engine agrees bit-for-bit.
    """
    salt_cols = [F.col(c) for c in (salt_from or [value_col])]
    salt = F.pmod(F.hash(*salt_cols), F.lit(salt_buckets)).alias("__salt")
    partial = df.groupBy(F.col(key), salt).agg(
        F.count(F.lit(1)).alias("__pn"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__psum"),
    )
    return partial.groupBy(key).agg(
        F.sum("__pn").alias("n"),
        F.sum("__psum").cast("double").alias("sum_value"),
    )
