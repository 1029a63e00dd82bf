"""Top-k operators.

Global top-k (`orderBy().limit(k)`) compiles to TakeOrderedAndProject —
per-partition heaps merged at the driver, no global sort. Grouped top-k
uses rank-over-window; the single shuffle partitions by the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column], k: int
) -> DataFrame:
    """k best rows per group under a deterministic total order; adds
    ``rn`` (1..k) to the output."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    )
