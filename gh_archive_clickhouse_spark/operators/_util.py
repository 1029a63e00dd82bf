"""Small shared utilities for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_rows_df(spark, rows, schema) -> DataFrame:
    """A driver-local SPEC-SIZED table (mixture rates, merge tables,
    model weights, single-row query literals) as a ONE-partition,
    JVM-only frame.

    ``spark.createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` Python-RDD slices, so EVERY downstream
    action — broadcast build, snapshot write, noop sink — pays a full
    task wave of Python-worker round-trips for a handful of rows
    (~0.35 s per action at local[32] for an 80-row table; a
    ``coalesce(1)`` on top is worse still: it computes the 32 Python
    slices SEQUENTIALLY in one task, 4+ s). Here the rows become one
    literal array-of-structs exploded in a single task: no Python
    worker in the lineage at all (~0.05 s per action), and one
    partition is the right layout for spec-sized metadata at any
    scale. Values must be plain literals (ints/floats/strings/bools/
    lists/None) — which is what a spec-sized table holds by
    definition; this is NOT a general createDataFrame replacement.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StructType

    st = (
        schema
        if isinstance(schema, StructType)
        else StructType.fromDDL(schema)
    )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for f, v in zip(st.fields, row)
            ]
        )
        for row in rows
    ]
    arr = (
        F.array(*structs)
        if structs
        # typed EMPTY array: explode yields the correct zero-row frame
        else F.array().cast(ArrayType(st))
    )
    return (
        spark.range(0, 1, 1, 1)
        .select(F.explode(arr).alias("__r"))
        .select(*[F.col(f"__r.{f.name}").alias(f.name) for f in st.fields])
    )


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Fan out compute-heavy per-row operators when the input arrives
    under-partitioned (e.g. one small parquet file → one task, so 31 of
    32 local cores idle).

    Only repartitions when the source has fewer partitions than half
    the cluster's default parallelism — a well-partitioned 100 TB input
    passes through untouched (no extra shuffle)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 1):
        return df.repartition(target)
    return df
