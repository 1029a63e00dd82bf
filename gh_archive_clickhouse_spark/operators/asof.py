"""As-of join and bucketed range join — time-series operators Spark
has no native form for (the "custom operator" tier of SURVEY.md §2.6's
mandate), built as compositions of existing DataFrame ops so they stay
declarative and scale-safe.

**As-of join** (backward): for each left row, the most recent right row
of the same key at-or-before its timestamp. Implemented with the
union-and-running-aggregate trick instead of a per-key merge: tag both
sides, union, and take running aggregates over
``Window.partitionBy(key).orderBy(ts, side)`` — ONE shuffle on the key,
no per-row probing, no Python. (``pd.merge_asof`` via applyInPandas
would work per group but pays Arrow transfer; the union form is pure
JVM.)

**Range join**: matching ``r.ts ∈ [l.ts - width, l.ts)`` naively makes
Catalyst fall back to a broadcast-nested-loop / cartesian per key.
Bucketizing time turns it into an equi-join on (key, bucket) with a
bounded expansion factor of 2, then an exact range filter — the
standard large-scale pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.functions.time import ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + running aggregates of the
    latest right row with ``right.ts <= left.ts`` per key.

    Appends ``asof_ts_us`` (microsecond timestamp of the matched right
    row, NULL when none) and ``n_right_so_far`` (how many right rows
    precede). Running max/count are order-insensitive under ties, so
    the result is deterministic without a tie-break column.
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__r_us"),
        F.struct(*lcols).alias("__payload"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        ts_micros(right_ts).alias("__r_us"),
        F.lit(None)
        .cast(l_tag.schema["__payload"].dataType)
        .alias("__payload"),
    )
    # right rows sort before left rows at equal ts → '<=' semantics
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag).select(
        "*",
        F.max("__r_us").over(w).alias("asof_ts_us"),
        F.count("__r_us").over(w).alias("n_right_so_far"),
    )
    out = merged.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__payload.{c}").alias(c) for c in lcols],
        "asof_ts_us",
        "n_right_so_far",
    )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    width_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
) -> DataFrame:
    """Count right rows with ``ts ∈ [left.ts - width, left.ts)`` per
    left row, same key — via time-bucketed equi-join.

    Left explodes to the (at most 2) buckets its window overlaps;
    the join is a plain shuffle equi-join on (key, bucket); the exact
    range predicate filters after. A left row with zero matches still
    appears (count 0) via the final left join back.
    """
    w_us = width_seconds * 1_000_000
    l_us = ts_micros(left_ts)
    r_us = ts_micros(right_ts)
    l = left.select(
        F.col(key).alias("__k"), F.col(left_id).alias("__lid"), l_us.alias("__l_us")
    )
    l_exploded = l.select(
        "*",
        F.explode(
            F.sequence(
                F.floor((F.col("__l_us") - w_us) / w_us),
                F.floor(F.col("__l_us") / w_us),
            )
        ).alias("__bucket"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        r_us.alias("__r_us"),
        F.floor(r_us / w_us).alias("__bucket"),
    )
    matched = (
        l_exploded.join(r, ["__k", "__bucket"])
        .filter(
            (F.col("__r_us") >= F.col("__l_us") - w_us)
            & (F.col("__r_us") < F.col("__l_us"))
        )
        .groupBy("__lid")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        l.select("__lid")
        .distinct()
        .join(matched, "__lid", "left")
        .select(
            F.col("__lid").alias(left_id),
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_in_range"),
        )
    )
