"""Gap-based sessionization (batch form of streaming session windows).

The batch analog of ``session_window(ts, gap)``: a new session starts
when the gap to the previous event of the same user exceeds the
threshold. One shuffle (partitionBy user) feeds both window passes and
the final per-session aggregate — Catalyst reuses the partitioning, so
this is a single exchange at any scale. Gap comparison is done on
microsecond integers so batch, streaming, and SQL oracles agree
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.functions.time import ts_micros


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids and aggregate per session.

    Output: user_id, session_id (1-based per user), n_events,
    duration_us, start_s (formatted string start time).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    us = ts_micros(ts_col)
    prev_us = F.lag(us).over(w)
    new_sess = F.when(
        prev_us.isNull() | ((us - prev_us) > F.lit(gap_us)), 1
    ).otherwise(0)
    with_sess = df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
        F.date_format(F.min(F.col(ts_col)), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "start_s"
        ),
    )


def funnel_levels(
    df: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy event funnel — the engine's ``windowFunnel`` analog
    (ClickHouse's funnel analytic over the archived events table).

    Semantics (deterministic, documented): t1 = user's earliest step-1
    event; t_{i+1} = earliest step-(i+1) event at/after t_i; level =
    number of steps reached with t_level - t1 <= window. Greedy
    earliest-match rather than ClickHouse's chain-maximizing search —
    identical on well-separated funnels, and exactly mirrorable in SQL.

    Plan shape: one shuffle total. Each step is a windowed min over
    the SAME partitionBy(user) — consecutive window stages reuse one
    exchange; the final per-user collapse is a groupBy on the already
    co-partitioned data.
    """
    w = Window.partitionBy(user_col)
    us = ts_micros(ts_col)
    out = df
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (us >= F.col(prev))
        out = out.withColumn(f"__t{i}", F.min(F.when(cond, us)).over(w))
        prev = f"__t{i}"
    lvl = F.lit(0)
    win_us = F.lit(window_seconds * 1_000_000)
    for i in range(1, len(steps) + 1):
        ok = F.col(f"__t{i}").isNotNull() & (
            (F.col(f"__t{i}") - F.col("__t1")) <= win_us
        )
        lvl = F.when(ok, F.lit(i)).otherwise(lvl) if i == 1 else F.when(
            ok & (lvl == i - 1), F.lit(i)
        ).otherwise(lvl)
    return (
        out.groupBy(user_col)
        .agg(F.max(lvl).alias("level"))
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
