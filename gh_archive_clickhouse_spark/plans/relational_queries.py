"""Qt10+ / Qe8+: extended relational surface — window-function battery,
cube & grouping sets, pivot, exact percentiles, correlated subqueries,
as-of join, bucketed range join.

Together with tpch_queries.py this closes out the operator families in
SURVEY.md §2.4 that the reference implicitly delegates to ClickHouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.asof import (
    asof_join,
    range_join_count,
)
from gh_archive_clickhouse_spark.plans.common import Query, read

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def qe8_asof_click_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(purchases, clicks, key="user_id")
    return joined.select("event_id", "user_id", "asof_ts_us", "n_right_so_far")


def qe9_range_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error")
    return range_join_count(errors, ev, key="user_id", width_seconds=3600)


def qt10_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc()
    )
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").asc())
        .rangeBetween(-1000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.lag("o_totalprice").over(w).alias("lag_price"),
        F.lead("o_totalprice").over(w).alias("lead_price"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("run_sum"),
        F.dense_rank().over(w_price).alias("price_drank"),
        F.first("o_totalprice").over(run).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("range_sum"),
    )


def qt11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().alias("gid"),
    )


def qt11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    read(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price,
               count(1) AS n,
               grouping_id() AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def qt14_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return pivoted.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
    )


def qt15_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.9), 6).alias("p90"),
        F.round(F.min("o_totalprice"), 2).alias("pmin"),
        F.round(F.max("o_totalprice"), 2).alias("pmax"),
    )


def qt16_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    read(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
          SELECT 1.5 * avg(o2.o_totalprice)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


_ASOF_WINDOW = (
    "OVER (PARTITION BY user_id ORDER BY ts, is_left "
    "ROWS UNBOUNDED PRECEDING)"
)

QUERIES = [
    Query(
        "qe8_asof_click_before_purchase",
        "as-of join: latest click at-or-before each purchase, per user",
        qe8_asof_click_before_purchase,
        f"""
        WITH tagged AS (
          SELECT user_id, ts, 1 AS is_left, CAST(NULL AS BIGINT) AS r_us,
                 event_id
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, epoch_us(ts), NULL
          FROM events WHERE event_type = 'click'
        ), run AS (
          SELECT *,
                 max(r_us) {_ASOF_WINDOW} AS asof_ts_us,
                 count(r_us) {_ASOF_WINDOW} AS n_right_so_far
          FROM tagged
        )
        SELECT event_id, user_id, asof_ts_us, n_right_so_far
        FROM run WHERE is_left = 1
        """,
        tags=("relational", "asof"),
    ),
    Query(
        "qe9_range_join_errors",
        "range join: events of same user within 1h before each error",
        qe9_range_join_errors,
        """
        SELECT l.event_id, count(r.ts) AS n_in_range
        FROM (SELECT * FROM events WHERE event_type = 'error') l
        LEFT JOIN events r
          ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 1 HOUR
         AND r.ts <  l.ts
        GROUP BY l.event_id
        """,
        tags=("relational", "rangejoin"),
    ),
    Query(
        "qt10_window_battery",
        "window functions: lag/lead/running/dense_rank/first/last/range frame",
        qt10_window_battery,
        """
        SELECT o_orderkey, o_custkey,
               CAST(row_number() OVER w AS INTEGER) AS rn,
               lag(o_totalprice) OVER w AS lag_price,
               lead(o_totalprice) OVER w AS lead_price,
               round(sum(o_totalprice) OVER
                 (w ROWS UNBOUNDED PRECEDING), 2) AS run_sum,
               CAST(dense_rank() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC) AS INTEGER) AS price_drank,
               first_value(o_totalprice) OVER
                 (w ROWS UNBOUNDED PRECEDING) AS first_price,
               last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED
                 PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice ASC RANGE BETWEEN 1000 PRECEDING
                 AND CURRENT ROW), 2) AS range_sum
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC)
        """,
        tags=("relational", "window"),
    ),
    Query(
        "qt11_cube",
        "CUBE(status, priority) with grouping_id",
        qt11_cube,
        """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price,
               count(*) AS n,
               CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        tags=("relational", "rollup"),
    ),
    Query(
        "qt11_grouping_sets",
        "explicit GROUPING SETS aggregation",
        qt11_grouping_sets,
        """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price,
               count(*) AS n,
               CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        tags=("relational", "rollup"),
    ),
    Query(
        "qt14_pivot",
        "pivot event_type into per-user count columns",
        qt14_pivot,
        """
        SELECT user_id,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events GROUP BY user_id
        """,
        tags=("relational", "pivot"),
    ),
    Query(
        "qt15_percentiles",
        "exact interpolated percentiles per group",
        qt15_percentiles,
        """
        SELECT o_orderstatus,
               round(percentile_cont(0.5) WITHIN GROUP
                 (ORDER BY o_totalprice), 6) AS p50,
               round(percentile_cont(0.9) WITHIN GROUP
                 (ORDER BY o_totalprice), 6) AS p90,
               round(min(o_totalprice), 2) AS pmin,
               round(max(o_totalprice), 2) AS pmax
        FROM orders GROUP BY o_orderstatus
        """,
        tags=("relational", "percentile"),
    ),
    Query(
        "qt16_correlated_scalar",
        "correlated scalar subquery: orders 1.5x above their customer's average",
        qt16_correlated_scalar,
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
          SELECT 1.5 * avg(o2.o_totalprice)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """,
        tags=("relational", "subquery"),
    ),
]
