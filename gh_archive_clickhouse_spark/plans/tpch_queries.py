"""Qt1–Qt9: the relational/OLAP query surface (SURVEY.md §2.4-2.5).

The reference has no query engine of its own — every SELECT a user of
gh-archive-clickhouse runs is served by ClickHouse. These queries pin
the equivalent native surface of this engine: joins (broadcast/shuffle,
semi/anti), hash aggregation, windows, rollup, set ops, approx
distinct, and the scalar function battery — all pure Catalyst.

Scale notes per query are in the builders: dims are broadcast, join
order keeps the big fact table un-reshuffled where possible, and every
orderBy+limit is a TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.topk import top_k_per_group
from gh_archive_clickhouse_spark.plans.common import (
    Query,
    dec_avg,
    dec_sum,
    dec_sum_2stage,
    read,
    us_avg,
    us_round,
)


def qt1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy on 2 low-cardinality keys.

    The 7 money aggregates run as ONE two-stage exact integer
    aggregation (micro-unit longs per input partition, decimal merge
    of the few partials — see dec_sum_2stage): bit-identical to per-
    column DECIMAL accumulation but ~2x faster, because the per-row
    hot loop is codegen long adds. Map-side partials still reduce the
    shuffle to ~6 rows/task."""
    li = read(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    totals = dec_sum_2stage(
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        ),
        ["l_returnflag", "l_linestatus"],
        {
            "qty": "l_quantity",
            "price": "l_extendedprice",
            "disc_price": disc_price,
            "charge": charge,
            "disc": "l_discount",
        },
        count_alias="count_order",
    )
    n = F.col("count_order")
    return totals.select(
        "l_returnflag",
        "l_linestatus",
        us_round(F.col("qty__us"), 2).alias("sum_qty"),
        us_round(F.col("price__us"), 2).alias("sum_base_price"),
        us_round(F.col("disc_price__us"), 2).alias("sum_disc_price"),
        us_round(F.col("charge__us"), 2).alias("sum_charge"),
        us_avg(F.col("qty__us"), n).alias("avg_qty"),
        us_avg(F.col("price__us"), n).alias("avg_price"),
        us_avg(F.col("disc__us"), n).alias("avg_disc"),
        n,
    )


def qt2_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. Fixed-cardinality dims
    (region/nation) broadcast by hint; customer/supplier — whose
    cardinality scales with the facts (SURVEY §4.3: no forced
    broadcast of unbounded frames, the qe14 rule) — are left to
    AQE, which picks broadcast at small SF and SMJ once a region's
    customer set outgrows the executors. The only unavoidable wide
    shuffle is fact-fact (orders⋈lineitem) and the final tiny agg."""
    region = read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read(spark, sf_dir, "nation")
    customer = read(spark, sf_dir, "customer")
    supplier = read(spark, sf_dir, "supplier")
    orders = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = read(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        # Q5 requires customer and supplier in the SAME nation.
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dec_sum(revenue).alias("revenue"))
    )


def qt3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never ordered: broadcast-able left-anti join."""
    part = read(spark, sf_dir, "part")
    li = read(spark, sf_dir, "lineitem")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
    )


def qt3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one high-value order: left-semi join."""
    customer = read(spark, sf_dir, "customer")
    orders = read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def qt4_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-3 orders per customer, deterministic ties."""
    orders = read(spark, sf_dir, "orders")
    ranked = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )
    return ranked.select("o_custkey", "o_orderkey", "o_totalprice", "rn")


def qt5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over nation × order-priority with grouping_id — the
    hierarchical-subtotal surface."""
    orders = read(spark, sf_dir, "orders")
    customer = read(spark, sf_dir, "customer")
    nation = read(spark, sf_dir, "nation")
    # customer scales with the facts — join strategy left to AQE
    # (the qe14 rule); nation is fixed-cardinality and hints safely.
    joined = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
    )


def qt6_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_sides(spark, sf_dir)
    return a.union(b).distinct()


def qt6_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_sides(spark, sf_dir)
    return a.intersect(b)


def qt6_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _setop_sides(spark, sf_dir)
    # subtract == EXCEPT DISTINCT (exceptAll would be EXCEPT ALL).
    return a.subtract(b)


def _setop_sides(spark: SparkSession, sf_dir: str):
    """Two custkey sets: customers with any order vs high-balance."""
    customer = read(spark, sf_dir, "customer")
    orders = read(spark, sf_dir, "orders")
    with_orders = customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey")
    high_balance = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return with_orders, high_balance


def qt7_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct sanity: HLL estimate within 15% of exact.

    Sketches differ across engines, so the oracle-checkable contract is
    (exact count, estimate-within-tolerance flag)."""
    orders = read(spark, sf_dir, "orders")
    agg = orders.agg(
        F.countDistinct("o_custkey").alias("exact_cnt"),
        F.approx_count_distinct("o_custkey").alias("__approx"),
    )
    return agg.select(
        "exact_cnt",
        (
            F.abs(F.col("__approx") - F.col("exact_cnt"))
            <= 0.15 * F.col("exact_cnt")
        ).alias("within_tol"),
    )


def qt8_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery (strings + math) over part."""
    p = read(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_pre"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_type"), "[AEIOU]", "").alias("type_novowel"),
        F.regexp_extract(F.col("p_brand"), "([0-9]+)", 1).alias("brand_num"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.col("p_name").contains("widget").alias("is_widget"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(
            F.col("p_retailprice") * F.col("p_size") / F.lit(7.0), 6
        ).alias("price_expr"),
        (F.col("p_size") % 5).alias("size_mod"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
    )


def qt9_scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery (dates) over orders."""
    o = read(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.weekday("o_orderdate") + 1).alias("isodow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.date_format(
            F.date_trunc("quarter", F.col("o_orderdate")), "yyyy-MM-dd"
        ).alias("quarter_start"),
        F.date_format(
            F.last_day(F.col("o_orderdate")), "yyyy-MM-dd"
        ).alias("month_end"),
    )


def qt12_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-10 by
    aggregated revenue. The filtered orders⋈customer side scales with
    SF, so its join strategy is left to AQE (broadcast at small SF,
    SMJ at warehouse scale — the qe14 rule); lineitem (the big side)
    is never re-shuffled before the join; the final top-10 is a
    TakeOrderedAndProject."""
    c = read(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(
        o.join(c, o.o_custkey == c.c_custkey),
        li.l_orderkey == o.o_orderkey,
    )
    agg = joined.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        "o_orderpriority",
    ).agg(dec_sum(revenue).alias("revenue"))
    return agg.orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc()
    ).limit(10)


def qt13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation —
    customers with zero orders must appear in the 0-bucket. The outer
    join broadcasts nothing (both sides keyed), the first groupBy
    shuffles per customer, the histogram groupBy is tiny."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def qt17_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch surface: percentile_approx (GK/KLL-style) sanity-checked
    against the exact percentile, per group. Like qt7, the sketch
    itself is engine-specific, so the oracle contract is (exact value,
    estimate-within-tolerance flag)."""
    o = read(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", 0.5), 6).alias("p50_exact"),
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("__approx"),
    )
    return agg.select(
        "o_orderstatus",
        "p50_exact",
        (
            F.abs(F.col("__approx") - F.col("p50_exact"))
            <= 0.05 * F.col("p50_exact")
        ).alias("within_tol"),
    )


def qt18_sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested aggregation: per-order sorted line-number list.
    collect_list is order-nondeterministic across partitions, so the
    deterministic contract is sort_array before serialization."""
    li = read(spark, sf_dir, "lineitem")
    lines = F.sort_array(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",", F.transform(lines, lambda x: x.cast("string"))
        ).alias("lines"),
        F.count(F.lit(1)).alias("n_lines"),
    )


QUERIES = [
    Query(
        "qt17_approx_percentile",
        "percentile_approx vs exact median within 5% per order status",
        qt17_approx_percentile,
        """
        SELECT o_orderstatus,
               round(percentile_cont(0.5) WITHIN GROUP
                 (ORDER BY o_totalprice), 6) AS p50_exact,
               CAST(1 AS BOOLEAN) AS within_tol
        FROM orders GROUP BY o_orderstatus
        """,
        tags=("tpch", "approx"),
    ),
    Query(
        "qt18_sorted_array_agg",
        "deterministic array agg: sorted per-order line numbers",
        qt18_sorted_array_agg,
        """
        SELECT l_orderkey,
               array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
        """,
        tags=("tpch", "agg", "nested"),
    ),
    Query(
        "qt12_shipping_priority",
        "TPC-H Q3 shape: 3-way join, revenue top-10",
        qt12_shipping_priority,
        """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date,
               o_orderpriority,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_date, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
        """,
        tags=("tpch", "join", "topk"),
    ),
    Query(
        "qt13_order_count_distribution",
        "TPC-H Q13 shape: left outer join + order-count histogram",
        qt13_order_count_distribution,
        """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
        """,
        tags=("tpch", "join", "agg"),
    ),
    Query(
        "qt1_pricing_summary",
        "TPC-H Q1 shape: filter + 8-agg groupBy on lineitem",
        qt1_pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / count(l_quantity) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / count(l_extendedprice) AS avg_price,
               CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                 / count(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
        tags=("tpch", "agg"),
    ),
    Query(
        "qt2_regional_revenue",
        "TPC-H Q5 shape: 6-way star join + agg (ASIA, 1996-1997)",
        qt2_regional_revenue,
        """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        """,
        tags=("tpch", "join"),
    ),
    Query(
        "qt3_anti_join",
        "left-anti join: parts never ordered",
        qt3_anti_join,
        """
        SELECT p_partkey, p_name, p_brand FROM part
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        """,
        tags=("tpch", "join"),
    ),
    Query(
        "qt3_semi_join",
        "left-semi join: customers with a >100k order",
        qt3_semi_join,
        """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        """,
        tags=("tpch", "join"),
    ),
    Query(
        "qt4_top_orders_per_customer",
        "window ranking: top-3 orders per customer",
        qt4_top_orders_per_customer,
        """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
          FROM orders)
        WHERE rn <= 3
        """,
        tags=("tpch", "window"),
    ),
    Query(
        "qt5_rollup",
        "ROLLUP(nation, priority) with grouping_id",
        qt5_rollup,
        """
        SELECT n_name, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price,
               count(*) AS n_orders,
               CAST(grouping(n_name, o_orderpriority) AS BIGINT) AS gid
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, o_orderpriority)
        """,
        tags=("tpch", "rollup"),
    ),
    Query(
        "qt6_union",
        "set op: customers-with-orders ∪ high-balance customers",
        qt6_union,
        """
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        """,
        tags=("tpch", "setop"),
    ),
    Query(
        "qt6_intersect",
        "set op: customers-with-orders ∩ high-balance customers",
        qt6_intersect,
        """
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        """,
        tags=("tpch", "setop"),
    ),
    Query(
        "qt6_except",
        "set op: customers-with-orders − high-balance customers",
        qt6_except,
        """
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        """,
        tags=("tpch", "setop"),
    ),
    Query(
        "qt7_approx_distinct",
        "approx_count_distinct vs exact within 15% tolerance",
        qt7_approx_distinct,
        """
        SELECT count(DISTINCT o_custkey) AS exact_cnt,
               CAST(1 AS BOOLEAN) AS within_tol
        FROM orders
        """,
        tags=("tpch", "approx"),
    ),
    Query(
        "qt8_scalar_strings",
        "scalar battery: string/regex/math functions over part",
        qt8_scalar_strings,
        """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               substr(p_name, 1, 4) AS name_pre,
               CAST(length(p_name) AS INTEGER) AS name_len,
               p_brand || '|' || p_type AS brand_type,
               regexp_replace(p_type, '[AEIOU]', '', 'g') AS type_novowel,
               regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
               reverse(p_name) AS name_rev,
               contains(p_name, 'widget') AS is_widget,
               round(sqrt(p_retailprice), 6) AS price_sqrt,
               round(ln(p_retailprice), 6) AS price_ln,
               round(p_retailprice * p_size / 7.0, 6) AS price_expr,
               CAST(p_size % 5 AS INTEGER) AS size_mod,
               CAST(abs(p_size - 25) AS INTEGER) AS size_dev
        FROM part
        """,
        tags=("tpch", "scalar"),
    ),
    Query(
        "qt9_scalar_dates",
        "scalar battery: date functions over orders",
        qt9_scalar_dates,
        """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(day(o_orderdate) AS INTEGER) AS dom,
               CAST(isodow(o_orderdate) AS INTEGER) AS isodow,
               strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER)
                 AS days_since_epoch_start,
               strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
                 AS quarter_start,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
        FROM orders
        """,
        tags=("tpch", "scalar"),
    ),
]
