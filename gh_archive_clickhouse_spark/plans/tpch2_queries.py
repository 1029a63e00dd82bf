"""Qt19–Qt28: the second TPC-H battery — the classic query shapes the
fixture star schema can express (the fixtures carry no partsupp table
and no l_shipmode/l_commitdate/l_receiptdate/p_container columns, so
Q2/Q9/Q11/Q12/Q16/Q20/Q21 are out of reach and the remaining classics
are adapted to the available columns; see FIXTURES.md §3).

Like tpch_queries.py, this is capability-contract surface (SURVEY.md
§2.4): the reference delegates every SELECT to ClickHouse, so these pin
the equivalent native surface here — selective-filter scans, star
joins, correlated and scalar subqueries, semi/anti joins with non-equi
conditions, disjunctive predicate pushdown, conditional aggregation,
and HAVING-style two-level aggregation.

Scale notes per query in the builders. Money aggregates use the
dec_sum/dec_avg order-exact forms (plans/common.py) so results don't
depend on partition count or AQE decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.plans.common import (
    Query,
    dec_sum,
    read,
)

# revenue expression, built lazily (Column construction needs a live
# SparkContext; this module imports at test collection time without one)
def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"
# Order-exact money sum / ratio fragments (see dec_sum/dec_avg).
_SQL_DECSUM = "CAST(round(sum(CAST({x} AS DECIMAL(18,6))), 2) AS DOUBLE)"
_SQL_DSUM = "CAST(sum(CAST({x} AS DECIMAL(18,6))) AS DOUBLE)"


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def qt19_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum, no join, no groupBy.

    Everything pushes to the parquet scan (range predicates on
    shipdate/discount/quantity are all PushedFilters); the aggregate is
    a one-row partial+final — the cheapest possible plan at any scale.
    """
    li = read(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


def qt20_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two trading nations per year.

    The nation-pair cut shrinks supplier/customer to a constant
    FRACTION — still proportional to SF, so the joins are left to AQE
    (the qe14 rule: no forced broadcast of frames whose cardinality
    scales with the facts; broadcast at small SF, SMJ at warehouse
    scale). lineitem⋈orders is the only unavoidable fact-fact shuffle.
    """
    n1, n2 = "NATION_1", "NATION_2"
    nation = read(spark, sf_dir, "nation")
    sup = (
        read(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .filter(F.col("supp_nation").isin(n1, n2))
    )
    cust = (
        read(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin(n1, n2))
    )
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") <= _ts("1997-12-31"))
    )
    o = read(spark, sf_dir, "orders")
    joined = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_sum(_rev()).alias("revenue"))
    )


def qt21_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside a region, per
    year — conditional aggregation over a 7-table star join.

    Fixed-cardinality dims (nation/region) and the type-filtered part
    broadcast by hint; supplier and the region's customer-key set
    scale with SF, so those joins are left to AQE (the qe14 rule —
    a region's customer set is not broadcastable at warehouse SF).
    The share division runs on order-exact decimal sums so the ratio
    is engine-deterministic — bit-identical to the oracle while the
    unscaled sums stay below 2^53 (enforced through the sf≤2 verified
    envelope by tests/test_knife_edge.py; qt21's largest per-year
    denominator crosses near sf5.9).
    """
    nation = read(spark, sf_dir, "nation")
    region = read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = read(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = read(spark, sf_dir, "supplier").join(
        F.broadcast(
            nation.select(
                "n_nationkey", F.col("n_name").alias("supp_nation")
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    cust_nation = (
        read(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") <= _ts("1997-12-31"))
    )
    li = read(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_nation, F.col("o_custkey") == F.col("c_custkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", _rev())
        .otherwise(F.lit(0.0))
        .cast("decimal(18,6)")
    ).cast("double")
    den = F.sum(_rev().cast("decimal(18,6)")).cast("double")
    return (
        joined.groupBy(
            F.year(F.col("o_orderdate")).cast("int").alias("o_year")
        )
        .agg((num / den).alias("mkt_share"))
    )


def qt22_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. nation broadcasts by hint; the full customer table scales
    with SF so its join is left to AQE (the qe14 rule);
    TakeOrderedAndProject top-20.
    """
    c = read(spark, sf_dir, "customer")
    nation = read(spark, sf_dir, "nation")
    o = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = read(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    ).agg(dec_sum(_rev()).alias("revenue"))
    return agg.orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    ).limit(20)


def qt23_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one month — part join
    + conditional aggregation, single-row output.

    part here is UNFILTERED (the p_type test is the aggregation's
    CASE), so its cardinality scales with SF like any fact — the join
    is left to AQE per the qe14 rule (broadcast at small SF, SMJ at
    warehouse scale). The quotient is bit-identical to the oracle
    while the unscaled DECIMAL(18,6) sums stay below 2^53 (crosses
    near sf2.4 — enforced through the sf≤2 verified envelope by
    tests/test_knife_edge.py).
    """
    part = read(spark, sf_dir, "part")
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    joined = li.join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev())
        .otherwise(F.lit(0.0))
        .cast("decimal(18,6)")
    ).cast("double")
    den = F.sum(_rev().cast("decimal(18,6)")).cast("double")
    return joined.agg(
        (F.lit(100.0) * num / den).alias("promo_revenue_pct")
    )


def qt24_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand — correlated aggregate (per-part avg quantity) realized as a
    broadcast join of a pre-aggregated per-part table.

    Quantities are integral doubles, so avg is exact and the 0.2*avg
    threshold is engine-deterministic.
    """
    part = read(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = read(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_part_avg = branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    small = branded.join(
        F.broadcast(per_part_avg), F.col("l_partkey") == F.col("__pk")
    ).filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
    total = F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
        "double"
    )
    return small.agg((total / 7.0).alias("avg_yearly"))


def qt25_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed a total-quantity
    threshold — HAVING-style two-level aggregation feeding a semi join.

    The per-order quantity sum is exact (integral doubles); the heavy
    groupBy runs once and its survivor set — a small FRACTION but
    still proportional to SF — joins back against orders with the
    strategy left to AQE (the qe14 rule), as is the full customer
    join.
    """
    li = read(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("__ok"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 140)
    )
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    joined = (
        o.join(big, F.col("o_orderkey") == F.col("__ok"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
    )
    out = joined.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        "o_totalprice",
        "sum_qty",
    )
    return out.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).limit(10)


def qt26_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity conjunctions
    over part⋈lineitem. Catalyst extracts the common l_partkey
    equi-key from the OR-of-ANDs so this is a hash join, not a nested
    loop; part is unfiltered before the join (the disjunction needs
    its columns), so the join strategy is left to AQE per the qe14
    rule.
    """
    part = read(spark, sf_dir, "part")
    li = read(spark, sf_dir, "lineitem")
    joined = li.join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(16, 30))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(31, 50))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return joined.filter(cond).agg(dec_sum(_rev()).alias("revenue"))


def qt27_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: fixtures carry no commit/receipt dates,
    so "late" means shipped >60 days after the order date): order count
    per priority for orders with at least one late line.

    The EXISTS is a left-semi join whose condition mixes the equi-key
    with a non-equi date comparison — Spark still plans the equi part
    as the hash key and evaluates the date predicate as a join residual.
    """
    o = read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    li = read(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def qt28_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: fixtures carry no phone column, so the
    country-code filter becomes a nation-key subset): count + balance
    of above-average-balance customers with no RECENT orders (none
    since 1999 — the original's "no orders in 7 years" window).

    Scalar subquery (the average) broadcasts as a 1-row cross join;
    the idleness test is a left-anti join against date-filtered orders
    — the date predicate pushes to the orders scan, shrinking the anti
    join's build side before any shuffle.
    """
    keys = [1, 3, 5, 7, 9, 11, 13]
    c = read(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(keys)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg_bal")
    )
    o = read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    nation = read(spark, sf_dir, "nation")
    rich_idle = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return rich_idle.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("numcust"),
        dec_sum("c_acctbal").alias("totacctbal"),
    )



def qt29_array_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map scalar-function battery (SURVEY §2.4 scalar surface):
    construction, sort, membership, position, element access, map
    build/extract/keys, fold — all row-local codegen'd expressions
    except the tiny fold (interpreted HOF on a 3-element array)."""
    part = read(spark, sf_dir, "part")
    toks = F.array_remove(F.split(F.lower(F.col("p_name")), " "), "")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")),
        F.array(F.col("p_brand"), F.col("p_type")),
    )
    return part.select(
        "p_partkey",
        F.concat_ws(",", F.sort_array(toks)).alias("toks_sorted"),
        F.array_contains(toks, "widget").alias("has_widget"),
        F.element_at(toks, 2).alias("second_tok"),
        F.array_position(toks, "widget").cast("int").alias("widget_pos"),
        F.element_at(m, "brand").alias("brand_from_map"),
        F.concat_ws(",", F.map_keys(m)).alias("mkeys"),
        F.expr(
            "CAST(aggregate(array(p_size, p_size*2, 7), 0, (a,x) -> a+x) AS BIGINT)"
        ).alias("arr_sum"),
        F.concat_ws(
            "|",
            F.reverse(
                F.array(F.col("p_size").cast("string"), F.col("p_brand"))
            ),
        ).alias("rev_arr"),
    )


def qt30_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: fixtures carry no commit/receipt
    dates, so "late" = shipped > 60 days after order date): suppliers
    who were the ONLY late shipper in a finished multi-supplier order.

    The hard part is the double correlation — EXISTS (another supplier
    in the order) AND NOT EXISTS (another LATE supplier in the order)
    — expressed as a left-semi then left-anti self-join of lineitem on
    the order key with a supplier-inequality condition; both sides
    pre-filtered before the shuffle. Top-10 by violation count.
    """
    li = read(spark, sf_dir, "lineitem")
    o = read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s_ = read(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    cand = late.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    lone = cand.join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        lone.join(s_, lone.l_suppkey == s_.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


def qt31_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly per-supplier revenue view, then the
    supplier(s) whose revenue equals the maximum — the view + scalar
    max-subquery pattern. The max is a 1-row broadcast; revenue sums
    are DECIMAL-exact so the equality join is engine-stable."""
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s_ = read(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(s_, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


QUERIES = [
    Query(
        "qt19_forecast_revenue",
        "TPC-H Q6 shape: scan-filter-sum, fully pushed-down predicates",
        qt19_forecast_revenue,
        f"""
        SELECT {_SQL_DECSUM.format(x='l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
        """,
        tags=("tpch", "scan"),
    ),
    Query(
        "qt20_volume_shipping",
        "TPC-H Q7 shape: two-nation trade volume per year",
        qt20_volume_shipping,
        f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_SQL_DECSUM.format(x=_SQL_REV)} AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
        GROUP BY supp_nation, cust_nation, l_year
        """,
        tags=("tpch", "join"),
    ),
    Query(
        "qt21_market_share",
        "TPC-H Q8 shape: NATION_5 market share in ASIA PROMO parts",
        qt21_market_share,
        f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_SQL_DSUM.format(x=f"CASE WHEN n1.n_name = 'NATION_5' THEN {_SQL_REV} ELSE 0.0 END")}
                 / {_SQL_DSUM.format(x=_SQL_REV)} AS mkt_share
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
        GROUP BY o_year
        """,
        tags=("tpch", "join", "conditional-agg"),
    ),
    Query(
        "qt22_returned_items",
        "TPC-H Q10 shape: top-20 customers by returned revenue",
        qt22_returned_items,
        f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {_SQL_DECSUM.format(x=_SQL_REV)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
        """,
        tags=("tpch", "join", "topk"),
    ),
    Query(
        "qt23_promo_revenue",
        "TPC-H Q14 shape: promo revenue percentage in one month",
        qt23_promo_revenue,
        f"""
        SELECT 100.0 *
                 {_SQL_DSUM.format(x=f"CASE WHEN p_type = 'PROMO' THEN {_SQL_REV} ELSE 0.0 END")}
                 / {_SQL_DSUM.format(x=_SQL_REV)} AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        """,
        tags=("tpch", "join", "conditional-agg"),
    ),
    Query(
        "qt24_small_qty_revenue",
        "TPC-H Q17 shape: small-quantity revenue via correlated avg",
        qt24_small_qty_revenue,
        f"""
        SELECT {_SQL_DSUM.format(x='l_extendedprice')} / 7.0
               AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey)
        """,
        tags=("tpch", "join", "correlated"),
    ),
    Query(
        "qt25_large_volume_customers",
        "TPC-H Q18 shape: customers with >140-qty orders, top 10",
        qt25_large_volume_customers,
        """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date,
               o_totalprice, sum_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN (
          SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 140
        ) big ON o_orderkey = big.l_orderkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
        """,
        tags=("tpch", "join", "having"),
    ),
    Query(
        "qt26_disjunctive_revenue",
        "TPC-H Q19 shape: OR-of-ANDs brand/size/quantity revenue",
        qt26_disjunctive_revenue,
        f"""
        SELECT {_SQL_DECSUM.format(x=_SQL_REV)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 30
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50
               AND l_quantity BETWEEN 20 AND 30)
        """,
        tags=("tpch", "join", "disjunctive"),
    ),
    Query(
        "qt27_late_shipment_priority",
        "TPC-H Q4 shape (adapted): late-shipment orders per priority",
        qt27_late_shipment_priority,
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """,
        tags=("tpch", "semi", "non-equi"),
    ),
    Query(
        "qt28_idle_rich_customers",
        "TPC-H Q22 shape (adapted): rich customers idle since 1999",
        qt28_idle_rich_customers,
        """
        SELECT n_name,
               count(*) AS numcust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c_acctbal > (
            SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*)
            FROM customer c2
            WHERE c2.c_acctbal > 0.0
              AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY n_name
        """,
        tags=("tpch", "anti", "scalar-subquery"),
    ),
    Query(
        "qt29_array_map_battery",
        "scalar battery: array/map construction, access, sort, fold",
        qt29_array_map_battery,
        """
        WITH t AS (
          SELECT p_partkey, p_brand, p_type, p_size,
                 list_filter(string_split(lower(p_name), ' '), x -> x != '')
                   AS toks,
                 map(['brand','type'], [p_brand, p_type]) AS m
          FROM part
        )
        SELECT p_partkey,
               array_to_string(list_sort(toks), ',') AS toks_sorted,
               list_contains(toks, 'widget') AS has_widget,
               toks[2] AS second_tok,
               CAST(COALESCE(list_position(toks, 'widget'), 0) AS INTEGER)
                 AS widget_pos,
               (m['brand'])[1] AS brand_from_map,
               array_to_string(map_keys(m), ',') AS mkeys,
               CAST(list_aggregate([p_size, p_size*2, 7], 'sum') AS BIGINT)
                 AS arr_sum,
               array_to_string(list_reverse([CAST(p_size AS VARCHAR), p_brand]), '|')
                 AS rev_arr
        FROM t
        """,
        tags=("tpch", "scalar", "array", "map"),
    ),
    Query(
        "qt30_waiting_suppliers",
        "TPC-H Q21 shape: sole-late-supplier in multi-supplier orders "
        "(EXISTS + NOT EXISTS double correlation)",
        qt30_waiting_suppliers,
        """
        WITH late AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        SELECT s.s_name, count(*) AS numwait
        FROM late l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name ASC
        LIMIT 10
        """,
        tags=("tpch", "join", "correlated"),
    ),
    Query(
        "qt31_top_revenue_supplier",
        "TPC-H Q15 shape: revenue view + scalar max subquery",
        qt31_top_revenue_supplier,
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM revenue r JOIN supplier s ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        tags=("tpch", "agg", "subquery"),
    ),
]
