"""Qt32–Qt35: the third TPC-H battery — the shapes that classically
need the partsupp table (Q2/Q9/Q11/Q20), re-expressed on the fixture
star schema with lineitem as the part↔supplier link (FIXTURES.md has
no partsupp; the SHAPES — correlated-min election, multi-dim profit
rollup, global-scalar HAVING, nested quantity-threshold semi-join —
are what this battery pins, exactly as tpch2 adapted Q8/Q17/Q22).

Capability-contract surface (SURVEY.md §2.4): the reference delegates
every SELECT to ClickHouse (README.md:9-17), so these pin the
equivalent native surface here. Scale notes per builder; money math
uses the order-exact DECIMAL forms from plans/common.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.plans.common import (
    Query,
    dec_sum,
    read,
)

_SQL_DECSUM = "CAST(round(sum(CAST({x} AS DECIMAL(18,6))), 2) AS DOUBLE)"


def qt32_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: elect, per part, the supplier(s) offering the
    MINIMUM unit price — a correlated-min subquery joined back into a
    star join (supplier ⋈ nation), top-20 by account balance.

    Scale shape: the per-(part, supplier) offer table aggregates
    map-side on uniform keys; the correlated min is a second tiny
    aggregate joined back on partkey (never a per-row subquery).
    nation and the type-filtered part broadcast by hint; supplier
    scales with SF so its join is left to AQE (the qe14 rule).
    orderBy+limit = TakeOrderedAndProject.
    """
    li = read(spark, sf_dir, "lineitem")
    part = read(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = read(spark, sf_dir, "supplier")
    nation = read(spark, sf_dir, "nation")
    # Pin the l_quantity = 0 edge in BOTH engines: Spark's Divide
    # yields NULL (min ignores it) while DuckDB double division yields
    # inf — filtering zero quantities here and in the oracle makes the
    # convention explicit instead of fixture-dependent.
    offers = li.filter(F.col("l_quantity") > 0).groupBy(
        "l_partkey", "l_suppkey"
    ).agg(
        F.min(
            F.col("l_extendedprice") / F.col("l_quantity")
        ).alias("unit_cost")
    )
    best = offers.groupBy(
        F.col("l_partkey").alias("b_partkey")
    ).agg(F.min("unit_cost").alias("best_cost"))
    return (
        offers.join(
            best,
            on=[
                F.col("l_partkey") == F.col("b_partkey"),
                F.col("unit_cost") == F.col("best_cost"),
            ],
        )
        .select("l_partkey", "l_suppkey", "unit_cost")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(
            F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey"), "p_name", "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            "n_name",
            "s_name",
            "p_partkey",
        )
        .limit(20)
    )


def qt33_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by (supplier nation, order
    year) with a LIKE part filter. amount = revenue − imputed supply
    cost (0.6·retailprice·qty, ≤3-decimal — exact in DECIMAL).

    Scale shape: one fact scan; the LIKE-filtered part and nation
    broadcast by hint, supplier's join is left to AQE (the qe14
    rule); orders⋈lineitem is the bucketed fact-fact pair; single
    hash aggregate on (nation, year).
    """
    li = read(spark, sf_dir, "lineitem")
    part = read(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = read(spark, sf_dir, "supplier")
    nation = read(spark, sf_dir, "nation")
    orders = read(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dec_sum(amount).alias("sum_profit"))
    )


def qt34_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value restricted to a
    supplier group, keeping parts whose value exceeds a FRACTION OF
    THE GLOBAL TOTAL — the scalar-subquery HAVING.

    Scale shape: one filtered aggregation per part + one one-row total
    (crossJoin broadcast of the scalar); threshold compare is a map
    filter. Both aggregates are order-exact DECIMAL sums.
    """
    li = read(spark, sf_dir, "lineitem")
    supp = read(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < 5
    )
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # the supplier-group key set is a constant fraction of supplier —
    # proportional to SF, so the join is left to AQE (the qe14 rule)
    scoped = li.join(
        supp.select("s_suppkey"),
        li.l_suppkey == F.col("s_suppkey"),
    )
    per_part = scoped.groupBy("l_partkey").agg(
        dec_sum(value).alias("part_value")
    )
    total = scoped.agg(
        (dec_sum(value) * F.lit(0.001)).alias("__threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__threshold"))
        .select("l_partkey", "part_value")
    )


def qt35_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who, for SOME part shipped in 1997,
    carried more than 30% of that part's total shipped quantity — the
    nested correlated-threshold semi-join chain.

    Scale shape: per-(part, supplier) quantity aggregate (map-side
    combine) → per-part totals joined back on partkey → threshold
    filter → LEFT SEMI join into supplier. Never a per-row subquery.
    """
    li = read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = read(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < 10
    )
    # Quantities sum as DECIMAL (exact, order-independent) — a
    # long-cast would TRUNCATE fractional quantities in Spark while
    # DuckDB's BIGINT cast rounds, silently diverging the engines the
    # moment a fixture carries a non-integral quantity.
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sq")
    )
    totals = shipped.groupBy("l_partkey").agg(
        F.sum("sq").alias("tq")
    )
    dominant = (
        shipped.join(totals, "l_partkey")
        .filter(
            F.col("sq").cast("double")
            > F.lit(0.3) * F.col("tq").cast("double")
        )
        .select("l_suppkey")
    )
    return (
        supp.join(
            dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


QUERIES = [
    Query(
        "qt32_cheapest_supplier",
        "TPC-H Q2 shape: correlated-min supplier election per part "
        "+ star join, top-20",
        qt32_cheapest_supplier,
        """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min(unit_cost) AS best_cost FROM offers GROUP BY 1
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
       o.unit_cost
FROM offers o
JOIN best b ON o.l_partkey = b.l_partkey AND o.unit_cost = b.best_cost
JOIN part p ON o.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
JOIN supplier s ON o.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 20
        """,
        tags=("tpch",),
    ),
    Query(
        "qt33_nation_year_profit",
        "TPC-H Q9 shape: profit by supplier nation and order year, "
        "LIKE part filter",
        qt33_nation_year_profit,
        f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       {_SQL_DECSUM.format(
           x="l.l_extendedprice * (1 - l.l_discount)"
             " - 0.6 * p.p_retailprice * l.l_quantity")} AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
        """,
        tags=("tpch",),
    ),
    Query(
        "qt34_important_parts",
        "TPC-H Q11 shape: per-part value above a fraction of the "
        "global total (scalar-subquery HAVING)",
        qt34_important_parts,
        f"""
WITH scoped AS (
  SELECT l.l_partkey, l.l_extendedprice * (1 - l.l_discount) AS v
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey < 5
), per_part AS (
  SELECT l_partkey, {_SQL_DECSUM.format(x="v")} AS part_value
  FROM scoped GROUP BY 1
), total AS (
  SELECT {_SQL_DECSUM.format(x="v")} * 0.001 AS threshold FROM scoped
)
SELECT l_partkey, part_value
FROM per_part, total WHERE part_value > threshold
        """,
        tags=("tpch",),
    ),
    Query(
        "qt35_dominant_suppliers",
        "TPC-H Q20 shape: suppliers carrying > 30% of some part's "
        "1997 shipped quantity (nested threshold semi-join)",
        qt35_dominant_suppliers,
        """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,6))) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), totals AS (
  SELECT l_partkey, sum(sq) AS tq
  FROM shipped GROUP BY 1
), dominant AS (
  SELECT DISTINCT sh.l_suppkey
  FROM shipped sh JOIN totals t ON sh.l_partkey = t.l_partkey
  WHERE CAST(sh.sq AS DOUBLE) > 0.3 * CAST(t.tq AS DOUBLE)
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN dominant d ON s.s_suppkey = d.l_suppkey
WHERE s.s_nationkey < 10
ORDER BY s.s_name
        """,
        tags=("tpch",),
    ),
]
