"""Relational surface beyond the reference: joins / multi-table aggregation.

The reference has NO joins (SURVEY.md §2.3 marks hash/broadcast/sort-merge/
semi/anti joins absent); Spark provides them natively. These TPC-H-style
queries over the driver's tables exercise that surface: broadcast dim joins,
shuffle joins, semi/anti joins, grouped aggregation, top-N over joins.

Money math discipline: monetary doubles are floored to integer cents PER ROW
before summing (``floor(x * 100)`` -> bigint). Bigint sums are exact and
order-independent, so Spark and DuckDB agree bit-for-bit regardless of
aggregation order (double sums would not).

Scale posture: dimension tables (region/nation/customer/supplier/part) are
broadcast -- no shuffle on the fact side except the final groupBy; AQE picks
broadcast automatically below the threshold, and we hint explicitly where the
dimension is guaranteed small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from cassandra_sstable_tools_spark.sources.tpch_adapter import load_table


def _rev_cents(ep: str = "l_extendedprice", disc: str = "l_discount"):
    return F.floor(F.col(ep) * (F.lit(1) - F.col(disc)) * 100).cast("bigint")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (scan + fused grouped aggregation)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "sum_base_cents"
            ),
            F.sum(_rev_cents()).alias("sum_disc_cents"),
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax"))
                    * 100
                ).cast("bigint")
            ).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
            F.floor(
                F.sum(F.floor("l_quantity").cast("bigint")) / F.count(F.lit(1))
            ).alias("avg_qty"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped orders by revenue (3-way join + top-N)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1995-03-15"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15"))
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("o_orderkey"))
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (6-way join, broadcast dims, grouped agg)."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change (pushed-down filter + global agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100)
                  .cast("bigint")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("matched_rows"),
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never placed an URGENT order, counted per
    market segment. (The fixture generator gives every customer at least one
    order, so the unrestricted anti join would be the degenerate empty set.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customer_count"))
    )


def priority_orders_with_cheap_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): orders having at least one tiny lineitem."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 2)
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLES = {
    "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS sum_disc_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT))
           AS BIGINT) AS sum_charge_cents,
       count(*) AS count_order,
       CAST(floor(sum(CAST(floor(l_quantity) AS BIGINT)) / count(*)) AS BIGINT) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
""",
    "tpch_q3": """
SELECT o_orderkey, o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT 10
""",
    "tpch_q5": """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
""",
    "tpch_q6": """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       count(*) AS matched_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    "customers_without_orders": """
SELECT c_mktsegment, count(*) AS customer_count
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY 1
""",
    "priority_orders_with_cheap_lines": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity < 2)
GROUP BY 1
""",
}

QUERIES = {
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "customers_without_orders": customers_without_orders,
    "priority_orders_with_cheap_lines": priority_orders_with_cheap_lines,
}
