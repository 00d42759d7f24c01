"""Relational surface over the driver testdata (SURVEY.md §2.9).

The reference has no relational operators (its closest artifact is the
txn-window id-equality pairing, `evaluation/EvaluationGraphComposer.java:96-126`);
in this engine the relational layer is stock Spark SQL — the value-add
is expressing each operator so Catalyst gets pushdown / broadcast /
partial aggregation, verified against the DuckDB oracle.

Naming: columns are aliased identically in Spark and oracle SQL (the
driver sorts columns by name before hashing).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from t_spoon_spark.queries.helpers import dd_fixed, dd_micros, fixed, micros
from t_spoon_spark.registry import register


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver runs queries in its own session; the oracle equality
    # contract (unix_micros == DuckDB epoch_us on NTZ parquet timestamps)
    # requires a UTC session tz. Dynamic conf — idempotent and safe.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from t_spoon_spark.session import load_events

        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- aggregation ---------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({dd_fixed('l_quantity')}) AS BIGINT) AS sum_qty_c,
           CAST(SUM({dd_fixed('l_extendedprice')}) AS BIGINT) AS sum_base_c,
           CAST(SUM({dd_fixed('l_extendedprice * (1 - l_discount)', 10000)}) AS BIGINT) AS sum_disc_c,
           CAST(SUM({dd_fixed('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 10000)}) AS BIGINT) AS sum_charge_c,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(fixed("l_quantity")).alias("sum_qty_c"),
            F.sum(fixed("l_extendedprice")).alias("sum_base_c"),
            F.sum(fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("sum_disc_c"),
            F.sum(
                fixed(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                    10000,
                )
            ).alias("sum_charge_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q6_revenue_filter",
    f"""
    SELECT CAST(SUM({dd_fixed('l_extendedprice * l_discount', 10000)}) AS BIGINT) AS revenue_c,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(fixed(F.col("l_extendedprice") * F.col("l_discount"), 10000)).alias("revenue_c"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- multi-way joins -----------------------------------------------------


@register(
    "q3_segment_top_orders",
    f"""
    SELECT l_orderkey,
           CAST(SUM({dd_fixed('l_extendedprice * (1 - l_discount)', 10000)}) AS BIGINT) AS revenue_c,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_c DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    # customer scales with SF — no explicit broadcast hint (at 100 TB it
    # is GBs); AQE picks broadcast when the filtered side fits under the
    # threshold and shuffle-join otherwise.
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_c"))
        .select("l_orderkey", "revenue_c", "o_orderdate")
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    f"""
    SELECT n_name,
           CAST(SUM({dd_fixed('l_extendedprice * (1 - l_discount)', 10000)}) AS BIGINT) AS revenue_c
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue_c DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            # supplier scales with SF — leave the join strategy to AQE;
            # only fixed-cardinality nation/region keep broadcast hints.
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_c"))
        .orderBy(F.desc("revenue_c"), F.asc("n_name"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({dd_fixed('l_extendedprice * (1 - l_discount)', 10000)}) AS BIGINT) AS revenue_c,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_c DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_c"))
        .select("c_custkey", "c_name", "revenue_c", "n_name")
        .orderBy(F.desc("revenue_c"), F.asc("c_custkey"))
        .limit(20)
    )


# --- semi / anti / outer joins ------------------------------------------


@register(
    "semi_join_customers_with_big_orders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def semi_join_customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-03-01 00:00:00')
    ORDER BY c_custkey
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no *recent* order (the bare no-orders predicate is
    vacuous on this dataset — every customer has at least one order)."""
    cust = t(spark, sf_dir, "customer")
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-03-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "outer_join_order_counts",
    f"""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM({dd_fixed('o_totalprice')}), 0) AS BIGINT) AS spent_c
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(fixed("o_totalprice")), F.lit(0)).alias("spent_c"),
        )
        .orderBy("c_custkey")
    )


# --- rollup / cube / grouping sets --------------------------------------


@register(
    "rollup_nation_status_revenue",
    f"""
    SELECT n_name, o_orderstatus,
           CAST(SUM({dd_fixed('o_totalprice')}) AS BIGINT) AS total_c,
           COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderstatus)
    ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def rollup_nation_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "o_orderstatus")
        .agg(F.sum(fixed("o_totalprice")).alias("total_c"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("o_orderstatus"))
    )


@register(
    "cube_returnflag_linestatus",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({dd_fixed('l_quantity')}) AS BIGINT) AS qty_c,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.sum(fixed("l_quantity")).alias("qty_c"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


# --- window functions ----------------------------------------------------


@register(
    "window_running_customer_spend",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({dd_fixed('o_totalprice')})
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c,
           ROW_NUMBER()
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, rn
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(fixed("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("running_c"),
            F.row_number().over(w).alias("rn"),
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_top3_orders_per_customer",
    f"""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, {dd_fixed('o_totalprice')} AS price_c,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            fixed("o_totalprice").alias("price_c"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    )


@register(
    "window_lag_lead_order_gaps",
    f"""
    SELECT o_custkey, o_orderkey,
           {dd_micros('o_orderdate')} - {dd_micros("LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)")} AS gap_us,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            (micros("o_orderdate") - micros(F.lag("o_orderdate").over(w))).alias("gap_us"),
            F.lead("o_orderkey").over(w).alias("next_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --- set operations ------------------------------------------------------


@register(
    "setops_active_vs_building",
    """
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         active   AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                      WHERE o_totalprice > 150000)
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM active)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM building EXCEPT SELECT * FROM active)
    UNION ALL
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM building UNION SELECT * FROM active)
    ORDER BY op
    """,
)
def setops_active_vs_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    active = (
        orders.filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    rows = [
        ("intersect", building.intersect(active)),
        ("except", building.exceptAll(active.distinct()).distinct()),
        ("union", building.union(active).distinct()),
    ]
    parts = [df.agg(F.lit(op).alias("op"), F.count(F.lit(1)).alias("n")) for op, df in rows]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.orderBy("op")


# --- sort / limit / distinct --------------------------------------------


@register(
    "topk_orders_by_price",
    f"""
    SELECT o_orderkey, o_custkey, {dd_fixed('o_totalprice')} AS price_c
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", fixed("o_totalprice").alias("price_c"))
        .orderBy(F.desc("price_c"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "distinct_cardinalities",
    """
    SELECT COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(DISTINCT o_orderpriority) AS n_prio,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days
    FROM orders
    """,
)
def distinct_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
    )


# --- scalar function library --------------------------------------------


@register(
    "scalar_function_suite",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           SUBSTR(p_name, 1, 8) AS name8,
           LENGTH(p_type) AS type_len,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           ABS(p_size - 25) AS size_dist,
           CAST(FLOOR(SQRT(CAST(p_size AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS sqrt_size_c,
           p_size % 7 AS size_mod,
           CASE WHEN p_retailprice > 1500 THEN 'high'
                WHEN p_retailprice > 1000 THEN 'mid'
                ELSE 'low' END AS price_band,
           REPLACE(p_type, ' ', '_') AS type_snake
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
)
def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return (
        part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 8).alias("name8"),
            F.length("p_type").alias("type_len"),
            F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
                "brand_size"
            ),
            F.abs(F.col("p_size") - 25).alias("size_dist"),
            fixed(F.sqrt(F.col("p_size").cast("double")), 1000).alias("sqrt_size_c"),
            (F.col("p_size") % 7).alias("size_mod"),
            F.when(F.col("p_retailprice") > 1500, "high")
            .when(F.col("p_retailprice") > 1000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        )
        .orderBy("p_partkey")
    )


@register(
    "date_extraction_suite",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mon,
           COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY yr, qtr, mon
    """,
)
def date_extraction_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("o_custkey").alias("n_cust"))
        .orderBy("yr", "qtr", "mon")
    )


# --- conditional aggregation (pivot-equivalent) --------------------------


@register(
    "pivot_event_type_values",
    f"""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN {dd_fixed('value')} ELSE 0 END) AS BIGINT) AS click_c,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN {dd_fixed('value')} ELSE 0 END) AS BIGINT) AS view_c,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN {dd_fixed('value')} ELSE 0 END) AS BIGINT) AS purchase_c,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN {dd_fixed('value')} ELSE 0 END) AS BIGINT) AS signup_c,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN {dd_fixed('value')} ELSE 0 END) AS BIGINT) AS error_c
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def pivot_event_type_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == et, fixed("value")).otherwise(F.lit(0))).alias(f"{et}_c")
        for et in ["click", "view", "purchase", "signup", "error"]
    ]
    return ev.groupBy("user_id").agg(*aggs).orderBy("user_id")


# --- correlated / scalar subquery ----------------------------------------


@register(
    "orders_above_customer_avg",
    f"""
    WITH cavg AS (
      SELECT o_custkey AS k, SUM({dd_fixed('o_totalprice')}) / COUNT(*) AS avg_c
      FROM orders GROUP BY o_custkey
    )
    SELECT o_orderkey, o_custkey, {dd_fixed('o_totalprice')} AS price_c
    FROM orders JOIN cavg ON o_custkey = k
    WHERE {dd_fixed('o_totalprice')} > 1.5 * avg_c
    ORDER BY o_orderkey
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cavg = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        (F.sum(fixed("o_totalprice")) / F.count(F.lit(1))).alias("avg_c")
    )
    return (
        orders.join(cavg, orders.o_custkey == cavg.k)
        .filter(fixed("o_totalprice") > 1.5 * F.col("avg_c"))
        .select("o_orderkey", "o_custkey", fixed("o_totalprice").alias("price_c"))
        .orderBy("o_orderkey")
    )
