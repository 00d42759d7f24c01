"""Second relational batch: JSON extraction, grouping sets, ranking
window functions, cross join, and the queryable-state surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from t_spoon_spark.queries.helpers import dd_fixed, fixed
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register


@register(
    "json_props_extraction",
    f"""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM({dd_fixed('value')}) AS BIGINT) AS sum_c
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    ORDER BY k_bucket
    """,
)
def json_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props column (stays in
    codegen via get_json_object — no UDF)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.filter(k.isNotNull())
        .groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(fixed("value")).alias("sum_c"))
        .orderBy("k_bucket")
    )


@register(
    "grouping_sets_revenue",
    f"""
    SELECT c_mktsegment, o_orderpriority,
           CAST(SUM({dd_fixed('o_totalprice')}) AS BIGINT) AS total_c,
           COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), (c_mktsegment, o_orderpriority))
    ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    joined.createOrReplaceTempView("__gs_joined")
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderpriority,
               SUM(FLOOR(o_totalprice * 100.0 + 0.5)) AS total_c,
               COUNT(*) AS n
        FROM __gs_joined
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority),
                                (c_mktsegment, o_orderpriority))
        ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "ranking_function_suite",
    f"""
    SELECT o_custkey, o_orderkey,
           NTILE(4)       OVER w AS quartile,
           CAST(FLOOR(PERCENT_RANK() OVER w * 10000 + 0.5) AS BIGINT) AS pct_rank_c,
           CAST(FLOOR(CUME_DIST() OVER w * 10000 + 0.5) AS BIGINT) AS cume_c,
           DENSE_RANK()   OVER w AS drnk
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, drnk, o_orderkey
    """,
)
def ranking_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.floor(F.percent_rank().over(w) * 10000 + 0.5).cast("long").alias("pct_rank_c"),
            F.floor(F.cume_dist().over(w) * 10000 + 0.5).cast("long").alias("cume_c"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("o_custkey", "drnk", "o_orderkey")
    )


@register(
    "cross_join_region_matrix",
    """
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    ORDER BY from_region, to_region
    """,
)
def cross_join_region_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = t(spark, sf_dir, "region")
    a = region.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("ka"))
    b = region.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("kb"))
    return (
        a.crossJoin(b)
        .filter(F.col("ka") != F.col("kb"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@register(
    "queryable_state_predicate",
    f"""
    WITH movements AS (
      SELECT 'a' || CAST(user_id % 50 AS VARCHAR) AS account, -FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 7 + 3) % 50 AS VARCHAR) AS account, FLOOR(value) AS delta
      FROM events
    ),
    balances AS (
      SELECT account AS key, 100 + SUM(delta) AS value FROM movements GROUP BY account
    )
    SELECT key, CAST(value AS BIGINT) AS balance_c
    FROM balances
    WHERE value > 100
    ORDER BY key
    """,
)
def queryable_state_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queryable-state surface (§2.4 Q2/Q4): run the bank fold, then a
    predicate query over the committed snapshot at the pinned epoch —
    the external-query path the reference serves via PredicateQuery +
    readCommittedBefore."""
    from t_spoon_spark.queries.txn import _bank_graph, _transfers
    from t_spoon_spark.tx import TxEnvironment

    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0)
    runner = env.runner(_bank_graph(env))
    runner.run_to_completion(_transfers(spark, sf_dir))
    out = env.query_predicate("balances", "value > 100")
    return out.select("key", F.col("value").cast("bigint").alias("balance_c")).orderBy("key")


@register(
    "array_function_suite",
    """
    SELECT l_orderkey,
           len(list_sort(list(l_partkey))) AS n_parts,
           array_to_string(list_sort(list(l_partkey)), ',') AS parts_str,
           list_sort(list(l_partkey))[1] AS first_part,
           array_to_string(list_sort(list(l_partkey))[1:3], ',') AS first3_str,
           len(list_distinct(list(l_suppkey))) AS n_supps,
           CAST(list_sum(list_transform(list_sort(list(l_partkey)), x -> x % 7)) AS BIGINT)
             AS mod7_sum
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 5
    ORDER BY l_orderkey
    """,
)
def array_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over grouped lineitem: collect + sort,
    length, indexing, slice, distinct, and a higher-order transform/
    aggregate — emitted as scalars / joined strings so the value hash
    compares exactly (raw array cells hash differently across engines).
    All JVM Column ops; the collect_list shuffle is the only exchange."""
    li = t(spark, sf_dir, "lineitem")
    g = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(F.collect_list("l_partkey")).alias("parts"),
            F.array_distinct(F.collect_list("l_suppkey")).alias("supps"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= 5)
    )
    return g.select(
        "l_orderkey",
        F.size("parts").alias("n_parts"),
        F.array_join(F.transform("parts", lambda x: x.cast("string")), ",").alias("parts_str"),
        F.element_at("parts", 1).alias("first_part"),
        F.array_join(
            F.transform(F.slice("parts", 1, 3), lambda x: x.cast("string")), ","
        ).alias("first3_str"),
        F.size("supps").alias("n_supps"),
        F.aggregate(
            "parts", F.lit(0).cast("long"), lambda acc, x: acc + x % 7
        ).alias("mod7_sum"),
    ).orderBy("l_orderkey")


@register(
    "quantile_order_values",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
             o.o_orderkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    r AS (
      SELECT segment, price_c,
             ROW_NUMBER() OVER (PARTITION BY segment ORDER BY price_c, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY segment) AS n
      FROM j
    )
    SELECT segment,
           MAX(n) AS n_orders,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN price_c END) AS p50_c,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN price_c END) AS p90_c,
           MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN price_c END) AS p99_c
    FROM r
    GROUP BY segment
    ORDER BY segment
    """,
)
def quantile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p50/p90/p99) of order value per market
    segment, by deterministic row selection (row_number at ceil(q*n)
    with a full tiebreak) — integer-exact in both engines, unlike
    interpolated percentiles whose float blend is not bit-portable.
    At scale this is one shuffle on the segment + the window sort."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("price_c"),
        "o_orderkey",
    )
    w = W.partitionBy("segment").orderBy("price_c", "o_orderkey")
    r = j.select(
        "segment",
        "price_c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("segment")).alias("n"),
    )

    def pick(q: float, name: str):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
                F.col("price_c"),
            )
        ).alias(name)

    return (
        r.groupBy("segment")
        .agg(F.max("n").alias("n_orders"), pick(0.5, "p50_c"), pick(0.9, "p90_c"), pick(0.99, "p99_c"))
        .orderBy("segment")
    )


@register(
    "merge_upsert_orders",
    """
    WITH changes AS (
      -- deterministic change set: every 7th order gets a 10% price
      -- bump (update); synthetic keys above the max get inserted
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 110.0 + 0.5) AS BIGINT) AS price_c,
             'update' AS op
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT (SELECT MAX(o_orderkey) FROM orders) + s.i,
             CAST(100000 + s.i AS BIGINT),
             'insert'
      FROM (SELECT unnest(range(1, 6)) AS i) s
    ),
    merged AS (
      SELECT COALESCE(c.o_orderkey, o.o_orderkey) AS o_orderkey,
             COALESCE(c.price_c,
                      CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS price_c,
             CASE WHEN c.o_orderkey IS NULL THEN 'keep'
                  WHEN o.o_orderkey IS NULL THEN 'insert'
                  ELSE 'update' END AS action
      FROM orders o FULL OUTER JOIN changes c USING (o_orderkey)
    )
    SELECT action,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(price_c) AS BIGINT) AS total_c
    FROM merged
    GROUP BY action
    ORDER BY action
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO semantics on plain tables (the lakehouse upsert
    Delta/Iceberg expose as MERGE): a deterministic change set (updates
    for every 7th order, five fresh inserts) full-outer-joins the
    target; matched rows take the source value, unmatched-source rows
    insert, unmatched-target rows carry over. The gate reports the
    per-action row counts and the merged balance total. At scale the
    join shuffles on the primary key — or stays shuffle-free when both
    sides are bucketed by it (operators/skew.write_bucketed); change
    sets smaller than the broadcast threshold skip the shuffle
    entirely."""
    orders = t(spark, sf_dir, "orders")
    max_key = orders.agg(F.max("o_orderkey").alias("mx"))
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 110.0 + 0.5).cast("long").alias("price_c"),
    )
    inserts = (
        spark.range(1, 6)
        .crossJoin(F.broadcast(max_key))
        .select(
            (F.col("mx") + F.col("id")).alias("o_orderkey"),
            (F.lit(100000) + F.col("id")).cast("long").alias("price_c"),
        )
    )
    changes = updates.unionByName(inserts)
    tgt = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("old_c"),
    )
    merged = tgt.join(changes, "o_orderkey", "full_outer").select(
        F.coalesce(F.col("price_c"), F.col("old_c")).alias("price_c"),
        F.when(F.col("price_c").isNull(), "keep")
        .when(F.col("old_c").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price_c").cast("long").alias("total_c"),
        )
        .orderBy("action")
    )


@register(
    "unpivot_order_metrics",
    """
    WITH per_status AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_c,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, metric, value FROM per_status
    UNPIVOT (value FOR metric IN (n_orders, total_c, n_customers))
    ORDER BY o_orderstatus, metric
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long) surface: the per-status metrics table
    melts into (status, metric, value) rows — the inverse of the pivot
    entry, completing the reshaping pair. Spark's unpivot/melt is pure
    row expansion (each input row emits one row per value column, no
    shuffle); the oracle uses DuckDB's native UNPIVOT so both engines'
    reshaping semantics are pinned against each other."""
    orders = t(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("total_c"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
    )
    return per_status.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_c", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("o_orderstatus", "metric")
