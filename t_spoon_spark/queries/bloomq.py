"""Gate entry for the Bloom-filter semi-join operator
(operators/bloom.py): result-identity with the plain semi-join is the
oracle, so any false-positive leak or bit-arithmetic drift breaks the
hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.bloom import bloom_semi_join
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register


@register(
    "bloom_semi_join_orders",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_c
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of BUILDING-segment customers via the Bloom-filter
    semi-join: the 8 KiB bitmap over the segment's customer keys
    broadcasts, the orders scan drops non-members with three bit tests
    inside codegen (no orders shuffle), and the exact semi-join only
    sees survivors. The oracle is the PLAIN semi-join — the operator's
    contract is result identity with a cheaper plan. At 100 TB the
    closing semi-join would be a shuffle join on the (already
    bloom-thinned) survivors instead of a broadcast; the bitmap stays
    8 KiB at any build cardinality."""
    orders = t(spark, sf_dir, "orders")
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    matched = bloom_semi_join(orders, cust, "o_custkey")
    return (
        matched.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .cast("long")
            .alias("total_c"),
        )
        .orderBy("o_orderpriority")
    )
