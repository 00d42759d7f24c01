"""Skyline (Pareto front) query: orders not strictly dominated on
(price, order date) — "no other order is both strictly cheaper and
strictly earlier". Skylines power multi-criteria data exploration and
are a classic operator relational engines lack natively.

The naive form is a quadratic NOT EXISTS self-join (which is exactly
what the DuckDB oracle runs — at oracle scale that is fine). The Spark
implementation is the distributed two-level form: bucket the price
axis, compute per-bucket date minima (tiny table), prefix-min them
across buckets, and resolve the strictly-lower-price minimum for each
row as least(prefix-min of earlier buckets, within-bucket running min
over a RANGE window partitioned by bucket) — every step is distributed
(the only global pass is over the buckets-sized table), total work
O(n) + a per-bucket sort, no dominance self-join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

BUCKET = 10_000  # price_c units per bucket (price_c = cents)

_BIG = 9_223_372_036_854_775_807  # "+inf" sentinel for empty minima


@register(
    "skyline_orders_pareto",
    """
    WITH o AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_c,
             CAST(epoch_us(o_orderdate) AS BIGINT) AS date_us
      FROM orders
    )
    SELECT o_orderkey, price_c, date_us
    FROM o r
    WHERE NOT EXISTS (
      SELECT 1 FROM o s
      WHERE s.price_c < r.price_c AND s.date_us < r.date_us
    )
    ORDER BY price_c, date_us, o_orderkey
    """,
)
def skyline_orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders on the (cheapest, earliest) Pareto front. A row survives
    iff the minimum date among all strictly-cheaper rows is not earlier
    than its own date; that minimum is assembled from (a) the prefix
    minimum of per-bucket date minima over strictly-earlier price
    buckets and (b) a RANGE-window running minimum within the row's own
    bucket — so the corpus never self-joins, and the only
    all-rows-ordered structure is the buckets-sized minima table. At
    100 TB: one shuffle on the bucket key, per-bucket sort, and a
    broadcast of the prefix-minima table."""
    orders = t(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("price_c"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("date_us"),
    ).withColumn("bucket", F.expr(f"price_c div {BUCKET}"))

    bucket_min = o.groupBy("bucket").agg(F.min("date_us").alias("bmin"))
    w_prefix = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bucket_min.select(
        "bucket",
        F.coalesce(F.min("bmin").over(w_prefix), F.lit(_BIG)).alias("prefix_min"),
    )

    w_in = (
        Window.partitionBy("bucket")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    resolved = (
        o.join(F.broadcast(prefix), "bucket")
        .withColumn(
            "in_bucket_min",
            F.coalesce(F.min("date_us").over(w_in), F.lit(_BIG)),
        )
        .withColumn(
            "strict_lower_min", F.least("prefix_min", "in_bucket_min")
        )
    )
    return (
        resolved.filter(F.col("date_us") <= F.col("strict_lower_min"))
        .select("o_orderkey", "price_c", "date_us")
        .orderBy("price_c", "date_us", "o_orderkey")
    )
