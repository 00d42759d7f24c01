"""Windowed analytics operators (reference §2.7: evaluation/BuyProducts.java:89-139,
evaluation/Mixed.java:382-451 — tumbling stats, sliding top-K, anomaly filter).

All built from groupBy(window(...)) + window-function ranking; the
anomaly filter is a windowed count + semi-join back to rows (the
reference drops the whole window when its count exceeds a threshold).
Spark's `window()` is epoch-aligned, which the DuckDB oracles mirror
with floor arithmetic on epoch microseconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame, ts: str, duration: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Tumbling-window aggregation; emits w_start_us BIGINT (epoch µs)
    instead of the struct column so results are engine-portable."""
    return (
        df.groupBy(F.window(ts, duration).alias("__w"), *keys)
        .agg(*aggs)
        .withColumn("w_start_us", F.unix_micros(F.col("__w.start")))
        .drop("__w")
    )


def sliding_topk(
    df: DataFrame,
    ts: str,
    duration: str,
    slide: str,
    partition_keys: list[str],
    rank_key: str,
    k: int,
    bottom: bool = False,
) -> DataFrame:
    """Per sliding window (and partition keys), the top-K (or bottom-K)
    values of `rank_key` by count. Ties broken by rank_key ascending so
    the result is deterministic (required by the oracle gate)."""
    counted = (
        df.groupBy(F.window(ts, duration, slide).alias("__w"), *partition_keys, rank_key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("w_start_us", F.unix_micros(F.col("__w.start")))
        .drop("__w")
    )
    order = [F.asc("cnt") if bottom else F.desc("cnt"), F.asc(rank_key)]
    w = W.partitionBy("w_start_us", *partition_keys).orderBy(*order)
    return counted.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def anomaly_filter(
    df: DataFrame, ts: str, duration: str, keys: list[str], threshold: int
) -> DataFrame:
    """Drop every row belonging to a (window, keys) group whose row count
    exceeds the threshold (reference: evaluation/Mixed.java:382-404).
    Windowed count + broadcast-friendly semi-join back onto the rows."""
    with_w = df.withColumn("w_start_us", F.unix_micros(F.window(ts, duration).start))
    counts = (
        with_w.groupBy("w_start_us", *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") <= threshold)
        .select("w_start_us", *keys)
    )
    return with_w.join(counts, ["w_start_us", *keys], "left_semi")
