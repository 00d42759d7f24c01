"""Gate entries for the native Structured Streaming operators
(streaming/windows.py): a bounded file-source replay is drained to
exhaustion, so the final answer equals the batch answer and the DuckDB
oracles are bit-exact — the plans, however, are genuine streaming plans
(StateStoreSave / FlatMapGroupsInPandasWithState), asserted by
tests/test_streaming_native.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.helpers import dd_fixed, fixed
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register
from t_spoon_spark.streaming.windows import (
    drain_stream,
    file_stream,
    running_totals_stateful,
    tumbling_stats_stream,
)


@register(
    "streaming_w1_tumbling_stats",
    f"""
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w_start_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM({dd_fixed('value')}) AS BIGINT) AS sum_c
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start_us, event_type
    """,
)
def streaming_w1_tumbling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 as a real watermarked streaming aggregation: the events table
    replays as a 2-micro-batch file stream, the windowed agg runs with
    a 3-hour watermark in complete mode, and the drained sink equals
    the batch tumbling aggregation bit-for-bit."""
    ev = t(spark, sf_dir, "events").select("event_type", "value", "ts")
    stream = file_stream(spark, ev, n_slices=2)
    agg = tumbling_stats_stream(
        stream,
        ts_col="ts",
        window="1 hour",
        watermark="3 hours",
        keys=("event_type",),
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(fixed("value")).alias("sum_c"),
        ],
    )
    out = drain_stream(agg, output_mode="complete")
    return out.select("w_start_us", "event_type", "n", "sum_c").orderBy(
        "w_start_us", "event_type"
    )


@register(
    "streaming_w7_stateful_totals",
    f"""
    SELECT user_id,
           CAST(SUM({dd_fixed('value')}) AS BIGINT) AS total_c,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_w7_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 as an applyInPandasWithState keyed reduce: per-user running
    (total, count) held in GroupState across 2 replayed micro-batches,
    one updated row emitted per key per batch; each key's final update
    (the row with the highest n_events) equals the batch grouped sum."""
    ev = t(spark, sf_dir, "events").select("user_id", fixed("value").alias("value_c"))
    stream = file_stream(spark, ev, n_slices=2)
    updates = drain_stream(running_totals_stateful(stream), output_mode="update")
    final = updates.groupBy("user_id").agg(
        F.max_by("total_c", "n_events").alias("total_c"),
        F.max("n_events").alias("n_events"),
    )
    return final.orderBy("user_id")
