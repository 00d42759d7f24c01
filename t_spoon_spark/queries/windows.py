"""Windowed analytics over events/documents (SURVEY.md §2.7 W1-W7).

Window starts are emitted as epoch-µs BIGINT; the DuckDB oracles mirror
Spark's epoch-aligned window assignment with integer floor arithmetic
(`epoch_us(ts) // slide * slide`), which is exact for both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.windows import anomaly_filter, sliding_topk, tumbling_agg
from t_spoon_spark.queries.helpers import dd_fixed, fixed
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

HOUR_US = 3_600_000_000


@register(
    "w1_tumbling_hourly_stats",
    f"""
    SELECT (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS w_start_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM({dd_fixed('value')}) AS BIGINT) AS sum_c,
           MIN({dd_fixed('value')}) AS min_c,
           MAX({dd_fixed('value')}) AS max_c
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start_us, event_type
    """,
)
def w1_tumbling_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(fixed("value")).alias("sum_c"),
            F.min(fixed("value")).alias("min_c"),
            F.max(fixed("value")).alias("max_c"),
        ],
    )
    return out.select("w_start_us", "event_type", "n", "sum_c", "min_c", "max_c").orderBy(
        "w_start_us", "event_type"
    )


@register(
    "w2_sliding_topk_users",
    f"""
    WITH slid AS (
      SELECT ((epoch_us(ts) // {6 * HOUR_US}) - g.i) * {6 * HOUR_US} AS w_start_us,
             event_type, user_id
      FROM events, generate_series(0, 3) AS g(i)
    ),
    counted AS (
      SELECT w_start_us, event_type, user_id, COUNT(*) AS cnt
      FROM slid GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY w_start_us, event_type
                                   ORDER BY cnt DESC, user_id) AS rnk
      FROM counted
    )
    SELECT w_start_us, event_type, user_id, cnt, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY w_start_us, event_type, rnk
    """,
)
def w2_sliding_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = sliding_topk(
        ev, "ts", "24 hours", "6 hours", ["event_type"], "user_id", k=3
    )
    return out.select("w_start_us", "event_type", "user_id", "cnt", "rnk").orderBy(
        "w_start_us", "event_type", "rnk"
    )


@register(
    "w3_sliding_bottomk_users",
    f"""
    WITH slid AS (
      SELECT ((epoch_us(ts) // {6 * HOUR_US}) - g.i) * {6 * HOUR_US} AS w_start_us,
             event_type, user_id
      FROM events, generate_series(0, 3) AS g(i)
    ),
    counted AS (
      SELECT w_start_us, event_type, user_id, COUNT(*) AS cnt
      FROM slid GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY w_start_us, event_type
                                   ORDER BY cnt ASC, user_id) AS rnk
      FROM counted
    )
    SELECT w_start_us, event_type, user_id, cnt, rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY w_start_us, event_type, rnk
    """,
)
def w3_sliding_bottomk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    out = sliding_topk(
        ev, "ts", "24 hours", "6 hours", ["event_type"], "user_id", k=3, bottom=True
    )
    return out.select("w_start_us", "event_type", "user_id", "cnt", "rnk").orderBy(
        "w_start_us", "event_type", "rnk"
    )


@register(
    "w4_anomaly_filter_calm_windows",
    f"""
    WITH win AS (
      SELECT event_id, user_id,
             (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS w_start_us
      FROM events
    ),
    calm AS (
      SELECT w_start_us, user_id
      FROM win GROUP BY 1, 2 HAVING COUNT(*) <= 2
    )
    SELECT w.event_id, w.user_id, w.w_start_us
    FROM win w JOIN calm c USING (w_start_us, user_id)
    ORDER BY w.event_id
    """,
)
def w4_anomaly_filter_calm_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = anomaly_filter(ev, "ts", "1 hour", ["user_id"], threshold=2)
    return out.select("event_id", "user_id", "w_start_us").orderBy("event_id")


@register(
    "w6_word_count",
    """
    SELECT w.word, COUNT(*) AS n
    FROM documents, unnest(string_split(text, ' ')) AS w(word)
    WHERE w.word <> ''
    GROUP BY w.word
    ORDER BY n DESC, w.word
    """,
)
def w6_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
    )


@register(
    "w7_continuous_reduce_user_totals",
    f"""
    SELECT user_id,
           CAST(SUM({dd_fixed('value')}) AS BIGINT) AS total_c,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def w7_continuous_reduce_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's non-transactional keyed `reduce` baseline
    (evaluation/BankUseCaseNoT.java:109-127): a plain running balance
    per key with no atomicity guarantees — in batch Spark this is just
    the grouped sum (partial aggregation map-side, one shuffle)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.sum(fixed("value")).alias("total_c"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )
