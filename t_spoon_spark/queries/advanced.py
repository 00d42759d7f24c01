"""Advanced temporal operators over events: as-of join, range join,
sessionization (SURVEY.md §2.9 — categories required by the task but
absent in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.temporal import as_of_join, range_join, sessionize
from t_spoon_spark.queries.helpers import dd_fixed, dd_micros, fixed, micros
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register


@register(
    "asof_join_purchase_last_click",
    f"""
    SELECT p.event_id,
           p.user_id,
           {dd_micros('p.ts')} AS purchase_us,
           {dd_micros('c.ts')} AS last_click_us,
           {dd_fixed('c.value')} AS click_value_c
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_join_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", fixed("value").alias("click_value_c")
    )
    joined = as_of_join(
        purchases,
        clicks.withColumn("click_us", micros("ts")),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["click_us", "click_value_c"],
    )
    return joined.select(
        "event_id",
        "user_id",
        micros("ts").alias("purchase_us"),
        F.col("asof_click_us").alias("last_click_us"),
        F.col("asof_click_value_c").alias("click_value_c"),
    ).orderBy("event_id")


@register(
    "range_join_signup_followups",
    f"""
    SELECT s.event_id AS signup_id,
           s.user_id,
           e.event_id AS follow_id,
           e.event_type AS follow_type,
           {dd_micros('e.ts')} - {dd_micros('s.ts')} AS delay_us
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    JOIN events e
      ON e.user_id = s.user_id
     AND e.ts > s.ts
     AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
    ORDER BY signup_id, follow_id
    """,
)
def range_join_signup_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    follow = ev.select(
        F.col("event_id").alias("follow_id"),
        F.col("user_id").alias("f_user"),
        F.col("event_type").alias("follow_type"),
        F.col("ts").alias("f_ts"),
    )
    joined = range_join(
        signups, follow, "s_user", "f_user", "s_ts", "f_ts", max_gap_seconds=3600
    )
    return joined.select(
        "signup_id",
        F.col("s_user").alias("user_id"),
        "follow_id",
        "follow_type",
        (micros("f_ts") - micros("s_ts")).alias("delay_us"),
    ).orderBy("signup_id", "follow_id")


@register(
    "sessionization_user_stats",
    f"""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 3600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           {dd_micros('MAX(ts)')} - {dd_micros('MIN(ts)')} AS duration_us
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionization_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(ev, key="user_id", ts="ts", gap_seconds=3600)
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(micros("ts")) - F.min(micros("ts"))).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "skew_salted_join_nation_revenue",
    """
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def skew_salted_join_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-management join, gate-checked against the PLAIN join's
    answer: orders x customer runs through `salted_join` (facts salted
    by a deterministic row hash across 16 reducers, the dim side
    replicated per salt), then the nation rollup. Result-identical to
    an unsalted join BY CONSTRUCTION — that identity is exactly what
    the oracle pins, so the structural skew tool carries driver-side
    correctness evidence, not just plan tests. At 100 TB this is the
    shape for a Zipf-headed fact key joining a dimension (shuffle:
    facts unchanged, dims x 16)."""
    from t_spoon_spark.operators.skew import salted_join

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = salted_join(orders, customer, "c_custkey", n_salts=16)
    full = joined.join(F.broadcast(nation), "c_nationkey")
    return (
        full.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("revenue_c"),
        )
        .orderBy("nation")
    )
