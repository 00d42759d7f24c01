"""Product-analytics operators over the events table: SCD2 interval
maintenance, funnel stages, cohort retention. The reference has no
analytics library (its evaluation graphs are bank transfers); these are
the queries a warehouse user of the engine runs daily, expressed as
pure window/join/aggregate plans with bit-exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from t_spoon_spark.queries.helpers import micros
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DAY_US = 86_400_000_000


@register(
    "scd2_user_state_intervals",
    """
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts_us, event_id
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    iv AS (
      SELECT user_id, event_type AS state, ts_us AS valid_from_us,
             LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
               AS valid_to_us
      FROM changes
    )
    SELECT user_id, state, valid_from_us,
           COALESCE(valid_to_us, 0) AS valid_to_us,
           CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
    FROM iv
    ORDER BY user_id, valid_from_us
    """,
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build: each user's
    event_type stream collapses into effective-dated (state,
    valid_from, valid_to] rows — change detection by LAG, interval
    close by LEAD, open intervals flagged current. Two window passes
    over one shuffle on user_id; the canonical dimension-maintenance
    pattern a warehouse runs on every load. Ties break on event_id so
    both engines order identically."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", micros("ts").alias("ts_us"), "event_id"
    )
    w_ord = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = ev.withColumn("prev_type", F.lag("event_type").over(w_ord))
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w_iv = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    iv = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(
            W.partitionBy("user_id").orderBy("ts_us", "event_id")
        ).alias("valid_to_us"),
    )
    return iv.select(
        "user_id",
        "state",
        "valid_from_us",
        F.coalesce("valid_to_us", F.lit(0)).alias("valid_to_us"),
        F.when(F.col("valid_to_us").isNull(), 1).otherwise(0).alias("is_current"),
    ).orderBy("user_id", "valid_from_us")


@register(
    "funnel_view_click_purchase",
    """
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_us
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT 'view>click', COUNT(*) FROM c
    UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM p
    ORDER BY n_users DESC, stage
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked after the first
    view, then purchased after that first click. Each stage is a
    filtered min-aggregate joined to the previous stage's frontier —
    three shuffles on user_id that AQE coalesces, with the stage
    frontier always the (shrinking) build side. The standard product
    funnel, stage times strictly increasing so both engines agree
    exactly."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", micros("ts").alias("ts_us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("v_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_us"))
    )
    out = (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view").alias("stage"), "n_users")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("view>click").alias("stage"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("view>click>purchase").alias("stage"), "n_users"
            )
        )
    )
    return out.orderBy(F.desc("n_users"), "stage")


@register(
    "retention_cohort_weeks",
    f"""
    WITH first_day AS (
      SELECT user_id, MIN(epoch_us(ts) // {7 * DAY_US}) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             (epoch_us(e.ts) // {7 * DAY_US}) - f.cohort_week AS week_offset
      FROM events e JOIN first_day f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def retention_cohort_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in each later week they return. First-touch aggregate +
    distinct-activity join + matrix groupBy — the cohort frame is one
    row per user (broadcast-sized relative to events at scale). The
    analytics table every growth dashboard reads."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", (micros("ts") / (7 * DAY_US)).cast("long").alias("week")
    )
    first_day = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = (
        ev.join(first_day, "user_id")
        .select(
            "user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "temporal_table_join_purchases",
    """
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts_us, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    iv AS (
      SELECT user_id, event_type AS state, ts_us AS valid_from_us,
             COALESCE(LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id),
                      9223372036854775807) AS valid_to_us
      FROM changes
    )
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, iv.state AS state_at_purchase
    FROM events p JOIN iv
      ON p.user_id = iv.user_id
     AND epoch_us(p.ts) >= iv.valid_from_us
     AND epoch_us(p.ts) < iv.valid_to_us
    WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
)
def temporal_table_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal table join (the Flink signature join the reference's
    ecosystem provides; reference itself has none): each purchase event
    joins the versioned user-state dimension row VALID AT the event's
    time — SCD2 intervals built by the same LAG/LEAD pass as
    scd2_user_state_intervals, then an interval-containment join.
    Spark shape: equi-join on user_id + range predicate, which AQE
    executes as a hash join with the (smaller) interval side built —
    at 100 TB the dimension intervals are bucketed by user_id next to
    the fact for a shuffle-free sort-merge. A purchase's containing
    interval is unique (intervals partition each user's timeline), so
    the join is 1:1 and both engines agree exactly."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", micros("ts").alias("ts_us"), "event_id"
    )
    w_ord = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w_ord)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    iv = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(
            F.lead("ts_us").over(W.partitionBy("user_id").orderBy("ts_us", "event_id")),
            F.lit(9223372036854775807),
        ).alias("valid_to_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    joined = purchases.join(iv, "user_id").filter(
        (F.col("ts_us") >= F.col("valid_from_us"))
        & (F.col("ts_us") < F.col("valid_to_us"))
    )
    return joined.select(
        "event_id", "user_id", "ts_us", F.col("state").alias("state_at_purchase")
    ).orderBy("event_id")


HOUR_US = 3_600_000_000


@register(
    "timeseries_gap_fill_hourly",
    f"""
    WITH hourly AS (
      SELECT user_id,
             epoch_us(ts) // {HOUR_US} AS hour_idx,
             CAST(FLOOR(100 * value + 0.5) AS BIGINT) AS v_c,
             epoch_us(ts) AS ts_us,
             event_id
      FROM events WHERE user_id < 20
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, hour_idx
                                   ORDER BY ts_us DESC, event_id DESC) AS rnk,
             COUNT(*) OVER (PARTITION BY user_id, hour_idx) AS n_events
      FROM hourly
    ),
    last_per_hour AS (
      SELECT user_id, hour_idx, v_c, n_events FROM ranked WHERE rnk = 1
    ),
    bounds AS (
      SELECT user_id, MIN(hour_idx) AS h_lo, MAX(hour_idx) AS h_hi
      FROM last_per_hour GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, g.h AS hour_idx
      FROM bounds b, unnest(range(b.h_lo, b.h_hi + 1)) AS g(h)
    ),
    joined AS (
      SELECT s.user_id, s.hour_idx, l.v_c, COALESCE(l.n_events, 0) AS n_events
      FROM spine s LEFT JOIN last_per_hour l USING (user_id, hour_idx)
    )
    SELECT user_id, hour_idx,
           LAST_VALUE(v_c IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled_c,
           n_events
    FROM joined
    ORDER BY user_id, hour_idx
    """,
)
def timeseries_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per user, an hourly spine from
    first to last activity, each hour carrying the hour's LAST observed
    value (ties broken by event_id) forward-filled across silent hours
    — the standard sensor/metrics densification. Spine generation is
    sequence+explode (linear in hours), the fill one last_value
    IGNORE NULLS window per user. Restricted to 20 users to keep the
    gate spine small; at scale the spine is bounded by
    users x active-hours, not events."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20).select(
        "user_id",
        (micros("ts") / HOUR_US).cast("long").alias("hour_idx"),
        F.floor(100 * F.col("value") + F.lit(0.5)).cast("long").alias("v_c"),
        micros("ts").alias("ts_us"),
        "event_id",
    )
    w_last = W.partitionBy("user_id", "hour_idx").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    w_cnt = W.partitionBy("user_id", "hour_idx")
    last_per_hour = (
        ev.withColumn("rnk", F.row_number().over(w_last))
        .withColumn("n_events", F.count(F.lit(1)).over(w_cnt))
        .filter(F.col("rnk") == 1)
        .select("user_id", "hour_idx", "v_c", "n_events")
    )
    bounds = last_per_hour.groupBy("user_id").agg(
        F.min("hour_idx").alias("h_lo"), F.max("hour_idx").alias("h_hi")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("h_lo", "h_hi")).alias("hour_idx")
    )
    joined = spine.join(last_per_hour, ["user_id", "hour_idx"], "left").select(
        "user_id", "hour_idx", "v_c", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    w_fill = (
        W.partitionBy("user_id")
        .orderBy("hour_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_idx",
        F.last("v_c", ignorenulls=True).over(w_fill).alias("v_filled_c"),
        "n_events",
    ).orderBy("user_id", "hour_idx")


@register(
    "markov_event_transitions",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions
    FROM ordered
    WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    ORDER BY from_type, to_type
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition counts (the Markov matrix behind
    next-action prediction and funnel diagnostics): LEAD over each
    user's time-ordered stream, then one grouped count. One shuffle on
    user_id for the window, one tiny (|types|^2-row) aggregate."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", micros("ts").alias("ts_us"), "event_id"
    )
    w_ord = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = ev.withColumn("next_type", F.lead("event_type").over(w_ord))
    return (
        ordered.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


@register(
    "funnel_conversion_latency",
    """
    WITH pairs AS (
      SELECT c.event_id AS click_id,
             MIN(epoch_us(p.ts) - epoch_us(c.ts)) AS delay_us
      FROM events c JOIN events p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOURS
      WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      GROUP BY c.event_id
    ),
    ranked AS (
      SELECT delay_us,
             ROW_NUMBER() OVER (ORDER BY delay_us, click_id) AS rn,
             COUNT(*) OVER () AS n
      FROM pairs
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_conversions,
           CAST(MAX(CASE WHEN rn = GREATEST((n * 50 + 99) // 100, 1)
                         THEN delay_us END) AS BIGINT) AS p50_delay_us,
           CAST(MAX(CASE WHEN rn = GREATEST((n * 90 + 99) // 100, 1)
                         THEN delay_us END) AS BIGINT) AS p90_delay_us
    FROM ranked
    """,
)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: each click's FIRST same-user
    purchase within 24h defines its delay; report exact p50/p90 delays
    over converting clicks (deterministic rank positions, the
    winsorize entry's convention). The interval join is the bounded
    range join the streaming entries use; the percentile pass runs on
    conversions only (already small). The time-to-convert curve is the
    product question funnels exist to answer — counts alone
    (funnel_view_click_purchase) miss it."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    pairs = (
        clicks.join(purchases, "user_id")
        .filter(
            (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("click_id")
        .agg(
            F.min(
                F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))
            ).alias("delay_us")
        )
    )
    from pyspark.sql import Window as W

    ranked = pairs.select(
        "delay_us",
        F.row_number().over(W.orderBy("delay_us", "click_id")).alias("rn"),
        F.count(F.lit(1)).over(
            W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_conversions"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.expr("(n * 50 + 99) div 100"), F.lit(1)),
                F.col("delay_us"),
            )
        )
        .cast("long")
        .alias("p50_delay_us"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.expr("(n * 90 + 99) div 100"), F.lit(1)),
                F.col("delay_us"),
            )
        )
        .cast("long")
        .alias("p90_delay_us"),
    )


@register(
    "pareto_revenue_concentration",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s,
             ROW_NUMBER() OVER (ORDER BY s DESC, o_custkey) AS rn,
             COUNT(*) OVER () AS n,
             SUM(s) OVER () AS total,
             SUM(s) OVER (ORDER BY s DESC, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM spend
    ),
    pcts AS (SELECT unnest([10, 20, 50]) AS top_pct)
    SELECT p.top_pct,
           CAST(MAX(CASE WHEN rn = GREATEST(n * p.top_pct // 100, 1)
                         THEN CAST(cum AS BIGINT) END) * 1000
                // MAX(CAST(total AS BIGINT)) AS BIGINT) AS revenue_share_c
    FROM pcts p CROSS JOIN ranked
    GROUP BY p.top_pct
    ORDER BY p.top_pct
    """,
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 read): share of total revenue
    contributed by the top 10/20/50% of customers by spend — exact
    integer cumulative sums at deterministic rank cutoffs. One customer
    rollup, one ordered window over the (customer-sized) spend table,
    three cutoff probes. The whale-dependence metric that decides
    where retention spend goes."""
    orders = t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
        .cast("long")
        .alias("s")
    )
    from pyspark.sql import Window as W

    w_ord = W.orderBy(F.desc("s"), F.asc("o_custkey"))
    ranked = spend.select(
        "s",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1))
        .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("n"),
        F.sum("s")
        .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("total"),
        F.sum("s").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum"),
    )
    pcts = spark.createDataFrame([(10,), (20,), (50,)], "top_pct int")
    joined = F.broadcast(pcts).crossJoin(ranked)
    return (
        joined.groupBy("top_pct")
        .agg(
            F.expr(
                "cast(max(case when rn = greatest((n * top_pct) div 100, 1) "
                "then cast(cum as bigint) end) * 1000 "
                "div max(cast(total as bigint)) as bigint)"
            ).alias("revenue_share_c")
        )
        .orderBy("top_pct")
    )
