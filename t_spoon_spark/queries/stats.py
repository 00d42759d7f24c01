"""Statistical analytics with exact integer moment arithmetic: per-user
spend-trend slopes (OLS on day index), Pearson correlation between
event value and hour-of-day, and a multi-resolution time-series rollup
(daily built FROM hourly, not from raw — the incremental-rollup pattern
of hypertable engines).

Moment sums (Σx, Σy, Σxy, Σx², Σy²) over integer-scaled inputs are
exact BIGINTs, so the only floating steps are the final one-shot
divisions/sqrt — the same single-rounding discipline as the cosine and
idf operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.helpers import dd_fixed, fixed
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register


@register(
    "stats_user_spend_slope",
    f"""
    WITH daily AS (
      SELECT user_id,
             (epoch_us(ts) // 86400000000) AS day,
             CAST(SUM({dd_fixed('value')}) AS BIGINT) AS y
      FROM events
      GROUP BY user_id, day
    ),
    m AS (
      SELECT user_id,
             COUNT(*) AS n,
             CAST(SUM(day) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(day * y) AS BIGINT) AS sxy,
             CAST(SUM(day * day) AS BIGINT) AS sxx
      FROM daily GROUP BY user_id
    )
    SELECT user_id, n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
           END AS slope_c
    FROM m
    WHERE n >= 3
    ORDER BY user_id
    """,
)
def stats_user_spend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user spend trend: OLS slope of daily spend over the day
    index, assembled purely from integer moment sums — slope =
    (nΣxy − ΣxΣy) / (nΣxx − Σx²), scaled 1e6 and integer-divided, so
    the result is exact. Two partial-aggregated shuffles ((user, day)
    then user); moments are the mergeable form, which is why this
    survives any re-partitioning — the identical trick classical
    distributed regression uses. Degenerate (single-day) users report
    NULL slope."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day"
            ),
            fixed("value").alias("v"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("v").cast("long").alias("y"))
    )
    m = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("day") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("day") * F.col("day")).cast("long").alias("sxx"),
    )
    slope = F.when(
        F.expr("n * sxx - sx * sx") == 0, F.lit(None).cast("long")
    ).otherwise(F.expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"))
    return (
        m.filter(F.col("n") >= 3)
        .select("user_id", "n", slope.alias("slope_c"))
        .orderBy("user_id")
    )


@register(
    "stats_pearson_value_hour",
    f"""
    WITH base AS (
      SELECT event_type,
             ((epoch_us(ts) // 3600000000) % 24) AS x,
             {dd_fixed('value')} AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM base GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(FLOOR(
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * 1000000
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             + 0.5) AS BIGINT) AS pearson_c
    FROM m
    ORDER BY event_type
    """,
)
def stats_pearson_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between event value and hour-of-day per
    event type, from the same exact integer moments; the final
    covariance/sqrt(var*var) is one rounded division over exact
    integers — the cosine_c pattern. One shuffle (event_type), moments
    merge associatively. (Spark's built-in corr() is a float
    aggregation whose result depends on partition order — unusable
    under an exact-hash gate; this formulation is the engine's
    deterministic replacement.)"""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24").alias(
            "x"
        ),
        fixed("value").alias("y"),
    )
    m = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) * 1e6
    den = F.sqrt(
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(
        F.col("n").cast("double") * F.col("syy")
        - F.col("sy").cast("double") * F.col("sy")
    )
    return m.select(
        "event_type",
        "n",
        F.floor(num / den + 0.5).cast("long").alias("pearson_c"),
    ).orderBy("event_type")


@register(
    "timeseries_multires_rollup",
    f"""
    WITH hourly AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) AS hour_idx,
             COUNT(*) AS n,
             CAST(SUM({dd_fixed('value')}) AS BIGINT) AS sum_c,
             CAST(MAX({dd_fixed('value')}) AS BIGINT) AS max_c
      FROM events GROUP BY event_type, hour_idx
    ),
    daily AS (
      SELECT event_type,
             hour_idx // 24 AS day_idx,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sum_c) AS BIGINT) AS sum_c,
             CAST(MAX(max_c) AS BIGINT) AS max_c,
             COUNT(*) AS n_hours_present
      FROM hourly GROUP BY event_type, day_idx
    )
    SELECT event_type, day_idx, n, sum_c, max_c, n_hours_present
    FROM daily
    ORDER BY event_type, day_idx
    """,
)
def timeseries_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup: daily aggregates computed FROM the
    hourly aggregates (merge of partial states), never from raw — the
    hypertable continuous-aggregate pattern. Works because every
    statistic carried (count, sum, max) is mergeable; the hourly level
    is what a production system persists, and each coarser level costs
    a groupBy over the previous level's (already tiny) output instead
    of a second raw scan. The oracle performs the identical two-level
    cascade."""
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias(
                "hour_idx"
            ),
            fixed("value").alias("v"),
        )
        .groupBy("event_type", "hour_idx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("long").alias("sum_c"),
            F.max("v").cast("long").alias("max_c"),
        )
    )
    daily = (
        hourly.withColumn("day_idx", F.expr("hour_idx div 24"))
        .groupBy("event_type", "day_idx")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_c").cast("long").alias("sum_c"),
            F.max("max_c").cast("long").alias("max_c"),
            F.count(F.lit(1)).alias("n_hours_present"),
        )
    )
    return daily.select(
        "event_type", "day_idx", "n", "sum_c", "max_c", "n_hours_present"
    ).orderBy("event_type", "day_idx")


ASSOC_MIN_SUPPORT = 3  # pair must co-occur in >= 3 orders


@register(
    "assoc_rules_part_pairs",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items),
    item_cnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS cab
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb
      HAVING COUNT(*) >= {ASSOC_MIN_SUPPORT}
    ),
    scored AS (
      SELECT p.pa, p.pb, p.cab,
             ca.c AS ca, cb.c AS cb,
             (p.cab * 1000000) // ca.c AS conf_ab_c,
             (p.cab * n.n * 1000000) // (ca.c * cb.c) AS lift_c
      FROM pairs p
      JOIN item_cnt ca ON p.pa = ca.l_partkey
      JOIN item_cnt cb ON p.pb = cb.l_partkey
      CROSS JOIN n_orders n
    )
    SELECT pa, pb, cab, ca, cb, conf_ab_c, lift_c,
           ROW_NUMBER() OVER (ORDER BY lift_c DESC, pa, pb) AS rnk
    FROM scored
    ORDER BY rnk
    LIMIT 20
    """,
)
def assoc_rules_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules on co-ordered parts: support
    (co-order count), confidence (pair/antecedent) and lift
    (pair·N / (a·b)), all exact integer arithmetic (scaled integer
    division — no float probabilities), top-20 pairs by lift above a
    support floor. Scale shape: the pair generation is the same
    order-key self-join as triangle counting (bounded by per-order
    basket size, never the item-catalog square), the support floor
    prunes before the stats joins, and item counts broadcast. This is
    the a-priori first level — the one production co-purchase systems
    actually ship."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select(
        F.count_distinct("l_orderkey").cast("long").alias("n")
    )
    item_cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cab"))
        .filter(F.col("cab") >= ASSOC_MIN_SUPPORT)
    )
    ca = item_cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))
    cb = item_cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))
    scored = (
        pairs.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "cab",
            "ca",
            "cb",
            F.expr("(cab * 1000000) div ca").alias("conf_ab_c"),
            F.expr("(cab * n * 1000000) div (ca * cb)").alias("lift_c"),
        )
    )
    from pyspark.sql import Window as W

    # TakeOrderedAndProject top-20 first, then rank the 20-row result —
    # the global row_number window pushed every part pair through one
    # partition (optimization r14)
    top = scored.orderBy(F.desc("lift_c"), F.asc("pa"), F.asc("pb")).limit(20)
    return (
        top.withColumn(
            "rnk",
            F.row_number().over(W.orderBy(F.desc("lift_c"), F.asc("pa"), F.asc("pb"))),
        )
        .orderBy("rnk")
    )


@register(
    "stats_winsorized_by_type",
    f"""
    WITH base AS (
      SELECT event_type, event_id, {dd_fixed('value')} AS v FROM events
    ),
    ranked AS (
      SELECT event_type, event_id, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM base
    ),
    bounds AS (
      SELECT event_type,
             MAX(CASE WHEN rn = GREATEST((n * 5 + 99) // 100, 1) THEN v END) AS lo,
             MAX(CASE WHEN rn = GREATEST((n * 95 + 99) // 100, 1) THEN v END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(MAX(r.n) AS BIGINT) AS n,
           CAST(MAX(b.lo) AS BIGINT) AS lo_c,
           CAST(MAX(b.hi) AS BIGINT) AS hi_c,
           CAST(SUM(CASE WHEN r.v < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
           CAST(SUM(CASE WHEN r.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high,
           CAST(SUM(LEAST(GREATEST(r.v, b.lo), b.hi)) AS BIGINT) // CAST(MAX(r.n) AS BIGINT)
             AS winsor_mean_c
    FROM ranked r JOIN bounds b USING (event_type)
    GROUP BY r.event_type
    ORDER BY r.event_type
    """,
)
def stats_winsorized_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%) robust mean per event type: exact per-group
    percentile bounds at deterministic ranks (ceil(n*p), total tiebreak
    on event_id — percentile_cont's interpolation would re-introduce
    float averaging), values clamped to [p05, p95], integer mean.
    The outlier-robust aggregate a metrics pipeline uses where a single
    corrupt reading would drag a plain mean. One per-group sort window
    + a broadcast of the groups-sized bounds table; at 100 TB the rank
    scan is the same shuffle the exact-quantile entry already pays."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    base = ev.select("event_type", "event_id", fixed("value").alias("v"))
    w_rank = W.partitionBy("event_type").orderBy("v", "event_id")
    w_all = W.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "v",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.expr("(n * 5 + 99) div 100"), F.lit(1)),
                F.col("v"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.expr("(n * 95 + 99) div 100"), F.lit(1)),
                F.col("v"),
            )
        ).alias("hi"),
    )
    joined = ranked.join(F.broadcast(bounds), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("lo").cast("long").alias("lo_c"),
            F.max("hi").cast("long").alias("hi_c"),
            F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_high"),
            F.expr(
                "cast(sum(least(greatest(v, lo), hi)) as bigint) div cast(max(n) as bigint)"
            ).alias("winsor_mean_c"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_ab_welch_t",
    f"""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM({dd_fixed('value')}) AS BIGINT) AS sy,
             CAST(SUM({dd_fixed('value')} * {dd_fixed('value')}) AS BIGINT) AS syy
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    ),
    ab AS (
      SELECT
        (SELECT n FROM m WHERE event_type = 'click') AS na,
        (SELECT sy FROM m WHERE event_type = 'click') AS sya,
        (SELECT syy FROM m WHERE event_type = 'click') AS syya,
        (SELECT n FROM m WHERE event_type = 'purchase') AS nb,
        (SELECT sy FROM m WHERE event_type = 'purchase') AS syb,
        (SELECT syy FROM m WHERE event_type = 'purchase') AS syyb
    )
    SELECT na, nb,
           CAST(FLOOR(
             (CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb) * 1000000
             / sqrt(
                 (CAST(syya AS DOUBLE) / na - (CAST(sya AS DOUBLE) / na) * (CAST(sya AS DOUBLE) / na)) / (na - 1)
               + (CAST(syyb AS DOUBLE) / nb - (CAST(syb AS DOUBLE) / nb) * (CAST(syb AS DOUBLE) / nb)) / (nb - 1)
             ) + 0.5) AS BIGINT) AS welch_t_c
    FROM ab
    """,
)
def stats_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic between the click and purchase value
    distributions (the unequal-variance A/B test): group moments are
    exact BIGINT sums, and the t statistic is ONE fixed-shape IEEE
    expression over them (identical operand order in both engines) —
    the same single-rounding discipline as Pearson. The experimentation
    primitive every product-analytics stack ships; moments merge
    associatively, so per-shard partials roll up before the one final
    expression."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    m = (
        ev.select("event_type", fixed("value").alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
    )
    a = m.filter(F.col("event_type") == "click").select(
        F.col("n").alias("na"), F.col("sy").alias("sya"), F.col("syy").alias("syya")
    )
    b = m.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("nb"), F.col("sy").alias("syb"), F.col("syy").alias("syyb")
    )
    ab = a.crossJoin(F.broadcast(b))
    mean_a = F.col("sya").cast("double") / F.col("na")
    mean_b = F.col("syb").cast("double") / F.col("nb")
    var_a = (
        F.col("syya").cast("double") / F.col("na") - mean_a * mean_a
    ) / (F.col("na") - 1)
    var_b = (
        F.col("syyb").cast("double") / F.col("nb") - mean_b * mean_b
    ) / (F.col("nb") - 1)
    return ab.select(
        "na",
        "nb",
        F.floor((mean_a - mean_b) * 1e6 / F.sqrt(var_a + var_b) + 0.5)
        .cast("long")
        .alias("welch_t_c"),
    )
