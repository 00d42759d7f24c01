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

from t_spoon_spark.queries.helpers import dd_fixed, fixed, micros
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


@register(
    "streaming_interval_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS c_ts_us,
           CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases within 1 hour after a
    same-user click), both sides watermarked so join state is evicted
    as event time advances. Time-ordered 2-batch replay of each side
    makes the drained result equal the batch interval join."""
    from t_spoon_spark.streaming.windows import interval_join_stream

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    cs = file_stream(spark, clicks, n_slices=2, time_ordered="c_ts")
    ps = file_stream(spark, purchases, n_slices=2, time_ordered="p_ts")
    j = interval_join_stream(cs, ps, "user_id", "c_ts", "p_ts")
    out = drain_stream(
        j.select(
            "click_id",
            "purchase_id",
            micros("c_ts").alias("c_ts_us"),
            micros("p_ts").alias("p_ts_us"),
        ),
        output_mode="append",
    )
    return out.orderBy("click_id", "purchase_id")


@register(
    "streaming_dedup_exact",
    """
    SELECT DISTINCT md5(text) AS content_hash
    FROM documents
    ORDER BY content_hash
    """,
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup over the documents table replayed as a
    2-micro-batch stream: dropDuplicatesWithinWatermark on the content
    hash (state bounded by the watermark horizon, not all-time distinct
    keys). Only the hash is emitted — which physical duplicate row
    arrives first is batch-order dependent, the surviving key set is
    not — so the drained result equals batch DISTINCT exactly."""
    from t_spoon_spark.streaming.windows import dedup_stream

    docs = t(spark, sf_dir, "documents").select(
        F.md5("text").alias("content_hash"),
        # synthetic arrival time = 1970-01-02 + doc_id seconds: a row AT
        # the epoch origin would sit exactly on the initial watermark
        # and be dropped as late, so offset away from t=0
        F.timestamp_micros((F.col("doc_id") + 86_400) * 1_000_000).alias("ts"),
    )
    stream = file_stream(spark, docs, n_slices=2, time_ordered="ts")
    out = drain_stream(
        dedup_stream(stream, ("content_hash",)), output_mode="append"
    )
    return out.select("content_hash").distinct().orderBy("content_hash")


@register(
    "streaming_session_stats",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 3600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS s_start_us,
           COUNT(*) AS n_events,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, s_start_us
    """,
)
def streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as true streaming session windows: per-user
    1-hour-gap sessions via session_window + watermark, replayed
    in event-time order. A far-future sentinel row (user -1) advances
    the global watermark at the end so every real session finalizes and
    appends; the drained result equals batch sessionization with the
    session-window boundary rule (a gap of exactly 1h starts a new
    session — window ends are exclusive)."""
    from t_spoon_spark.streaming.windows import session_stats_stream

    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts)], "user_id long, ts timestamp"
    ).select("user_id", (F.col("ts") + F.expr("INTERVAL 10 HOURS")).alias("ts"))
    stream = file_stream(
        spark, ev.unionByName(sentinel), n_slices=3, time_ordered="ts"
    )
    sess = session_stats_stream(stream, ts_col="ts", key="user_id")
    out = drain_stream(sess, output_mode="append")
    return (
        out.filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            micros("first_ts").alias("s_start_us"),
            "n_events",
            (micros("last_ts") - micros("first_ts")).alias("duration_us"),
        )
        .orderBy("user_id", "s_start_us")
    )


HOUR_US = 3_600_000_000


@register(
    "streaming_w2_sliding_topk",
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
def streaming_w2_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 (sliding top-K users) as a real watermarked SLIDING-window
    streaming aggregation: 24 h windows sliding 6 h (each event expands
    to 4 window buckets at the scan), counts per (window, event_type,
    user) in streaming state across a 2-micro-batch replay, top-3 rank
    applied to the drained sink (ranking is output-side in streaming —
    the state holds only the counts). Oracle identical to the batch
    `w2_sliding_topk_users` twin, pinning batch/streaming parity."""
    ev = t(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    stream = file_stream(spark, ev, n_slices=2)
    agg = tumbling_stats_stream(
        stream,
        ts_col="ts",
        window="24 hours",
        slide="6 hours",
        watermark="25 hours",
        keys=("event_type", "user_id"),
        aggs=[F.count(F.lit(1)).alias("cnt")],
    )
    out = drain_stream(agg, output_mode="complete")
    from pyspark.sql import Window as W

    rnk = F.row_number().over(
        W.partitionBy("w_start_us", "event_type").orderBy(
            F.desc("cnt"), F.asc("user_id")
        )
    )
    return (
        out.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= 3)
        .select("w_start_us", "event_type", "user_id", "cnt", "rnk")
        .orderBy("w_start_us", "event_type", "rnk")
    )


from t_spoon_spark.queries.dedup import _DD_SIMHASH_CTES  # shared CTE (no cycle)

_SIMHASH_DEDUP_ORACLE = f"""
    WITH {_DD_SIMHASH_CTES},
    dups AS (
      SELECT DISTINCT doc_b AS doc_id FROM cand
      WHERE bit_count(xor(sim_a, sim_b)) <= 3
    )
    SELECT s.doc_id,
           CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
    FROM sim s LEFT JOIN dups d USING (doc_id)
    ORDER BY s.doc_id
    """


@register(
    "streaming_dedup_simhash",
    _SIMHASH_DEDUP_ORACLE,
)
def streaming_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup membership: SimHash signatures (computed at
    ingest, as a production pipeline does) replayed as a doc_id-ordered
    2-micro-batch stream; per-band-bucket GroupState compares each
    arriving doc against all earlier docs in its bucket (exhaustive at
    hamming <= 3 by the 4x12-bit banded pigeonhole — recall 1.0, not
    approximate). A doc is a duplicate iff some strictly-earlier doc is
    within hamming 3; the DuckDB oracle recomputes that definition
    directly from the pair CTE. The batch dedup_simhash finds the
    pairs; this entry is its arrival-ordered streaming twin (keep-first
    policy)."""
    from t_spoon_spark.operators.dedup import (
        SIMHASH_BANDS,
        SIMHASH_BITS,
        simhash,
    )
    from t_spoon_spark.streaming.windows import (
        drain_stream,
        file_stream,
        simhash_dedup_stateful,
    )

    docs = t(spark, sf_dir, "documents")
    sh = simhash(docs)  # (doc_id, sim) — ingest-side signature pass
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << band_bits) - 1
    bands = sh.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sim"), b * band_bits).bitwiseAND(F.lit(mask))
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    stream = file_stream(spark, bands, n_slices=2, time_ordered="doc_id")
    per_band = drain_stream(simhash_dedup_stateful(stream), output_mode="update")
    return (
        per_band.groupBy("doc_id")
        .agg(F.max("is_dup").cast("int").alias("is_dup"))
        .orderBy("doc_id")
    )


@register(
    "streaming_interval_join_left_outer",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS c_ts_us,
           CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
)
def streaming_interval_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits — with
    its purchase when one lands within the hour, null-padded otherwise.
    The null-padded rows only materialize when the watermark passes the
    click's match horizon, so a far-future sentinel row on EACH side
    (the query watermark is the min across inputs) closes the tail;
    sentinels filter out of the result. State on both sides stays
    watermark-bounded — the unmatched-left buffer is exactly the
    eviction horizon, the contract that makes outer stream joins
    runnable indefinitely."""
    from t_spoon_spark.streaming.windows import interval_join_stream

    ev = t(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    far = F.expr("INTERVAL 20 HOURS")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c_sent = spark.createDataFrame(
        [(-1, -1, max_ts)], "user_id long, click_id long, c_ts timestamp"
    ).select("user_id", "click_id", (F.col("c_ts") + far).alias("c_ts"))
    p_sent = spark.createDataFrame(
        [(-1, -1, max_ts)], "user_id long, purchase_id long, p_ts timestamp"
    ).select("user_id", "purchase_id", (F.col("p_ts") + far).alias("p_ts"))
    cs = file_stream(
        spark, clicks.unionByName(c_sent), n_slices=3, time_ordered="c_ts"
    )
    ps = file_stream(
        spark, purchases.unionByName(p_sent), n_slices=3, time_ordered="p_ts"
    )
    j = interval_join_stream(cs, ps, "user_id", "c_ts", "p_ts", how="left_outer")
    # sentinels filter AFTER the drain: a pre-drain filter on click_id
    # pushes down into the left input, removing the left sentinel — the
    # left watermark then stalls at the last real click and the final
    # unmatched click's null row never flushes
    out = drain_stream(
        j.select(
            "click_id",
            "purchase_id",
            micros("c_ts").alias("c_ts_us"),
            micros("p_ts").alias("p_ts_us"),
        ),
        output_mode="append",
    )
    return (
        out.filter(F.col("click_id") >= 0)
        .orderBy("click_id", "purchase_id")
    )


@register(
    "streaming_interval_join_full_outer",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS c_ts_us,
           CAST(epoch_us(p.ts) AS BIGINT) AS p_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
)
def streaming_interval_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: clicks with their
    in-window purchase, PLUS null-padded rows for clicks that never
    converted AND purchases no click preceded — both tails flush only
    when the watermark passes each row's match horizon, so state on
    both sides stays watermark-bounded exactly as in the left-outer
    entry.  Same far-future sentinel drain (one per side; the query
    watermark is the min across inputs), and the same pushdown trap:
    sentinels must filter AFTER the drain, and for full outer the
    filter must keep null keys on EITHER side (a naive
    `click_id >= 0 AND purchase_id >= 0` would delete every outer
    row — the rows the join mode exists to produce)."""
    from t_spoon_spark.streaming.windows import interval_join_stream

    ev = t(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    far = F.expr("INTERVAL 20 HOURS")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c_sent = spark.createDataFrame(
        [(-1, -1, max_ts)], "user_id long, click_id long, c_ts timestamp"
    ).select("user_id", "click_id", (F.col("c_ts") + far).alias("c_ts"))
    p_sent = spark.createDataFrame(
        [(-1, -1, max_ts)], "user_id long, purchase_id long, p_ts timestamp"
    ).select("user_id", "purchase_id", (F.col("p_ts") + far).alias("p_ts"))
    cs = file_stream(
        spark, clicks.unionByName(c_sent), n_slices=3, time_ordered="c_ts"
    )
    ps = file_stream(
        spark, purchases.unionByName(p_sent), n_slices=3, time_ordered="p_ts"
    )
    j = interval_join_stream(cs, ps, "user_id", "c_ts", "p_ts", how="full_outer")
    out = drain_stream(
        j.select(
            "click_id",
            "purchase_id",
            micros("c_ts").alias("c_ts_us"),
            micros("p_ts").alias("p_ts_us"),
        ),
        output_mode="append",
    )
    keep_c = F.col("click_id").isNull() | (F.col("click_id") >= 0)
    keep_p = F.col("purchase_id").isNull() | (F.col("purchase_id") >= 0)
    return out.filter(keep_c & keep_p).orderBy("click_id", "purchase_id")


@register(
    "streaming_cdc_latest_state",
    f"""
    WITH ops AS (
      SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_del,
             {dd_fixed('value')} AS value_c
      FROM events
    ),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts_us DESC, event_id DESC) AS rn
      FROM ops
    ),
    counts AS (
      SELECT user_id,
             CAST(SUM(1 - is_del) AS BIGINT) AS n_upserts,
             CAST(SUM(is_del) AS BIGINT) AS n_deletes
      FROM ops GROUP BY user_id
    )
    SELECT l.user_id, l.value_c AS last_value_c, c.n_upserts, c.n_deletes
    FROM latest l JOIN counts c USING (user_id)
    WHERE l.rn = 1 AND l.is_del = 0
    ORDER BY l.user_id
    """,
)
def streaming_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert/delete materialized view: the events table replayed
    as a 3-micro-batch change stream ('error' = delete tombstone,
    everything else = upsert); per-key GroupState folds last-writer-wins
    by (ts, event_id) across batches and counts ops. Keys whose latest
    op is a tombstone are absent from the final view; a later upsert
    would revive them. The drained final update per key equals the
    batch argmax — the streaming materialization and the warehouse
    backfill agree bit-for-bit."""
    from t_spoon_spark.queries.helpers import fixed
    from t_spoon_spark.streaming.windows import cdc_latest_stateful

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        fixed("value").alias("value_c"),
    )
    stream = file_stream(spark, ev, n_slices=3, time_ordered="ts_us")
    upd = drain_stream(cdc_latest_stateful(stream), output_mode="update")
    final = upd.groupBy("user_id").agg(
        F.max_by("last_value_c", F.col("n_upserts") + F.col("n_deletes")).alias(
            "last_value_c"
        ),
        F.max_by("alive", F.col("n_upserts") + F.col("n_deletes")).alias("alive"),
        F.max("n_upserts").alias("n_upserts"),
        F.max("n_deletes").alias("n_deletes"),
    )
    return (
        final.filter(F.col("alive") == 1)
        .select("user_id", "last_value_c", "n_upserts", "n_deletes")
        .orderBy("user_id")
    )


@register(
    "streaming_static_enrichment",
    f"""
    WITH users AS (
      SELECT c_custkey AS user_id, n.n_name AS nation
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT u.nation,
           (epoch_us(e.ts) // 86400000000) AS day_idx,
           COUNT(*) AS n_events,
           CAST(SUM({dd_fixed('e.value')}) AS BIGINT) AS sum_c
    FROM events e JOIN users u ON (e.user_id % 1500) = (u.user_id - 1)
    GROUP BY u.nation, day_idx
    ORDER BY nation, day_idx
    """,
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join (the third Structured Streaming join kind,
    next to the inner and left-outer stream-stream entries): the events
    stream enriches against the static customer->nation dimension — no
    watermark needed on the static side, and Spark plans it as a
    broadcast per micro-batch, so dimension updates between batches are
    picked up (the slowly-changing-dimension enrichment every event
    pipeline runs). Drained 3-batch replay equals the batch join; daily
    per-nation aggregates run in complete mode on top of the join."""
    ev = t(spark, sf_dir, "events").select("user_id", "value", "ts")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    users = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        (F.col("c_custkey") - 1).alias("join_key"), F.col("n_name").alias("nation")
    )
    stream = file_stream(spark, ev, n_slices=3)
    joined = stream.withColumn("join_key", F.col("user_id") % 1500).join(
        F.broadcast(users), "join_key"
    )
    agg = joined.groupBy(
        "nation",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day_idx"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(fixed("value")).alias("sum_c"),
    )
    out = drain_stream(agg, output_mode="complete")
    return out.select("nation", "day_idx", "n_events", "sum_c").orderBy(
        "nation", "day_idx"
    )

