"""Sketch queries over events: HyperLogLog distinct count and
count-min-sketch heavy hitters. The oracles rebuild the identical
sketches in SQL — registers, counters, and estimates are all integer-
exact except HLL's final one-expression double divide (same literal,
same IEEE ops in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from t_spoon_spark.operators.dedup import MINHASH_P, PERMS
from t_spoon_spark.operators.sketch import (
    CMS_D,
    CMS_W,
    HLL_ALPHA_NUM,
    HLL_M,
    HLL_W,
    SCALE_POW,
    cms_heavy_hitters,
    hll_estimate,
    hll_registers,
)
from t_spoon_spark.operators.text import dd_md5_long
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

_H = dd_md5_long("CAST(event_id AS VARCHAR)")
_HU = dd_md5_long("CAST(user_id AS VARCHAR)")


@register(
    "sketch_hll_distinct_events",
    f"""
    WITH h AS (SELECT {_H} AS h FROM events),
    reg AS (
      SELECT h % {HLL_M} AS bucket,
             MAX(CASE WHEN (h // {HLL_M}) % {1 << HLL_W} = 0 THEN {HLL_W + 1}
                      ELSE {HLL_W} + 1 - length(bin((h // {HLL_M}) % {1 << HLL_W}))
                 END) AS rho_max
      FROM h GROUP BY 1
    ),
    s AS (
      SELECT COUNT(*) AS used,
             CAST(SUM(CAST(power(2, {SCALE_POW} - rho_max) AS BIGINT)) AS BIGINT) AS s_used
      FROM reg
    )
    SELECT used AS n_buckets_used,
           {HLL_M} - used AS zero_registers,
           CAST(FLOOR({HLL_ALPHA_NUM} /
                CAST(s_used + ({HLL_M} - used) * {1 << SCALE_POW} AS DOUBLE)) AS BIGINT) AS est
    FROM s
    """,
)
def sketch_hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL(p=9, 512 registers) distinct count of event_id: the register
    build is one groupBy with map-side max partials (512 rows of state,
    mergeable across partitions/days by MAX — the property that makes
    HLL the 100 TB distinct-count primitive)."""
    ev = t(spark, sf_dir, "events").select("event_id")
    return hll_estimate(hll_registers(ev, "event_id"))


def _dd_cms_col(h_expr: str, j: int) -> str:
    a, b = PERMS[j]
    return f"((({h_expr}) % {MINHASH_P}) * {a} + {b}) % {MINHASH_P} % {CMS_W}"


@register(
    "sketch_cms_heavy_users",
    f"""
    WITH h AS (SELECT user_id, {_HU} AS h FROM events),
    rc AS (
      {" UNION ALL ".join(f"SELECT {j} AS r, {_dd_cms_col('h', j)} AS c FROM h" for j in range(CMS_D))}
    ),
    sk AS (SELECT r, c, COUNT(*) AS cnt FROM rc GROUP BY r, c),
    cand AS (
      SELECT DISTINCT user_id AS value,
             {", ".join(f"{_dd_cms_col('h', j)} AS c{j}" for j in range(CMS_D))}
      FROM h
    ),
    est AS (
      SELECT cand.value,
             LEAST({", ".join(f"s{j}.cnt" for j in range(CMS_D))}) AS est
      FROM cand
        {" ".join(f"JOIN sk s{j} ON s{j}.r = {j} AND s{j}.c = cand.c{j}" for j in range(CMS_D))}
    )
    SELECT value, est FROM est
    WHERE est >= (SELECT GREATEST(COUNT(*) // 100, 1) FROM events)
    ORDER BY value
    """,
)
def sketch_cms_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min(4x256) heavy hitters over user_id: users whose CMS
    estimate reaches 1% of the stream. The sketch is d*w=1024 exact
    counters built in one groupBy; the candidate probe broadcasts it.
    Estimates are deterministic upper bounds (collision inflation is
    identical in both engines)."""
    ev = t(spark, sf_dir, "events").select("user_id")
    threshold = max(ev.count() // 100, 1)
    return cms_heavy_hitters(ev, "user_id", threshold).orderBy("value")


@register(
    "sketch_histogram_quantiles",
    """
    WITH h AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(value / 4.0) AS BIGINT), 0), 127) AS bin,
             COUNT(*) AS c
      FROM events GROUP BY bin
    ),
    cum AS (
      SELECT bin, c, SUM(c) OVER (ORDER BY bin) AS cum, SUM(c) OVER () AS total
      FROM h
    ),
    q AS (SELECT unnest([50, 90, 99]) AS q_pct)
    SELECT q_pct,
           MIN(bin) AS bin,
           CAST(MIN(bin) * 4 AS BIGINT) AS est_value_lo
    FROM q JOIN cum ON cum.cum * 100 >= q.q_pct * cum.total
    GROUP BY q_pct
    ORDER BY q_pct
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantile sketch: a fixed 128-bin equi-width
    histogram over events.value (bin width 4.0, domain clamped) — the
    constant-size, commutative-merge state family of HLL/count-min; at
    100 TB each partition folds its own histogram and the merge is a
    128-long vector add, with NO per-value state. Quantile estimate =
    lower edge of the first bin whose cumulative count reaches the
    rank; the oracle recomputes the identical estimator, so the
    approximation itself is pinned exactly (same sketch -> same
    answer), not compared against exact quantiles."""
    ev = t(spark, sf_dir, "events")
    h = (
        ev.select(
            F.least(
                F.greatest(F.floor(F.col("value") / 4.0).cast("long"), F.lit(0)),
                F.lit(127),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = h.select(
        "bin",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("total"),
    )
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q_pct int")
    return (
        qs.join(cum, F.col("cum") * 100 >= F.col("q_pct") * F.col("total"))
        .groupBy("q_pct")
        .agg(
            F.min("bin").alias("bin"),
            (F.min("bin") * 4).cast("long").alias("est_value_lo"),
        )
        .orderBy("q_pct")
    )


_DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"
_HT = dd_md5_long("term")


@register(
    "sketch_hll_grouped_merge",
    f"""
    WITH tok AS (SELECT source, unnest({_DD_TOKS}) AS term FROM documents),
    h AS (SELECT source, {_HT} AS h FROM tok),
    reg AS (
      SELECT source, h % {HLL_M} AS bucket,
             MAX(CASE WHEN (h // {HLL_M}) % {1 << HLL_W} = 0 THEN {HLL_W + 1}
                      ELSE {HLL_W} + 1 - length(bin((h // {HLL_M}) % {1 << HLL_W}))
                 END) AS rho_max
      FROM h GROUP BY source, bucket
    ),
    merged AS (
      SELECT '__all__' AS source, bucket, MAX(rho_max) AS rho_max
      FROM reg GROUP BY bucket
    ),
    allreg AS (SELECT * FROM reg UNION ALL SELECT * FROM merged),
    s AS (
      SELECT source, COUNT(*) AS used,
             CAST(SUM(CAST(power(2, {SCALE_POW} - rho_max) AS BIGINT)) AS BIGINT) AS s_used
      FROM allreg GROUP BY source
    )
    SELECT source,
           used AS n_buckets_used,
           CAST(FLOOR({HLL_ALPHA_NUM} /
                CAST(s_used + ({HLL_M} - used) * {1 << SCALE_POW} AS DOUBLE)) AS BIGINT) AS est
    FROM s
    ORDER BY source
    """,
)
def sketch_hll_grouped_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL + lossless merge: one distinct-term sketch per
    source (a (source, bucket) groupBy — m rows of state per group),
    and a corpus-wide '__all__' estimate obtained by MERGING the
    per-source registers (bucket-wise MAX), never re-scanning the data.
    That register-merge IS the property that makes HLL the 100 TB
    distinct-count primitive: per-day/per-shard sketches roll up to any
    coarser grouping with a tiny aggregate. The oracle rebuilds both
    levels identically."""
    docs = t(spark, sf_dir, "documents")
    from t_spoon_spark.operators.text import md5_long, tokens

    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    h = tok.select("source", md5_long(F.col("term")).alias("__h"))
    w = F.expr(f"(__h div {HLL_M}) % {1 << HLL_W}")
    bits = F.length(F.conv(w.cast("string"), 10, 2))
    rho = (
        F.when(w == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W) + 1 - bits)
        .cast("long")
    )
    reg = (
        h.select(
            "source", (F.col("__h") % F.lit(HLL_M)).alias("bucket"), rho.alias("rho")
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    merged = (
        reg.groupBy("bucket")
        .agg(F.max("rho_max").alias("rho_max"))
        .select(F.lit("__all__").alias("source"), "bucket", "rho_max")
    )
    allreg = reg.unionByName(merged)
    term = F.pow(F.lit(2.0), F.lit(SCALE_POW) - F.col("rho_max")).cast("long")
    s = allreg.groupBy("source").agg(
        F.count(F.lit(1)).alias("used"), F.sum(term).alias("s_used")
    )
    s_total = F.col("s_used") + (F.lit(HLL_M) - F.col("used")) * F.lit(
        1 << SCALE_POW
    )
    return s.select(
        "source",
        F.col("used").alias("n_buckets_used"),
        F.floor(F.expr(HLL_ALPHA_NUM) / s_total.cast("double"))
        .cast("long")
        .alias("est"),
    ).orderBy("source")


KMV_K = 64
KMV_M = float(1 << 60)  # md5_long domain (15 hex chars)


def _dd_kmv(event_type: str, name: str) -> str:
    return f"""
    {name} AS (
      SELECT h FROM (
        SELECT DISTINCT {_HU} AS h FROM events WHERE event_type = '{event_type}'
      ) ORDER BY h LIMIT {KMV_K}
    )"""


_DD_KMV_EST = (
    "CASE WHEN cnt < {k} THEN CAST(cnt AS BIGINT) "
    "ELSE CAST(FLOOR(({k} - 1) * ({m} / CAST(hk AS DOUBLE)) + 0.5) AS BIGINT) END"
).format(k=KMV_K, m=repr(KMV_M))


@register(
    "sketch_kmv_set_ops",
    f"""
    WITH {_dd_kmv('click', 'ka')},
    {_dd_kmv('purchase', 'kb')},
    ku AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
      ) ORDER BY h LIMIT {KMV_K}
    ),
    stats AS (
      SELECT
        (SELECT COUNT(*) FROM ka) AS ca, (SELECT MAX(h) FROM ka) AS ha,
        (SELECT COUNT(*) FROM kb) AS cb, (SELECT MAX(h) FROM kb) AS hb,
        (SELECT COUNT(*) FROM ku) AS cu, (SELECT MAX(h) FROM ku) AS hu,
        (SELECT COUNT(*) FROM ku
         WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS n_both
    )
    SELECT
      (SELECT {_DD_KMV_EST} FROM (SELECT ca AS cnt, ha AS hk FROM stats)) AS est_clicks,
      (SELECT {_DD_KMV_EST} FROM (SELECT cb AS cnt, hb AS hk FROM stats)) AS est_purchases,
      (SELECT {_DD_KMV_EST} FROM (SELECT cu AS cnt, hu AS hk FROM stats)) AS est_union,
      CAST(FLOOR(n_both * 1000000.0 / cu) AS BIGINT) AS jaccard_c,
      CAST(FLOOR(
        (n_both * 1000000.0 / cu)
        * (SELECT {_DD_KMV_EST} FROM (SELECT cu AS cnt, hu AS hk FROM stats))
        / 1000000.0
      ) AS BIGINT) AS est_intersection
    FROM stats
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, k=64) distinct sketches with SET
    OPERATIONS — the capability HLL lacks: the union sketch is the k
    smallest of the merged sketches, the Jaccard estimate is the
    fraction of union-sketch members present in both input sketches,
    and the intersection estimate is Jaccard x union. Each sketch is a
    bottom-k of distinct hashes (TakeOrderedAndProject — mergeable,
    constant size), so per-day / per-segment sketches compose into any
    set-algebra question later. Degenerate small sets (fewer distinct
    values than k) report their exact count — same rule both engines.
    All hash arithmetic is exact; the two estimator divisions are
    single IEEE ops with identical expression shape."""
    ev = t(spark, sf_dir, "events")
    from t_spoon_spark.operators.text import md5_long

    def sketch(etype: str) -> list[int]:
        # the k-row sketch IS the control-plane state (constant size by
        # construction) — collect it once; all set algebra then runs
        # driver-side on <=3k integers, no cached frames left pinned
        return [
            r.h
            for r in ev.filter(F.col("event_type") == etype)
            .select(md5_long(F.col("user_id").cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
            .collect()
        ]

    ka = sketch("click")
    kb = sketch("purchase")
    ku = sorted(set(ka) | set(kb))[:KMV_K]
    n_both = sum(1 for h in ku if h in set(ka) and h in set(kb))

    def est(vals: list[int]) -> int:
        if len(vals) < KMV_K:
            return len(vals)
        import math

        return int(math.floor((KMV_K - 1) * (KMV_M / float(max(vals))) + 0.5))

    ea, eb, eu = est(ka), est(kb), est(ku)
    cu = len(ku)
    jacc = int(n_both * 1_000_000.0 // cu) if cu else 0
    inter = int((n_both * 1_000_000.0 / cu) * eu // 1_000_000.0) if cu else 0
    return ev.sparkSession.createDataFrame(
        [(ea, eb, eu, jacc, inter)],
        "est_clicks bigint, est_purchases bigint, est_union bigint, "
        "jaccard_c bigint, est_intersection bigint",
    )


@register(
    "sketch_hll_sliding_7d",
    f"""
    WITH h AS (
      SELECT (epoch_us(ts) // 86400000000) AS day, {_HU} AS h FROM events
    ),
    reg AS (
      SELECT day, h % {HLL_M} AS bucket,
             MAX(CASE WHEN (h // {HLL_M}) % {1 << HLL_W} = 0 THEN {HLL_W + 1}
                      ELSE {HLL_W} + 1 - length(bin((h // {HLL_M}) % {1 << HLL_W}))
                 END) AS rho_max
      FROM h GROUP BY day, bucket
    ),
    days AS (SELECT DISTINCT day FROM reg),
    win AS (
      SELECT d.day, r.bucket, MAX(r.rho_max) AS rho_max
      FROM days d JOIN reg r ON r.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day, r.bucket
    ),
    s AS (
      SELECT day, COUNT(*) AS used,
             CAST(SUM(CAST(power(2, {SCALE_POW} - rho_max) AS BIGINT)) AS BIGINT) AS s_used
      FROM win GROUP BY day
    )
    SELECT day,
           used AS n_buckets_used,
           CAST(FLOOR({HLL_ALPHA_NUM} /
                CAST(s_used + ({HLL_M} - used) * {1 << SCALE_POW} AS DOUBLE)) AS BIGINT)
             AS est_7d_users
    FROM s
    ORDER BY day
    """,
)
def sketch_hll_sliding_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day WITHOUT re-scanning raw
    events per window: daily HLL registers merge by bucket-wise MAX
    across each day's trailing window — the rolling-MAU pattern where
    the persisted state is one 512-register sketch per day and every
    window estimate is a register merge. The window join runs on the
    (days x buckets)-sized register table, never on events; the same
    registers answer any other window length after the fact. Oracle
    rebuilds the identical two-level structure."""
    from t_spoon_spark.operators.text import md5_long

    ev = t(spark, sf_dir, "events")
    h = ev.select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day"),
        md5_long(F.col("user_id").cast("string")).alias("__h"),
    )
    w = F.expr(f"(__h div {HLL_M}) % {1 << HLL_W}")
    bits = F.length(F.conv(w.cast("string"), 10, 2))
    rho = (
        F.when(w == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W) + 1 - bits)
        .cast("long")
    )
    reg = (
        h.select("day", (F.col("__h") % F.lit(HLL_M)).alias("bucket"), rho.alias("rho"))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    days = reg.select("day").distinct().select(F.col("day").alias("d"))
    win = (
        days.join(
            reg,
            (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")),
        )
        .groupBy(F.col("d").alias("day"), "bucket")
        .agg(F.max("rho_max").alias("rho_max"))
    )
    term = F.pow(F.lit(2.0), F.lit(SCALE_POW) - F.col("rho_max")).cast("long")
    s = win.groupBy("day").agg(
        F.count(F.lit(1)).alias("used"), F.sum(term).alias("s_used")
    )
    s_total = F.col("s_used") + (F.lit(HLL_M) - F.col("used")) * F.lit(1 << SCALE_POW)
    return s.select(
        "day",
        F.col("used").alias("n_buckets_used"),
        F.floor(F.expr(HLL_ALPHA_NUM) / s_total.cast("double"))
        .cast("long")
        .alias("est_7d_users"),
    ).orderBy("day")
