"""Forecasting baseline: Holt linear (double-exponential) smoothing
over the per-type daily event series, with a 3-day-ahead forecast —
the capacity-planning primitive a metrics pipeline runs on its own
rollups.

alpha = beta = 1/2 makes every smoothing step one addition plus one
halving; values are pre-scaled x1000 and halving is EXPLICIT FLOOR
division (Python `//` floors; DuckDB `//` truncates toward zero like
Spark `div`, which diverges on negative trends — so the oracle floors
through FLOOR(x/2.0) instead). The fold is sequential per series, so
it runs as an Arrow applyInPandas over the type partitions (the
packing entry's pattern); the oracle replays the identical recurrence
as a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

FC_H = 3  # forecast horizon (days)


@register(
    "forecast_holt_linear",
    f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000) AS day,
             CAST(COUNT(*) * 1000 AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    rn AS (
      SELECT event_type, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    init AS (
      SELECT a.event_type, CAST(2 AS BIGINT) AS i, b.y AS l, b.y - a.y AS b, a.n
      FROM (SELECT * FROM rn WHERE i = 1) a
      JOIN (SELECT * FROM rn WHERE i = 2) b USING (event_type)
    ),
    rec(event_type, i, l, b, n) AS (
      SELECT event_type, i, l, b, n FROM init
      UNION ALL
      SELECT r.event_type, r.i + 1,
             CAST(FLOOR((x.y + r.l + r.b) / 2.0) AS BIGINT),
             CAST(FLOOR((CAST(FLOOR((x.y + r.l + r.b) / 2.0) AS BIGINT) - r.l
                         + r.b) / 2.0) AS BIGINT),
             r.n
      FROM rec r
      JOIN rn x ON x.event_type = r.event_type AND x.i = r.i + 1
      WHERE r.i < r.n
    ),
    final AS (SELECT * FROM rec WHERE i = n),
    h AS (SELECT unnest(range(1, {FC_H} + 1)) AS horizon)
    SELECT f.event_type, CAST(h.horizon AS BIGINT) AS horizon,
           CAST(f.l + h.horizon * f.b AS BIGINT) AS forecast_c
    FROM final f CROSS JOIN h
    ORDER BY event_type, horizon
    """,
)
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear smoothing per event type (alpha=beta=0.5, x1000
    fixed point): level and trend fold sequentially over the observed
    daily series, then project h=1..3 days ahead as l + h*b. Series
    fold is inherently sequential per key -> Arrow applyInPandas, keys
    in parallel; at 100 TB the input to the fold is the (already tiny)
    daily rollup, so the Python stage sees series-length rows per key,
    never raw events. Floor-halving keeps the recurrence exact and
    engine-portable even when the trend goes negative."""
    import pandas as pd

    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
                "day"
            ),
        )
        .groupBy("event_type", "day")
        .agg((F.count(F.lit(1)) * 1000).cast("long").alias("y"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = [int(v) for v in pdf["y"]]
        if len(ys) < 2:
            return pd.DataFrame(
                {"event_type": [], "horizon": [], "forecast_c": []}
            ).astype({"event_type": str, "horizon": "int64", "forecast_c": "int64"})
        level, trend = ys[1], ys[1] - ys[0]
        for y in ys[2:]:
            new_level = (y + level + trend) // 2  # Python // floors
            trend = (new_level - level + trend) // 2
            level = new_level
        etype = pdf["event_type"].iloc[0]
        rows = [(etype, h, level + h * trend) for h in range(1, FC_H + 1)]
        return pd.DataFrame(rows, columns=["event_type", "horizon", "forecast_c"])

    out = daily.groupBy("event_type").applyInPandas(
        holt, schema="event_type string, horizon bigint, forecast_c bigint"
    )
    return out.orderBy("event_type", "horizon")
