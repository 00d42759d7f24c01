"""Temporal join/session operators.

Spark has no native AS-OF join (the reference has no joins at all,
SURVEY.md §2.9); the scalable formulation is the union-window trick:
tag both sides, union, and carry the latest right-side payload forward
with ``last(..., ignorenulls)`` over a key-partitioned window. One
shuffle on the key, no range-condition row explosion, survives skew via
AQE. ``merge_asof``-per-group via applyInPandas would ship every group
through Python — kept out of the hot path deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (or < when strict) matching the `on` key.

    Right payload columns come back prefixed ``asof_``; rows with no
    match keep nulls (left outer semantics).
    """
    l_tag, r_tag = (1, 0) if not strict else (0, 1)
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__src"),
        *[F.col(c).alias(f"asof_{c}") for c in payload],
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__src"),
        *[F.lit(None).cast(r.schema[f"asof_{c}"].dataType).alias(f"asof_{c}") for c in payload],
        F.struct(*lcols).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))
    unioned = l.unionByName(r)
    # at equal ts the right row sorts before the left row (non-strict)
    # or after it (strict), which encodes <= vs <.
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__src")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__left",
        "__src",
        *[F.last(f"asof_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in payload],
    )
    is_left = F.col("__src") == l_tag
    return carried.filter(is_left).select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        *[F.col(f"asof_{c}") for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: float,
) -> DataFrame:
    """Pairs (left, right) on key with right_ts in (left_ts, left_ts+gap].

    Column names must be disjoint between the two sides (rename before
    calling). Equi-join on the key plus a range filter: Catalyst
    evaluates the range predicate inside the hash join, so the blow-up
    is bounded by real matches. For key-free range joins, bucketize the
    time axis first.
    """
    gap_us = int(max_gap_seconds * 1_000_000)
    lts = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rts = F.unix_micros(F.col(right_ts).cast("timestamp"))
    return left.join(
        right,
        (F.col(left_on) == F.col(right_on)) & (rts > lts) & (rts <= lts + F.lit(gap_us)),
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: float,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds the gap. Adds
    ``session_id`` (per-key, 1-based) — one shuffle, lag + running sum.
    """
    gap_us = int(gap_seconds * 1_000_000)
    w = W.partitionBy(key).orderBy(ts)
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    new_session = F.when(prev.isNull() | ((ts_us - prev) > gap_us), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
