"""Native Structured Streaming semantics (streaming/windows.py):
watermark late-data eviction in append mode and cross-micro-batch
GroupState in the applyInPandasWithState keyed reduce. The bounded
replay equivalence to batch answers is covered by the oracle gate
(streaming_w1_tumbling_stats / streaming_w7_stateful_totals)."""

from __future__ import annotations

import os
import tempfile
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from t_spoon_spark.streaming.windows import (
    drain_stream,
    running_totals_stateful,
    tumbling_stats_stream,
)


def _file_stream(spark, *files: pd.DataFrame):
    """Parquet files with forced ascending mtimes, opened as a
    maxFilesPerTrigger=1 stream: one micro-batch per file, in order."""
    d = tempfile.mkdtemp(prefix="tspoon_stream_test_")
    now = time.time()
    for i, df in enumerate(files):
        if "ts" in df.columns:
            # µs precision (the engine sessions set nanosAsLong, under
            # which ns timestamps read as BIGINT) and UTC-adjusted
            # (withWatermark rejects TIMESTAMP_NTZ)
            df["ts"] = df["ts"].astype("datetime64[us]").dt.tz_localize("UTC")
        p = os.path.join(d, f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(df), p)
        os.utime(p, (now - 100 + i * 10, now - 100 + i * 10))
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)


def _ts(h: int, m: int = 0) -> pd.Timestamp:
    return pd.Timestamp(2024, 1, 1, h, m)


def test_watermark_drops_late_rows_append_mode(spark):
    """Batch 0 ends at 13:05 -> watermark 12:05 (1h delay), which
    finalizes [10:00,11:00) during batch 1. Batch 2's 10:30 row is late
    behind that watermark and must be dropped (Spark's late filter uses
    the previous trigger's watermark, hence the spacer batch 1): the
    window emits with batch 0's count only, and the 13:00 window is
    never finalized, so append mode never emits it."""
    a = pd.DataFrame(
        {"k": ["x", "x", "x"], "ts": [_ts(10, 0), _ts(10, 15), _ts(13, 5)]}
    )
    b = pd.DataFrame({"k": ["x"], "ts": [_ts(13, 10)]})
    c = pd.DataFrame({"k": ["x", "x"], "ts": [_ts(10, 30), _ts(13, 20)]})
    stream = _file_stream(spark, a, b, c)
    agg = tumbling_stats_stream(
        stream,
        ts_col="ts",
        window="1 hour",
        watermark="1 hour",
        keys=("k",),
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    rows = {r.w_start_us: r.n for r in drain_stream(agg, "append").collect()}
    t10 = int(_ts(10).timestamp() * 1_000_000)
    t13 = int(_ts(13).timestamp() * 1_000_000)
    assert rows.get(t10) == 2, rows  # late 10:30 row evicted, not counted
    assert t13 not in rows, rows  # unfinalized window not emitted


def test_group_state_accumulates_across_batches(spark):
    """A key present in both micro-batches must emit two cumulative
    updates from one GroupState (not two independent per-batch sums)."""
    a = pd.DataFrame({"user_id": [1, 1, 2], "value_c": [10, 20, 5]})
    b = pd.DataFrame({"user_id": [1, 3], "value_c": [70, 1]})
    stream = _file_stream(spark, a, b)
    updates = drain_stream(running_totals_stateful(stream), "update").collect()
    by_user: dict[int, list] = {}
    for r in sorted(updates, key=lambda r: (r.user_id, r.n_events)):
        by_user.setdefault(r.user_id, []).append((r.total_c, r.n_events))
    assert by_user[1] == [(30, 2), (100, 3)], by_user  # cumulative, not per-batch
    assert by_user[2] == [(5, 1)], by_user
    assert by_user[3] == [(1, 1)], by_user


def test_streaming_dedup_bounds_state_and_keeps_first(spark):
    """dedup_stream emits one row per key and holds state only within
    the watermark horizon: a duplicate arriving after its key's state
    expired is re-emitted (the documented horizon contract), while
    in-horizon duplicates are suppressed."""
    import pyspark.sql.functions as F

    from t_spoon_spark.streaming.windows import dedup_stream, drain_stream, file_stream

    rows = [
        # (key, seconds) — key "a" repeats in-horizon (t=10) and far
        # beyond the 1-minute horizon (t=100000). Eviction lags the
        # data by two micro-batches (batch N evicts with the watermark
        # computed from batches <= N-1), so the middle batches advance
        # the watermark past a's state expiry before a's re-arrival.
        ("a", 5), ("b", 6), ("a", 10),
        ("d", 2_000), ("c", 2_500),
        ("e", 3_000),
        ("a", 100_000),
    ]
    df = spark.createDataFrame(rows, "k string, s long").select(
        "k", F.timestamp_micros((F.col("s") + 86_400) * 1_000_000).alias("ts")
    )
    stream = file_stream(spark, df, n_slices=4, time_ordered="ts")
    out = drain_stream(
        dedup_stream(stream, ("k",), watermark="1 minute"), output_mode="append"
    )
    got = sorted((r["k"]) for r in out.collect())
    # "a" appears twice: once at t=5, once after state expiry at t=100000
    assert got == ["a", "a", "b", "c", "d", "e"]
