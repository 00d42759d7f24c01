"""Pinned contract for load_events: whatever physical timestamp type
events.parquet ships — TIMESTAMP(NANOS) (Spark: raw long under
nanosAsLong) or TIMESTAMP(MICROS, isAdjustedToUTC=0) (Spark:
TIMESTAMP_NTZ) — the loaded frame MUST expose

  * ``ts``    as a true TimestampType (never NTZ, never long): required
              by window(), withWatermark(), unix_micros();
  * ``ts_ns`` as BIGINT nanoseconds of the same instant.

Rounds 1 and 3 each shipped a loader regression in one direction of
this contract (r1: NANOS→long left raw; r3: MICROS→NTZ not cast), so
both directions are synthesized and pinned here, independent of which
flavor the live testdata currently uses.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from tests.conftest import SF_SMALL

# fixed instants (UTC), microsecond precision
INSTANTS_US = [
    1_700_000_000_000_000,  # 2023-11-14T22:13:20Z
    1_700_000_123_456_789 // 1000 * 1000 // 1,  # odd micros
    1_700_003_600_000_000,
]


def _write_events(tmp_path, unit: str) -> str:
    ts = pa.array(INSTANTS_US, type=pa.int64())
    if unit == "us":
        col = ts.cast(pa.timestamp("us"))  # no tz → isAdjustedToUTC=0 → NTZ
    else:
        col = pa.array([v * 1000 for v in INSTANTS_US], type=pa.int64()).cast(
            pa.timestamp("ns")
        )
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": col,
            "user_id": pa.array([10, 11, 12], type=pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
        }
    )
    out = str(tmp_path / unit)
    (tmp_path / unit).mkdir()
    # version 2.6 keeps TIMESTAMP(NANOS) physical; 'us' stays MICROS
    pq.write_table(
        table,
        f"{out}/events.parquet",
        version="2.6",
        coerce_timestamps=None,
    )
    return out


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_events_normalizes_both_physical_types(spark, tmp_path, unit):
    from t_spoon_spark.session import load_events

    sf_dir = _write_events(tmp_path, unit)
    # emulate the driver's vanilla session: the loader must not depend
    # on build_spark() having pre-set nanosAsLong
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_events(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    ts_type = df.schema["ts"].dataType
    assert isinstance(ts_type, TimestampType), f"ts is {ts_type}, want TIMESTAMP"
    assert not isinstance(ts_type, TimestampNTZType)
    assert isinstance(df.schema["ts_ns"].dataType, LongType)

    rows = (
        df.select("event_id", F.unix_micros("ts").alias("us"), "ts_ns")
        .orderBy("event_id")
        .collect()
    )
    assert [r["us"] for r in rows] == INSTANTS_US
    assert [r["ts_ns"] for r in rows] == [v * 1000 for v in INSTANTS_US]


def test_live_testdata_contract(spark):
    """The actual driver testdata (whatever flavor it currently ships)
    satisfies the same contract, and window()/withWatermark() accept ts."""
    from t_spoon_spark.session import load_events

    df = load_events(spark, SF_SMALL)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # window() over ts must plan without DATATYPE_MISMATCH
    agg = df.groupBy(F.window("ts", "1 hour")).count()
    agg.select(F.unix_micros("window.start")).limit(1).collect()
    # withWatermark must accept ts (rejects NTZ outright)
    df.withWatermark("ts", "1 hour")


def test_live_testdata_instants_match_duckdb(spark, duck):
    """unix_micros(ts) after loading equals DuckDB's epoch_us over the
    same file — the cross-engine instant contract the oracles rely on."""
    from t_spoon_spark.session import load_events

    got = (
        load_events(spark, SF_SMALL)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .limit(100)
        .collect()
    )
    want = duck.execute(
        "SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS us "
        "FROM events ORDER BY event_id LIMIT 100"
    ).fetchall()
    assert [(r["event_id"], r["us"]) for r in got] == [tuple(w) for w in want]
