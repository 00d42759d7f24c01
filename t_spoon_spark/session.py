"""SparkSession construction for the engine.

Single place that encodes the scale-aware defaults: AQE on, Arrow on,
UTC session timezone (required for byte-identical comparison against
the DuckDB oracle), shuffle partitions sized to the executor core
count rather than the 200 default.

On a real cluster the caller overrides ``master`` / memory; locally
(the test/bench harness) we run ``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_spark(
    app_name: str = "t_spoon_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one partition per core; a cluster deployment would
        # size this to ~2-3x total executor cores (or rely on AQE coalesce).
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns type —
        # read as long and normalize in load_events().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # full plan strings (plan-shape assertions parse PushedFilters etc.)
        .config("spark.sql.debug.maxToStringFields", "2000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Load the driver testdata tables and register temp views.

    Returns {name: DataFrame}. Parquet scans get pushdown/pruning from
    Catalyst; nothing is cached here — callers decide what to persist.
    """
    names = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            df = load_events(spark, sf_dir) if n == "events" else spark.read.parquet(path)
            df.createOrReplaceTempView(n)
            out[n] = df
    return out


def load_events(spark: SparkSession, sf_dir: str):
    """events.parquet with `ts` normalized to a µs TIMESTAMP column
    (`ts_ns` keeps raw nanos as BIGINT). The file has shipped with two
    physical types across testdata generations — TIMESTAMP(NANOS)
    (Spark: long under nanosAsLong) and TIMESTAMP(MICROS) (Spark:
    timestamp/ntz) — so sniff the read type and normalize either way.
    DuckDB reads the same file natively; epoch_us(ts) there ==
    unix_micros(ts) here in both cases.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # The driver may hand us a vanilla session without build_spark()'s
    # confs; nanosAsLong is a dynamic SQL conf, safe+idempotent to set here.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # TIMESTAMP(NANOS) read as raw nanos
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    # TIMESTAMP(MICROS): Spark reads isAdjustedToUTC=0 as TIMESTAMP_NTZ.
    # Under the UTC session tz the cast to TIMESTAMP is identity on the
    # instant (same contract as queries/helpers.micros()); consumers
    # (window(), withWatermark, unix_micros) require a true TIMESTAMP.
    return df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
    )
