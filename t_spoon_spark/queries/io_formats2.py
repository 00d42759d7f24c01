"""Partitioned-layout coverage gate (round 13): write the events table
partitioned by ``event_type`` and aggregate one partition back through
a filtered scan — the Spark-native mechanism this engine claims as the
reference's ``PartitionOrBcastPartitioner`` equivalent (SURVEY §2
Q6: "partition pruning — Catalyst does this"; reference
common/PartitionOrBcastPartitioner.java:20-117 routes key queries to
owning partitions with a custom partitioner).  The oracle reads the
raw parquet with the same predicate, so the gate pins that the
partitioned layout loses nothing; the plan test in
tests/test_plans_curation.py pins that the scan actually PRUNES
(PartitionFilters, one directory read) rather than filtering
post-scan.  At 100 TB this layout turns an event-type-scoped query
from a full-corpus scan into a directory listing — the first lever a
deployment pulls before any engine work.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.helpers import dd_fixed, fixed
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

# one scratch layout per session, overwritten per sf signature (the
# io_formats roundtrip convention: overwrite-in-place bounds /tmp at
# one copy; the read is lazy so the dir outlives the frame)
_WRITTEN: dict[tuple[str, str], bool] = {}


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as an event_type-partitioned parquet layout,
    written once per (session, sf_dir).  The scratch dir is PER
    (session, sf_dir) (hash-suffixed): a shared dir would let a later
    call for a different scale factor — or a concurrent session on the
    SAME sf_dir — overwrite the files under an earlier call's
    still-lazy frame, silently serving the wrong corpus to whoever
    collects it afterwards.  One copy per sf used in the session; the
    events table is the smallest scaling table, so the disk bound is
    modest and the correctness hazard is gone."""
    import hashlib

    # the applicationId joins the path, not just the guard key (ADVICE
    # r13): two concurrent sessions (parallel pytest/bench) on the same
    # sf_dir each held their own _WRITTEN guard but shared one /tmp
    # layout, so either could overwrite the files under the other's
    # still-lazy frame — per-session dirs make the layouts disjoint
    app_id = spark.sparkContext.applicationId
    suffix = hashlib.md5(
        f"{app_id}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"tspoon_io_part_events_{suffix}")
    key = (app_id, sf_dir)
    if not _WRITTEN.get(key):
        t(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
        _WRITTEN[key] = True
    return spark.read.parquet(path)


@register(
    "io_partition_pruned_scan",
    f"""
    SELECT user_id % 100 AS user_bucket,
           COUNT(*) AS n_events,
           CAST(SUM({dd_fixed("value")}) AS BIGINT) AS sum_value_c
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id % 100
    ORDER BY user_bucket
    """,
)
def io_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the 'purchase' partition of the event_type-partitioned
    layout: the filter resolves to a PARTITION directory, so the scan
    reads one partition's files and nothing else (PartitionFilters in
    the plan — asserted by the plan gate).  The oracle computes the
    identical aggregate from the raw unpartitioned parquet, pinning
    that the partitioned write/read loses no rows and coerces no types
    (event_type travels as a directory key and comes back a string)."""
    ev = partitioned_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy((F.col("user_id") % 100).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(fixed("value")).cast("long").alias("sum_value_c"),
        )
        .orderBy("user_bucket")
    )
