"""Streaming end-to-end commit latency (round-6 verdict item 7).

The reference tracks end-to-end latency through its tracker sinks
(evaluation/LatencyTrackerStart.java / LatencyTrackerEnd.java stamp a
record at ingestion and at the sink).  In the epoch model the analogous
number is TRIGGER-TO-COMMIT: a record delivered by a micro-batch
trigger is durably committed one epoch wall later, and
StreamMetrics.wall_s measures exactly that span per epoch (foreachBatch
entry -> store commit + result accounting).

The workload mirrors the bank benches: transfers derived from the
events table, fed as a file stream one batch per trigger through the
PL3 transactional graph.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.bench_txn import _graph, _transfers
from t_spoon_spark.streaming import StreamRunner
from t_spoon_spark.tx import TxEnvironment

SCHEMA = "_tid long, from_account string, to_account string, amount double"


def streaming_bank_latency_ms(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 6,
    batch_rows: int = 4000,
) -> tuple[float, float]:
    """(mean, spread) trigger-to-commit latency in ms over the measured
    micro-batch epochs (first epoch excluded as warm-up — it pays the
    one-time plan/codegen cost the reference likewise excludes from its
    post-warm-up latency numbers).  Amounts are capped like the
    unloaded bench so this measures the clean streaming floor, not the
    abort-cascade path (covered by the loaded latency metric)."""
    transfers = (
        _transfers(spark, sf_dir)
        .withColumn("amount", F.col("amount") % 100 + 1)
        .localCheckpoint(eager=True)
    )
    total = transfers.count()
    n_batches = min(n_batches, max(2, total // max(batch_rows, 1)))

    stream_dir = tempfile.mkdtemp(prefix="tspoon_stream_bench_")
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for i in range(n_batches):
            lo, hi = i * batch_rows, min((i + 1) * batch_rows, total)
            transfers.filter(
                (F.col("_tid") >= lo) & (F.col("_tid") < hi)
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(stream_dir, f"b{i:03d}")
            )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(stream_dir, "b*"))
        )
        sr = StreamRunner(env, _graph(env, False))
        sr.process_all(stream)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
    walls = [e["wall_s"] for e in sr.metrics.epochs if e["n_results"] > 0]
    measured = walls[1:] if len(walls) > 1 else walls
    if not measured:
        raise RuntimeError(
            f"no measured micro-batch epochs at {sf_dir} (empty transfer stream?)"
        )
    mean = round(1000.0 * sum(measured) / len(measured), 1)
    spread = round(1000.0 * (max(measured) - min(measured)), 1)
    return mean, spread


def streaming_concurrent_latency_ms(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int = 6,
    batch_rows: int = 4000,
) -> tuple[float, float, float]:
    """(mean_ms, spread_ms, lock_wait_share_pct) trigger-to-commit
    latency when TWO streaming queries (two graphs, two namespaces, ONE
    environment) run concurrently — the contended multi-TGraph case
    where the env epoch lock serializes foreachBatch callbacks onto the
    store's single committed-epoch line.  lock_wait_share_pct is the
    fraction of the measured trigger-to-commit wall spent queued on
    that lock (how much of the contended latency is serialization vs
    epoch work).  Same workload/sizing conventions as
    streaming_bank_latency_ms; each runner's first epoch is warm-up."""
    transfers = (
        _transfers(spark, sf_dir)
        .withColumn("amount", F.col("amount") % 100 + 1)
        .localCheckpoint(eager=True)
    )
    total = transfers.count()
    n_batches = min(n_batches, max(2, total // (2 * max(batch_rows, 1))))

    env = TxEnvironment(spark, isolation="PL3")
    halves = {}
    for gi, ns in enumerate(("ga", "gb")):
        env.create_namespace(ns, "double", 100.0, invariant="value >= 0")
        halves[ns] = transfers.filter(F.col("_tid") % 2 == gi)

    def graph(ns: str):
        return (
            env.graph()
            .flat_map(
                lambda df: F.array(
                    F.struct(
                        F.col("from_account").alias("account"),
                        (-F.col("amount")).alias("delta"),
                    ),
                    F.struct(
                        F.col("to_account").alias("account"),
                        F.col("amount").alias("delta"),
                    ),
                )
            )
            .state(
                ns,
                key=lambda df: F.col("account"),
                update=lambda v: v + F.col("delta"),
                pre_combine={"delta": "sum"},
            )
        )

    stream_dir = tempfile.mkdtemp(prefix="tspoon_stream_ctg_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    runners = {ns: StreamRunner(env, graph(ns), collect_votes=False) for ns in halves}
    queries = {}
    try:
        for ns, df in halves.items():
            for i in range(n_batches):
                lo, hi = i * batch_rows, min((i + 1) * batch_rows, total)
                df.filter(
                    (F.col("_tid") >= lo) & (F.col("_tid") < hi)
                ).coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(stream_dir, ns, f"b{i:03d}")
                )
        for ns in halves:
            src = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(stream_dir, ns, "b*"))
            )
            queries[ns] = runners[ns].start(src)
        for q in queries.values():
            q.processAllAvailable()
    finally:
        for q in queries.values():
            q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)

    measured: list[dict] = []
    for sr in runners.values():
        walls = [e for e in sr.metrics.epochs if e["n_results"] > 0]
        measured.extend(walls[1:] if len(walls) > 1 else walls)
    if not measured:
        raise RuntimeError(
            f"no measured concurrent micro-batch epochs at {sf_dir}"
        )
    walls = [e["wall_s"] for e in measured]
    lock = sum(e["lock_wait_s"] for e in measured)
    mean = round(1000.0 * sum(walls) / len(walls), 1)
    spread = round(1000.0 * (max(walls) - min(walls)), 1)
    share = round(100.0 * lock / sum(walls), 1) if sum(walls) > 0 else 0.0
    return mean, spread, share
