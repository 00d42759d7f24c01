"""Streaming mode: file-source micro-batches drive the transactional
graph; replays carry across triggers; metrics mirror the tracker sinks.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from t_spoon_spark.streaming import StreamRunner
from t_spoon_spark.tx import TxEnvironment

SCHEMA = "transfer_id string, from_account string, to_account string, amount double, _tid long"


def _write_batches(spark, path):
    b1 = [("t0", "a1", "a2", 30.0, 0), ("t1", "a3", "a4", 50.0, 1)]
    b2 = [("t2", "a2", "a3", 40.0, 2), ("t3", "a2", "a4", 10.0, 3)]  # conflict on a2
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode("overwrite").parquet(f"{path}/f1")
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("overwrite").parquet(f"{path}/f2")
    import glob
    import shutil

    files = sorted(glob.glob(f"{path}/f*/part-*.parquet"))
    out = f"{path}/stream"
    import os

    os.makedirs(out, exist_ok=True)
    for i, f in enumerate(files):
        shutil.copy(f, f"{out}/batch_{i}.parquet")
    return out


def test_streaming_epochs_with_replay_carryover(spark, tmp_path):
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    g = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .state("balances", key=lambda df: F.col("account"), update=lambda v: v + F.col("delta"))
    )

    stream_dir = _write_batches(spark, str(tmp_path))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )

    results = []
    sr = StreamRunner(env, g, on_epoch=lambda r: results.append(r))
    metrics = sr.process_all(stream)

    # all 4 txns closed; the a2 conflict replayed into a later epoch
    assert metrics.total_results >= 4
    votes_final = {}
    for r in results:
        for row in r.results.collect():
            if row["vote"] != "REPLAY" or row["_tid"] not in votes_final:
                votes_final[row["_tid"]] = row["vote"]
    assert votes_final == {0: "COMMIT", 1: "COMMIT", 2: "COMMIT", 3: "COMMIT"}

    bal = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    # a1=70, a2=130-40-10=80, a3=50+40=90... a3 starts 100-50=50? no:
    # t1: a3->a4 50 => a3=50, a4=150; t2: a2->a3 40 => a2=90? a2=130-40=90;
    # t3: a2->a4 10 => a2=80, a4=160; a3=50+40=90
    assert bal == {"a1": 70.0, "a2": 80.0, "a3": 90.0, "a4": 160.0}
    assert env.watermark() == metrics.epochs[-1]["epoch"]
    assert metrics.throughput > 0


def _bank_graph(env):
    return (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .state("balances", key=lambda df: F.col("account"), update=lambda v: v + F.col("delta"))
    )


def test_streaming_crash_recovery_no_double_apply(spark, tmp_path):
    """Kill-and-restart against a Structured Streaming checkpoint +
    durable store: a crash BETWEEN the store's epoch commit and the
    Spark checkpoint advance makes Spark re-deliver the micro-batch on
    restart; the batch_id idempotence guard must skip it, leaving exact
    final balances (reference recovery:
    tgraph/state/StateOperator.java:317-353, replay-WAL-above-watermark
    — ours is the dual: skip at-or-below the committed frontier)."""
    import os
    import shutil

    store_dir = str(tmp_path / "store")
    ckpt_dir = str(tmp_path / "ckpt")
    stream_dir = _write_batches(spark, str(tmp_path))

    env1 = TxEnvironment(spark, isolation="PL3", durable=True, store_dir=store_dir)
    env1.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    )
    sr1 = StreamRunner(env1, _bank_graph(env1))
    q = sr1.start(stream, checkpoint_dir=ckpt_dir)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    expected = {"a1": 70.0, "a2": 80.0, "a3": 90.0, "a4": 160.0}
    assert {r["key"]: r["value"] for r in env1.store.read("balances").collect()} == expected
    committed = env1.store.committed_epoch()
    last_batch = env1.store.last_batch_id
    assert last_batch is not None

    # crash window: the store committed the last batch's epoch but Spark
    # never wrote the checkpoint commit — drop the newest commit marker
    # so the restarted query re-runs that batch.
    commits = sorted(os.listdir(os.path.join(ckpt_dir, "commits")))
    newest = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(ckpt_dir, "commits", newest))
    crc = os.path.join(ckpt_dir, "commits", f".{newest}.crc")
    if os.path.exists(crc):  # local-fs checksum shadow of the commit file
        os.remove(crc)

    # restart: fresh env recovers the committed prefix from disk
    env2 = TxEnvironment(spark, isolation="PL3", durable=True, store_dir=store_dir)
    env2.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    assert env2.store.committed_epoch() == committed
    assert env2.store.last_batch_id == last_batch

    stream2 = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    )
    sr2 = StreamRunner(env2, _bank_graph(env2))
    q2 = sr2.start(stream2, checkpoint_dir=ckpt_dir)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    # the re-delivered batch was skipped: same epoch, same balances
    assert env2.store.committed_epoch() == committed
    assert {r["key"]: r["value"] for r in env2.store.read("balances").collect()} == expected
    assert sr2.metrics.epochs == []

    shutil.rmtree(ckpt_dir, ignore_errors=True)
