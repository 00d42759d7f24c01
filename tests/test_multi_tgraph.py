"""Multi-TGraph topology: two GraphRunners sharing one environment and
one state store, epochs interleaved on the store's single committed
line — the epoch-model equivalent of the reference's n-graphs-per-
environment mode (`tGraphID` in Metadata,
tgraph/TransactionEnvironment.java:66-100; `series_ntg`/`parallel_ntg`,
evaluation/EvaluationGraphComposer.java:34-59).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from t_spoon_spark.tx import TxEnvironment


def _mk_batch(spark, rows, tid0):
    return spark.createDataFrame(
        [(tid0 + i, f, t, float(a)) for i, (f, t, a) in enumerate(rows)],
        "_tid long, from_account string, to_account string, amount double",
    )


def _transfer_graph(env, ns):
    return (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(
                    F.col("from_account").alias("account"),
                    (-F.col("amount")).alias("delta"),
                ),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .state(
            ns,
            key=lambda df: F.col("account"),
            update=lambda v: v + F.col("delta"),
            pre_combine={"delta": "sum"},
            epoch_combine=True,
        )
    )


def test_two_graphs_interleave_on_one_epoch_line(spark):
    """g1 e1, g2 e2, g1 e3, g2 e4: each runner picks up the NEXT epoch
    of the shared store (not its own private counter), snapshots stay
    per-namespace correct, and history retention survives the other
    graph's commits in between."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("ga", "double", 0.0)
    env.create_namespace("gb", "double", 0.0)
    r1 = env.runner(_transfer_graph(env, "ga"))
    r2 = env.runner(_transfer_graph(env, "gb"))

    e0 = env.store.committed_epoch()
    r1.run_epoch(_mk_batch(spark, [("x", "y", 10.0)], 1))
    assert env.store.committed_epoch() == e0 + 1
    r2.run_epoch(_mk_batch(spark, [("p", "q", 5.0)], 100))
    assert env.store.committed_epoch() == e0 + 2
    r1.run_epoch(_mk_batch(spark, [("y", "x", 4.0)], 200))
    assert env.store.committed_epoch() == e0 + 3
    r2.run_epoch(_mk_batch(spark, [("q", "p", 1.0)], 300))
    assert env.store.committed_epoch() == e0 + 4

    ga = {r["key"]: r["value"] for r in env.store.read("ga").collect()}
    gb = {r["key"]: r["value"] for r in env.store.read("gb").collect()}
    assert ga == {"x": -6.0, "y": 6.0}
    assert gb == {"p": -4.0, "q": 4.0}

    # snapshot-consistent read at an interleaved historical epoch: ga
    # after g1's first epoch (before g2 ever committed) still shows only
    # the first transfer
    ga_e1 = {r["key"]: r["value"] for r in env.store.read("ga", epoch=e0 + 1).collect()}
    assert ga_e1 == {"x": -10.0, "y": 10.0}
    # gb at that epoch existed but was empty (g2 had not run yet)
    assert env.store.read("gb", epoch=e0 + 1).count() == 0


def test_two_graphs_shared_namespace_sequential_epochs(spark):
    """Two graphs may also write the SAME namespace (the reference's
    series composition chains graphs over shared state): epoch folds
    from either runner accumulate into one store line."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("shared", "double", 0.0)
    r1 = env.runner(_transfer_graph(env, "shared"))
    r2 = env.runner(_transfer_graph(env, "shared"))

    r1.run_epoch(_mk_batch(spark, [("x", "y", 10.0)], 1))
    r2.run_epoch(_mk_batch(spark, [("y", "x", 3.0)], 100))
    vals = {r["key"]: r["value"] for r in env.store.read("shared").collect()}
    assert vals == {"x": -7.0, "y": 7.0}


def test_per_query_frontiers_interleaved_streams(spark, tmp_path):
    """Two streaming queries interleaving epochs on one durable store:
    each keeps its OWN idempotence frontier, so a redelivered batch of
    query A is skipped even after query B committed later epochs (a
    single-slot frontier forgets A as soon as B commits)."""
    from t_spoon_spark.streaming.runner import already_applied
    from t_spoon_spark.tx import TxEnvironment

    env = TxEnvironment(spark, durable=True, store_dir=str(tmp_path / "store"))
    env.create_namespace("ga", "double", 0.0)
    env.create_namespace("gb", "double", 0.0)
    r1 = env.runner(_transfer_graph(env, "ga"))
    r2 = env.runner(_transfer_graph(env, "gb"))

    qa, qb = "ckpt/A", "ckpt/B"
    r1.run_epoch(_mk_batch(spark, [("x", "y", 1.0)], 1), batch_id=0, query_id=qa)
    r2.run_epoch(_mk_batch(spark, [("p", "q", 2.0)], 100), batch_id=0, query_id=qb)
    r1.run_epoch(_mk_batch(spark, [("x", "y", 3.0)], 200), batch_id=1, query_id=qa)
    r2.run_epoch(_mk_batch(spark, [("p", "q", 4.0)], 300), batch_id=1, query_id=qb)

    store = env.store
    assert store.batch_frontiers == {qa: 1, qb: 1}
    # A's batch 1 redelivered AFTER B's later commit: still skipped
    assert already_applied(store, qa, 1)
    assert already_applied(store, qb, 0)
    # genuinely new batches run
    assert not already_applied(store, qa, 2)
    # a fresh query identity is never skipped
    assert not already_applied(store, "ckpt/C", 0)
    assert not already_applied(store, None, 0)

    # recovery rebuilds BOTH frontiers from the marker history
    env2 = TxEnvironment(spark, durable=True, store_dir=str(tmp_path / "store"))
    env2.create_namespace("ga", "double", 0.0)
    env2.create_namespace("gb", "double", 0.0)
    assert env2.store.batch_frontiers == {qa: 1, qb: 1}
    assert already_applied(env2.store, qa, 1)
    assert already_applied(env2.store, qb, 1)


def test_concurrent_streaming_graphs_one_store(spark, tmp_path):
    """TRUE concurrent multi-TGraph streaming: two Structured Streaming
    queries, two graphs, ONE environment/store. foreachBatch callbacks
    arrive on separate threads; the env epoch lock serializes them onto
    the store's single committed-epoch line, and each query keeps its
    own idempotence frontier. Final snapshots equal the grouped sums of
    each side's input."""
    import os

    from t_spoon_spark.streaming import StreamRunner

    schema = "_tid long, from_account string, to_account string, amount double"

    def write_stream_dir(name, batches, tid0):
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                [(tid0 + 10 * i + j, f, t, float(a)) for j, (f, t, a) in enumerate(rows)],
                schema,
            ).coalesce(1).write.mode("overwrite").parquet(f"{d}/tmp")
            import glob
            import shutil

            part = glob.glob(f"{d}/tmp/part-*.parquet")[0]
            shutil.copy(part, f"{d}/batch_{i}.parquet")
            shutil.rmtree(f"{d}/tmp")
        return d

    da = write_stream_dir(
        "sa", [[("x", "y", 10.0), ("y", "z", 4.0)], [("z", "x", 6.0)]], 1
    )
    db = write_stream_dir(
        "sb", [[("p", "q", 8.0)], [("q", "p", 3.0), ("p", "q", 1.0)]], 1000
    )

    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("ga", "double", 0.0)
    env.create_namespace("gb", "double", 0.0)
    sra = StreamRunner(env, _transfer_graph(env, "ga"), collect_votes=False)
    srb = StreamRunner(env, _transfer_graph(env, "gb"), collect_votes=False)

    def rd(d):
        return (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        )

    qa = sra.start(rd(da))
    qb = srb.start(rd(db))
    try:
        qa.processAllAvailable()
        qb.processAllAvailable()
    finally:
        qa.stop()
        qb.stop()

    ga = {r["key"]: r["value"] for r in env.store.read("ga").collect()}
    gb = {r["key"]: r["value"] for r in env.store.read("gb").collect()}
    assert ga == {"x": -4.0, "y": 6.0, "z": -2.0}
    assert gb == {"p": -6.0, "q": 6.0}
    # both queries' epochs landed on one strictly-increasing line
    assert env.store.committed_epoch() >= 3
