"""Isolation levels, cross-namespace atomicity (BuyProducts fixture,
evaluation/BuyProducts.java:59-74), SPU commands
(evaluation/BankUseCase.java:145-153), and durable recovery
(tgraph/durability/*).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from t_spoon_spark.tx import TxEnvironment


# --- cross-namespace abort propagation (two-state transaction) -----------


def purchases_env(spark, isolation="PL3"):
    env = TxEnvironment(spark, isolation=isolation)
    env.create_namespace(
        "warehouse",
        value_type="int",
        default=3,  # 3 units of each product in stock
        invariant="value >= 0",
        py_invariant=lambda v: v >= 0,
    )
    env.create_namespace(
        "products_by_user",
        value_type="array<string>",
        default=[],
    )
    return env


def purchases_graph(env):
    # one purchase decrements warehouse AND appends to the customer's
    # list atomically (BuyProducts two-state txn): sold-out => the
    # productsByUser append must roll back.
    return (
        env.graph()
        .state("warehouse", key=lambda df: F.col("product"), update=lambda v: v - 1)
        .state(
            "products_by_user",
            key=lambda df: F.col("customer"),
            py_update=lambda v, rec: (list(v) if v is not None else []) + [rec["product"]],
        )
    )


def test_two_namespace_abort_propagation(spark):
    env = purchases_env(spark)
    runner = env.runner(purchases_graph(env))
    # 5 purchases of p1 by distinct customers; stock=3 => last 2 abort
    rows = [(f"c{i}", "p1", i) for i in range(5)]
    batch = spark.createDataFrame(rows, "customer string, product string, _tid long")
    epochs = runner.run_to_completion(batch, max_epochs=16)

    wh = {r["key"]: r["value"] for r in env.store.read("warehouse").collect()}
    assert wh == {"p1": 0}
    pbu = {r["key"]: list(r["value"]) for r in env.store.read("products_by_user").collect()}
    # only the 3 committed customers got their append; aborted ones rolled back
    assert pbu == {"c0": ["p1"], "c1": ["p1"], "c2": ["p1"]}

    votes = {}
    for ep in epochs:
        for r in ep.results.collect():
            if r["vote"] != "REPLAY" or r["_tid"] not in votes:
                votes[r["_tid"]] = r["vote"]
    assert votes == {0: "COMMIT", 1: "COMMIT", 2: "COMMIT", 3: "ABORT", 4: "ABORT"}


def test_parallel_multi_state_commit(spark):
    # disjoint customers+products: everything commits in one epoch
    env = purchases_env(spark)
    runner = env.runner(purchases_graph(env))
    rows = [(f"c{i}", f"p{i}", i) for i in range(4)]
    batch = spark.createDataFrame(rows, "customer string, product string, _tid long")
    epochs = runner.run_to_completion(batch)
    assert len(epochs) == 1
    assert epochs[0].vote_counts() == {"COMMIT": 4}
    assert env.store.read("warehouse").count() == 4
    assert {len(r["value"]) for r in env.store.read("products_by_user").collect()} == {1}


# --- PL0 dirty-read chain -------------------------------------------------


def test_pl0_dirty_read_chain(spark):
    """At PL0 the chain materializes values through uncommitted writes:
    an aborted txn's write stays visible to later in-batch readers
    (the dirty-read anomaly), and the committed value is the last
    committed chain entry (tgraph/db/Object.java lastCommitted)."""
    env = TxEnvironment(spark, isolation="PL0")
    env.create_namespace(
        "acc",
        value_type="double",
        default=100.0,
        py_invariant=lambda v: v >= 0,
    )
    g = env.graph().state(
        "acc",
        key=lambda df: F.col("k"),
        py_update=lambda v, rec: v + rec["d"],
    )
    runner = env.runner(g)
    # tid0: -150 => candidate -50 => ABORT (invariant)
    # tid1: +10 reads the DIRTY -50 => -40 => ABORT at PL0!
    # tid2: +100 reads -40 => 60 => COMMIT; final value = 60
    batch = spark.createDataFrame(
        [("k1", -150.0, 0), ("k1", 10.0, 1), ("k1", 100.0, 2)], "k string, d double, _tid long"
    )
    epochs = runner.run_to_completion(batch)
    assert len(epochs) == 1  # PL0 never replays
    votes = {r["_tid"]: r["vote"] for r in epochs[0].results.collect()}
    assert votes == {0: "ABORT", 1: "ABORT", 2: "COMMIT"}
    acc = {r["key"]: r["value"] for r in env.store.read("acc").collect()}
    assert acc == {"k1": 60.0}


def test_pl2_lost_updates(spark):
    """PL2: everyone reads the epoch-start committed value; last
    committed writer wins (lost update permitted)."""
    env = TxEnvironment(spark, isolation="PL2")
    env.create_namespace("acc", "double", 100.0, "value >= 0")
    g = env.graph().state("acc", key=lambda df: F.col("k"), update=lambda v: v + F.col("d"))
    runner = env.runner(g)
    batch = spark.createDataFrame(
        [("k1", 10.0, 0), ("k1", 20.0, 1)], "k string, d double, _tid long"
    )
    epochs = runner.run_to_completion(batch)
    assert len(epochs) == 1
    assert epochs[0].vote_counts() == {"COMMIT": 2}
    acc = {r["key"]: r["value"] for r in env.store.read("acc").collect()}
    assert acc == {"k1": 120.0}  # tid1's read of 100 wins; tid0's +10 lost


# --- SPU (single-partition updates) --------------------------------------


def test_spu_commands(spark):
    env = TxEnvironment(spark, isolation="PL3")
    ns = env.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )

    @ns.command("deposit")
    def deposit(current, amount):
        return current + amount

    @ns.command("withdrawal")
    def withdrawal(current, amount):
        return current - amount

    g = env.graph().state("balances", key=lambda df: F.col("k"), update=lambda v: v + F.col("d"))
    runner = env.runner(g)
    batch = spark.createDataFrame([("a1", 50.0, 0)], "k string, d double, _tid long")
    spus = spark.createDataFrame(
        [
            ("s1", "balances", "a1", "deposit", [25.0]),
            ("s2", "balances", "a1", "withdrawal", [60.0]),
            ("s3", "balances", "a2", "withdrawal", [500.0]),  # invariant abort
        ],
        "spu_id string, namespace string, key string, method string, args array<double>",
    )
    res = runner.run_epoch(batch, spus=spus)
    spu_votes = {r["spu_id"]: r["vote"] for r in res.spu_results.collect()}
    assert spu_votes == {"s1": "COMMIT", "s2": "COMMIT", "s3": "ABORT"}
    bal = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    # a1: 100 + 50 (txn) + 25 - 60 = 115; a2 untouched (abort, no default write)
    assert bal == {"a1": 115.0}


# --- durability & recovery ------------------------------------------------


def test_durable_commit_and_recovery(spark, tmp_path):
    store_dir = str(tmp_path / "store")
    env = TxEnvironment(spark, isolation="PL3", durable=True, store_dir=store_dir)
    env.create_namespace("balances", "double", 100.0, "value >= 0")
    g = env.graph().state("balances", key=lambda df: F.col("k"), update=lambda v: v + F.col("d"))
    runner = env.runner(g)
    for i in range(3):
        batch = spark.createDataFrame([(f"k{i}", 10.0 * (i + 1), i)], "k string, d double, _tid long")
        runner.run_epoch(batch)
    assert env.watermark() == 2

    # "crash": brand-new environment over the same directory
    env2 = TxEnvironment(spark, isolation="PL3", durable=True, store_dir=store_dir)
    env2.create_namespace("balances", "double", 100.0, "value >= 0")
    env2.store._recover()
    assert env2.watermark() == 2
    bal = {r["key"]: r["value"] for r in env2.store.read("balances").collect()}
    assert bal == {"k0": 110.0, "k1": 120.0, "k2": 130.0}

    # WAL holds one entry per transaction with its write-set
    wal = env2.store.wal().collect()
    assert len(wal) == 3
    assert all(r["vote"] == "COMMIT" for r in wal)

    # historical snapshot (time travel to epoch 0)
    snap0 = {r["key"]: r["value"] for r in env2.store.read("balances", epoch=0).collect()}
    assert snap0 == {"k0": 110.0}
