"""Workload generators (SRC1-4) and the batched query-merger path (Q7)."""

from __future__ import annotations

import pyspark.sql.functions as F

from t_spoon_spark.sources import query_requests, spu_commands, transfers
from t_spoon_spark.tx import TxEnvironment


def test_transfers_generator_deterministic(spark):
    a = transfers(spark, 100, keyspace=1000, seed=7).collect()
    b = transfers(spark, 100, keyspace=1000, seed=7).collect()
    assert a == b
    for r in a:
        assert r["from_account"] != r["to_account"]
        assert 1 <= r["amount"] <= 100


def test_spu_generator_shape(spark):
    rows = spu_commands(spark, 50, keyspace=100).collect()
    assert len(rows) == 50
    assert {r["method"] for r in rows} <= {"deposit", "withdrawal"}
    assert all(len(r["args"]) == 1 for r in rows)


def test_execute_queries_merged_results(spark):
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0)
    g = env.graph().state(
        "balances", key=lambda df: F.col("k"), update=lambda v: v + F.col("d")
    )
    batch = spark.createDataFrame(
        [("a1", 10.0, 0), ("a2", 20.0, 1)], "k string, d double, _tid long"
    )
    env.runner(g).run_epoch(batch)

    reqs = spark.createDataFrame(
        [
            ("q0", "balances", ["a1", "a2", "zz"], None),
            ("q1", "balances", ["a2"], None),
            # predicate request through the same union type
            # (tgraph/state/NoConsensusOperation.java:13-39)
            ("q2", "balances", None, "value > 115"),
        ],
        "query_id string, namespace string, keys array<string>, predicate string",
    )
    res = env.execute_queries(reqs).collect()
    got = {(r["query_id"], r["key"]): r["value"] for r in res}
    # missing key "zz" yields no row (reference returns only owned keys)
    assert got == {
        ("q0", "a1"): 110.0,
        ("q0", "a2"): 120.0,
        ("q1", "a2"): 120.0,
        ("q2", "a2"): 120.0,
    }


def test_query_requests_generator(spark):
    reqs = query_requests(spark, 20, keyspace=50, avg_keys=3).collect()
    assert len(reqs) == 20
    assert all(1 <= len(r["keys"]) <= 6 for r in reqs)
    assert all(len(set(r["keys"])) == len(r["keys"]) for r in reqs)


# --- multi-source deterministic tid assignment (SURVEY §7 hard part) ----


def _merged_workload(spark):
    from t_spoon_spark.sources import merge_sources

    # two independent transfer sources on one small hot keyspace: real
    # cross-source conflicts, so PL3 outcomes depend on the global tid
    # order — exactly what must be deterministic.
    s0 = transfers(spark, 30, keyspace=8, seed=11).withColumnRenamed("_tid", "_offset")
    s1 = transfers(spark, 30, keyspace=8, seed=23).withColumnRenamed("_tid", "_offset")
    return merge_sources([s0, s1])


def _run_bank(spark, batch):
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    g = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(
                    F.col("from_account").alias("account"),
                    (-F.col("amount")).alias("delta"),
                ),
                F.struct(
                    F.col("to_account").alias("account"), F.col("amount").alias("delta")
                ),
            )
        )
        .state(
            "balances", key=lambda df: F.col("account"), update=lambda v: v + F.col("delta")
        )
    )
    epochs = env.runner(g).run_to_completion(batch, max_epochs=128)
    votes: dict[int, str] = {}
    for e in epochs:
        for r in e.results.select("_tid", "vote").collect():
            if r["vote"] != "REPLAY" or r["_tid"] not in votes:
                votes[r["_tid"]] = r["vote"]
    bal = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    return votes, bal


def test_merge_sources_interleaves_deterministically(spark):
    merged = _merged_workload(spark)
    rows = merged.orderBy("_tid").collect()
    assert len(rows) == 60
    # round-robin: even tids from source 0, odd from source 1; both
    # sources keep their internal offset order; tids are dense+disjoint
    assert [r["_tid"] for r in rows] == list(range(60))
    # repartitioning must not change the assignment (pure arithmetic)
    rows2 = _merged_workload(spark).repartition(7).orderBy("_tid").collect()
    assert rows == rows2


def test_multi_source_pl4_outcome_deterministic(spark):
    """Two interleaved sources on conflicting hot keys: the global tid
    order — and hence every PL3/PL4 vote and final balance — is
    identical across independent runs, and equals the serial tid-order
    simulator (the property the reference buys by forcing open
    parallelism to 1, tgraph/AbstractTStream.java:69-72)."""
    from tests.test_tx_core import simulate_pl3

    votes_a, bal_a = _run_bank(spark, _merged_workload(spark))
    votes_b, bal_b = _run_bank(spark, _merged_workload(spark))
    assert votes_a == votes_b
    assert bal_a == bal_b

    txns = [
        (r["_tid"], [(r["from_account"], -r["amount"]), (r["to_account"], r["amount"])])
        for r in _merged_workload(spark).collect()
    ]
    want_bal, want_votes = simulate_pl3(txns)
    assert votes_a == want_votes
    assert bal_a == want_bal
