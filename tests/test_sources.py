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
