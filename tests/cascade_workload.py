"""Shared contended bank workload for cascade-equivalence tests.

Used twice by tests/test_local_cluster.py: once inside the 2-JVM
local-cluster subprocess (materialize mode 'reliable' — the distributed
cascade refold path) and once on the host local[] session (pandas mode
— the driver cascade).  Both runs must agree vote-for-vote and
balance-for-balance on an epoch with chain conflicts, overdraft aborts,
and cross-key contamination.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def build_cascade_workload(spark):
    """~200 transfers over a 20-key space + 6 deterministic overdrafts —
    contention high enough that aborted txns chain-commit on their other
    key (contamination) and the cascade runs several refold rounds."""
    rows = []
    tid = 0
    for i in range(200):
        src = f"k{(i * 7) % 20}"
        dst = f"k{(i * 11 + 3) % 20}"
        if src != dst:
            rows.append((tid, src, dst, float(5 + (i * 13) % 40)))
        tid += 1
    for j in range(6):
        rows.append((tid, f"k{j * 3 % 20}", f"k{(j * 3 + 1) % 20}", 2500.0 + j))
        tid += 1
    return spark.createDataFrame(
        rows, "_tid long, from_account string, to_account string, amount double"
    )


def run_cascade_workload(spark, env) -> dict:
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    graph = (
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
            "balances",
            key=lambda df: F.col("account"),
            update=lambda v: v + F.col("delta"),
            pre_combine={"delta": "sum"},
        )
    )
    res = env.runner(graph).run_epoch(build_cascade_workload(spark))
    votes = {
        str(r["_tid"]): r["vote"]
        for r in res.results.select("_tid", "vote").collect()
    }
    balances = {
        r["key"]: r["value"]
        for r in env.store.read("balances").orderBy("key").collect()
    }
    return {"votes": votes, "balances": balances}
