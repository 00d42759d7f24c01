"""The reference's flagship evaluation program re-expressed on this
engine (evaluation/BankUseCase.java:45-100 + the money-conservation
assertion of evaluation/ConsistencyCheck.java:101-126): a stream of
bank transfers runs through a transactional graph under PL3 — every
transfer debits one account and credits another atomically, overdrafts
abort, and at any committed epoch the total money in the system equals
the initial endowment exactly.

Run: python examples/bank_use_case.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from t_spoon_spark.bench_txn import _transfers
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx import TxEnvironment

    own_session = spark is None
    if own_session:
        spark = build_spark(app_name="bank_use_case")

    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")

    # transfer -> (debit, credit) -> per-key state update, the graph of
    # evaluation/EvaluationGraphComposer.java:60-88
    graph = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
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
    runner = env.runner(graph)

    transfers = (
        _transfers(spark, sf_dir, keyspace=1_000)
        .filter(F.col("_tid") < 3_000)
        .localCheckpoint(eager=True)
    )
    votes: dict[str, int] = {}
    for i in range(3):  # three 1k-transfer epochs
        batch = transfers.filter(
            (F.col("_tid") >= i * 1_000) & (F.col("_tid") < (i + 1) * 1_000)
        )
        res = runner.run_epoch(batch)
        for vote, n in res.vote_counts().items():
            votes[vote] = votes.get(vote, 0) + n
    while runner._replay is not None:  # drain replay carryover
        res = runner.run_epoch(None)
        for vote, n in res.vote_counts().items():
            votes[vote] = votes.get(vote, 0) + n

    # ConsistencyCheck: no account negative, total conserved exactly
    stats = env.sql(
        "SELECT count(*) AS accounts, min(value) AS min_balance,"
        " sum(value) AS total FROM state_balances"
    ).collect()[0]
    out = {
        "watermark": env.watermark(),
        "votes": votes,
        "accounts": stats["accounts"],
        "min_balance": stats["min_balance"],
        "total": stats["total"],
        "expected_total": 100.0 * stats["accounts"],
    }
    assert out["min_balance"] >= 0.0, "overdraft committed!"
    assert out["total"] == out["expected_total"], "money not conserved!"
    print(out)
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
