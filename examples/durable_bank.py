"""The bank use case on a DURABLE store with a bounded retention
horizon — the reference's durability story (WAL + snapshot servers,
tgraph/durability/*; version bound `maxNoVersions`,
tgraph/state/StateOperator.java:100-101) as a runnable program:

1. run transfer epochs against a durable `TxEnvironment`
   (`max_epochs` retention keeps the on-disk log/base/WAL footprint
   bounded — tools/store_growth_probe.py measures the curve);
2. "crash" (drop every driver-side handle) and RECOVER by opening a
   fresh environment on the same store directory — the committed
   prefix rebuilds exactly (atomic commit markers; an uncommitted
   epoch's files are ignored);
3. check the ConsistencyCheck invariant on the RECOVERED state:
   no negative balance, total money conserved;
4. time-travel inside the retained horizon works; a read below the
   horizon refuses loudly instead of answering from a truncated log.

Run: python examples/durable_bank.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

N_EPOCHS = 8
MAX_EPOCHS = 4  # retained horizon: newest 4 epochs stay reconstructable


def _graph(env):
    return (
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


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from t_spoon_spark.bench_txn import _transfers
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx import TxEnvironment

    own_session = spark is None
    if own_session:
        spark = build_spark(app_name="durable_bank")

    store_dir = tempfile.mkdtemp(prefix="tspoon_durable_bank_")
    env = TxEnvironment(
        spark,
        isolation="PL3",
        durable=True,
        store_dir=store_dir,
        checkpoint_every=2,
        max_epochs=MAX_EPOCHS,
    )
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    runner = env.runner(_graph(env))

    transfers = (
        _transfers(spark, sf_dir, keyspace=200)
        .filter(F.col("_tid") < N_EPOCHS * 250)
        .localCheckpoint(eager=True)
    )
    votes: dict[str, int] = {}
    for i in range(N_EPOCHS):
        batch = transfers.filter(
            (F.col("_tid") >= i * 250) & (F.col("_tid") < (i + 1) * 250)
        )
        res = runner.run_epoch(batch)
        for vote, n in res.vote_counts().items():
            votes[vote] = votes.get(vote, 0) + n
    while runner._replay is not None:
        res = runner.run_epoch(None)
        for vote, n in res.vote_counts().items():
            votes[vote] = votes.get(vote, 0) + n
    committed = env.watermark()

    # -- "crash": drop every handle; recover from the directory alone --
    del runner, env
    recovered = TxEnvironment(
        spark,
        isolation="PL3",
        durable=True,
        store_dir=store_dir,
        checkpoint_every=2,
        max_epochs=MAX_EPOCHS,
    )
    recovered.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    assert recovered.watermark() == committed, "committed prefix lost in recovery"

    stats = recovered.sql(
        "SELECT count(*) AS accounts, min(value) AS min_balance,"
        " sum(value) AS total FROM state_balances"
    ).collect()[0]
    out = {
        "watermark": recovered.watermark(),
        "votes": votes,
        "accounts": stats["accounts"],
        "min_balance": stats["min_balance"],
        "total": stats["total"],
        "expected_total": 100.0 * stats["accounts"],
    }
    assert out["min_balance"] >= 0.0, "overdraft committed!"
    assert out["total"] == out["expected_total"], "money not conserved!"

    # -- time travel inside the horizon; loud refusal below it --------
    horizon = committed - MAX_EPOCHS + 1
    inside = recovered.store.read("balances", epoch=horizon)
    out["rows_at_horizon"] = inside.count()
    try:
        recovered.store.read("balances", epoch=max(0, horizon - 2))
        out["below_horizon"] = "ANSWERED (bug!)"
    except KeyError as e:
        out["below_horizon"] = f"refused: {e}"
    print(out)
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
