"""Quantify the PL0 freshness win (round-13 spike): how much earlier
the `freshness='uncommitted'` view becomes visible than the committed
view on the durable path.

The overlay publishes at store.commit() ENTRY (resolved updates in
hand); the committed view flips at return (marker landed + snapshot
merged).  The lead time is therefore exactly the commit wall — measured
here per epoch alongside the full epoch wall, so the documented
staleness bound ("trigger interval + epoch wall") can be restated with
the uncommitted mode's shrink: a query lands mid-commit sees epoch k
`commit_wall` earlier.

Usage: python tools/freshness_staleness_probe.py [sf_dir] [rate] [n_epochs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 5200.0
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    epoch_seconds = 5.0

    import tempfile

    from pyspark.sql import functions as F

    from t_spoon_spark.bench_txn import KEYSPACE, _graph, _transfers, _pin_copies
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx import TxEnvironment

    spark = build_spark(app_name="freshness_probe", shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    env = TxEnvironment(
        spark,
        isolation="PL3",
        durable=True,
        store_dir=tempfile.mkdtemp(prefix="freshness_probe_"),
    )
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    runner = env.runner(_graph(env, fold=False))

    per_epoch = int(rate * epoch_seconds)
    base_total = _transfers(spark, sf_dir, KEYSPACE).count()
    copies = _pin_copies(base_total, rate, epoch_seconds, n_epochs)
    stream = _transfers(spark, sf_dir, KEYSPACE, copies=copies).localCheckpoint(
        eager=True
    )
    total = stream.count()
    batches = [
        stream.filter(
            (F.col("_tid") >= i * per_epoch) & (F.col("_tid") < (i + 1) * per_epoch)
        ).localCheckpoint(eager=True)
        for i in range(n_epochs + 2)
    ]

    # time the commit window (overlay-visible -> committed-visible)
    store = env.store
    orig_commit = store.commit
    leads: list[float] = []

    def timed_commit(epoch, updates, wal, **kw):
        t0 = time.time()
        orig_commit(epoch, updates, wal, **kw)
        leads.append(time.time() - t0)

    store.commit = timed_commit
    for b in batches[:2]:  # warm (leads recorded then discarded)
        runner.run_epoch(b)
    leads.clear()
    walls: list[float] = []
    for b in batches[2:]:
        t0 = time.time()
        runner.run_epoch(b)
        walls.append(time.time() - t0)
    store.commit = orig_commit

    mean_wall = 1000.0 * sum(walls) / len(walls)
    mean_lead = 1000.0 * sum(leads) / len(leads)
    out = {
        "sf_dir": sf_dir,
        "rate": rate,
        "epoch_txns": per_epoch,
        "mean_epoch_wall_ms": round(mean_wall, 1),
        "mean_commit_wall_ms": round(mean_lead, 1),
        "uncommitted_lead_ms": round(mean_lead, 1),
        "lead_share_of_epoch_pct": round(100.0 * mean_lead / mean_wall, 1),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
