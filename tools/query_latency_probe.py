"""Queryable-state serving latency (reference parity metric: the
evaluation harness issues 1-10-key queries against live state and
reports query latency — evaluation/EvalConfig.java:60-97 'query size
avg 1-10 keys', launch_scripts/parse_results.py:31-38).

Measures TCP round-trip latency of key queries (sizes cycling 1..10)
over a 100k-key namespace in three modes:
  - idle, committed snapshot;
  - under continuous epoch commits (writer thread), committed snapshot;
  - under commits, freshness='uncommitted' (PL0 overlay).

Usage: python tools/query_latency_probe.py [n_keys] [n_queries]
"""

from __future__ import annotations

import json
import statistics
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from pyspark.sql import functions as F

    from t_spoon_spark.serve import StateService, query_client
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx import TxEnvironment

    spark = build_spark(app_name="query_latency_probe", shuffle_partitions=8)
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0)
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
    runner = env.runner(g)

    def batch(lo: int, n: int):
        return spark.createDataFrame(
            [
                (lo + i, f"a{(lo + i) % n_keys}", f"a{(lo + i * 7 + 1) % n_keys}", 1.0)
                for i in range(n)
            ],
            "_tid long, from_account string, to_account string, amount double",
        )

    # seed state across the keyspace, then warm the query path
    runner.run_epoch(batch(0, 2000))

    def measure(call, freshness: str | None) -> dict:
        lats = []
        for i in range(n_queries):
            size = (i % 10) + 1
            keys = [f"a{(i * 997 + j * 131) % n_keys}" for j in range(size)]
            req = {"op": "keys", "ns": "balances", "keys": keys}
            if freshness:
                req["freshness"] = freshness
            t0 = time.time()
            resp = call(req)
            lats.append(time.time() - t0)
            assert resp["ok"], resp
        lats.sort()
        return {
            "p50_ms": round(1000 * statistics.median(lats), 1),
            "p95_ms": round(1000 * lats[int(0.95 * len(lats)) - 1], 1),
            "max_ms": round(1000 * lats[-1], 1),
        }

    out = {"n_keys": n_keys, "n_queries": n_queries}
    with StateService(env).serve() as svc:
        call = query_client(*svc.address)
        measure(call, None)  # warm (plan + codegen for the filter shape)
        out["idle_committed"] = measure(call, None)

        stop = threading.Event()

        def writer():
            tid = 10_000
            while not stop.is_set():
                runner.run_epoch(batch(tid, 500))
                tid += 500

        t = threading.Thread(target=writer, daemon=True)
        t.start()
        try:
            out["under_commit_committed"] = measure(call, None)
            out["under_commit_uncommitted"] = measure(call, "uncommitted")
        finally:
            stop.set()
            t.join(timeout=120)
        call.close()
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
