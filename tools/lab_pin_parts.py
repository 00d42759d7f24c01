"""A/B the 30k fixed-rate pin's shuffle-partition count.

The pin harness pins spark.sql.shuffle.partitions=8 (right for the
26k-txn epochs it was tuned on); at the 30k pin the epoch is 150k txns
and the fold job — the pin's single largest phase (~1.4 s/epoch) — may
be parallelism-starved on 8 of 32 cores.  Interleaved A/B pairs, one
fresh runner per side, same protocol as txn_latency_ms_at_rate minus
its conf pinning.

Usage: python tools/lab_pin_parts.py [rate] [parts_a] [parts_b]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from t_spoon_spark import bench_txn as bt
from t_spoon_spark.session import build_spark

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 30000.0
PA = sys.argv[2] if len(sys.argv) > 2 else "8"
PB = sys.argv[3] if len(sys.argv) > 3 else "32"
SF_DIR = "/root/testdata/sf0.1"

spark = build_spark(app_name="lab_pin_parts")
spark.conf.set("spark.sql.adaptive.enabled", "false")

base_total = bt._transfers(spark, SF_DIR).count()
copies = bt._pin_copies(base_total, RATE, 5.0, 3)
transfers = bt._transfers(spark, SF_DIR, copies=copies).localCheckpoint(eager=True)
total = transfers.count()


def env_factory():
    from t_spoon_spark.tx import TxEnvironment

    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    return env.runner(bt._graph(env, False))


for trial in range(2):
    for parts in (PA, PB):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        t0 = time.time()
        mean, spread = bt._latency_at(env_factory, transfers, total, RATE, 5.0, 3)
        print(
            f"parts={parts} trial={trial} mean_ms={mean} spread={spread} "
            f"wall={time.time()-t0:.1f}s",
            flush=True,
        )
spark.stop()
