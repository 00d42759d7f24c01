"""Lab: literal-sliced vs pre-sliced epoch batches at the 30k pin.

If the per-epoch filter literal forces a whole-stage-codegen recompile
of the chain-fold stage (janino), pre-sliced batches (identical plan
source across epochs) should cut the size-independent ~1-2 s overhead.
Usage: python tools/lab_preslice.py [rate] [n_epochs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from t_spoon_spark import session as S
from t_spoon_spark import bench_txn as bt
from t_spoon_spark.tx import TxEnvironment

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 30000.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = "/root/testdata/sf0.1"
EPOCH_SECONDS = 5.0

spark = S.build_spark(app_name="lab_preslice")
base_total = bt._transfers(spark, SF_DIR).count()
copies = bt._pin_copies(base_total, RATE, EPOCH_SECONDS, N)
transfers = bt._transfers(spark, SF_DIR, copies=copies).localCheckpoint(eager=True)
total = transfers.count()
per_epoch = int(RATE * EPOCH_SECONDS)
spark.conf.set("spark.sql.shuffle.partitions", "8")


def env_factory():
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    return env.runner(bt._graph(env, False))


def run(mode):
    runner = env_factory()
    warm = transfers.filter(F.col("_tid") >= total - per_epoch)
    if mode == "presliced":
        warm = warm.localCheckpoint(eager=True)
    runner.run_epoch(warm)
    walls = []
    for i in range(N):
        batch = transfers.filter(
            (F.col("_tid") >= i * per_epoch) & (F.col("_tid") < (i + 1) * per_epoch)
        )
        if mode == "presliced":
            batch = batch.localCheckpoint(eager=True)
        t0 = time.time()
        runner.run_epoch(batch)
        walls.append(time.time() - t0)
    return [round(1000 * w, 1) for w in walls]


for mode in ("literal", "presliced", "literal", "presliced"):
    print(f"{mode}: {run(mode)}", flush=True)
spark.stop()
