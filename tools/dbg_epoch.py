"""Debug: per-epoch timing + plan growth for the hot-key chain."""
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")
from t_spoon_spark.session import build_spark
from t_spoon_spark.tx import TxEnvironment

import os

extra = {}
if os.environ.get("TSPOON_AQE") == "0":
    extra["spark.sql.adaptive.enabled"] = "false"
spark = build_spark(app_name="dbg_epoch", extra_conf=extra)
env = TxEnvironment(spark, isolation="PL3")
env.create_namespace("balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0)
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
rows = [("h", f"x{i}", 1.0) for i in range(12)]
batch = spark.createDataFrame(
    [(f"t{i}", a, b, float(x), i) for i, (a, b, x) in enumerate(rows)],
    "transfer_id string, from_account string, to_account string, amount double, _tid long",
)
for i in range(14):
    t0 = time.time()
    res = runner.run_epoch(batch if i == 0 else None)
    dt = time.time() - t0
    snap = len(env.store.read("balances")._jdf.queryExecution().analyzed().toString())
    rep = (
        len(runner._replay._jdf.queryExecution().analyzed().toString())
        if runner._replay is not None
        else 0
    )
    t1 = time.time()
    spark.range(1000).count()
    trivial = time.time() - t1
    n_rdds = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    snap_parts = env.store.read("balances").rdd.getNumPartitions()
    rep_parts = runner._replay.rdd.getNumPartitions() if runner._replay is not None else 0
    print(
        f"epoch {res.epoch} replay={res.n_replay} {dt:.1f}s snap={snap} rep={rep} "
        f"trivial={trivial:.2f}s rdds={n_rdds} snap_parts={snap_parts} rep_parts={rep_parts}",
        flush=True,
    )
    if res.n_replay == 0:
        break
