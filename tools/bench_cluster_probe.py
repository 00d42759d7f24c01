"""Cluster-mode close-path probe (round-9 verdict item 5).

All committed txn latency/throughput numbers run local[32] pandas-mode;
the 100 TB path is the DISTRIBUTED close (materialize_mode 'reliable':
checkpoint-based epoch cuts, distributed cascade refolds, no driver
pandas twins).  This probe measures the same fixed-rate latency pin on
a true multi-JVM local-cluster master and on local[32], sequentially in
one process, and prints one JSON line per mode — the pandas-vs-reliable
row BENCHNOTES records.

Usage: python tools/bench_cluster_probe.py [rate] [n_epochs]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 5200.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = "/root/testdata/sf0.1"


def run(master: str, conf: dict) -> dict:
    from t_spoon_spark import bench_txn as bt
    from t_spoon_spark.tx.runner import materialize_mode

    builder = (
        SparkSession.builder.master(master)
        .appName("tspoon_cluster_probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
    )
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode = materialize_mode(spark)
    t0 = time.time()
    mean, spread = bt.txn_latency_ms_at_rate(spark, SF_DIR, RATE, n_epochs=N)
    out = {
        "master": master,
        "materialize_mode": mode,
        "rate": RATE,
        "latency_ms_mean": mean,
        "latency_ms_spread": spread,
        "wall_s": round(time.time() - t0, 1),
    }
    spark.stop()
    return out


if __name__ == "__main__":
    # reliable first (cold JVMs for both modes — comparable warmth)
    rel = run(
        "local-cluster[4,8,8192]",
        {"spark.executor.memory": "8g", "spark.driver.memory": "8g"},
    )
    print(json.dumps(rel), flush=True)
    pan = run("local[32]", {"spark.driver.memory": "48g"})
    print(json.dumps(pan), flush=True)
    ratio = rel["latency_ms_mean"] / max(pan["latency_ms_mean"], 1e-9)
    print(json.dumps({"reliable_over_pandas": round(ratio, 2)}), flush=True)
