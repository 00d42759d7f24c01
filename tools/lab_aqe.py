"""Lab: A/B AQE on/off at a fixed-rate latency pin (round-9 item 1).

Usage: python tools/lab_aqe.py [rate] [n_epochs]
Interleaves off/on/off/on in ONE session to neutralize box drift.
"""
import sys

sys.path.insert(0, "/root/repo")

from t_spoon_spark import session as S
from t_spoon_spark import bench_txn as bt

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 30000.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = "/root/testdata/sf0.1"

spark = S.build_spark(app_name="lab_aqe")
for aqe in ("false", "true", "false", "true"):
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    mean, spread = bt.txn_latency_ms_at_rate(spark, SF_DIR, RATE, n_epochs=N)
    print(f"aqe={aqe}: mean={mean} spread={spread}", flush=True)
spark.stop()
