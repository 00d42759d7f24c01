"""Lab: A/B the part-0 tids-branch drop at a fixed-rate pin.

Forces _tids_covered False (old behavior) vs computed (new) in
interleaved runs within one session. Usage: python tools/lab_part0.py
[rate] [n_epochs]
"""
import sys

sys.path.insert(0, "/root/repo")

from t_spoon_spark import session as S
from t_spoon_spark import bench_txn as bt
from t_spoon_spark.tx import runner as R

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 30000.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = "/root/testdata/sf0.1"

spark = S.build_spark(app_name="lab_part0")

orig = R.GraphRunner._run_epoch_locked
FORCE_OFF = {"v": False}


def patched(self, *a, **kw):
    if FORCE_OFF["v"]:
        self._tids_covered = False
    return orig(self, *a, **kw)


R.GraphRunner._run_epoch_locked = patched

for force in (True, False, True, False):
    FORCE_OFF["v"] = force
    mean, spread = bt.txn_latency_ms_at_rate(spark, SF_DIR, RATE, n_epochs=N)
    label = "part0-on (old)" if force else "part0-off(new)"
    print(f"{label}: mean={mean} spread={spread}", flush=True)
spark.stop()
