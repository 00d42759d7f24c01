"""Phase profile of the loaded PL3 epoch at a fixed amplified rate.

Monkeypatch timers around the DriverCascade phases (the round-8 map's
method list) and run the same fixed-rate latency pin the bench uses, so
lever changes can be measured before/after at an identical operating
point.  Usage:

    python tools/profile_loaded.py [rate] [n_epochs]
"""
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from t_spoon_spark import session as S
from t_spoon_spark.tx import driver_cascade as dc
from t_spoon_spark import bench_txn as bt

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 30000.0
N_EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = "/root/testdata/sf0.1"

totals = defaultdict(float)
calls = defaultdict(int)


def wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            totals[name] += time.time() - t0
            calls[name] += 1

    setattr(cls, name, timed)


for m in (
    "_pull_fused",
    "_pull_eval",
    "_pull_refold",
    "_ensure_chains",
    "_refold_key",
    "_merge_votes",
    "close",
    "_merge_votes_delta",
    "_update_ov_links",
    "_ensure_v0",
    "_vec_init",
    "_refold_keys_vec",
):
    if hasattr(dc.DriverCascade, m):
        wrap(dc.DriverCascade, m)

spark = S.build_spark(app_name="profile_loaded")
mean, spread = bt.txn_latency_ms_at_rate(spark, SF_DIR, RATE, n_epochs=N_EPOCHS)
print(f"\nrate={RATE} latency_ms mean={mean} spread={spread}")
print(f"{'phase':<16}{'total_s':>9}{'calls':>7}{'s/call':>9}")
for name in sorted(totals, key=totals.get, reverse=True):
    print(f"{name:<16}{totals[name]:>9.2f}{calls[name]:>7}{totals[name]/calls[name]:>9.3f}")
# close includes everything; subtract the listed inner phases
inner = sum(v for k, v in totals.items() if k not in ("close",))
print(f"{'(close-other)':<16}{totals['close']-inner:>9.2f}")
spark.stop()
