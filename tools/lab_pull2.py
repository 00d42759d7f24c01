"""Lab: per-epoch breakdown inside _pull_fused at the 30k pin.

Times plan construction (py4j), toArrow (job execution), dictionary
encode, to_pandas, and the post-pull pandas slicing, per epoch.
Usage: python tools/lab_pull2.py [rate] [n_epochs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from t_spoon_spark import session as S
from t_spoon_spark.tx import driver_cascade as dc
from t_spoon_spark import bench_txn as bt

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 30000.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = "/root/testdata/sf0.1"


def timed_pull_pdf(df, key_cols=()):
    import pyarrow.compute as pc

    t0 = time.time()
    tbl = df.toArrow()
    t1 = time.time()
    for c in key_cols:
        i = tbl.schema.get_field_index(c)
        tbl = tbl.set_column(i, c, pc.dictionary_encode(tbl.column(c)))
    t2 = time.time()
    out = tbl.to_pandas(self_destruct=True)
    t3 = time.time()
    print(
        f"    [lab] pull rows={len(out)} toArrow={t1-t0:.2f}s "
        f"dictenc={t2-t1:.2f}s to_pandas={t3-t2:.2f}s",
        flush=True,
    )
    return out


dc._pull_pdf = timed_pull_pdf

orig_fused = dc.DriverCascade._pull_fused


def timed_fused(self, store, tids_df):
    t0 = time.time()
    out = orig_fused(self, store, tids_df)
    print(f"    [lab] _pull_fused total={time.time()-t0:.2f}s", flush=True)
    return out


dc.DriverCascade._pull_fused = timed_fused

spark = S.build_spark(app_name="lab_pull2")
mean, spread = bt.txn_latency_ms_at_rate(spark, SF_DIR, RATE, n_epochs=N)
print(f"latency mean={mean} spread={spread}")
spark.stop()
