"""Lab: decompose the fused-pull cost at the 30k pin (round-9 item 1).

Captures the union frame `u` of the LAST epoch's _pull_fused, then
re-collects it (plan cached -> pure execution + Arrow) and re-builds an
identical frame from the same logical plan string (fresh analysis) to
split the per-epoch cost into [analysis+optimization] vs [job execution]
vs [Arrow->pandas].  Usage: python tools/lab_pull.py [rate]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from t_spoon_spark import session as S
from t_spoon_spark.tx import driver_cascade as dc
from t_spoon_spark import bench_txn as bt

RATE = float(sys.argv[1]) if len(sys.argv) > 1 else 30000.0
SF_DIR = "/root/testdata/sf0.1"

captured = {}
orig = dc._pull_pdf


def capture(df, key_cols=()):
    t0 = time.time()
    out = orig(df, key_cols)
    captured["df"] = df
    captured["key_cols"] = key_cols
    captured["wall"] = time.time() - t0
    captured["rows"] = len(out)
    return out


dc._pull_pdf = capture

spark = S.build_spark(app_name="lab_pull")
mean, spread = bt.txn_latency_ms_at_rate(spark, SF_DIR, RATE, n_epochs=2)
print(f"latency mean={mean} spread={spread}")
df = captured["df"]
print(f"captured pull: rows={captured['rows']} wall={captured['wall']:.2f}s")

# (a) re-collect same DataFrame: analysis/opt cached, jobs re-run
for i in range(3):
    t0 = time.time()
    tbl = df.toArrow()
    t1 = time.time()
    pdf = tbl.to_pandas()
    print(f"recollect[{i}]: exec+arrow->table {t1-t0:.2f}s  to_pandas {time.time()-t1:.2f}s")

# (b) identical plan, fresh DataFrame object (full re-analysis), like an epoch does
import pyspark.sql.functions as F

for i in range(3):
    t0 = time.time()
    df2 = df.select("*")  # new plan node on top -> re-analyzed tree
    tbl = df2.toArrow()
    print(f"fresh-select[{i}]: total {time.time()-t0:.2f}s")

# (c) job count / stages
print("explain cost:")
t0 = time.time()
df.select("*").explain(mode="simple")
print(f"explain wall {time.time()-t0:.2f}s")
spark.stop()
