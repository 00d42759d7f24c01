"""Ops-fold threshold-boundary A/B (round-12 verdict next-round #5).

The driver-side ops-fold close engages only when the previous epoch was
<= TSPOON_OPS_FOLD_MAX_TXNS (default 500k) — above that the epoch runs
the fused JVM fold.  The 500k default was justified by "the fold wins
across the whole local operating range", measured only up to 150k-txn
pins; this probe measures BOTH paths at epoch sizes straddling the
seam so the handoff is a recorded curve, not an assumption:

  - per-epoch wall (mean of 3 measured, after 2 full-size warm epochs,
    pre-sliced checkpointed batches, AQE off — the pin-v2 protocol of
    bench_txn._latency_at) for the ops-fold path and the JVM path at
    each size;
  - the crossover (first size where the JVM fold is faster), if any,
    which is where the default threshold should sit.

Paths are selected by patching the runner's module flags in-process
(the env vars are read at import time); each (size, mode) cell gets a
fresh TxEnvironment + runner, same as every latency pin.

Usage:
  python tools/ops_fold_threshold_probe.py [sf_dir] [sizes_csv]
  # default: /root/repo/.scratch/sf1  300000,400000,500000,600000
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".scratch" / "sf1")
    sizes = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [300_000, 400_000, 500_000, 600_000]
    )
    n_warm, n_meas = 2, 3

    from pyspark.sql import functions as F

    import t_spoon_spark.tx.runner as runner_mod
    from t_spoon_spark.bench_txn import KEYSPACE, _graph, _transfers
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx import TxEnvironment

    spark = build_spark(app_name="ops_fold_threshold_probe", shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # one amplified stream big enough for the largest size, sliced per
    # cell — built once (the slices are re-checkpointed per cell anyway)
    need = max(sizes) * (n_warm + n_meas)
    base_total = _transfers(spark, sf_dir, KEYSPACE).count()
    copies = max(1, -(-need // base_total))
    stream = _transfers(spark, sf_dir, KEYSPACE, copies=copies).localCheckpoint(
        eager=True
    )
    total = stream.count()
    print(f"# stream: base={base_total} copies={copies} total={total}", flush=True)

    results: dict[str, dict[str, float]] = {}
    for size in sizes:
        if size * (n_warm + n_meas) > total:
            print(f"# size {size}: insufficient stream, skipped", flush=True)
            continue
        batches = [
            stream.filter(
                (F.col("_tid") >= i * size) & (F.col("_tid") < (i + 1) * size)
            ).localCheckpoint(eager=True)
            for i in range(n_warm + n_meas)
        ]
        for mode in ("ops_fold", "jvm_fold"):
            # in-process path selection: same flags the env vars set
            runner_mod._OPS_FOLD = mode == "ops_fold"
            runner_mod._OPS_FOLD_MAX_TXNS = 1_000_000_000
            env = TxEnvironment(spark, isolation="PL3")
            env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
            runner = env.runner(_graph(env, fold=False))
            for b in batches[:n_warm]:
                runner.run_epoch(b)
            # confirm which path the measured epochs will take
            engaged = runner._ops_fold_ok(batches[n_warm], False, None)
            walls = []
            for b in batches[n_warm:]:
                t0 = time.time()
                runner.run_epoch(b)
                walls.append(time.time() - t0)
            mean_ms = round(1000.0 * sum(walls) / len(walls), 1)
            spread_ms = round(1000.0 * (max(walls) - min(walls)), 1)
            results.setdefault(str(size), {})[mode] = mean_ms
            results[str(size)][f"{mode}_spread"] = spread_ms
            if mode == "ops_fold":
                results[str(size)]["ops_fold_engaged"] = bool(engaged)
            print(
                f"# size={size} mode={mode} engaged={engaged} "
                f"mean={mean_ms}ms spread={spread_ms}ms walls="
                f"{[round(w, 2) for w in walls]}",
                flush=True,
            )
        from t_spoon_spark.bench_txn import _free_checkpoint

        for b in batches:
            _free_checkpoint(b)

    crossover = None
    for size in sorted(results, key=int):
        r = results[size]
        if "ops_fold" in r and "jvm_fold" in r and r["jvm_fold"] < r["ops_fold"]:
            crossover = int(size)
            break
    out = {"sf_dir": sf_dir, "sizes": results, "crossover_size": crossover}
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
