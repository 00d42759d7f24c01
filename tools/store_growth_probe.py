"""Durable-store footprint growth baseline (round-12 prep; measure-only).

Round-10 verdict "What's missing" #3: the durable store keeps a
per-epoch parquet log with periodic base compaction, but no user-facing
retention bound — a long-running deployment grows until manual
compaction (the reference bounds versions per key via `maxNoVersions`,
tgraph/state/StateOperator.java:100-101).  The retention knob is queued
for round 12 (it edits the watched tx/ modules); this probe records the
BEFORE curve so the knob's effect is a measured delta, not a claim.

Runs a durable StateStore for N epochs of small updates and samples
on-disk bytes + file count + log/base split every `sample_every`
epochs.  Prints one JSON line.

Round 12: the knob landed (`StateStore(max_epochs=N)`); pass a third
arg to record the AFTER curve on the identical workload.

Usage: python tools/store_growth_probe.py [n_epochs] [sample_every] [max_epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def dir_stats(root: str) -> dict:
    total = files = log_b = base_b = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            p = os.path.join(dirpath, f)
            try:
                b = os.path.getsize(p)
            except OSError:
                continue
            total += b
            files += 1
            if f"{os.sep}log{os.sep}" in p:
                log_b += b
            elif f"{os.sep}base{os.sep}" in p:
                base_b += b
    return {"bytes": total, "files": files, "log_bytes": log_b, "base_bytes": base_b}


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    sample_every = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    max_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else None

    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx.namespace import Namespace
    from t_spoon_spark.tx.store import StateStore

    spark = build_spark(app_name="store_growth_probe", shuffle_partitions=4)
    root = tempfile.mkdtemp(prefix="tspoon_growth_")
    store = StateStore(spark, root=root, durable=True, max_epochs=max_epochs)
    store.register(Namespace("g", "double", 0.0))

    samples = []
    for e in range(n_epochs):
        upd = spark.createDataFrame(
            [(f"k{(e * 7 + i) % 50}", float(e + i)) for i in range(20)],
            "key string, value double",
        )
        store.commit(e, {"g": upd}, None)
        if (e + 1) % sample_every == 0:
            s = dir_stats(root)
            s["epoch"] = e + 1
            samples.append(s)

    # growth per epoch over the back half (front half carries one-time
    # costs); the retention knob should flatten this to ~0 for epochs
    # past the horizon
    if len(samples) >= 2:
        a, b = samples[len(samples) // 2], samples[-1]
        per_epoch = (b["bytes"] - a["bytes"]) / max(1, b["epoch"] - a["epoch"])
    else:
        per_epoch = None
    print(
        json.dumps(
            {
                "metric": "durable_store_growth",
                "n_epochs": n_epochs,
                "max_epochs": max_epochs,
                "samples": samples,
                "bytes_per_epoch_back_half": per_epoch,
                "root": root,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
