"""Bounded fixed-rate ladder at sf1 (round-11 verdict next-round #6).

The sustained-rate PROBE stays a sf0.1 metric: its bisection re-slices
the amplified stream once per probe point and its discovered rate
grinds a single-core stage >30 min in local mode at sf1 (SCALING.md
round-11 cut note).  This ladder gives the flagship throughput metric
its 10x reading anyway: THREE fixed rates bracketing the sf0.1
sustained point (52k tx/s, BENCH_r11), each measured with the pin
protocol (txn_latency_ms_at_rate, 2 epochs, 5 s budget).  A rung
"sustains" if its mean epoch wall fits the epoch budget — the same
criterion the probe uses, at a bounded cost.

Usage: python tools/sf1_rate_ladder.py [sf_dir] [rate ...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".scratch" / "sf1")
    rates = [float(r) for r in sys.argv[2:]] or [30_000.0, 50_000.0, 70_000.0]
    epoch_seconds, n_epochs = 5.0, 2

    from t_spoon_spark.bench_txn import txn_latency_ms_at_rate
    from t_spoon_spark.session import build_spark

    spark = build_spark(app_name="sf1_rate_ladder", shuffle_partitions=32)
    rungs = []
    for rate in rates:
        t0 = time.time()
        mean, spread = txn_latency_ms_at_rate(
            spark, sf_dir, rate, epoch_seconds=epoch_seconds, n_epochs=n_epochs
        )
        rungs.append(
            {
                "rate_tps": rate,
                "epoch_ms_mean": mean,
                "epoch_ms_spread": spread,
                "sustains": mean <= epoch_seconds * 1000.0,
                "wall_s": round(time.time() - t0, 1),
            }
        )
        print(f"# rate {rate:.0f}: epoch {mean} ms (budget 5000)", file=sys.stderr)
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "sf1_fixed_rate_ladder",
                "sf_dir": sf_dir,
                "epoch_seconds": epoch_seconds,
                "n_epochs": n_epochs,
                "rungs": rungs,
            }
        )
    )


if __name__ == "__main__":
    main()
