"""Scale rehearsal (SCALING.md): run the bench headline suite plus one
transactional epoch workload at an arbitrary sf dir and print one JSON
line — used to produce the sf0.1-vs-sf1 table that checks the
near-linear-scaling claim by actually running it, not just asserting
plan shapes.

Usage: python tools/scale_rehearsal.py [sf_dir] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=str(REPO / ".scratch" / "sf1"))
    ap.add_argument("--runs", type=int, default=2, help="measured runs after 1 warmup")
    args = ap.parse_args()

    import bench
    from t_spoon_spark.bench_txn import bank_transfer_tps
    from t_spoon_spark.registry import all_queries
    from t_spoon_spark.session import build_spark

    spark = build_spark(app_name="scale_rehearsal")
    qs = all_queries()
    qs["q6_revenue_filter"](spark, args.sf_dir).count()  # session warmup

    timings: dict[str, object] = {}
    total = 0.0
    for name in bench.HEADLINE:
        if name not in qs:
            continue
        try:
            samples = []
            for i in range(args.runs + 1):
                t0 = time.time()
                n = qs[name](spark, args.sf_dir).count()
                if i > 0:
                    samples.append(time.time() - t0)
            best = min(samples)
            timings[name] = {
                "best": round(best, 3),
                "spread": round(max(samples) - best, 3),
                "rows": n,
            }
            total += best
            print(f"# {name}: best={best:.2f}s rows={n}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            timings[name] = "failed"
            print(f"# {name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)

    # one transactional workload: PL3 per-transaction path over the
    # full events-derived transfer stream (1 M txns at sf1)
    try:
        timings["txn_bank_tps_pl3"] = bank_transfer_tps(spark, args.sf_dir)
    except Exception as exc:  # noqa: BLE001
        timings["txn_bank_tps_pl3"] = "failed"
        print(f"# txn_bank_tps_pl3: FAILED {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scale_rehearsal_headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf_dir": args.sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
