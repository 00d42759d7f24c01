"""Query-section-only bench: exactly bench.py's headline +
extra-representative timing protocol (same session confs, same
1-warm + 3-measured best-of for headline, 1+2 for extras, same
`.count()` timed action) without the transactional/streaming/cluster
sections — for fast same-session before/after comparisons during
optimization rounds. The contract artifact stays bench.py.

Usage: python tools/bench_queries.py [query ...]   # default: full set
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import bench
    from t_spoon_spark.registry import all_queries
    from t_spoon_spark.session import build_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])
    # a typo'd name must not silently produce a partial run that looks
    # valid (ADVICE r14): warn on anything not in the timed sets
    known = set(bench.HEADLINE) | set(bench.EXTRA_REPRESENTATIVES)
    for miss in sorted(only - known):
        print(f"# WARN: requested query {miss!r} is not a bench row — skipped", file=sys.stderr)
    spark = build_spark(app_name="bench_queries")
    qs = all_queries()
    qs["q6_revenue_filter"](spark, sf_dir).count()  # session warmup

    out: dict[str, object] = {}
    total = 0.0
    for name in bench.HEADLINE:
        if name not in qs or (only and name not in only):
            continue
        samples = []
        for i in range(4):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if i > 0:
                samples.append(dt)
        best = min(samples)
        out[name] = round(best, 3)
        total += best
        print(f"# {name}: best={best:.3f}s spread={max(samples)-best:.3f}s", file=sys.stderr)
    for name in bench.EXTRA_REPRESENTATIVES:
        if name not in qs or (only and name not in only):
            continue
        samples = []
        for i in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if i > 0:
                samples.append(dt)
        best = min(samples)
        out[f"x_{name}_sec"] = round(best, 3)
        print(f"# x_{name}: best={best:.3f}s spread={max(samples)-best:.3f}s", file=sys.stderr)
    if not only:
        out["headline_total"] = round(total, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
