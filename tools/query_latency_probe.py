"""Queryable-state serving latency (reference parity metric: the
evaluation harness issues 1-10-key queries against live state and
reports query latency — evaluation/EvalConfig.java:60-97 'query size
avg 1-10 keys', launch_scripts/parse_results.py:31-38).

Measures TCP round-trip latency of key queries (sizes cycling 1..10)
over a 100k-key namespace in three modes: idle committed, under
continuous epoch commits, under commits with freshness='uncommitted'.

Round 14: the measurement core moved to
``t_spoon_spark.bench_txn.serve_query_latency`` (it is now a committed
bench.py row — verdict r13 #6); this tool is the standalone CLI over
the same protocol.

Usage: python tools/query_latency_probe.py [n_keys] [n_queries]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from t_spoon_spark.bench_txn import serve_query_latency
    from t_spoon_spark.session import build_spark

    spark = build_spark(app_name="query_latency_probe", shuffle_partitions=8)
    out = {"n_keys": n_keys, "n_queries": n_queries}
    out.update(serve_query_latency(spark, n_keys=n_keys, n_queries=n_queries))
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
