"""Characterize cursor paging cost (round-13 serve cursors): keyset
(predicate path, `key > after_key` range scan per page) should stay
flat per page, while the sql offset cursor rescans the skipped prefix
(documented O(pages^2) total).  This probe pages a 100k-key namespace
through both and prints first/median/last per-page latencies — the
recorded basis for the 'keyset is the scale path' guidance in
serve.py's docstrings.

Usage: python tools/cursor_paging_probe.py [n_keys] [page_size]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    page = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from t_spoon_spark.serve import StateService
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx import TxEnvironment
    from t_spoon_spark.tx.namespace import Namespace

    spark = build_spark(app_name="cursor_paging_probe", shuffle_partitions=8)
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("kv", "double", 0.0)
    # seed the namespace directly through the store (one commit): the
    # probe measures the QUERY paths, not epoch execution
    snap = spark.range(n_keys).selectExpr(
        "concat('k', lpad(cast(id as string), 7, '0')) AS key",
        "cast(id as double) AS value",
    )
    env.store.commit(0, {"kv": snap}, None)

    svc = StateService(env, max_rows=page)

    def run_pages(first_req, follow):
        times, rows, resp = [], 0, None
        cursor = None
        while True:
            t0 = time.time()
            resp = follow(cursor) if cursor is not None else first_req()
            times.append(time.time() - t0)
            rows += len(resp["rows"])
            if not resp.get("truncated"):
                break
            cursor = resp["cursor"]
        return times, rows

    # keyset: predicate path
    ks_times, ks_rows = run_pages(
        lambda: svc.query_predicate("kv", "value >= 0"),
        lambda cur: svc.query_predicate("kv", "value >= 0", epoch=cur["epoch"],
                                        after_key=cur["after_key"]),
    )
    # offset: sql path (total order imposed by the query)
    sql = "SELECT key, value FROM state_kv ORDER BY key"
    of_times, of_rows = run_pages(
        lambda: svc.sql(sql),
        lambda cur: svc.sql(sql, epoch=cur["epoch"], offset=cur["offset"]),
    )

    def stats(ts):
        return {
            "pages": len(ts),
            "first_ms": round(1000 * ts[0], 1),
            "median_ms": round(1000 * statistics.median(ts), 1),
            "last_ms": round(1000 * ts[-1], 1),
            "total_s": round(sum(ts), 2),
        }

    out = {
        "n_keys": n_keys,
        "page_size": page,
        "keyset_predicate": {**stats(ks_times), "rows": ks_rows},
        "offset_sql": {**stats(of_times), "rows": of_rows},
    }
    assert ks_rows == n_keys and of_rows == n_keys, out
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
