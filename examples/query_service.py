"""The reference's external-query evaluation re-expressed on this
engine (evaluation/QueryEvaluation.java:52-67: a query stream runs
against live transactional state at the watermark): start the
queryable-state TCP service on a long-lived session, keep committing
transfer epochs, and issue key / predicate / SQL queries from a plain
socket client while the state moves — every response is pinned to one
committed epoch, so the money-conservation invariant holds in every
answer even mid-stream.

Run: python examples/query_service.py [sf_dir]
"""

from __future__ import annotations

import sys
import threading
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from t_spoon_spark.bench_txn import _transfers
    from t_spoon_spark.serve import StateService, query_client
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.tx import TxEnvironment

    own_session = spark is None
    if own_session:
        spark = build_spark(app_name="query_service_example")

    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    graph = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .state(
            "balances",
            key=lambda df: F.col("account"),
            update=lambda v: v + F.col("delta"),
            pre_combine={"delta": "sum"},
        )
    )
    runner = env.runner(graph)
    transfers = (
        _transfers(spark, sf_dir, keyspace=200)
        .filter(F.col("_tid") < 2_000)
        .localCheckpoint(eager=True)
    )
    runner.run_epoch(transfers.filter(F.col("_tid") < 500))

    answers = []
    with StateService(env).serve() as svc:
        # epochs keep committing on a writer thread while we query
        def writer():
            for i in range(1, 4):
                runner.run_epoch(
                    transfers.filter(
                        (F.col("_tid") >= i * 500) & (F.col("_tid") < (i + 1) * 500)
                    )
                )

        t = threading.Thread(target=writer)
        t.start()
        call = query_client(*svc.address)
        try:
            for _ in range(6):
                resp = call(
                    {"op": "sql",
                     "query": "SELECT count(*) AS accounts, sum(value) AS total"
                              " FROM state_balances"}
                )
                assert resp["ok"], resp
                accounts, total = resp["rows"][0]
                # snapshot consistency: conservation holds at EVERY pin
                assert total == 100.0 * accounts, resp
                answers.append({"epoch": resp["epoch"], "total": total})
            some_key = call(
                {"op": "keys", "ns": "balances", "keys": ["a0", "a1"]}
            )
            overdrawn = call(
                {"op": "predicate", "ns": "balances", "predicate": "value < 0"}
            )
            assert some_key["ok"] and overdrawn["ok"]
            assert overdrawn["rows"] == [], "overdraft visible to a query!"
            # unbounded scans page at the service's row cap (round 11):
            # the response is truncated server-side (executor-side
            # top-k, ordered by key) and flagged, so a careless client
            # cannot pull the whole state through the driver
            page = call(
                {"op": "predicate", "ns": "balances",
                 "predicate": "value >= 0", "limit": 5}
            )
            assert page["ok"] and len(page["rows"]) == 5
            assert page.get("truncated") is True, page
            # round 13: a truncated response carries an epoch-pinned
            # cursor — follow it to retrieve the FULL result at one
            # consistent snapshot even while the writer keeps committing
            pages, resp = [page["rows"]], page
            while resp.get("truncated"):
                resp = call(
                    {"op": "predicate", "ns": "balances",
                     "predicate": "value >= 0", "limit": 5,
                     "cursor": resp["cursor"]}
                )
                assert resp["ok"] and resp["epoch"] == page["epoch"], resp
                pages.append(resp["rows"])
            full = [kv for p in pages for kv in p]
            assert len(full) == len({k for k, _ in full}), "paged dup/loss"
            assert sum(v for _, v in full) == 100.0 * len(full), "torn pages"
            # round 14: keyset paging on the SQL path — the client
            # names its ORDER BY columns and the cursor becomes a
            # lexicographic continuation predicate at the same pin
            # (O(pages) deep paging, no offset rescan)
            kreq = {
                "op": "sql",
                "query": "SELECT key, value FROM state_balances ORDER BY key",
                "limit": 5,
                "keyset_cols": ["key"],
            }
            resp = call(kreq)
            assert resp["ok"] and "keyset" in resp["cursor"], resp
            krows = list(resp["rows"])
            while resp.get("truncated"):
                resp = call({**kreq, "cursor": resp["cursor"]})
                assert resp["ok"], resp
                krows.extend(resp["rows"])
            assert len(krows) == len(full), "keyset drain != predicate drain"
            # round 13: PL0 hot reads — freshness='uncommitted' answers
            # from the in-flight epoch's resolved updates mid-commit
            # (idle here, so it equals committed and is flagged)
            hot = call(
                {"op": "keys", "ns": "balances", "keys": ["a0", "a1"],
                 "freshness": "uncommitted"}
            )
            assert hot["ok"] and hot.get("uncommitted") is True, hot
        finally:
            call.close()
            t.join()

    out = {"answers": answers, "final_watermark": env.watermark()}
    print(out)
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
