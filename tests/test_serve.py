"""Queryable-state service (serve.py): the reference's external query
client flow (QuerySupplier -> Query/PredicateQuery -> QueryResultMerger)
over a long-lived engine session — key/predicate/SQL queries against a
pinned committed snapshot, concurrent with epoch commits."""

from __future__ import annotations

import pyspark.sql.functions as F

from t_spoon_spark.serve import StateService, query_client
from t_spoon_spark.tx import TxEnvironment


def _bank_env(spark):
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
    g = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .state("balances", key=lambda df: F.col("account"), update=lambda v: v + F.col("delta"))
    )
    return env, env.runner(g)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "_tid long, from_account string, to_account string, amount double"
    )


def test_in_process_service_pins_snapshot(spark):
    env, runner = _bank_env(spark)
    runner.run_epoch(_batch(spark, [(1, "a1", "a2", 30.0)]))
    svc = StateService(env)

    e1 = env.watermark()
    out = svc.query_keys("balances", ["a1", "a2"])
    assert out == {"epoch": e1, "rows": [["a1", 70.0], ["a2", 130.0]]}

    # state advances; a request pinned at the OLD epoch still answers
    # from that snapshot (time travel), a fresh request sees the new one
    runner.run_epoch(_batch(spark, [(2, "a2", "a1", 50.0)]))
    old = svc.query_keys("balances", ["a1", "a2"], epoch=e1)
    assert old["rows"] == [["a1", 70.0], ["a2", 130.0]]
    new = svc.query_keys("balances", ["a1", "a2"])
    assert new["epoch"] == e1 + 1
    assert new["rows"] == [["a1", 120.0], ["a2", 80.0]]

    pred = svc.query_predicate("balances", "value > 100.0")
    assert pred["rows"] == [["a1", 120.0]]

    agg = svc.sql("SELECT count(*) AS n, sum(value) AS total FROM state_balances")
    assert agg["columns"] == ["n", "total"]
    assert agg["rows"] == [[2, 200.0]]


def test_tcp_server_roundtrip_and_errors(spark):
    env, runner = _bank_env(spark)
    runner.run_epoch(_batch(spark, [(1, "a1", "a2", 25.0)]))

    with StateService(env).serve() as svc:
        call = query_client(*svc.address)
        wm = call({"op": "watermark"})
        assert wm["ok"] and wm["epoch"] == env.watermark()

        resp = call({"op": "keys", "ns": "balances", "keys": ["a2"]})
        assert resp["ok"] and resp["rows"] == [["a2", 125.0]]

        resp = call({"op": "predicate", "ns": "balances", "predicate": "value < 100"})
        assert resp["ok"] and resp["rows"] == [["a1", 75.0]]

        resp = call(
            {"op": "sql", "query": "SELECT key FROM state_balances ORDER BY key"}
        )
        assert resp["ok"] and resp["rows"] == [["a1"], ["a2"]]

        # the network sql op is read-only: DDL/DML/config statements are
        # rejected before reaching the session (ADVICE r6 — a TCP client
        # must not be able to drop views or mutate the shared session)
        for stmt in (
            "DROP VIEW state_balances",
            "CREATE TABLE t (x INT)",
            "SET spark.sql.shuffle.partitions=1",
            "INSERT INTO state_balances VALUES ('z', 1.0)",
            "/* sneaky */ DROP VIEW state_balances",
            # CTE-prefixed DML parses under a 'WITH' head — the parsed-
            # plan check must reject it even though the head passes
            "WITH x AS (SELECT 1 AS a) INSERT OVERWRITE DIRECTORY "
            "'/tmp/pwn' USING parquet SELECT * FROM x",
            "WITH x AS (SELECT 'z' k, 1.0 v) INSERT INTO state_balances SELECT * FROM x",
        ):
            resp = call({"op": "sql", "query": stmt})
            assert not resp["ok"] and "read-only" in resp["error"], stmt
        # comments and parenthesized set-ops still pass the whitelist
        resp = call(
            {"op": "sql", "query": "-- c\n(SELECT key FROM state_balances) ORDER BY key"}
        )
        assert resp["ok"] and resp["rows"] == [["a1"], ["a2"]]

        # errors are per-request, the connection survives them
        resp = call({"op": "keys", "ns": "nope", "keys": ["x"]})
        assert not resp["ok"] and "error" in resp
        resp = call({"op": "frobnicate"})
        assert not resp["ok"]
        resp = call({"op": "watermark"})
        assert resp["ok"]
        call.close()


def test_server_concurrent_with_epoch_commits(spark):
    """Queries racing epoch commits: every response is internally
    consistent (sum conserved at ANY pinned epoch — money invariant)."""
    import threading

    env, runner = _bank_env(spark)
    runner.run_epoch(_batch(spark, [(1, "a1", "a2", 10.0)]))
    with StateService(env).serve() as svc:
        call = query_client(*svc.address)
        stop = threading.Event()
        errors: list[str] = []

        def commits():
            tid = 2
            while not stop.is_set():
                runner.run_epoch(_batch(spark, [(tid, "a1", "a2", 1.0)]))
                tid += 1

        t = threading.Thread(target=commits, daemon=True)
        t.start()
        try:
            for _ in range(10):
                resp = call({"op": "sql", "query": "SELECT sum(value) AS s FROM state_balances"})
                if not resp["ok"]:
                    errors.append(resp["error"])
                elif resp["rows"][0][0] != 200.0:
                    errors.append(f"sum violated: {resp['rows']}")
        finally:
            stop.set()
            t.join(timeout=60)
        call.close()
    assert not errors, errors


def test_row_cap_truncates_unbounded_queries(spark):
    """Round-10 verdict #8: an unbounded predicate/sql query must not
    collect its full result to the long-lived driver — responses
    truncate at the server cap (flagged), a client may lower the cap
    per request but never raise it, and an oversized key list is capped
    the same way."""
    env, runner = _bank_env(spark)
    # 30 keys via transfers out of a hub account (balance stays >= 0 on
    # the hub because it RECEIVES first)
    rows = [(i, "hub", f"k{i:02d}", 1.0) for i in range(30)]
    runner.run_epoch(_batch(spark, rows))
    svc = StateService(env, max_rows=10)

    pred = svc.query_predicate("balances", "value >= 0.0")
    assert len(pred["rows"]) == 10
    assert pred["truncated"] is True
    # deterministic page: orderBy(key) -> the 10 smallest keys
    assert pred["rows"][0][0] == "hub" or pred["rows"][0][0] == "k00"

    tight = svc.query_predicate("balances", "value >= 0.0", limit=3)
    assert len(tight["rows"]) == 3 and tight["truncated"] is True
    # a client-supplied limit can never RAISE the server cap
    wide = svc.query_predicate("balances", "value >= 0.0", limit=10_000)
    assert len(wide["rows"]) == 10

    sql = svc.sql("SELECT key, value FROM state_balances")
    assert len(sql["rows"]) == 10 and sql["truncated"] is True
    # under-cap results come back whole, no flag
    small = svc.sql("SELECT count(*) AS n FROM state_balances")
    assert small["rows"] == [[31]] and "truncated" not in small

    keys = svc.query_keys("balances", [f"k{i:02d}" for i in range(30)])
    assert len(keys["rows"]) == 10 and keys["truncated"] is True

    # the TCP path honors the request-level limit field
    with StateService(env, max_rows=10).serve() as served:
        call = query_client(*served.address)
        out = call(
            {"op": "predicate", "ns": "balances", "predicate": "value >= 0.0",
             "limit": 4}
        )
        assert out["ok"] and len(out["rows"]) == 4 and out["truncated"] is True
        call.close()


def test_concurrent_clients_consistent_pin_under_commit_load(spark):
    """Round-11 verdict #8: concurrent clients during ACTIVE epoch
    commits each see one consistent snapshot — for a response pinned at
    epoch E, the keys / predicate / sql ops re-issued AT that explicit
    pin must agree with each other exactly (the sql path serializes on
    _sql_lock and every op pins per request; this is the cross-op
    consistency those mechanisms promise)."""
    import threading

    env, runner = _bank_env(spark)
    # a pin must outlive the 2 follow-up reads even if commits race
    # several epochs ahead meanwhile — widen the retained history so the
    # test exercises cross-op consistency, not history eviction
    env.store.history_epochs = 64
    runner.run_epoch(_batch(spark, [(1, "a1", "a2", 10.0)]))
    with StateService(env).serve() as svc:
        stop = threading.Event()
        commit_err: list[str] = []

        def commits():
            tid = 2
            while not stop.is_set():
                try:
                    runner.run_epoch(_batch(spark, [(tid, "a1", "a2", 1.0)]))
                except Exception as exc:  # noqa: BLE001
                    commit_err.append(str(exc))
                    return
                tid += 1

        t = threading.Thread(target=commits, daemon=True)
        t.start()

        errors: list[str] = []

        def client(n_reqs: int):
            call = query_client(*svc.address)
            try:
                for _ in range(n_reqs):
                    # pin via an unpinned sql request, then re-read the
                    # SAME epoch through all three ops
                    sql = call(
                        {"op": "sql",
                         "query": "SELECT key, value FROM state_balances"}
                    )
                    if not sql["ok"]:
                        errors.append(sql["error"])
                        continue
                    pin = sql["epoch"]
                    by_sql = {k: v for k, v in sql["rows"]}
                    pred = call(
                        {"op": "predicate", "ns": "balances",
                         "predicate": "value >= 0.0", "epoch": pin}
                    )
                    keys = call(
                        {"op": "keys", "ns": "balances",
                         "keys": ["a1", "a2"], "epoch": pin}
                    )
                    if not (pred["ok"] and keys["ok"]):
                        errors.append(str((pred, keys)))
                        continue
                    by_pred = {k: v for k, v in pred["rows"]}
                    by_keys = {k: v for k, v in keys["rows"]}
                    if by_pred != by_sql:
                        errors.append(
                            f"pin {pin}: predicate {by_pred} != sql {by_sql}"
                        )
                    if by_keys != by_sql:
                        errors.append(
                            f"pin {pin}: keys {by_keys} != sql {by_sql}"
                        )
                    if round(sum(by_sql.values()), 6) != 200.0:
                        errors.append(f"pin {pin}: sum violated: {by_sql}")
            finally:
                call.close()

        clients = [
            threading.Thread(target=client, args=(6,), daemon=True)
            for _ in range(3)
        ]
        try:
            for c in clients:
                c.start()
            for c in clients:
                c.join(timeout=300)
        finally:
            stop.set()
            t.join(timeout=60)
    assert not commit_err, commit_err
    assert not errors, errors[:5]


def test_cursor_pages_full_result_under_commit_load(spark):
    """Round-12 verdict #6: a truncated response carries a first-class
    cursor token (epoch-pinned), and following it retrieves the FULL
    result set — every page read from the same snapshot even while
    commits race ahead.  Both paths: keyset cursor on predicate
    (after_key), offset cursor on sql."""
    import threading

    env, runner = _bank_env(spark)
    env.store.history_epochs = 256  # pins must outlive the racing commits
    rows = [(i, "hub", f"k{i:02d}", 1.0) for i in range(30)]
    runner.run_epoch(_batch(spark, rows))

    with StateService(env, max_rows=7).serve() as svc:
        stop = threading.Event()

        def commits():
            tid = 100
            while not stop.is_set():
                runner.run_epoch(_batch(spark, [(tid, "hub", "k00", 1.0)]))
                tid += 1

        t = threading.Thread(target=commits, daemon=True)
        t.start()
        try:
            call = query_client(*svc.address)

            # -- predicate path: keyset cursor ------------------------
            req = {"op": "predicate", "ns": "balances", "predicate": "value >= 0.0"}
            resp = call(req)
            assert resp["ok"] and resp["truncated"] is True
            pin = resp["epoch"]
            assert resp["cursor"] == {"epoch": pin, "after_key": resp["rows"][-1][0]}
            pages = [resp["rows"]]
            while resp.get("truncated"):
                resp = call({**req, "cursor": resp["cursor"]})
                assert resp["ok"], resp
                assert resp["epoch"] == pin  # cursor re-pins the snapshot
                pages.append(resp["rows"])
            got = {k: v for page in pages for k, v in page}
            oracle = {
                r["key"]: r["value"]
                for r in env.query_predicate("balances", "value >= 0.0", epoch=pin).collect()
            }
            assert got == oracle
            assert len(got) == 31  # hub + 30 keys: nothing lost or duplicated
            assert sum(len(p) for p in pages) == 31

            # -- sql path: offset cursor -------------------------------
            req = {
                "op": "sql",
                "query": "SELECT key, value FROM state_balances ORDER BY key",
            }
            resp = call(req)
            assert resp["ok"] and resp["truncated"] is True
            pin = resp["epoch"]
            assert resp["cursor"] == {"epoch": pin, "offset": 7}
            sql_rows = list(resp["rows"])
            while resp.get("truncated"):
                resp = call({**req, "cursor": resp["cursor"]})
                assert resp["ok"], resp
                assert resp["epoch"] == pin
                sql_rows.extend(resp["rows"])
            oracle_rows = [
                [r["key"], r["value"]]
                for r in env.sql(
                    "SELECT key, value FROM state_balances ORDER BY key", epoch=pin
                ).collect()
            ]
            assert sql_rows == oracle_rows
            # the engine kept committing while we paged
            wm = call({"op": "watermark"})
            assert wm["ok"] and wm["epoch"] >= pin
            call.close()
        finally:
            stop.set()
            t.join(timeout=60)


def test_freshness_uncommitted_over_tcp(spark):
    """Round-13 freshness option on the wire: idle engine -> uncommitted
    equals committed (flagged); pinning + uncommitted is rejected
    per-request; bad freshness value is rejected."""
    env, runner = _bank_env(spark)
    runner.run_epoch(_batch(spark, [(1, "a1", "a2", 30.0)]))
    with StateService(env).serve() as svc:
        call = query_client(*svc.address)
        fresh = call(
            {"op": "keys", "ns": "balances", "keys": ["a1", "a2"],
             "freshness": "uncommitted"}
        )
        assert fresh["ok"] and fresh["uncommitted"] is True
        assert fresh["rows"] == [["a1", 70.0], ["a2", 130.0]]
        assert fresh["epoch"] == env.watermark()

        pred = call(
            {"op": "predicate", "ns": "balances", "predicate": "value > 100",
             "freshness": "uncommitted"}
        )
        assert pred["ok"] and pred["rows"] == [["a2", 130.0]]

        bad = call(
            {"op": "keys", "ns": "balances", "keys": ["a1"],
             "epoch": 0, "freshness": "uncommitted"}
        )
        assert not bad["ok"] and "cannot pin" in bad["error"]
        bad2 = call(
            {"op": "keys", "ns": "balances", "keys": ["a1"], "freshness": "dirty"}
        )
        assert not bad2["ok"]
        call.close()


def test_cursor_pin_below_retention_horizon_refuses(spark, tmp_path):
    """Round-13 features composed: a cursor pins its epoch, and the
    retention horizon (max_epochs) can pass that pin while a slow
    client pages.  The next page must refuse loudly (the store's
    KeyError surfaces as an error response) — never silently answer
    from a newer snapshot."""
    from t_spoon_spark.tx import TxEnvironment

    env = TxEnvironment(
        spark,
        isolation="PL3",
        durable=True,
        store_dir=str(tmp_path / "store"),
        checkpoint_every=1,
        max_epochs=3,
    )
    env.create_namespace("kv", "double", 0.0)

    def commit_epoch(e):
        upd = spark.createDataFrame(
            [(f"k{i:02d}", float(e * 100 + i)) for i in range(30)],
            "key string, value double",
        )
        env.store.commit(e, {"kv": upd}, None)

    commit_epoch(0)
    svc = StateService(env, max_rows=7)
    page1 = svc.handle({"op": "predicate", "ns": "kv", "predicate": "value >= 0"})
    assert page1["ok"] and page1["truncated"] and page1["epoch"] == 0

    # retention passes the pin while the client dawdles
    for e in range(1, 6):
        commit_epoch(e)
    stale = svc.handle(
        {"op": "predicate", "ns": "kv", "predicate": "value >= 0",
         "cursor": page1["cursor"]}
    )
    assert not stale["ok"] and "retention horizon" in stale["error"], stale
    # a fresh request (new pin) works fine
    fresh = svc.handle({"op": "predicate", "ns": "kv", "predicate": "value >= 0"})
    assert fresh["ok"] and fresh["epoch"] == 5


def test_sql_op_honors_freshness_and_flags_unpageable(spark):
    """Review findings (r13): the wire sql op must honor freshness like
    keys/predicate (flagged response, invalid value rejected), and a
    truncated uncommitted response must say paging_unavailable instead
    of silently omitting the cursor a paging loop expects."""
    env, runner = _bank_env(spark)
    rows = [(i, "hub", f"k{i:02d}", 1.0) for i in range(30)]
    runner.run_epoch(_batch(spark, rows))
    with StateService(env, max_rows=7).serve() as svc:
        call = query_client(*svc.address)
        # sql + freshness honored (idle: equals committed, flagged)
        resp = call(
            {"op": "sql",
             "query": "SELECT key, value FROM state_balances ORDER BY key",
             "freshness": "uncommitted"}
        )
        assert resp["ok"] and resp["uncommitted"] is True
        assert resp["epoch"] == env.watermark()
        # truncated uncommitted: no cursor, explicit paging_unavailable
        assert resp["truncated"] is True and "cursor" not in resp
        assert resp["paging_unavailable"] is True
        # same contract on the predicate path
        pred = call(
            {"op": "predicate", "ns": "balances", "predicate": "value >= 0",
             "freshness": "uncommitted"}
        )
        assert pred["ok"] and pred["truncated"] is True
        assert "cursor" not in pred and pred["paging_unavailable"] is True
        # invalid freshness and pinned+uncommitted rejected on sql too
        bad = call({"op": "sql", "query": "SELECT 1 AS x", "freshness": "dirty"})
        assert not bad["ok"] and "freshness" in bad["error"]
        bad2 = call(
            {"op": "sql", "query": "SELECT 1 AS x", "epoch": 0,
             "freshness": "uncommitted"}
        )
        assert not bad2["ok"] and "cannot pin" in bad2["error"]
        call.close()


def test_sql_keyset_cursor_pages_under_commit_load(spark):
    """Round-13 verdict #8: the sql path accepts keyset paging — the
    client names its ORDER BY columns (unique tiebreak) in
    ``keyset_cols``, a truncated response carries ``cursor={"epoch":
    pin, "keyset": {...}}`` from the last served row, and following it
    drains the FULL result at ONE pinned snapshot while commits race —
    each page a range-continuation predicate, no offset rescan."""
    import threading

    env, runner = _bank_env(spark)
    env.store.history_epochs = 256  # pins must outlive the racing commits
    rows = [(i, "hub", f"k{i:02d}", 1.0) for i in range(30)]
    runner.run_epoch(_batch(spark, rows))

    with StateService(env, max_rows=7).serve() as svc:
        stop = threading.Event()

        def commits():
            tid = 100
            while not stop.is_set():
                runner.run_epoch(_batch(spark, [(tid, "hub", "k00", 1.0)]))
                tid += 1

        t = threading.Thread(target=commits, daemon=True)
        t.start()
        try:
            call = query_client(*svc.address)
            req = {
                "op": "sql",
                "query": "SELECT key, value FROM state_balances ORDER BY key",
                "keyset_cols": ["key"],
            }
            resp = call(req)
            assert resp["ok"] and resp["truncated"] is True, resp
            pin = resp["epoch"]
            # the cursor is a keyset (last served row's key), not an offset
            assert resp["cursor"] == {
                "epoch": pin,
                "keyset": {"key": resp["rows"][-1][0]},
            }
            assert "unordered" not in resp  # ORDER BY present
            sql_rows = list(resp["rows"])
            while resp.get("truncated"):
                resp = call({**req, "cursor": resp["cursor"]})
                assert resp["ok"], resp
                assert resp["epoch"] == pin  # cursor re-pins the snapshot
                sql_rows.extend(resp["rows"])
            oracle_rows = [
                [r["key"], r["value"]]
                for r in env.sql(
                    "SELECT key, value FROM state_balances ORDER BY key", epoch=pin
                ).collect()
            ]
            assert sql_rows == oracle_rows
            assert len(sql_rows) == 31  # hub + 30 keys: exact drain
            call.close()
        finally:
            stop.set()
            t.join(timeout=60)


def test_sql_keyset_validation(spark):
    """Keyset sharp edges: unknown columns refused, keyset+offset
    refused, multi-column lexicographic continuation is exact."""
    env, runner = _bank_env(spark)
    runner.run_epoch(_batch(spark, [(i, "hub", f"k{i}", 1.0) for i in range(5)]))
    svc = StateService(env, max_rows=2)
    bad = svc.handle(
        {"op": "sql", "query": "SELECT key FROM state_balances ORDER BY key",
         "keyset_cols": ["nope"]}
    )
    assert not bad["ok"] and "keyset column" in bad["error"], bad
    both = svc.handle(
        {"op": "sql", "query": "SELECT key FROM state_balances ORDER BY key",
         "keyset_cols": ["key"], "cursor": {"offset": 2, "keyset": {"key": "a"}}}
    )
    assert not both["ok"] and "mutually exclusive" in both["error"], both
    # multi-column keyset: order by (value, key) — value ties across
    # many keys, the key tiebreak must advance through the tie
    req = {
        "op": "sql",
        "query": "SELECT value, key FROM state_balances ORDER BY value, key",
        "keyset_cols": ["value", "key"],
    }
    resp = svc.handle(req)
    got = list(resp["rows"])
    while resp.get("truncated"):
        resp = svc.handle({**req, "cursor": resp["cursor"]})
        assert resp["ok"], resp
        got.extend(resp["rows"])
    oracle = [
        [r["value"], r["key"]]
        for r in env.sql(
            "SELECT value, key FROM state_balances ORDER BY value, key"
        ).collect()
    ]
    assert got == oracle and len(got) == 6
