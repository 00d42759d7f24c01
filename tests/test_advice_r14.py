"""Round-13 advisor/verdict hardening (ADVICE r13, VERDICT r13 "What's
wrong"): future-epoch reads cannot bypass the freshness gate, an
unstable PL0 capture refuses loudly instead of returning a possibly
torn view, unordered SQL paging carries an advisory flag, the
partitioned-layout scratch dir is per-session, and env.sql is safe to
call from concurrent threads without going through serve.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import threading

import pytest

from t_spoon_spark.serve import StateService
from t_spoon_spark.tx import TxEnvironment
from t_spoon_spark.tx.namespace import Namespace
from t_spoon_spark.tx.store import StateStore


def _upd(spark, pairs):
    return spark.createDataFrame(pairs, "key string, value double")


# -- ADVICE medium: read() must refuse epochs above the watermark ------


def test_read_future_epoch_refused_durable(spark, tmp_path):
    """Durable mode: _reconstruct would fold in log files for epochs
    whose commit marker never landed (mid-commit or crash-orphaned), so
    a client pinning epoch=committed+1 used to receive not-yet-durable
    state without the freshness='uncommitted' opt-in."""
    store = StateStore(spark, root=str(tmp_path / "s"), durable=True)
    store.register(Namespace("g", "double", 0.0))
    store.commit(0, {"g": _upd(spark, [("a", 1.0)])}, None)
    # plant an orphaned epoch-1 log (a crash between log write and
    # marker): the guard must refuse, not reconstruct through it
    with pytest.raises(KeyError, match="above the committed watermark"):
        store.read("g", 1)
    with pytest.raises(KeyError, match="above the committed watermark"):
        store.read("g", 99)
    # the committed epoch itself still answers
    assert {r["key"]: r["value"] for r in store.read("g", 0).collect()} == {"a": 1.0}


def test_read_future_epoch_refused_in_memory(spark):
    store = StateStore(spark)
    store.register(Namespace("g", "double", 0.0))
    store.commit(0, {"g": _upd(spark, [("a", 1.0)])}, None)
    with pytest.raises(KeyError, match="above the committed watermark"):
        store.read("g", 1)


def test_serve_future_epoch_pin_errors(spark):
    """The serve pin path routes through store.read, so a wire request
    with a future epoch gets a clean refusal, not uncommitted rows."""
    env = TxEnvironment(spark)
    env.create_namespace("bal", "double", 0.0)
    env.store.commit(0, {"bal": _upd(spark, [("a", 1.0)])}, None)
    svc = StateService(env)
    out = svc.handle(
        {"op": "keys", "ns": "bal", "keys": ["a"], "epoch": env.watermark() + 1}
    )
    assert not out["ok"] and "above the committed watermark" in out["error"], out


# -- ADVICE low: unstable PL0 capture refuses loudly -------------------


def test_read_uncommitted_all_unstable_capture_raises(spark):
    """Force the capture-stability identity check to fail every pass (a
    fresh _inflight object per access): the loop must raise, never
    silently return the last (possibly torn) capture."""
    env = TxEnvironment(spark)
    env.create_namespace("a", "double", 0.0)
    store = env.store
    store.commit(0, {"a": _upd(spark, [("k", 1.0)])}, None)
    orig_cls = store.__class__

    class UnstableStore(orig_cls):
        @property
        def _inflight(self):
            # a new tuple per access: `is` can never see the same object
            return (self._committed + 1, {})

        @_inflight.setter
        def _inflight(self, value):
            pass

    store.__class__ = UnstableStore
    try:
        with pytest.raises(RuntimeError, match="did not stabilize"):
            store.read_uncommitted_all(["a"])
    finally:
        store.__class__ = orig_cls


# -- ADVICE low: unordered SQL paging advisory -------------------------


def _filled_env(spark, n=8):
    env = TxEnvironment(spark)
    env.create_namespace("bal", "double", 0.0)
    env.store.commit(
        0, {"bal": _upd(spark, [(f"k{i:02d}", float(i)) for i in range(n)])}, None
    )
    return env


def test_sql_cursor_unordered_advisory_flag(spark):
    env = _filled_env(spark)
    svc = StateService(env, max_rows=3)
    # no ORDER BY: the cursor still pages, but the response must say
    # the enumeration is not frozen by the client's query
    out = svc.sql("SELECT key, value FROM state_bal")
    assert out["truncated"] and "cursor" in out
    assert out.get("unordered") is True, out
    # with a total order the advisory flag is absent
    ordered = svc.sql("SELECT key, value FROM state_bal ORDER BY key")
    assert ordered["truncated"] and "cursor" in ordered
    assert "unordered" not in ordered, ordered
    # ordered paging drains exactly
    rows, req = [], {"op": "sql", "query": "SELECT key FROM state_bal ORDER BY key"}
    resp = svc.handle(dict(req, limit=3))
    rows += resp["rows"]
    while resp.get("truncated"):
        resp = svc.handle(dict(req, limit=3, cursor=resp["cursor"]))
        assert "unordered" not in resp
        rows += resp["rows"]
    assert [r[0] for r in rows] == [f"k{i:02d}" for i in range(8)]


def test_sql_untruncated_has_no_advisory(spark):
    env = _filled_env(spark, n=2)
    svc = StateService(env, max_rows=100)
    out = svc.sql("SELECT key, value FROM state_bal")
    assert "unordered" not in out and "cursor" not in out


# -- ADVICE low: per-session partitioned-layout scratch dir ------------


def test_partitioned_layout_path_embeds_session(spark):
    from t_spoon_spark.queries.io_formats2 import partitioned_events

    sf_dir = "/root/testdata/sf0.001"
    df = partitioned_events(spark, sf_dir)
    assert df.count() > 0
    app_id = spark.sparkContext.applicationId
    suffix = hashlib.md5(
        f"{app_id}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"tspoon_io_part_events_{suffix}")
    # the layout landed under THIS session's dir: a concurrent session
    # (different applicationId) hashes to a disjoint path
    assert os.path.isdir(path)
    other = hashlib.md5(
        f"not-{app_id}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    assert other != suffix


# -- verdict r13 "wrong" #2: env.sql direct-call thread safety ---------


def test_env_sql_concurrent_threads_pin_consistently(spark):
    """Two threads calling env.sql DIRECTLY (not through serve) with
    different epoch pins: the bind+analysis lock means neither ever
    analyzes against the other's view bind — every result matches its
    own pin."""
    env = TxEnvironment(spark)
    env.create_namespace("bal", "double", 0.0)
    env.store.commit(0, {"bal": _upd(spark, [("a", 1.0), ("b", 2.0)])}, None)
    env.store.commit(1, {"bal": _upd(spark, [("a", 10.0)])}, None)
    expect = {0: 3.0, 1: 12.0}
    errs: list[str] = []

    def worker(epoch: int):
        for _ in range(6):
            rows = env.sql(
                "SELECT sum(value) AS s FROM state_bal", epoch=epoch
            ).collect()
            if rows[0]["s"] != expect[epoch]:
                errs.append(f"epoch {epoch}: got {rows[0]['s']}")

    threads = [threading.Thread(target=worker, args=(e,)) for e in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs


def test_serve_uncommitted_sql_holds_env_lock(spark):
    """r14 self-review: the serve sql uncommitted branch binds the same
    state_<ns> temp views a direct env.sql caller binds — both must
    serialize on env.sql_lock, or a rebind can slip between serve's
    bind and its analysis.  Deterministic check: with env.sql_lock held
    elsewhere, the serve call must block until release."""
    import time as _time

    env = _filled_env(spark, n=3)
    svc = StateService(env, max_rows=10)
    done = []

    def call():
        out = svc.sql(
            "SELECT count(*) AS n FROM state_bal", freshness="uncommitted"
        )
        done.append(out)

    acquired = env.sql_lock.acquire()
    assert acquired
    try:
        t = threading.Thread(target=call, daemon=True)
        t.start()
        t.join(timeout=1.5)
        assert not done, "serve sql ran while env.sql_lock was held elsewhere"
    finally:
        env.sql_lock.release()
    t.join(timeout=120)
    assert done and done[0]["rows"] == [[3]], done


# -- property: keyset pagination drains exactly under any page size ----


def test_keyset_pagination_property(spark):
    """Randomized (hypothesis) drain check for the keyset SQL cursor:
    for random row sets with DUPLICATE order-column values and random
    page sizes, paging ORDER BY (value, key) with keyset_cols
    ["value", "key"] retrieves exactly the full result — no dup, no
    loss — because the lexicographic continuation predicate advances
    through ties on the unique tiebreak."""
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    n_examples = int(os.environ.get("TSPOON_PROP_EXAMPLES", "6"))

    env = TxEnvironment(spark)
    env.create_namespace("bal", "double", 0.0)
    # duplicate-heavy values: many ties for the tiebreak to resolve
    rows = [(f"k{i:03d}", float(i % 4)) for i in range(23)]
    env.store.commit(0, {"bal": _upd(spark, rows)}, None)
    oracle = sorted(((v, k) for k, v in rows))

    @settings(
        max_examples=n_examples,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(page=st.integers(min_value=1, max_value=9))
    def run(page):
        svc = StateService(env, max_rows=page)
        req = {
            "op": "sql",
            "query": "SELECT value, key FROM state_bal ORDER BY value, key",
            "keyset_cols": ["value", "key"],
        }
        resp = svc.handle(req)
        assert resp["ok"], resp
        got = [tuple(r) for r in resp["rows"]]
        while resp.get("truncated"):
            resp = svc.handle({**req, "cursor": resp["cursor"]})
            assert resp["ok"], resp
            got.extend(tuple(r) for r in resp["rows"])
        assert got == oracle, (page, got)

    run()


def test_recovery_ignores_orphaned_epoch_log(spark, tmp_path):
    """Crash BETWEEN log write and marker: the orphaned epoch-1 log
    parquet exists on disk but its marker never landed.  A fresh store
    opening the same root must recover to epoch 0 (the orphan is not
    state), and a pinned read of the orphaned epoch must hit the
    above-watermark guard — the on-disk twin of the ADVICE-r13 fix."""
    root = str(tmp_path / "s")
    store = StateStore(spark, root=root, durable=True)
    store.register(Namespace("g", "double", 0.0))
    store.commit(0, {"g": _upd(spark, [("a", 1.0), ("b", 2.0)])}, None)
    # simulate the torn commit: epoch-1 log written, no marker
    _upd(spark, [("a", 99.0)]).write.mode("overwrite").parquet(
        store._log_path("g", 1)
    )

    recovered = StateStore(spark, root=root, durable=True)
    recovered.register(Namespace("g", "double", 0.0))
    assert recovered.committed_epoch() == 0
    got = {r["key"]: r["value"] for r in recovered.read("g").collect()}
    assert got == {"a": 1.0, "b": 2.0}, got  # orphan invisible
    with pytest.raises(KeyError, match="above the committed watermark"):
        recovered.read("g", 1)
    # and the engine moves on: the next commit REUSES epoch 1 and its
    # values win over the orphan's
    recovered.commit(1, {"g": _upd(spark, [("a", 5.0)])}, None)
    got = {r["key"]: r["value"] for r in recovered.read("g").collect()}
    assert got == {"a": 5.0, "b": 2.0}, got
