"""PL0-visibility queryable state (round-13 freshness spike, round-12
verdict "Next round" #7): ``freshness='uncommitted'`` reads answer from
the in-flight epoch's RESOLVED updates while a commit is underway,
shrinking query staleness by the commit wall.  Reference parity target:
record-level watermark reads (tgraph/query/WatermarkAssigner.java:11-26,
tgraph/db/Shard.java:170-184); ours reaches resolved-but-not-yet-durable
— the closest the epoch model gets without continuous triggers.

Key invariants:
  - the overlay holds POST-abort-resolution finals, so an uncommitted
    read never sees a write that will roll back;
  - with no commit in flight, uncommitted == committed exactly;
  - the committed-snapshot contract is untouched (read()/watermark()
    only advance at the marker).
"""

from __future__ import annotations

import threading

import pyspark.sql.functions as F
import pytest

from t_spoon_spark.tx import TxEnvironment
from t_spoon_spark.tx.namespace import Namespace
from t_spoon_spark.tx.store import StateStore


def _upd(spark, pairs):
    return spark.createDataFrame(pairs, "key string, value double")


class TestStoreOverlay:
    def test_idle_uncommitted_equals_committed(self, spark, tmp_path):
        store = StateStore(spark, root=str(tmp_path / "s"), durable=True)
        store.register(Namespace("g", "double", 0.0))
        store.commit(0, {"g": _upd(spark, [("a", 1.0), ("b", 2.0)])}, None)
        frame, eff = store.read_uncommitted("g")
        assert eff == 0 == store.committed_epoch()
        got = {r["key"]: r["value"] for r in frame.collect()}
        assert got == {"a": 1.0, "b": 2.0}

    def test_overlay_visible_during_commit_window(self, spark, tmp_path):
        """Deterministic mid-commit read: block the commit inside its
        marker write (updates already resolved and handed to commit),
        and assert the PL0 view shows epoch 1's values while the
        committed view still answers epoch 0."""
        store = StateStore(spark, root=str(tmp_path / "s"), durable=True)
        store.register(Namespace("g", "double", 0.0))
        store.commit(0, {"g": _upd(spark, [("a", 1.0), ("b", 2.0)])}, None)

        in_marker, release = threading.Event(), threading.Event()
        orig = store._write_marker

        def slow_marker(*args, **kwargs):
            in_marker.set()
            assert release.wait(timeout=120)
            return orig(*args, **kwargs)

        store._write_marker = slow_marker
        err: list[Exception] = []

        def commit_epoch1():
            try:
                store.commit(1, {"g": _upd(spark, [("a", 5.0), ("c", 7.0)])}, None)
            except Exception as exc:  # noqa: BLE001
                err.append(exc)

        t = threading.Thread(target=commit_epoch1, daemon=True)
        t.start()
        try:
            assert in_marker.wait(timeout=120)
            # committed contract untouched mid-commit
            assert store.committed_epoch() == 0
            committed = {r["key"]: r["value"] for r in store.read("g").collect()}
            assert committed == {"a": 1.0, "b": 2.0}
            # PL0 view: epoch 1's resolved updates overlaid
            frame, eff = store.read_uncommitted("g")
            assert eff == 1
            fresh = {r["key"]: r["value"] for r in frame.collect()}
            assert fresh == {"a": 5.0, "b": 2.0, "c": 7.0}
        finally:
            release.set()
            t.join(timeout=120)
            store._write_marker = orig
        assert not err, err
        # after the marker lands the two views agree and overlay clears
        assert store._inflight is None
        assert store.committed_epoch() == 1
        frame, eff = store.read_uncommitted("g")
        assert eff == 1
        assert {r["key"]: r["value"] for r in frame.collect()} == {
            "a": 5.0,
            "b": 2.0,
            "c": 7.0,
        }

    def test_pandas_twin_overlay_converts(self, spark):
        """The fused commit publishes its pandas updates dict as the
        overlay; read_uncommitted must convert and merge it (the
        non-durable zero-job path keeps uniform PL0 semantics)."""
        import pandas as pd

        store = StateStore(spark, durable=False, checkpoint_every=1)
        store.register(Namespace("g", "double", 0.0))
        store.commit_pandas(0, {"g": pd.DataFrame({"key": ["a"], "value": [1.0]})})

        seen: dict = {}
        orig_body = store._commit_pandas_body

        def spying_body(epoch, updates_pdfs, batch_id, query_id, pd_mod):
            frame, eff = store.read_uncommitted("g")
            seen["eff"] = eff
            seen["rows"] = {r["key"]: r["value"] for r in frame.collect()}
            return orig_body(epoch, updates_pdfs, batch_id, query_id, pd_mod)

        store._commit_pandas_body = spying_body
        store.commit_pandas(
            1, {"g": pd.DataFrame({"key": ["a", "b"], "value": [3.0, 4.0]})}
        )
        assert seen == {"eff": 1, "rows": {"a": 3.0, "b": 4.0}}
        assert store._inflight is None


    def test_multi_namespace_overlay(self, spark, tmp_path):
        """An epoch updating TWO namespaces exposes both in the PL0
        view mid-commit, and a namespace untouched this epoch reads its
        committed snapshot (no overlay entry)."""
        store = StateStore(spark, root=str(tmp_path / "m"), durable=True)
        for ns in ("g", "h", "idle"):
            store.register(Namespace(ns, "double", 0.0))
        store.commit(
            0,
            {
                "g": _upd(spark, [("a", 1.0)]),
                "h": _upd(spark, [("x", 10.0)]),
                "idle": _upd(spark, [("z", 5.0)]),
            },
            None,
        )
        in_marker, release = threading.Event(), threading.Event()
        orig = store._write_marker

        def slow_marker(*args, **kwargs):
            in_marker.set()
            assert release.wait(timeout=120)
            return orig(*args, **kwargs)

        store._write_marker = slow_marker
        t = threading.Thread(
            target=lambda: store.commit(
                1,
                {"g": _upd(spark, [("a", 2.0)]), "h": _upd(spark, [("y", 20.0)])},
                None,
            ),
            daemon=True,
        )
        t.start()
        try:
            assert in_marker.wait(timeout=120)
            fg, eg = store.read_uncommitted("g")
            fh, eh = store.read_uncommitted("h")
            fi, _ei = store.read_uncommitted("idle")
            assert eg == eh == 1
            assert {r["key"]: r["value"] for r in fg.collect()} == {"a": 2.0}
            assert {r["key"]: r["value"] for r in fh.collect()} == {
                "x": 10.0,
                "y": 20.0,
            }
            assert {r["key"]: r["value"] for r in fi.collect()} == {"z": 5.0}
        finally:
            release.set()
            t.join(timeout=120)
            store._write_marker = orig


class TestEnvFreshness:
    def test_validation(self, spark):
        env = TxEnvironment(spark)
        env.create_namespace("balances", "double", 100.0)
        with pytest.raises(ValueError, match="cannot pin"):
            env.query_keys("balances", ["a1"], epoch=0, freshness="uncommitted")
        with pytest.raises(ValueError, match="freshness"):
            env.query_predicate("balances", "value > 0", freshness="dirty")

    def test_uncommitted_never_shows_aborted_writes(self, spark, tmp_path):
        """End-to-end through the runner on the durable path: an
        overdraft txn aborts during the epoch; a PL0 read taken INSIDE
        the commit window (marker-write hook, same thread — no lock to
        deadlock on) must equal the eventual committed state, i.e. the
        aborted write is invisible even to uncommitted reads."""
        env = TxEnvironment(
            spark, isolation="PL3", durable=True, store_dir=str(tmp_path / "bank")
        )
        env.create_namespace("balances", "double", 100.0, invariant="value >= 0")
        g = (
            env.graph()
            .flat_map(
                lambda df: F.array(
                    F.struct(
                        F.col("from_account").alias("account"),
                        (-F.col("amount")).alias("delta"),
                    ),
                    F.struct(
                        F.col("to_account").alias("account"),
                        F.col("amount").alias("delta"),
                    ),
                )
            )
            .state(
                "balances",
                key=lambda df: F.col("account"),
                update=lambda v: v + F.col("delta"),
            )
        )
        runner = env.runner(g)
        store = env.store
        captured: dict = {}
        orig = store._write_marker

        def capturing_marker(*args, **kwargs):
            frame = env.query_keys(
                "balances", ["a1", "a2", "a3", "a4"], freshness="uncommitted"
            )
            captured["rows"] = {r["key"]: r["value"] for r in frame.collect()}
            captured["watermark"] = env.watermark()
            # the SQL surface binds its views to the same PL0 overlay
            captured["sql_sum"] = env.sql(
                "SELECT CAST(sum(value) AS BIGINT) AS s FROM state_balances",
                freshness="uncommitted",
            ).collect()[0]["s"]
            return orig(*args, **kwargs)

        store._write_marker = capturing_marker
        try:
            batch = spark.createDataFrame(
                [
                    (1, "a1", "a2", 30.0),  # commits
                    (2, "a3", "a4", 500.0),  # overdraft -> aborts
                ],
                "_tid long, from_account string, to_account string, amount double",
            )
            runner.run_epoch(batch)
        finally:
            store._write_marker = orig
        # the PL0 read happened before the marker (watermark still -1)
        assert captured["watermark"] == -1
        # money conservation held in the mid-commit PL0 SQL view: only
        # the two touched accounts existed, 70 + 130
        assert captured["sql_sum"] == 200
        committed = {
            r["key"]: r["value"]
            for r in env.query_keys("balances", ["a1", "a2", "a3", "a4"]).collect()
        }
        assert captured["rows"] == committed
        assert committed.get("a1") == 70.0 and committed.get("a2") == 130.0
        # aborted txn's accounts were never created/touched
        assert "a3" not in committed or committed["a3"] == 100.0
        assert "a4" not in committed or committed["a4"] == 100.0
