"""Durable-store retention horizon (``max_epochs``).

Reference parity: the reference bounds per-key version history via
``maxNoVersions`` (tgraph/state/StateOperator.java:100-101,
tgraph/db/Object.java:253-278); our Spark-native equivalent bounds the
reconstructable epoch horizon of the parquet log/base store.  Round-10
verdict "What's missing" #3 / round-11 "Next round" #1: without the
knob the on-disk footprint grows linearly forever
(tools/store_growth_probe.py BEFORE curve ~17.5 KB/epoch).
"""

from __future__ import annotations

import os

import pytest

from t_spoon_spark.tx.namespace import Namespace
from t_spoon_spark.tx.store import StateStore


def _run_epochs(spark, store, n, start=0, ns="g", batch_query=None):
    for e in range(start, start + n):
        upd = spark.createDataFrame(
            [(f"k{(e * 7 + i) % 50}", float(e * 1000 + i)) for i in range(20)],
            "key string, value double",
        )
        bid, qid = (e, batch_query) if batch_query else (None, None)
        store.commit(e, {ns: upd}, None, batch_id=bid, query_id=qid)


def _epoch_dirs(root, ns, kind):
    d = os.path.join(root, ns, kind)
    if not os.path.isdir(d):
        return []
    return sorted(int(x.split("=")[1]) for x in os.listdir(d) if x.startswith("epoch="))


def _expected_snapshot(upto_epoch):
    """Driver-side oracle: replay the deterministic update stream."""
    state = {}
    for e in range(upto_epoch + 1):
        for i in range(20):
            state[f"k{(e * 7 + i) % 50}"] = float(e * 1000 + i)
    return state


class TestRetentionPrunes:
    def test_footprint_plateaus_and_horizon_reads_exact(self, spark, tmp_path):
        root = str(tmp_path / "bounded")
        store = StateStore(
            spark, root=root, durable=True, checkpoint_every=4, max_epochs=8
        )
        store.register(Namespace("g", "double", 0.0))
        _run_epochs(spark, store, 40)

        horizon = 40 - 1 - 8 + 1  # committed=39, max_epochs=8 -> 32
        logs = _epoch_dirs(root, "g", "log")
        bases = _epoch_dirs(root, "g", "base")
        # anchor base = newest base <= horizon (multiples of 4 -> 32);
        # everything strictly older is gone, nothing newer is touched
        assert bases and min(bases) == 32
        assert logs and min(logs) > 32
        assert max(logs) == 39
        # every retained epoch reconstructs exactly (vs driver replay)
        for e in (32, 35, 39):
            got = {
                r["key"]: r["value"] for r in store.read("g", epoch=e).collect()
            }
            assert got == _expected_snapshot(e), f"epoch {e} mismatch"
        # a pruned epoch refuses loudly instead of answering from a
        # truncated log chain
        with pytest.raises(KeyError, match="retention horizon"):
            store.read("g", epoch=10)

    def test_footprint_bounded_vs_unbounded(self, spark, tmp_path):
        import t_spoon_spark.tx.store as store_mod

        sizes = {}
        for label, max_epochs in (("unbounded", None), ("bounded", 6)):
            root = str(tmp_path / label)
            st = StateStore(
                spark,
                root=root,
                durable=True,
                checkpoint_every=3,
                max_epochs=max_epochs,
            )
            st.register(Namespace("g", "double", 0.0))
            _run_epochs(spark, st, 36)
            sizes[label] = store_mod._dir_bytes(root)
        # same workload, same cadence: retention must cut the footprint
        # materially (36 epochs vs a ~9-epoch reconstructable window)
        assert sizes["bounded"] < 0.55 * sizes["unbounded"], sizes

    def test_sparse_bases_keep_all_loadbearing_logs(self, spark, tmp_path):
        # cadence longer than the run: the only base is the epoch-0 one
        # (0 % cadence == 0 always), so it is the anchor forever — log 0
        # is absorbed by it, and every later log stays load-bearing for
        # the retained horizon no matter how far committed advances
        # (correctness over space)
        root = str(tmp_path / "sparse")
        store = StateStore(
            spark, root=root, durable=True, checkpoint_every=100, max_epochs=3
        )
        store.register(Namespace("g", "double", 0.0))
        _run_epochs(spark, store, 8)
        assert _epoch_dirs(root, "g", "base") == [0]
        assert _epoch_dirs(root, "g", "log") == list(range(1, 8))
        got = {r["key"]: r["value"] for r in store.read("g", epoch=7).collect()}
        assert got == _expected_snapshot(7)

    def test_default_is_unbounded(self, spark, tmp_path):
        root = str(tmp_path / "default")
        store = StateStore(spark, root=root, durable=True, checkpoint_every=4)
        store.register(Namespace("g", "double", 0.0))
        _run_epochs(spark, store, 20)
        # durable mode logs every epoch; with no max_epochs none prune
        assert _epoch_dirs(root, "g", "log") == list(range(20))
        got = {r["key"]: r["value"] for r in store.read("g", epoch=2).collect()}
        assert got == _expected_snapshot(2)

    def test_invalid_max_epochs_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="max_epochs"):
            StateStore(spark, root=str(tmp_path / "x"), durable=True, max_epochs=0)

    def test_max_epochs_requires_durable(self, spark, tmp_path):
        # ADVICE r12: silently ignoring the retention knob on the
        # in-memory store hands the caller unbounded behavior
        with pytest.raises(ValueError, match="durable"):
            StateStore(spark, root=str(tmp_path / "y"), durable=False, max_epochs=4)

    def test_history_window_below_horizon_refuses_loudly(self, spark, tmp_path):
        # ADVICE r12 (medium): with max_epochs <= history_epochs an epoch
        # sits in the in-memory history window yet below the retention
        # horizon; its pinned frame's lineage roots at a base
        # _gc_retention pruned.  read() must refuse with the documented
        # KeyError, not return a frame that throws FileNotFoundException
        # at action time.
        root = str(tmp_path / "histbelow")
        store = StateStore(
            spark,
            root=root,
            durable=True,
            checkpoint_every=2,
            max_epochs=4,
            history_epochs=4,
        )
        store.register(Namespace("g", "double", 0.0))
        _run_epochs(spark, store, 20)
        # committed=19, horizon=16; epoch 15 is history-resident
        # (cutoff 15) but below the horizon — and its frame roots at
        # base 14, which the horizon-16 anchor (base 16) pruned
        assert ("g", 15) in store._history
        assert 14 not in _epoch_dirs(root, "g", "base")
        with pytest.raises(KeyError, match="retention horizon"):
            store.read("g", epoch=15)
        # every epoch inside the horizon still reads exactly
        for e in (16, 17, 18, 19):
            got = {
                r["key"]: r["value"] for r in store.read("g", epoch=e).collect()
            }
            assert got == _expected_snapshot(e), f"epoch {e} mismatch"


class TestRetentionRecovery:
    def test_recovery_and_pruned_marker_frontiers(self, spark, tmp_path):
        root = str(tmp_path / "recover")
        store = StateStore(
            spark, root=root, durable=True, checkpoint_every=4, max_epochs=5
        )
        store.register(Namespace("g", "double", 0.0))
        # query A commits early then goes quiet; query B keeps going.
        # A's markers fall past the horizon — its frontier must survive
        # via _horizon.json or a crash-redelivered A batch double-applies.
        _run_epochs(spark, store, 6, start=0, batch_query="qA")
        _run_epochs(spark, store, 18, start=6, batch_query="qB")
        assert store.batch_frontiers == {"qA": 5, "qB": 23}

        re = StateStore(
            spark, root=root, durable=True, checkpoint_every=4, max_epochs=5
        )
        re.register(Namespace("g", "double", 0.0))
        assert re.committed_epoch() == 23
        assert re.batch_frontiers["qA"] == 5
        assert re.batch_frontiers["qB"] == 23
        got = {r["key"]: r["value"] for r in re.read("g").collect()}
        assert got == _expected_snapshot(23)

    def test_unreadable_marker_kept_and_recovery_survives(self, spark, tmp_path):
        # ADVICE r12: an unreadable below-horizon marker must NOT be
        # treated as {} and deleted — that silently loses its query's
        # batch frontier, so a crash-redelivered batch could double-apply.
        # Retention keeps it (retried each commit); recovery tolerates it.
        root = str(tmp_path / "corrupt")
        store = StateStore(
            spark, root=root, durable=True, checkpoint_every=4, max_epochs=5
        )
        store.register(Namespace("g", "double", 0.0))
        _run_epochs(spark, store, 4, start=0, batch_query="qA")
        # damage epoch 2's marker before the horizon passes it
        marker2 = os.path.join(root, "_commits", f"{2:012d}.json")
        with open(marker2, "w") as f:
            f.write("{not json")
        _run_epochs(spark, store, 16, start=4, batch_query="qB")
        # horizon = 19 - 5 + 1 = 15: readable old markers folded+deleted,
        # the damaged one stays on disk for retry
        assert os.path.exists(marker2)
        remaining = sorted(
            f for f in os.listdir(os.path.join(root, "_commits"))
            if f.endswith(".json") and not f.startswith("_")
        )
        assert remaining[0] == f"{2:012d}.json"
        assert int(remaining[1].split(".")[0]) >= 15
        # qA's frontier survived via the readable markers (3 > 2)
        re = StateStore(
            spark, root=root, durable=True, checkpoint_every=4, max_epochs=5
        )
        re.register(Namespace("g", "double", 0.0))
        assert re.committed_epoch() == 19
        assert re.batch_frontiers["qA"] == 3
        assert re.batch_frontiers["qB"] == 19
        got = {r["key"]: r["value"] for r in re.read("g").collect()}
        assert got == _expected_snapshot(19)
