"""Chained PL3/PL4 semantics: intra-epoch serial-in-tid-order
application (replacing min-tid-wins replay storms) and PL4 strictness.

Reference parity: the final state/votes must equal serial execution in
tid order with committed-only visibility — the fixpoint the reference
reaches through optimistic execution + REPLAY
(tgraph/twopc/OpenOperator.java:287-357); PL4 strictness additionally
pins the external order to tid order
(tgraph/twopc/StrictnessEnforcer.java:27-118).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from t_spoon_spark.tx import TxEnvironment
from tests.test_tx_core import bank_env, simulate_pl3, transfer_graph, transfers_df


def test_hot_key_drains_in_one_epoch(spark):
    """40 txns over 20 hot keys (the gate fixture's contention shape):
    chained application resolves every conflict inside one epoch — the
    old min-tid-wins design needed one epoch per queued conflict."""
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    rows = [(f"h{i % 20}", f"h{(i * 3 + 7) % 20}", 5) for i in range(40)]
    rows = [(a, b, x) for a, b, x in rows if a != b]
    epochs = runner.run_to_completion(transfers_df(spark, rows), max_epochs=4)
    assert len(epochs) == 1  # O(1) drain, not O(conflicts)

    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    txns = [(i, [(a, -float(x)), (b, float(x))]) for i, (a, b, x) in enumerate(rows)]
    want, _ = simulate_pl3(txns)
    assert got == want


def test_zipf_skew_single_epoch(spark):
    """Zipf-ish skew: half of all transfers touch one hot key. The
    chained fold serializes the hot chain inside one task and one epoch;
    min-tid-wins would have needed ~n_hot epochs (replay storm)."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append(("hot", f"c{rng.randrange(30)}", rng.randint(1, 3)))
        else:
            rows.append((f"c{rng.randrange(30)}", "hot", rng.randint(1, 3)))
    rows = [(a, b, x) for a, b, x in rows if a != b]
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    epochs = runner.run_to_completion(transfers_df(spark, rows), max_epochs=4)
    assert len(epochs) == 1

    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    txns = [(i, [(a, -float(x)), (b, float(x))]) for i, (a, b, x) in enumerate(rows)]
    want, _ = simulate_pl3(txns)
    assert got == want


@pytest.mark.parametrize("isolation", ["PL3", "PL4"])
def test_strict_tid_order_outcome(spark, isolation):
    """Distinguishes strict (tid-order) execution from mere
    serializability: deposits with a cap invariant. Serial order
    t0,t1,t2 gives votes C,A,C and final 130; a merely-serializable
    engine could pick order t1,t2,t0 (A=200 violates only in one
    order) and return votes A,C,C with final 130 — same state,
    different external order. PL4 requires the tid order; our chained
    application gives it at PL3 too (stricter than required is
    permitted — the PL hierarchy is an inclusion of allowed histories).
    """
    env = TxEnvironment(spark, isolation=isolation)
    env.create_namespace(
        "caps", "double", 0.0, invariant="value <= 150", py_invariant=lambda v: v <= 150
    )
    g = env.graph().state(
        "caps", key=lambda df: F.col("k"), update=lambda v: v + F.col("amt")
    )
    batch = spark.createDataFrame(
        [("x", 100.0, 0), ("x", 100.0, 1), ("x", 30.0, 2)], "k string, amt double, _tid long"
    )
    epochs = env.runner(g).run_to_completion(batch)
    assert len(epochs) == 1
    votes = {r["_tid"]: r["vote"] for r in epochs[0].results.select("_tid", "vote").collect()}
    assert votes == {0: "COMMIT", 1: "ABORT", 2: "COMMIT"}  # strict tid order
    got = {r["key"]: r["value"] for r in env.store.read("caps").collect()}
    assert got == {"x": 130.0}


def test_cross_key_abort_cascade(spark):
    """A txn whose withdrawal fails must not leave its deposit in a
    later txn's chain: t1 (a1->a3, 150) aborts on a1; t2 withdraws 120
    from a3 and must abort too (a3 never had t1's 150)."""
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    rows = [("a1", "a3", 150), ("a3", "a2", 120)]
    epochs = runner.run_to_completion(transfers_df(spark, rows))
    votes = {r["_tid"]: r["vote"] for r in epochs[0].results.select("_tid", "vote").collect()}
    assert votes == {0: "ABORT", 1: "ABORT"}
    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    assert got == {}  # nothing committed


def test_pl4_votes_frame_matches_results(spark):
    env = bank_env(spark, isolation="PL4")
    runner = env.runner(transfer_graph(env))
    res = runner.run_epoch(transfers_df(spark, [("a1", "a2", 30), ("a2", "a3", 160)]))
    assert res.vote_counts() == {"COMMIT": 1, "ABORT": 1}
    from_results = {r["vote"] for r in res.results.select("vote").collect()}
    assert from_results == {"COMMIT", "ABORT"}
