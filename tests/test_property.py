"""Property-based check: random transfer workloads must match the
reference-faithful PL3 simulator (the randomized analogue of the
reference's TotalOrderTest/ConsistencyCheck style).

Few examples, tiny workloads — each example runs real Spark epochs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_tx_core import bank_env, simulate_pl3, transfer_graph, transfers_df

transfer_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # from key idx
        st.integers(min_value=0, max_value=5),  # to key idx
        st.integers(min_value=1, max_value=150),
    ).map(lambda t: (f"k{t[0]}", f"k{(t[1] + 1 + t[0]) % 6}", t[2])),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=transfer_strategy)
def test_random_workload_matches_simulator(spark, rows):
    rows = [(a, b, x) for a, b, x in rows if a != b]
    if not rows:
        return
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    runner.run_to_completion(transfers_df(spark, rows), max_epochs=32)
    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    txns = [(i, [(a, -float(x)), (b, float(x))]) for i, (a, b, x) in enumerate(rows)]
    want, _ = simulate_pl3(txns)
    assert got == want


def test_series_composition_state_window_state(spark):
    """T11 series: state -> per-txn window -> state. The audit
    namespace counts committed transfers per from-account; an abort in
    balances must also roll the audit increment back."""
    env = bank_env(spark)
    g = (
        transfer_graph(env)  # flat_map -> state(balances)
        .t_window(
            lambda items: {
                "from_account": F.element_at(items, 1)["account"],
                "n_moves": F.size(items),
            }
        )
        .state(
            "audit",
            key=lambda df: F.col("from_account"),
            update=lambda v: v + 1,
        )
    )
    env.create_namespace("audit", "int", 0)
    runner = env.runner(g)
    # t1 aborts (a1 would go negative after t0 commits)
    rows = [("a1", "a2", 80.0), ("a1", "a3", 90.0), ("a4", "a5", 10.0)]
    batch = transfers_df(spark, rows)
    epochs = runner.run_to_completion(batch, max_epochs=16)

    votes = {}
    for ep in epochs:
        for r in ep.results.collect():
            if r["vote"] != "REPLAY" or r["_tid"] not in votes:
                votes[r["_tid"]] = r["vote"]
    assert votes == {0: "COMMIT", 1: "ABORT", 2: "COMMIT"}

    audit = {r["key"]: r["value"] for r in env.store.read("audit").collect()}
    # flatMap emits (account=-amt from, +amt to); items[0] is the
    # lineage-first element = the from-movement
    assert audit == {"a1": 1, "a4": 1}  # aborted t1 left no audit row
