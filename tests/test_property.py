"""Property-based check: random transfer workloads must match the
reference-faithful PL3 simulator (the randomized analogue of the
reference's TotalOrderTest/ConsistencyCheck style).

Few examples by default, tiny workloads — each example runs real Spark
epochs.  Set TSPOON_PROP_EXAMPLES (e.g. 200) for a deep sweep; the
round-7 verdict's abort-cascade divergence was found by this suite at
6 examples/run, so the sweep is the engine's strongest randomized gate.
Votes are checked alongside final balances (the round-7 bug's vote
vector diverged even where gate workloads' balances agreed).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_tx_core import bank_env, simulate_pl3, transfer_graph, transfers_df

N_EXAMPLES = int(os.environ.get("TSPOON_PROP_EXAMPLES", "6"))

_SETTINGS = dict(
    max_examples=N_EXAMPLES,
    deadline=None,
    print_blob=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

transfer_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # from key idx
        st.integers(min_value=0, max_value=5),  # to key idx
        st.integers(min_value=1, max_value=150),
    ).map(lambda t: (f"k{t[0]}", f"k{(t[1] + 1 + t[0]) % 6}", t[2])),
    min_size=1,
    max_size=8,
)


def _final_votes(epochs) -> dict[int, str]:
    votes: dict[int, str] = {}
    for ep in epochs:
        for r in ep.results.collect():
            if r["vote"] != "REPLAY" or r["_tid"] not in votes:
                votes[r["_tid"]] = r["vote"]
    return votes


@settings(**_SETTINGS)
@given(rows=transfer_strategy)
def test_random_workload_matches_simulator(spark, rows):
    rows = [(a, b, x) for a, b, x in rows if a != b]
    if not rows:
        return
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    epochs = runner.run_to_completion(transfers_df(spark, rows), max_epochs=32)
    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    txns = [(i, [(a, -float(x)), (b, float(x))]) for i, (a, b, x) in enumerate(rows)]
    want, want_votes = simulate_pl3(txns)
    assert got == want
    assert _final_votes(epochs) == {
        t: v for t, v in want_votes.items() if v != "REPLAY"
    }


# --- mixed transfers + SPU commands ---------------------------------------

spu_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key idx
        st.booleans(),  # deposit / withdrawal
        st.integers(min_value=1, max_value=150),
    ),
    min_size=0,
    max_size=6,
)


def simulate_mixed(rows, spus, default=100.0):
    """Extended simulator: serial tid-order transfer replay (simulate_pl3)
    then per-key SPU fold in spu_id order over the committed snapshot —
    the epoch model applies SPUs after the epoch's transactional writes
    (runner._apply_spus, reference tgraph/db/Shard.java:113-154).
    Aborted SPU commands leave the chain value untouched."""
    txns = [(i, [(a, -float(x)), (b, float(x))]) for i, (a, b, x) in enumerate(rows)]
    bal, votes = simulate_pl3(txns, default)
    spu_votes: dict[str, str] = {}
    for i, (k, dep, amt) in enumerate(spus):  # spu_id order == list order
        key = f"k{k}"
        cur = bal.get(key, default)
        cand = cur + float(amt) if dep else cur - float(amt)
        if cand >= 0:
            bal[key] = cand
            spu_votes[f"s{i:03d}"] = "COMMIT"
        else:
            spu_votes[f"s{i:03d}"] = "ABORT"
    return bal, votes, spu_votes


@settings(**_SETTINGS)
@given(rows=transfer_strategy, spus=spu_strategy)
def test_random_mixed_spu_transfer_matches_simulator(spark, rows, spus):
    rows = [(a, b, x) for a, b, x in rows if a != b]
    if not rows and not spus:
        return
    env = bank_env(spark)
    ns = env.namespaces["balances"]
    ns.commands["deposit"] = lambda cur, amt: cur + amt
    ns.commands["withdrawal"] = lambda cur, amt: cur - amt
    runner = env.runner(transfer_graph(env))
    spu_df = (
        spark.createDataFrame(
            [
                (f"s{i:03d}", "balances", f"k{k}", "deposit" if dep else "withdrawal", [float(amt)])
                for i, (k, dep, amt) in enumerate(spus)
            ],
            "spu_id string, namespace string, key string, method string, args array<double>",
        )
        if spus
        else None
    )
    # an SPU-only epoch still needs a typed (empty) batch — the runner's
    # contract (see txn_spu_final_balances) is batch-or-replays, and the
    # graph derives its op schema from the batch frame
    batch = transfers_df(spark, rows)
    res = runner.run_epoch(batch, spus=spu_df)
    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    want, _, want_spu = simulate_mixed(rows, spus)
    assert got == want
    if spu_df is not None:
        got_spu = {r["spu_id"]: r["vote"] for r in res.spu_results.collect()}
        assert got_spu == want_spu


def test_spu_only_epoch(spark):
    """Deterministic pin of the sweep-found edge: an epoch whose batch
    is EMPTY (typed) but that carries SPU commands must apply them —
    the engine contract is batch-or-replays, with SPU-only traffic
    riding an empty typed frame (as txn_spu_final_balances does)."""
    env = bank_env(spark)
    ns = env.namespaces["balances"]
    ns.commands["deposit"] = lambda cur, amt: cur + amt
    ns.commands["withdrawal"] = lambda cur, amt: cur - amt
    runner = env.runner(transfer_graph(env))
    spu_df = spark.createDataFrame(
        [("s000", "balances", "k0", "withdrawal", [1.0])],
        "spu_id string, namespace string, key string, method string, args array<double>",
    )
    res = runner.run_epoch(transfers_df(spark, []), spus=spu_df)
    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    assert got == {"k0": 99.0}
    assert [r["vote"] for r in res.spu_results.collect()] == ["COMMIT"]


# --- two namespaces in series (cross-namespace abort propagation) ---------

AUDIT_CAP = 2


def simulate_two_ns(rows, default=100.0, cap=AUDIT_CAP):
    """Serial tid-order replay over TWO namespaces: a txn commits iff
    its balance movements keep every touched balance >= 0 AND the
    from-account's audit counter stays <= cap; committed txns apply
    both. The engine realizes this as state(balances) -> t_window ->
    state(audit) with the global vote = lattice MAX across stages."""
    bal: dict[str, float] = {}
    audit: dict[str, int] = {}
    votes: dict[int, str] = {}
    for tid, (a, b, x) in enumerate(rows):
        by = {a: bal.get(a, default) - float(x)}
        by[b] = by.get(b, bal.get(b, default)) + float(x)
        n = audit.get(a, 0) + 1
        if all(v >= 0 for v in by.values()) and n <= cap:
            bal.update(by)
            audit[a] = n
            votes[tid] = "COMMIT"
        else:
            votes[tid] = "ABORT"
    return bal, audit, votes


@settings(**_SETTINGS)
@given(rows=transfer_strategy)
def test_random_two_namespace_matches_simulator(spark, rows):
    rows = [(a, b, x) for a, b, x in rows if a != b]
    if not rows:
        return
    env = bank_env(spark)
    env.create_namespace(
        "audit",
        "int",
        0,
        invariant=f"value <= {AUDIT_CAP}",
        py_invariant=lambda v: v <= AUDIT_CAP,
    )
    g = (
        transfer_graph(env)
        .t_window(
            lambda items: {
                "from_account": F.element_at(items, 1)["account"],
            }
        )
        .state(
            "audit",
            key=lambda df: F.col("from_account"),
            update=lambda v: v + 1,
        )
    )
    runner = env.runner(g)
    epochs = runner.run_to_completion(transfers_df(spark, rows), max_epochs=32)
    got_bal = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    got_audit = {r["key"]: r["value"] for r in env.store.read("audit").collect()}
    want_bal, want_audit, want_votes = simulate_two_ns(rows)
    assert got_bal == want_bal
    assert got_audit == want_audit
    assert _final_votes(epochs) == want_votes


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
