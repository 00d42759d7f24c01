"""Transactional core goldens — mirrors the reference's FunctionsTest
(tgraph/functions/FunctionsTest.java:39-147) and the bank-transfer
consistency programs (evaluation/ConsistencyCheck.java:101-126,
BankUseCase --check).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from t_spoon_spark.tx import TxEnvironment


def bank_env(spark, isolation="PL3", **kw):
    env = TxEnvironment(spark, isolation=isolation, **kw)
    env.create_namespace(
        "balances",
        value_type="double",
        default=100.0,
        invariant="value >= 0",
        py_invariant=lambda v: v >= 0,
    )
    return env


def transfer_graph(env):
    # transfer -> flatMap into (account, ±amount) movements -> state
    # (evaluation/BankUseCase.java:82-93)
    return (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(
                    F.col("from_account").alias("account"),
                    (-F.col("amount")).alias("delta"),
                ),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .state("balances", key=lambda df: F.col("account"), update=lambda v: v + F.col("delta"))
    )


def transfers_df(spark, rows):
    return spark.createDataFrame(
        [(f"t{i}", a, b, float(x), i) for i, (a, b, x) in enumerate(rows)],
        "transfer_id string, from_account string, to_account string, amount double, _tid long",
    )


# --- FunctionsTest-style operator goldens --------------------------------


def test_map_golden(spark):
    env = TxEnvironment(spark)
    g = env.graph().map(lambda df: {"x": F.col("x") * 2})
    batch = spark.createDataFrame([(i,) for i in range(1, 6)], "x int")
    res = env.runner(g).run_epoch(batch)
    vals = sorted(r["x"] for r in res.stream.collect())
    assert vals == [2, 4, 6, 8, 10]
    assert res.results.count() == 5
    assert {r["vote"] for r in res.results.collect()} == {"COMMIT"}


def test_flatmap_golden(spark):
    # flatMap range(e) on [2,3,2,1] -> 8 children with lineage positions
    # (FunctionsTest golden: tids [1,1,2,2,2,3,3,4])
    env = TxEnvironment(spark)
    g = env.graph().flat_map(
        lambda df: F.transform(F.sequence(F.lit(0), F.col("e") - 1), lambda i: F.struct(i.alias("v")))
    )
    batch = spark.createDataFrame([(2,), (3,), (2,), (1,)], "e int").withColumn(
        "_tid", F.monotonically_increasing_id()
    )
    res = env.runner(g).run_epoch(batch)
    rows = res.stream.select("_tid", "_path", "v").collect()
    assert len(rows) == 8
    by_tid = {}
    for r in rows:
        by_tid.setdefault(r["_tid"], []).append(list(r["_path"]))
    sizes = sorted(len(v) for v in by_tid.values())
    assert sizes == [1, 2, 2, 3]
    for paths in by_tid.values():
        assert sorted(p[0] for p in paths) == list(range(len(paths)))


def test_filter_tombstones_not_dropped(spark):
    env = TxEnvironment(spark)
    g = env.graph().filter(lambda df: F.col("x") % 2 == 0)
    batch = spark.createDataFrame([(i,) for i in range(1, 11)], "x int")
    res = env.runner(g).run_epoch(batch)
    stream = res.stream.collect()
    assert len(stream) == 10  # nothing dropped
    assert sum(1 for r in stream if r["_alive"]) == 5
    assert res.results.count() == 10  # every txn still closes


def test_t_window_pairs_transaction_records(spark):
    # per-transaction window: both movements of one transfer reduce to
    # their sum (TransferMerger-style, evaluation/EvaluationGraphComposer.java:96-126)
    env = TxEnvironment(spark)
    g = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct((-F.col("amount")).alias("m")),
                F.struct(F.col("amount").alias("m")),
            )
        )
        .t_window(
            lambda items: {
                "net": F.aggregate(items, F.lit(0.0), lambda acc, s: acc + s["m"]),
                "n": F.size(items),
            }
        )
    )
    batch = spark.createDataFrame([(10.0,), (25.0,)], "amount double")
    res = env.runner(g).run_epoch(batch)
    rows = res.stream.collect()
    assert len(rows) == 2
    assert all(r["net"] == 0.0 and r["n"] == 2 for r in rows)
    assert all(list(r["_path"]) == [] for r in rows)  # BatchID reset


# --- bank workload: PL3 semantics vs python oracle ------------------------


def simulate_pl3(txns, default=100.0):
    """Reference-faithful simulator: per epoch, min-tid-wins per key;
    partial winners REPLAY; full winners commit iff every per-key
    invariant holds (else ABORT). Returns (balances, votes)."""
    balances: dict[str, float] = {}
    votes: dict[int, str] = {}
    pending = sorted(txns, key=lambda t: t[0])
    while pending:
        min_tid = {}
        for tid, ops in pending:
            for k, _ in ops:
                min_tid[k] = min(min_tid.get(k, tid), tid)
        nxt = []
        for tid, ops in pending:
            if all(min_tid[k] == tid for k, _ in ops):
                by_key: dict[str, float] = {}
                for k, d in ops:
                    by_key[k] = by_key.get(k, balances.get(k, default)) + d
                if all(v >= 0 for v in by_key.values()):
                    balances.update(by_key)
                    votes[tid] = "COMMIT"
                else:
                    votes[tid] = "ABORT"
            else:
                votes[tid] = "REPLAY"
                nxt.append((tid, ops))
        pending = nxt
    return balances, votes


BANK_CASES = [
    # disjoint keys, all commit
    [("a1", "a2", 30), ("a3", "a4", 50)],
    # conflicting keys -> replay then commit
    [("a1", "a2", 30), ("a2", "a3", 150), ("a1", "a3", 20)],
    # invariant abort (would drive a1 negative after first two commit)
    [("a1", "a2", 80), ("a1", "a3", 90), ("a2", "a1", 10)],
    # chain of conflicts on one hot key
    [("h", "x1", 10), ("h", "x2", 10), ("h", "x3", 95), ("x1", "h", 5)],
]


@pytest.mark.parametrize("case", range(len(BANK_CASES)))
def test_bank_matches_oracle(spark, case):
    rows = BANK_CASES[case]
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    batch = transfers_df(spark, rows)
    epochs = runner.run_to_completion(batch)

    got = {r["key"]: r["value"] for r in env.store.read("balances").collect()}
    txns = [
        (i, [(a, -float(x)), (b, float(x))]) for i, (a, b, x) in enumerate(rows)
    ]
    want, want_votes = simulate_pl3(txns)
    assert got == want

    # final (non-REPLAY) vote per txn across epochs matches
    final_votes = {}
    for ep in epochs:
        for r in ep.results.collect():
            if r["vote"] != "REPLAY" or r["_tid"] not in final_votes:
                final_votes[r["_tid"]] = r["vote"]
    want_final = {
        tid: v for tid, v in want_votes.items()
    }
    assert {k: v for k, v in final_votes.items()} == want_final


def test_money_conservation_under_load(spark):
    # ConsistencyCheck invariant: sum(balances) % startAmount == 0 after
    # any committed prefix (evaluation/ConsistencyCheck.java:101-126)
    import random

    rng = random.Random(7)
    keys = [f"a{i}" for i in range(20)]
    rows = []
    for _ in range(60):
        a, b = rng.sample(keys, 2)
        rows.append((a, b, rng.randint(1, 120)))
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    runner.run_to_completion(transfers_df(spark, rows), max_epochs=80)
    total = env.sql("SELECT sum(value) AS s FROM state_balances").collect()[0]["s"]
    n_keys = env.store.read("balances").count()
    assert total == pytest.approx(100.0 * n_keys)


def test_queryable_state(spark):
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    runner.run_to_completion(transfers_df(spark, [("a1", "a2", 30)]))
    assert env.watermark() == 0
    kq = {r["key"]: r["value"] for r in env.query_keys("balances", ["a1", "a2"]).collect()}
    assert kq == {"a1": 70.0, "a2": 130.0}
    pq = env.query_predicate("balances", "value > 100").collect()
    assert [r["key"] for r in pq] == ["a2"]
    sq = env.sql("SELECT count(*) AS n FROM state_balances WHERE value >= 0").collect()
    assert sq[0]["n"] == 2
