"""links_cover_tids / part-0 drop (round-9 lever 1): when every txn
provably reaches a state stage, the fused driver pull derives the epoch
tid set from the links instead of a second source scan — semantics must
be bit-identical to the part-0 path, and graphs that CAN drop txns
(filter, t_window, data-dependent flat_map) must keep the branch so
dropped txns still vote COMMIT.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from t_spoon_spark.tx import TxEnvironment
from t_spoon_spark.tx import graph as G

from test_tx_core import bank_env, transfer_graph, transfers_df


def _src(spark):
    return spark.createDataFrame(
        [(i, f"a{i}", f"b{i}", 1.0) for i in range(3)],
        "_tid long, from_account string, to_account string, amount double",
    ).select(
        "*",
        F.col("_tid").alias("_ts"),
        F.array().cast("array<int>").alias("_path"),
        F.lit(True).alias("_alive"),
    )


def _state():
    return G.StateStage("ns", key=lambda d: F.col("account"), update=lambda v: v)


def _total_fm():
    return G.FlatMapStage(
        lambda d: F.array(
            F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
            F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
        )
    )


def test_links_cover_tids_shapes(spark):
    df = _src(spark)
    # literal-arity flat_map -> provably total
    assert G.flat_map_total(df, _total_fm())
    # data-dependent array -> not provable
    seq = G.FlatMapStage(
        lambda d: F.transform(
            F.sequence(F.lit(0), F.col("amount").cast("int")),
            lambda i: F.struct(i.alias("n")),
        )
    )
    assert not G.flat_map_total(df, seq)
    assert G.links_cover_tids(G.TGraph([_total_fm(), _state()]), df)
    assert not G.links_cover_tids(G.TGraph([seq, _state()]), df)
    # filter BEFORE the first state can drop a txn's links
    filt = G.FilterStage(lambda d: F.col("amount") > 0)
    assert not G.links_cover_tids(G.TGraph([filt, _total_fm(), _state()]), df)
    # ... but AFTER the first state it cannot remove the link
    assert G.links_cover_tids(G.TGraph([_total_fm(), _state(), filt]), df)
    # map before flat_map: introspection sees the mapped columns
    mapped = G.TGraph(
        [
            G.MapStage(
                lambda d: {
                    "from_account": F.col("from_account"),
                    "to_account": F.col("to_account"),
                    "amount": F.col("amount") * 2,
                }
            ),
            _total_fm(),
            _state(),
        ]
    )
    assert G.links_cover_tids(mapped, df)
    # no state stage at all -> nothing to cover from
    assert not G.links_cover_tids(G.TGraph([_total_fm()]), df)


def _run_bank(spark, force_part0: bool):
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    if force_part0:
        # pin the pre-round-9 behavior: pull the tid set via the part-0
        # union branch even though the graph is covered
        runner._tids_covered = False
    # a3 overdraws (abort), a0->a1 chains, t3 rides a replay-able mix
    batch = transfers_df(
        spark,
        [
            ("a0", "a1", 30.0),
            ("a1", "a2", 120.0),   # needs t0's credit on a1
            ("a3", "a4", 500.0),   # clean abort (overdraw)
            ("a2", "a0", 60.0),    # reads a2 after t1
        ],
    )
    res = runner.run_epoch(batch)
    votes = {r["_tid"]: r["vote"] for r in res.results.select("_tid", "vote").collect()}
    balances = {
        r["key"]: r["value"] for r in env.query_predicate("balances", "TRUE").collect()
    }
    return votes, balances


def test_covered_matches_part0_semantics(spark):
    v_new, b_new = _run_bank(spark, force_part0=False)
    v_old, b_old = _run_bank(spark, force_part0=True)
    assert v_new == v_old
    assert b_new == b_old
    assert len(v_new) == 4  # every txn voted, including the abort


def test_uncovered_graph_keeps_dropped_txn_votes(spark):
    """A filter BEFORE state drops txn t1 entirely — its vote must still
    appear (COMMIT, vacuous) via the part-0 tid branch."""
    env = bank_env(spark)
    g = (
        env.graph()
        .filter(lambda df: F.col("amount") < 100.0)
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .state("balances", key=lambda df: F.col("account"), update=lambda v: v + F.col("delta"))
    )
    runner = env.runner(g)
    batch = transfers_df(spark, [("x0", "x1", 10.0), ("x2", "x3", 150.0)])
    res = runner.run_epoch(batch)
    assert runner._tids_covered is False
    votes = {r["_tid"]: r["vote"] for r in res.results.select("_tid", "vote").collect()}
    assert votes == {0: "COMMIT", 1: "COMMIT"}
    balances = {r["key"]: r["value"] for r in env.query_predicate("balances", "TRUE").collect()}
    # the filtered txn wrote nothing
    assert "x2" not in balances and "x3" not in balances
    assert balances["x0"] == 90.0 and balances["x1"] == 110.0


def test_covered_flag_computed_once(spark):
    env = bank_env(spark)
    runner = env.runner(transfer_graph(env))
    assert runner._tids_covered is None
    runner.run_epoch(transfers_df(spark, [("a0", "a1", 5.0)]))
    assert runner._tids_covered is True
    runner.run_epoch(transfers_df(spark, [("a1", "a2", 5.0)]))
    assert runner._tids_covered is True


def test_flat_map_total_probe_battery(spark):
    """The CreateArray probe must return TRUE across the whole battery
    of literal-arity array shapes — not merely leave the engine correct.
    flat_map_total reads Spark JVM internals (_jdf queryExecution +
    getSimpleName string match), and its failure mode is silently
    conservative (False -> keep the part-0 tid branch -> correct but
    slower).  A Spark upgrade that renames the node or changes the
    py4j surface must therefore fail HERE, loudly, instead of quietly
    degrading every covered graph (round-9 verdict 'What's wrong' #1 —
    the same pinning contract as the _chain_update_sql compile checks
    in test_driver_cascade_property)."""
    df = _src(spark)
    battery = [
        # two-struct transfer fan-out (the bank graph's shape)
        _total_fm().fn(df),
        # single-element array
        F.array(F.struct(F.col("from_account").alias("account"))),
        # plain column elements, no structs
        F.array(F.col("amount"), -F.col("amount"), F.col("amount") * 2),
        # literals only
        F.array(F.lit(1), F.lit(2)),
        # nested expressions inside the elements
        F.array(
            F.struct((F.col("amount") + F.lit(1.0)).alias("a")),
            F.struct(F.when(F.col("amount") > 0, F.col("amount")).otherwise(F.lit(0.0)).alias("a")),
        ),
    ]
    for i, arr in enumerate(battery):
        assert G.flat_map_total(df, G.FlatMapStage(lambda d, _a=arr: _a)), (
            f"probe went dark on battery shape {i} — JVM introspection "
            "surface changed; covered graphs silently lost the part-0 drop"
        )
    # and the conservative side stays conservative: data-dependent or
    # possibly-null arrays must NOT be claimed total
    negatives = [
        F.sequence(F.lit(0), F.col("amount").cast("int")).cast("array<int>"),
        F.split(F.col("from_account"), ""),
        F.when(F.col("amount") > 0, F.array(F.lit(1))),  # CaseWhen, nullable
    ]
    for i, arr in enumerate(negatives):
        assert not G.flat_map_total(df, G.FlatMapStage(lambda d, _a=arr: _a)), (
            f"negative shape {i} wrongly claimed total"
        )
