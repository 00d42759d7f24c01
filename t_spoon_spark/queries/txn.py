"""Transactional-engine queries for the correctness gate.

Each entry runs a real TGraph over transfers/SPUs derived
deterministically from the events table, then returns the committed
snapshot as a DataFrame.

Oracle trick: amounts are FLOOR(value) (integer-valued doubles), so
balances are exact integers regardless of summation order, and the
associative epoch fold (state(epoch_combine=True)) equals a plain
GROUP BY sum — giving the transactional path a bit-exact ANSI-SQL twin.
The PL3 invariant/abort/replay semantics are SQL-expressible too, just
not as plain aggregation: since round 6 every txn_* entry (including
the PL3 vote entry) carries a recursive-CTE serial-replay oracle that
re-executes the epoch's transfers in tid order with the same
invariant/abort rules, so the driver records a full exact-hash check —
all 160 registry entries have oracles (registry.all_oracles()).  The
engine is additionally verified by the Python-simulated oracle in
tests/test_tx_core.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register
from t_spoon_spark.tx import TxEnvironment

KEYSPACE = 50


def _transfers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("_tid"),
        F.concat(F.lit("a"), (F.col("user_id") % KEYSPACE).cast("string")).alias("from_account"),
        F.concat(F.lit("a"), ((F.col("user_id") * 7 + 3) % KEYSPACE).cast("string")).alias(
            "to_account"
        ),
        F.floor(F.col("value")).cast("double").alias("amount"),
    )


def _bank_graph(env: TxEnvironment):
    return (
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
            epoch_combine=True,
        )
    )


def _bank_graph_txn(env: TxEnvironment):
    # per-transaction conflict semantics (no epoch fold) — used by the
    # PL3 vote-accounting entry
    return (
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


@register(
    "txn_bank_balances_fold",
    f"""
    WITH movements AS (
      SELECT 'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS account,
             -FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS account,
             FLOOR(value) AS delta
      FROM events
    )
    SELECT account AS key,
           CAST(100 + SUM(delta) AS BIGINT) AS balance_c
    FROM movements
    GROUP BY account
    ORDER BY key
    """,
)
def txn_bank_balances_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full open→flatMap→state→close→snapshot cycle with the
    associative epoch fold (no invariant): every transaction commits
    and the committed snapshot equals the grouped sum — the SQL twin
    proves the transactional plumbing end to end."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0)
    runner = env.runner(_bank_graph(env))
    runner.run_to_completion(_transfers(spark, sf_dir))
    snap = env.store.read("balances")
    return snap.select("key", F.col("value").cast("bigint").alias("balance_c")).orderBy("key")


@register(
    "txn_bank_votes_pl3",
    """
    WITH RECURSIVE txn AS (
      SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS step,
             event_id AS tid,
             CAST(event_id % 20 AS INT) AS f,
             CAST((event_id * 3 + 7) % 20 AS INT) AS tt,
             FLOOR(value) AS amt
      FROM events WHERE event_id < 40
    ),
    replay AS (
      SELECT CAST(0 AS BIGINT) AS step,
             CAST(NULL AS BIGINT) AS tid,
             CAST(NULL AS VARCHAR) AS vote,
             [100.0 FOR i IN range(20)] AS bal
      UNION ALL
      SELECT t.step, t.tid,
             CASE WHEN r.bal[t.f+1] - t.amt >= 0 AND r.bal[t.tt+1] + t.amt >= 0
                  THEN 'COMMIT' ELSE 'ABORT' END,
             CASE WHEN r.bal[t.f+1] - t.amt >= 0 AND r.bal[t.tt+1] + t.amt >= 0
                  THEN [CASE WHEN i = t.f THEN r.bal[i+1] - t.amt
                             WHEN i = t.tt THEN r.bal[i+1] + t.amt
                             ELSE r.bal[i+1] END FOR i IN range(20)]
                  ELSE r.bal END
      FROM replay r JOIN txn t ON t.step = r.step + 1
    )
    SELECT tid, vote FROM replay WHERE step > 0 ORDER BY tid
    """,
)
def txn_bank_votes_pl3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PL3 with the `value >= 0` invariant over a small high-contention
    keyspace: per-transaction final vote (COMMIT/ABORT) after the abort/
    replay queue drains. The epoch protocol (min-tid-wins per key,
    partial winners REPLAY — tgraph/state/PL3Strategy.java:9-13,
    tgraph/twopc/OpenOperator.java:287-357) converges to the serial
    tid-order execution where aborted transactions have no effect, so
    the DuckDB twin replays that serial fold with a recursive CTE over
    the 20-key balance vector (validated against the python simulator
    in tests/test_tx_core.py). Epoch/drain accounting is pinned by
    tests, not the oracle."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    runner = env.runner(_bank_graph_txn(env))
    # cap the workload: 40 txns over 20 hot keys => real contention with
    # a bounded drain (a handful of replay epochs)
    transfers = (
        _transfers(spark, sf_dir)
        .filter(F.col("_tid") < 40)
        .withColumn(
            "from_account", F.concat(F.lit("h"), (F.col("_tid") % 20).cast("string"))
        )
        .withColumn(
            "to_account", F.concat(F.lit("h"), ((F.col("_tid") * 3 + 7) % 20).cast("string"))
        )
    )
    epochs = runner.run_to_completion(transfers, max_epochs=128)
    # fold vote accounting over the materialized per-epoch control
    # frames (EpochResult.votes) — a txn votes REPLAY (=2) until its
    # deciding epoch, then exactly one COMMIT (=0) or ABORT (=1), so
    # the final vote is the per-tid MIN over the vote lattice.
    from t_spoon_spark.tx.vote import vote_name

    all_votes = epochs[0].votes
    for ep in epochs[1:]:
        all_votes = all_votes.unionByName(ep.votes)
    return (
        all_votes.groupBy("_tid")
        .agg(F.min("vote").alias("vote"))
        .select(F.col("_tid").alias("tid"), vote_name(F.col("vote")).alias("vote"))
        .orderBy("tid")
    )


@register(
    "txn_cascade_replay_chain",
    """
    WITH RECURSIVE txn AS (
      SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS step,
             event_id AS tid,
             CAST(event_id % 4 AS INT) AS f,
             CAST((event_id * 5 + 1) % 4 AS INT) AS tt,
             CAST(FLOOR(value) AS INT) % 120 + 80 AS amt
      FROM events WHERE event_id < 80
    ),
    replay AS (
      SELECT CAST(0 AS BIGINT) AS step,
             CAST(NULL AS BIGINT) AS tid,
             CAST(NULL AS VARCHAR) AS vote,
             [100.0 FOR i IN range(4)] AS bal
      UNION ALL
      SELECT t.step, t.tid,
             CASE WHEN r.bal[t.f+1] - t.amt >= 0 AND r.bal[t.tt+1] + t.amt >= 0
                  THEN 'COMMIT' ELSE 'ABORT' END,
             CASE WHEN r.bal[t.f+1] - t.amt >= 0 AND r.bal[t.tt+1] + t.amt >= 0
                  THEN [CASE WHEN i = t.f THEN r.bal[i+1] - t.amt
                             WHEN i = t.tt THEN r.bal[i+1] + t.amt
                             ELSE r.bal[i+1] END FOR i IN range(4)]
                  ELSE r.bal END
      FROM replay r JOIN txn t ON t.step = r.step + 1
    )
    SELECT tid, vote FROM replay WHERE step > 0 ORDER BY tid
    """,
)
def txn_cascade_replay_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deflating chained contamination (C9 dependency replay,
    tgraph/state/StandardDependencyTrackingStrategy.java:10-17): 80
    large transfers (amounts 80..199 vs the 100 default) over FOUR hot
    keys, so aborted deposits routinely inflate a chain that a later
    withdrawal spends from — the later txn's invariant fails on the
    contaminated value but passes on the clean one and must REPLAY and
    COMMIT, not stay aborted.  On this workload the round-7 engine's
    monotone-abort rule diverged from serial tid-order replay on 21 of
    80 votes; the oracle is the same recursive-CTE serial replay as
    txn_bank_votes_pl3 over a 4-key balance vector."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    runner = env.runner(_bank_graph_txn(env))
    ev = t(spark, sf_dir, "events")
    transfers = ev.filter(F.col("event_id") < 80).select(
        F.col("event_id").alias("_tid"),
        F.concat(F.lit("h"), (F.col("event_id") % 4).cast("string")).alias("from_account"),
        F.concat(F.lit("h"), ((F.col("event_id") * 5 + 1) % 4).cast("string")).alias(
            "to_account"
        ),
        (F.floor(F.col("value")).cast("int") % 120 + 80).cast("double").alias("amount"),
    )
    epochs = runner.run_to_completion(transfers, max_epochs=128)
    from t_spoon_spark.tx.vote import vote_name

    all_votes = epochs[0].votes
    for ep in epochs[1:]:
        all_votes = all_votes.unionByName(ep.votes)
    return (
        all_votes.groupBy("_tid")
        .agg(F.min("vote").alias("vote"))
        .select(F.col("_tid").alias("tid"), vote_name(F.col("vote")).alias("vote"))
        .orderBy("tid")
    )


@register(
    "txn_window_merge",
    f"""
    WITH t AS (
      SELECT event_id AS tid,
             'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS from_account,
             'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS to_account,
             FLOOR(value) AS amount
      FROM events WHERE event_id < 2000
    )
    SELECT tid,
           CAST(0 AS BIGINT) AS net_c,
           2 AS n_moves,
           from_account
    FROM t
    ORDER BY tid
    """,
)
def txn_window_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transaction window (T7, tgraph/functions/WindowWrapper.java:23-70):
    flatMap each transfer into its two movements, then the t_window
    collapses the siblings back to one record per transaction
    (TransferMerger pairing) — net movement is zero by construction,
    which the SQL twin states directly."""
    env = TxEnvironment(spark, isolation="PL3")
    g = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("from_account").alias("account"), (-F.col("amount")).alias("delta")),
                F.struct(F.col("to_account").alias("account"), F.col("amount").alias("delta")),
            )
        )
        .t_window(
            lambda items: {
                "net_c": F.aggregate(
                    items, F.lit(0).cast("long"), lambda acc, s: acc + s["delta"].cast("long")
                ),
                "n_moves": F.size(items),
                "from_account": F.element_at(items, 1)["account"],
            }
        )
    )
    runner = env.runner(g)
    res = runner.run_epoch(_transfers(spark, sf_dir).filter(F.col("_tid") < 2000))
    return res.stream.select(
        F.col("_tid").alias("tid"), "net_c", "n_moves", "from_account"
    ).orderBy("tid")


@register(
    "txn_streaming_bank_fold",
    f"""
    WITH movements AS (
      SELECT 'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS account,
             -FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS account,
             FLOOR(value) AS delta
      FROM events
    )
    SELECT account AS key,
           CAST(100 + SUM(delta) AS BIGINT) AS balance_c
    FROM movements
    GROUP BY account
    ORDER BY key
    """,
)
def txn_streaming_bank_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transactional graph under Structured Streaming: the transfer
    workload replays as a 3-micro-batch file stream through StreamRunner
    (each micro-batch = one atomic epoch, the foreachBatch barrier is
    the commit point), and the final committed snapshot equals the batch
    grouped sum — end-to-end driver evidence for the streaming
    transactional mode (SURVEY M3), not just its pytest coverage."""
    from t_spoon_spark.streaming import StreamRunner
    from t_spoon_spark.streaming.windows import file_stream

    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0)
    stream = file_stream(spark, _transfers(spark, sf_dir), n_slices=3)
    sr = StreamRunner(env, _bank_graph(env))
    sr.process_all(stream)
    snap = env.store.read("balances")
    return snap.select("key", F.col("value").cast("bigint").alias("balance_c")).orderBy("key")


@register(
    "txn_spu_mixed_epoch",
    f"""
    WITH moves AS (
      SELECT 'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS account,
             -FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS account,
             FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 3 + 1) % {KEYSPACE} AS VARCHAR) AS account,
             CASE WHEN event_id % 2 = 0 THEN FLOOR(value) ELSE -FLOOR(value) END
      FROM events WHERE event_id % 5 = 0
    )
    SELECT account AS key,
           CAST(100 + SUM(delta) AS BIGINT) AS balance_c
    FROM moves
    GROUP BY account
    ORDER BY key
    """,
)
def txn_spu_mixed_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One epoch carrying BOTH the transfer graph and single-partition
    updates on the same hot keyspace (mirrors the reference's mixed
    bank workload, evaluation/BankUseCase.java:72-80,96-100 — transfers
    interleaved with deposits/withdrawals). The reference interleaves
    SPUs at version-stability points inside the shard
    (tgraph/db/Shard.java:113-154); our epoch model applies SPUs after
    the epoch's transactions — outcome-equivalent here because with no
    invariant every operation commits and the per-key fold is
    commutative, which the grouped-sum twin states exactly."""
    env = TxEnvironment(spark, isolation="PL3")
    ns = env.create_namespace("balances", "double", 100.0)
    ns.commands["deposit"] = lambda cur, amt: cur + amt
    ns.commands["withdrawal"] = lambda cur, amt: cur - amt

    ev = t(spark, sf_dir, "events")
    spus = ev.filter(F.col("event_id") % 5 == 0).select(
        F.concat(F.lit("s"), F.col("event_id").cast("string")).alias("spu_id"),
        F.lit("balances").alias("namespace"),
        F.concat(F.lit("a"), ((F.col("user_id") * 3 + 1) % KEYSPACE).cast("string")).alias("key"),
        F.when(F.col("event_id") % 2 == 0, "deposit").otherwise("withdrawal").alias("method"),
        F.array(F.floor(F.col("value")).cast("double")).alias("args"),
    )
    runner = env.runner(_bank_graph(env))
    runner.run_epoch(_transfers(spark, sf_dir), spus=spus)
    snap = env.store.read("balances")
    return snap.select("key", F.col("value").cast("bigint").alias("balance_c")).orderBy("key")


@register(
    "txn_spu_final_balances",
    f"""
    WITH spus AS (
      SELECT 'u' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS key,
             CASE WHEN event_id % 2 = 0 THEN FLOOR(value) ELSE -FLOOR(value) END AS delta
      FROM events
    )
    SELECT key, CAST(100 + SUM(delta) AS BIGINT) AS balance_c
    FROM spus
    GROUP BY key
    ORDER BY key
    """,
)
def txn_spu_final_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-partition-update path (§2.5): deposits/withdrawals derived
    from events, dispatched through the registered command table and
    folded per key — equals the grouped sum when no invariant aborts."""
    env = TxEnvironment(spark, isolation="PL3")
    ns = env.create_namespace("balances", "double", 100.0)
    ns.commands["deposit"] = lambda cur, amt: cur + amt
    ns.commands["withdrawal"] = lambda cur, amt: cur - amt

    ev = t(spark, sf_dir, "events")
    spus = ev.select(
        F.concat(F.lit("s"), F.col("event_id").cast("string")).alias("spu_id"),
        F.lit("balances").alias("namespace"),
        F.concat(F.lit("u"), (F.col("user_id") % KEYSPACE).cast("string")).alias("key"),
        F.when(F.col("event_id") % 2 == 0, "deposit").otherwise("withdrawal").alias("method"),
        F.array(F.floor(F.col("value")).cast("double")).alias("args"),
    )
    # SPUs need a (possibly empty) transactional batch alongside
    empty = spark.createDataFrame([], "from_account string, to_account string, amount double, _tid long")
    runner = env.runner(_bank_graph(env))
    runner.run_epoch(empty, spus=spus)
    snap = env.store.read("balances")
    return snap.select("key", F.col("value").cast("bigint").alias("balance_c")).orderBy("key")


@register(
    "txn_two_graphs_interleaved",
    f"""
    WITH m1 AS (
      SELECT 'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS key,
             -FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS key,
             FLOOR(value) AS delta
      FROM events
    )
    SELECT * FROM (
      SELECT 'g1_balances' AS ns, key, CAST(100 + SUM(delta) AS BIGINT) AS value_c
      FROM m1 GROUP BY key
      UNION ALL
      SELECT 'g2_type_totals' AS ns, event_type AS key,
             CAST(SUM(FLOOR(value)) AS BIGINT) AS value_c
      FROM events GROUP BY event_type
    ) ORDER BY ns, key
    """,
)
def txn_two_graphs_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-TGraph topology (reference: n independent transactional
    graphs per environment — `tGraphID` in Metadata,
    tgraph/TransactionEnvironment.java:66-100; `series_ntg` /
    `parallel_ntg` composition, evaluation/EvaluationGraphComposer.java:34-59).

    Two GraphRunners share ONE environment and ONE state store: graph 1
    folds bank transfers into `g1_balances`, graph 2 folds per-type
    value totals into `g2_type_totals`. Their epochs interleave on the
    store's single committed-epoch line (g1 e1, g2 e2, g1 e3, g2 e4) —
    exactly the shared-runtime/independent-state contract of the
    reference's multi-graph mode. The grouped-sum oracle spans both
    graphs' namespaces, so a cross-graph epoch-sequencing bug (lost
    update, stale snapshot base, history GC dropping the other graph's
    frontier) breaks the hash."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("g1_balances", "double", 100.0)
    env.create_namespace("g2_type_totals", "double", 0.0)
    r1 = env.runner(
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
        .state(
            "g1_balances",
            key=lambda df: F.col("account"),
            update=lambda v: v + F.col("delta"),
            pre_combine={"delta": "sum"},
            epoch_combine=True,
        )
    )
    r2 = env.runner(
        env.graph()
        .map(
            lambda df: {
                "etype": F.col("event_type"),
                "delta": F.floor(F.col("value")).cast("double"),
            }
        )
        .state(
            "g2_type_totals",
            key=lambda df: F.col("etype"),
            update=lambda v: v + F.col("delta"),
            pre_combine={"delta": "sum"},
            epoch_combine=True,
        )
    )

    transfers = _transfers(spark, sf_dir)
    ev = t(spark, sf_dir, "events").select(
        # distinct tid range per graph — the epoch model's stand-in for
        # the reference's tGraphID disambiguation in Metadata
        (F.col("event_id") + F.lit(1 << 40)).alias("_tid"),
        "event_type",
        "value",
    )
    # interleave epochs on the shared store's single epoch line
    for i in range(2):
        r1.run_to_completion(transfers.filter(F.col("_tid") % 2 == i))
        r2.run_to_completion(ev.filter(F.col("_tid") % 2 == i))

    snap1 = env.store.read("g1_balances").select(
        F.lit("g1_balances").alias("ns"),
        "key",
        F.col("value").cast("bigint").alias("value_c"),
    )
    snap2 = env.store.read("g2_type_totals").select(
        F.lit("g2_type_totals").alias("ns"),
        "key",
        F.col("value").cast("bigint").alias("value_c"),
    )
    return snap1.unionByName(snap2).orderBy("ns", "key")


@register(
    "txn_time_travel_snapshot",
    f"""
    WITH movements AS (
      SELECT 'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS account,
             -FLOOR(value) AS delta, event_id
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS account,
             FLOOR(value) AS delta, event_id
      FROM events
    ),
    mid AS (
      SELECT 'mid' AS snap, account AS key,
             CAST(100 + SUM(delta) AS BIGINT) AS balance_c
      FROM movements WHERE event_id % 2 = 0 GROUP BY account
    ),
    fin AS (
      SELECT 'final' AS snap, account AS key,
             CAST(100 + SUM(delta) AS BIGINT) AS balance_c
      FROM movements GROUP BY account
    )
    SELECT * FROM mid UNION ALL SELECT * FROM fin
    ORDER BY snap, key
    """,
)
def txn_time_travel_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 snapshot-consistent time travel, driver-visible: run the bank
    fold in two batches, pin the committed epoch after the first, and
    read BOTH the pinned mid-state and the final state from the same
    store (`store.read(ns, epoch)` — the MVCC epoch column the close
    protocol maintains; reference analogue:
    tgraph/query/QueryableState reads at the transaction-index
    watermark). The mid snapshot must equal the grouped sum over only
    the first batch's transfers — proving committed versions stay
    readable after later epochs commit, which is what makes queryable
    state repeatable-read (SURVEY §2.4 Q4)."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0)
    runner = env.runner(_bank_graph(env))
    tr = _transfers(spark, sf_dir)
    runner.run_to_completion(tr.filter(F.col("_tid") % 2 == 0))
    e_mid = env.watermark()
    runner.run_to_completion(tr.filter(F.col("_tid") % 2 == 1))
    mid = env.store.read("balances", e_mid).select(
        F.lit("mid").alias("snap"),
        "key",
        F.col("value").cast("bigint").alias("balance_c"),
    )
    fin = env.store.read("balances").select(
        F.lit("final").alias("snap"),
        "key",
        F.col("value").cast("bigint").alias("balance_c"),
    )
    return mid.unionByName(fin).orderBy("snap", "key")


@register(
    "txn_streaming_concurrent_graphs",
    f"""
    WITH movements AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'ga' ELSE 'gb' END AS graph,
             'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS account,
             -FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT CASE WHEN event_id % 2 = 0 THEN 'ga' ELSE 'gb' END AS graph,
             'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS account,
             FLOOR(value) AS delta
      FROM events
    )
    SELECT graph, account AS key,
           CAST(SUM(delta) AS BIGINT) AS balance_c
    FROM movements
    GROUP BY graph, account
    ORDER BY graph, key
    """,
)
def txn_streaming_concurrent_graphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE concurrent multi-TGraph STREAMING, driver-visible: the
    transfer workload splits into two Structured Streaming queries (two
    graphs, two namespaces, ONE environment/store); their foreachBatch
    callbacks land on separate threads and the env epoch lock
    serializes them onto the store's single committed-epoch line
    (reference: n transactional graphs per environment, `tGraphID` in
    tgraph/TransactionEnvironment.java:66-100, driven concurrently by
    the evaluation topology). The associative epoch fold makes each
    side's final snapshot equal its grouped sum REGARDLESS of how the
    two queries' epochs interleaved — which is exactly what the oracle
    checks, per namespace."""
    import glob
    import os
    import shutil
    import tempfile

    from t_spoon_spark.streaming import StreamRunner

    tr = _transfers(spark, sf_dir)
    halves = {
        "ga": tr.filter(F.col("_tid") % 2 == 0),
        "gb": tr.filter(F.col("_tid") % 2 == 1),
    }
    schema = "_tid long, from_account string, to_account string, amount double"

    def spill(df: DataFrame, name: str) -> str:
        d = os.path.join(tempfile.mkdtemp(prefix="tspoon_ctg_"), name)
        os.makedirs(d, exist_ok=True)
        # two deterministic micro-batch files per stream, split by tid
        mid = df.approxQuantile("_tid", [0.5], 0.0)[0]
        for i, part in enumerate(
            (df.filter(F.col("_tid") <= mid), df.filter(F.col("_tid") > mid))
        ):
            tmp = f"{d}/tmp"
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            shutil.copy(
                glob.glob(f"{tmp}/part-*.parquet")[0], f"{d}/batch_{i}.parquet"
            )
            shutil.rmtree(tmp)
        return d

    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("ga", "double", 0.0)
    env.create_namespace("gb", "double", 0.0)
    runners = {
        ns: StreamRunner(env, _bank_graph_ns(env, ns), collect_votes=False)
        for ns in ("ga", "gb")
    }
    queries = {}
    # gate-sized epochs: 32-way shuffles on tens-of-k-row epoch frames
    # are pure task-scheduling overhead (same sizing the latency bench
    # and drain_stream use); restore the session default afterwards
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for ns, df in halves.items():
            d = spill(df, ns)
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            queries[ns] = runners[ns].start(src)
        for q in queries.values():
            q.processAllAvailable()
    finally:
        for q in queries.values():
            q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    outs = []
    for ns in ("ga", "gb"):
        outs.append(
            env.store.read(ns).select(
                F.lit(ns).alias("graph"),
                "key",
                F.col("value").cast("bigint").alias("balance_c"),
            )
        )
    return outs[0].unionByName(outs[1]).orderBy("graph", "key")


def _bank_graph_ns(env: TxEnvironment, ns: str):
    return (
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
            ns,
            key=lambda df: F.col("account"),
            update=lambda v: v + F.col("delta"),
            pre_combine={"delta": "sum"},
            epoch_combine=True,
        )
    )


@register(
    "queryable_state_multi_query",
    f"""
    WITH movements AS (
      SELECT 'a' || CAST(user_id % {KEYSPACE} AS VARCHAR) AS account,
             -FLOOR(value) AS delta
      FROM events
      UNION ALL
      SELECT 'a' || CAST((user_id * 7 + 3) % {KEYSPACE} AS VARCHAR) AS account,
             FLOOR(value) AS delta
      FROM events
    ),
    balances AS (
      SELECT account AS key, CAST(100 + SUM(delta) AS BIGINT) AS value_c
      FROM movements GROUP BY account
    )
    SELECT 'q_keys' AS query_id, key, value_c
    FROM balances WHERE key IN ('a1', 'a7', 'a23')
    UNION ALL
    SELECT 'q_pred', key, value_c FROM balances WHERE value_c < 0
    ORDER BY query_id, key
    """,
)
def queryable_state_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 + Q3 driver-visible: a BATCH of query requests (one key query
    over {{a1, a7, a23}}, one predicate query `value < 0`) executes
    against a single pinned committed snapshot via env.execute_queries
    — the reference's QuerySupplier -> QueryResultMerger cycle
    (tgraph/query/QueryResultMerger.java:36-51) in one call. Both
    requests read the same epoch, so the merged result is consistent by
    construction; the oracle recomputes each request against the
    grouped-sum balances."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace("balances", "double", 100.0)
    runner = env.runner(_bank_graph(env))
    runner.run_to_completion(_transfers(spark, sf_dir))
    requests = spark.createDataFrame(
        [
            ("q_keys", "balances", ["a1", "a7", "a23"], None),
            ("q_pred", "balances", None, "value < 0"),
        ],
        "query_id string, namespace string, keys array<string>, predicate string",
    )
    out = env.execute_queries(requests)
    return (
        out.select(
            "query_id", "key", F.col("value").cast("bigint").alias("value_c")
        )
        .orderBy("query_id", "key")
    )
