"""Hardening from the round-2 advisor findings: abort-cascade fixpoint,
string-literal-safe SQL chain rewriting, adversarial column names,
query-identity-scoped streaming idempotence, and spill-base GC
reachability under checkpoint_every > 1.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from t_spoon_spark.tx import TxEnvironment
from t_spoon_spark.tx.runner import _map_outside_literals, _sub_cols


# -- _sub_cols / _map_outside_literals units ---------------------------


def test_sub_cols_skips_string_literals():
    sql = "concat(delta, ' not delta ', `delta`)"
    out = _sub_cols(sql, ["delta"])
    assert out == "concat(x.delta, ' not delta ', x.delta)"


def test_sub_cols_handles_escaped_quotes():
    sql = "delta = 'it''s delta' OR delta = \"delta\""
    out = _sub_cols(sql, ["delta"])
    assert out == "x.delta = 'it''s delta' OR x.delta = \"delta\""


def test_sub_cols_does_not_touch_acc_reference():
    # a record column literally named `acc` must not corrupt the
    # accumulator reference acc.value
    sql = "acc.value + acc"
    assert _sub_cols(sql, ["acc"]) == "acc.value + x.acc"


def test_sub_cols_prefix_names():
    # one column a prefix of another
    sql = "val + value"
    assert _sub_cols(sql, ["val", "value"]) == "x.val + x.value"


def test_map_outside_literals_identity_on_literals():
    sql = "a = 'b = c' AND b = 1"
    out = _map_outside_literals(sql, lambda s: s.replace("b", "B"))
    assert out == "a = 'b = c' AND B = 1"


# -- adversarial column names through the full PL3 chain path ----------


def test_chain_adversarial_column_names(spark):
    """Columns named value/acc/x and an invariant whose string literal
    contains a column name — the SQL chain rewrite must leave literals
    intact and still fold correctly (advisor: runner.py _sub_cols)."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace(
        "adv",
        "string",
        "",
        invariant="value != 'x'",  # literal 'x' collides with a column name
        py_invariant=lambda v: v != "x",
    )
    g = env.graph().state(
        "adv",
        key=lambda df: F.col("k"),
        # candidate = concat of chain value and ALL the nasty columns
        update=lambda v: F.concat(v, F.col("value"), F.col("acc"), F.col("x")),
    )
    batch = spark.createDataFrame(
        [
            ("k1", "a", "b", "c", 0),  # chain: "" + abc = "abc"  COMMIT
            ("k1", "", "", "", 1),  # "abc" unchanged            COMMIT
            ("k2", "x", "", "", 2),  # "x" violates the invariant ABORT
        ],
        "k string, value string, acc string, x string, _tid long",
    )
    res = env.runner(g).run_epoch(batch)
    votes = {r["_tid"]: r["vote"] for r in res.results.select("_tid", "vote").collect()}
    assert votes == {0: "COMMIT", 1: "COMMIT", 2: "ABORT"}
    got = {r["key"]: r["value"] for r in env.store.read("adv").collect()}
    assert got == {"k1": "abc"}


def test_chain_literal_containing_column_name(spark):
    """Invariant `value != 'delta'` with a record column named delta:
    the literal must survive the rewrite (advisor low #4)."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace(
        "lit",
        "string",
        "",
        invariant="value != 'delta'",
        py_invariant=lambda v: v != "delta",
    )
    g = env.graph().state(
        "lit", key=lambda df: F.col("k"), update=lambda v: F.col("delta")
    )
    batch = spark.createDataFrame(
        [("k1", "ok", 0), ("k2", "delta", 1)], "k string, delta string, _tid long"
    )
    res = env.runner(g).run_epoch(batch)
    votes = {r["_tid"]: r["vote"] for r in res.results.select("_tid", "vote").collect()}
    assert votes == {0: "COMMIT", 1: "ABORT"}
    got = {r["key"]: r["value"] for r in env.store.read("lit").collect()}
    assert got == {"k1": "ok"}


# -- deep abort cascade (fixpoint, not a fixed cap) --------------------


def test_abort_cascade_deeper_than_six(spark):
    """A dependency chain 8 transfers deep: t0 aborts, and each t_i
    only stays solvent if t_{i-1}'s deposit lands — the abort must
    cascade through all 8 (the old 6-round cap would silently commit
    the tail; advisor medium #1).

    Chain: t_i moves 100 from c_i to c_{i+1}. Every c_i starts at 0, so
    t_i is solvent only via t_{i-1}'s deposit. t0 overdraws from a dry
    source, so every link must abort."""
    env = TxEnvironment(spark, isolation="PL3")
    env.create_namespace(
        "bal", "double", 0.0, invariant="value >= 0", py_invariant=lambda v: v >= 0
    )
    g = (
        env.graph()
        .flat_map(
            lambda df: F.array(
                F.struct(F.col("src").alias("account"), (-F.col("amt")).alias("delta")),
                F.struct(F.col("dst").alias("account"), F.col("amt").alias("delta")),
            )
        )
        .state("bal", key=lambda df: F.col("account"), update=lambda v: v + F.col("delta"))
    )
    n = 9
    rows = [(f"c{i}", f"c{i + 1}", 100.0, i) for i in range(n)]
    batch = spark.createDataFrame(rows, "src string, dst string, amt double, _tid long")
    res = env.runner(g).run_epoch(batch)
    votes = {r["_tid"]: r["vote"] for r in res.results.select("_tid", "vote").collect()}
    assert votes == {i: "ABORT" for i in range(n)}
    assert {r["key"]: r["value"] for r in env.store.read("bal").collect()} == {}


# -- streaming idempotence tied to query identity ----------------------


def test_fresh_query_not_skipped_by_old_frontier(spark, tmp_path):
    """A NEW streaming query (fresh checkpoint, batch ids restart at 0)
    against a store that already recorded a frontier must process its
    batches — the guard only applies to the query identity that wrote
    the frontier (advisor medium #2)."""
    from tests.test_streaming import SCHEMA, _bank_graph, _write_batches
    from t_spoon_spark.streaming import StreamRunner

    store_dir = str(tmp_path / "store")
    stream_dir = _write_batches(spark, str(tmp_path))

    env1 = TxEnvironment(spark, isolation="PL3", durable=True, store_dir=store_dir)
    env1.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    s1 = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    sr1 = StreamRunner(env1, _bank_graph(env1))
    q1 = sr1.start(s1, checkpoint_dir=str(tmp_path / "ckptA"))
    q1.processAllAvailable()
    q1.stop()
    q1.awaitTermination(30)
    committed = env1.store.committed_epoch()
    assert env1.store.last_batch_id is not None
    assert env1.store.last_query_id == str(tmp_path / "ckptA")

    # new query, new checkpoint: its batch 0/1 must NOT be skipped
    env2 = TxEnvironment(spark, isolation="PL3", durable=True, store_dir=store_dir)
    env2.create_namespace(
        "balances", "double", 100.0, "value >= 0", py_invariant=lambda v: v >= 0
    )
    assert env2.store.last_batch_id is not None  # recovered frontier
    s2 = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    sr2 = StreamRunner(env2, _bank_graph(env2))
    q2 = sr2.start(s2, checkpoint_dir=str(tmp_path / "ckptB"))
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    assert len(sr2.metrics.epochs) > 0  # batches processed, not dropped
    assert env2.store.committed_epoch() > committed


# -- spill-base GC keeps bases reachable from retained history ---------


def test_gc_bases_keeps_reachable_spill(spark):
    """With checkpoint_every > 1, a retained history snapshot's lineage
    roots at the last spill at-or-before it — possibly older than the
    raw `epoch - history_epochs` cutoff. GC must key off reachability
    (advisor low #3: FileNotFoundException on snapshot read).

    history_epochs=2, checkpoint_every=4: at the epoch-8 spill the old
    cutoff deleted base 4, which is the lineage root of retained
    epochs 6 and 7."""
    from t_spoon_spark.tx.namespace import Namespace
    from t_spoon_spark.tx.store import StateStore

    store = StateStore(spark, durable=False, history_epochs=2, checkpoint_every=4)
    store.register(Namespace("g", "double", 0.0))
    for e in range(9):  # spills at 0, 4, 8; GC runs at each spill
        upd = spark.createDataFrame([(f"k{e % 3}", float(e))], "key string, value double")
        store.commit(e, {"g": upd}, None)
    # every retained history epoch must be readable end-to-end
    for e in range(store.committed_epoch() - store.history_epochs, store.committed_epoch() + 1):
        rows = store.read("g", e).collect()
        assert rows  # materializes fine — no dangling base lineage


# -- round-9 advisor: ANN recall report cost-column symmetry ------------


def test_ann_recall_oracle_fails_loudly_on_unknown_method(monkeypatch):
    """A method added to _ANN_METHODS without a candidate-cost
    expression must raise at ORACLE COMPOSITION time (the same loud
    KeyError the Spark side raises from counts[tag]) — previously the
    inner JOIN silently dropped it from only the oracle result."""
    import pytest as _pytest

    from t_spoon_spark.queries import similarity2 as s2

    monkeypatch.setattr(
        s2, "_ANN_METHODS", (*s2._ANN_METHODS, ("novel", "similarity_bruteforce_topk"))
    )
    with _pytest.raises(KeyError):
        s2._ann_recall_oracle()


def test_ann_recall_oracle_subtracts_actual_query_count():
    """Every self-match subtraction and per-query product must use the
    ACTUAL query count CTE (qcnt), not the N_Q literal — the corpus-
    smaller-than-N_Q symmetry fix."""
    from t_spoon_spark.queries import similarity2 as s2

    sql = s2._ann_recall_oracle()
    assert "qcnt" in sql
    assert sql.count("(SELECT q FROM qcnt)") >= 3  # lsh, lsh_mp, ivf
    # the bin_ham/pq_adc/sq8 rows and the cand_pct denominator use q
    assert "q * LEAST" in sql and "(qc.q * (ns.n - 1))" in sql


# -- round-10 advisor: co-order edge cache keying + stat fallback ------


def test_co_edge_memo_keyed_by_content_not_path(spark, tmp_path):
    """In-session regeneration of the source at the SAME path must miss
    the in-process memo and mint a fresh edge table (ADVICE r10: the
    memo was keyed by sf_dir, so a rebuilt corpus kept serving the
    previous corpus's edges within one long-lived session)."""
    import time

    from t_spoon_spark.queries import graph as g

    sf_dir = str(tmp_path)
    li1 = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "l_orderkey long, l_partkey long"
    )
    li1.write.parquet(f"{sf_dir}/lineitem.parquet")
    t1 = g.co_order_edges(spark, sf_dir)
    name1 = [v for k, v in g._CO_EDGE_TABLES.items() if v.startswith("tsp_co_edges")][-1]
    assert t1.count() == 2  # (10,11) symmetric

    time.sleep(0.05)  # ensure a distinct mtime_ns on regeneration
    li2 = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], "l_orderkey long, l_partkey long"
    )
    li2.write.mode("overwrite").parquet(f"{sf_dir}/lineitem.parquet")
    t2 = g.co_order_edges(spark, sf_dir)
    name2 = [v for v in g._CO_EDGE_TABLES.values()][-1]
    assert t2.count() == 6  # three co-order pairs, symmetric
    assert name1 != name2  # fresh fingerprint -> fresh table


def test_co_edge_missing_source_raises_spark_path_error(spark, tmp_path):
    """A missing lineitem table must surface as the clear Spark read
    error, not a bare FileNotFoundError from the fingerprint stat loop
    (ADVICE r10)."""
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    from t_spoon_spark.queries import graph as g

    with _pytest.raises(AnalysisException):
        g.co_order_edges(spark, str(tmp_path / "nosuch_sf"))
