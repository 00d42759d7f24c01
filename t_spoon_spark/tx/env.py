"""TxEnvironment — the engine session object (reference:
tgraph/TransactionEnvironment.java:66-100 singleton; ours wraps an
explicit SparkSession, no global state).

Exposes: namespace registration (StateFunction contract), graph
building (open/map/flatMap/filter/window/state/close through
GraphRunner), snapshot-consistent queryable state (§2.4), and the
committed-epoch watermark.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.tx.graph import TGraph
from t_spoon_spark.tx.namespace import Namespace
from t_spoon_spark.tx.runner import GraphRunner
from t_spoon_spark.tx.store import StateStore

ISOLATION_LEVELS = ("PL0", "PL1", "PL2", "PL3", "PL4")


def check_freshness(freshness: str, epoch: int | None) -> bool:
    """Validate a query's freshness option — the ONE copy of the rule
    every query surface (env key/predicate/sql, serve ops) delegates to.
    Returns True for 'uncommitted' (an explicit epoch pin is rejected:
    a pin and 'newer than committed' contradict each other), False for
    'committed'; raises on anything else."""
    if freshness == "uncommitted":
        if epoch is not None:
            raise ValueError("freshness='uncommitted' cannot pin an epoch")
        return True
    if freshness != "committed":
        raise ValueError(
            f"freshness must be 'committed' or 'uncommitted', got {freshness!r}"
        )
    return False


class TxEnvironment:
    def __init__(
        self,
        spark: SparkSession,
        isolation: str = "PL3",
        strategy: str = "optimistic",
        durable: bool = False,
        store_dir: str | None = None,
        checkpoint_every: int | None = None,
        max_epochs: int | None = None,
    ):
        import threading

        if isolation not in ISOLATION_LEVELS:
            raise ValueError(f"isolation must be one of {ISOLATION_LEVELS}")
        # serializes epochs across runners: CONCURRENT streaming queries
        # (multi-TGraph streaming) invoke run_epoch from separate
        # foreachBatch threads, and the store's committed-epoch line
        # admits exactly one in-flight epoch (commit asserts
        # epoch == committed + 1). Uncontended cost is a no-op.
        self.epoch_lock = threading.Lock()
        # serializes the sql() temp-view bind: createOrReplaceTempView
        # is session-global, so two threads calling env.sql directly
        # could interleave view binds and analyze against mixed pins
        # (verdict r13).  RLock: serve's sql path holds its own lock
        # around bind+collect and calls through here.  The bind and the
        # ANALYSIS are what need the lock — spark.sql resolves views
        # eagerly at analysis, so the returned frame is immune to later
        # rebinds and callers may collect it lock-free.
        self.sql_lock = threading.RLock()
        # `strategy` is kept for config parity (tgraph/Strategy.java:6-8);
        # in micro-batch execution optimistic vs pessimistic collapse to
        # the same per-key ordered application (SURVEY.md §4.3).
        self.spark = spark
        self.isolation = isolation
        self.strategy = strategy
        self.store = StateStore(
            spark,
            root=store_dir,
            durable=durable,
            checkpoint_every=checkpoint_every,
            # durable retention horizon (round 12; reference parity
            # maxNoVersions, tgraph/state/StateOperator.java:100-101)
            max_epochs=max_epochs,
        )

    # -- namespaces ------------------------------------------------------

    @property
    def namespaces(self) -> dict[str, Namespace]:
        return self.store.namespaces

    def create_namespace(
        self,
        name: str,
        value_type: str = "double",
        default: Any = None,
        invariant: str | None = None,
        py_invariant: Callable[[Any], bool] | None = None,
    ) -> Namespace:
        ns = Namespace(
            name=name,
            value_type=value_type,
            default=default,
            invariant=invariant,
            py_invariant=py_invariant,
        )
        self.store.register(ns)
        return ns

    # -- graph -----------------------------------------------------------

    def graph(self) -> TGraph:
        return TGraph()

    def runner(self, tgraph: TGraph) -> GraphRunner:
        return GraphRunner(self, tgraph)

    # -- queryable state (§2.4) -------------------------------------------

    def watermark(self) -> int:
        """Highest epoch whose transactions are all complete — the
        consistent-snapshot frontier (tgraph/query/WatermarkAssigner.java:11-26
        generalized: ours moves per epoch, not per txn)."""
        return self.store.committed_epoch()

    def _snapshot(self, ns: str, epoch: int | None, freshness: str) -> DataFrame:
        """Resolve one query's snapshot: the pinned committed epoch
        (default), or — ``freshness='uncommitted'`` — the PL0-visibility
        overlay that includes the in-flight epoch's resolved updates
        while a commit is underway (round-13 freshness spike; reference
        parity target tgraph/query/WatermarkAssigner.java:11-26).  The
        uncommitted mode is epoch-less by construction: an explicit pin
        and 'give me newer than committed' contradict each other."""
        if check_freshness(freshness, epoch):
            frame, _effective = self.store.read_uncommitted(ns)
            return frame
        return self.store.read(ns, epoch)

    def query_keys(
        self,
        ns: str,
        keys: list[str],
        epoch: int | None = None,
        freshness: str = "committed",
    ) -> DataFrame:
        """Key query (tgraph/query/Query.java:13-56): fetch a key set at
        a pinned committed snapshot. `WHERE key IN (...)` lets Catalyst
        prune partitions — the reference needed a custom partitioner
        for this (common/PartitionOrBcastPartitioner.java:56-73)."""
        return self._snapshot(ns, epoch, freshness).filter(F.col("key").isin(keys))

    def query_predicate(
        self,
        ns: str,
        predicate_sql: str,
        epoch: int | None = None,
        freshness: str = "committed",
    ) -> DataFrame:
        """Predicate (full-scan) query (tgraph/query/PredicateQuery.java:11-49)
        over columns (key, value)."""
        return self._snapshot(ns, epoch, freshness).filter(F.expr(predicate_sql))

    def execute_queries(self, requests: DataFrame, epoch: int | None = None) -> DataFrame:
        """Execute a batch of query requests (query_id, namespace,
        keys ARRAY<STRING>, predicate STRING) against one pinned
        snapshot; returns (query_id, namespace, key, value) — the merged
        result the reference assembles via QueryResultMerger
        (tgraph/query/QueryResultMerger.java:36-51). Key and predicate
        requests route through one union type, like the reference's
        NoConsensusOperation (tgraph/state/NoConsensusOperation.java:13-39):
        a request with non-empty `keys` joins on key (Catalyst prunes to
        owning partitions like PartitionOrBcastPartitioner routing); a
        request with a `predicate` full-scans the snapshot with the
        predicate pushed into the scan. Predicates are query *text*
        (control plane, a handful per batch), so collecting them to
        drive per-predicate filters is not a data-plane collect."""
        pin = self.store.committed_epoch() if epoch is None else epoch
        outs = []
        for ns_row in requests.select("namespace").distinct().collect():
            ns = ns_row["namespace"]
            snap = self.store.read(ns, pin)
            sub = requests.filter(F.col("namespace") == ns)
            req = sub.filter(
                F.col("keys").isNotNull() & (F.size("keys") > 0)
            ).select("query_id", F.explode("keys").alias("key"))
            outs.append(
                req.join(snap, "key", "inner").select(
                    "query_id", F.lit(ns).alias("namespace"), "key", "value"
                )
            )
            if "predicate" in sub.columns:
                pred_rows = (
                    sub.filter(F.col("predicate").isNotNull())
                    .select("query_id", "predicate")
                    .collect()
                )
                for r in pred_rows:
                    outs.append(
                        snap.filter(F.expr(r["predicate"])).select(
                            F.lit(r["query_id"]).alias("query_id"),
                            F.lit(ns).alias("namespace"),
                            "key",
                            "value",
                        )
                    )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    def sql(
        self, query: str, epoch: int | None = None, freshness: str = "committed"
    ) -> DataFrame:
        """Full SQL over the live state: every namespace is exposed as
        view state_<ns> pinned at one snapshot — this generalizes the
        reference's two query forms to arbitrary SQL (SURVEY.md §3.2).
        ``freshness='uncommitted'`` binds every view to the PL0 overlay
        instead (same contract as query_keys/query_predicate); all views
        come from ONE ``read_uncommitted_all`` capture so a commit
        starting or finishing mid-bind cannot tear a cross-namespace
        query (e.g. a money-conservation join would otherwise see
        namespace A at epoch k-1 and B at k)."""
        with self.sql_lock:  # bind + analysis under one lock: two
            # threads interleaving view binds would analyze against
            # mixed pins; the returned (analyzed) frame is rebind-proof
            if check_freshness(freshness, epoch):
                frames, _eff = self.store.read_uncommitted_all(list(self.namespaces))
                for name, frame in frames.items():
                    frame.createOrReplaceTempView(f"state_{name}")
                return self.spark.sql(query)
            for name in self.namespaces:
                self.store.read(name, epoch).createOrReplaceTempView(f"state_{name}")
            return self.spark.sql(query)
