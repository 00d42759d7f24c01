"""Epoch executor: runs a TGraph over one micro-batch = one transaction
epoch, resolves votes, commits atomically, and carries the REPLAY queue
to the next epoch.

This file replaces, wholesale, the reference's 2PC machinery
(tgraph/twopc/OpenOperator.java, CloseFunction.java, ReduceVotesFunction.java,
the TCP notification servers) with three Spark aggregates and an atomic
store commit — the epoch barrier makes the out-of-band protocol
unnecessary (SURVEY.md §3.1 "Spark shape").

Isolation semantics (SURVEY.md §4.3, tgraph/state/PL*Strategy.java):

- PL3/PL4: serial per-key application in tid order WITHIN the epoch —
  each transaction reads the value left by the last committed lower-tid
  transaction on that key (committed-only visibility), checks the
  invariant, and either commits its write or aborts without advancing
  the chain. This realizes exactly the fixpoint the reference reaches
  through optimistic execution + REPLAY of conflicting txns
  (tgraph/twopc/OpenOperator.java:287-357) but in ONE epoch instead of
  one epoch per conflicting transaction on a hot key — under Zipf skew
  the replay-storm cost disappears. PL4's strictness (external order =
  tid order, tgraph/twopc/StrictnessEnforcer.java:27-118) is structural
  here: application order IS tid order, and cross-namespace aborts
  cascade forward (see the fixpoint in _close).
- PL2: read-committed — every transaction reads the epoch-start
  committed value; last committed writer per key wins (lost updates
  permitted, as PL2 allows).
- PL0/PL1: dirty-read chain — transactions fold over the key's
  version chain including uncommitted/later-aborted candidates; the
  committed value is the last chain entry whose transaction committed
  (materialized from a possibly-dirty read — the anomaly PL0/1 permit,
  mirroring lastCommitted over flipped version statuses,
  tgraph/db/Object.java:54-82).
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass

_DEBUG = os.environ.get("TSPOON_DEBUG") == "1"
# None = auto-select per session master (local → pandas, cluster →
# reliable); an explicit TSPOON_MATERIALIZE always wins.
_MATERIALIZE = os.environ.get("TSPOON_MATERIALIZE") or None
# Driver-side cascade fixpoint (pandas materialize mode only; see
# tx/driver_cascade.py). On by default; TSPOON_DRIVER_CASCADE=0 pins
# the distributed refold loop (tests use it to keep both paths covered).
_DRIVER_CASCADE = os.environ.get("TSPOON_DRIVER_CASCADE", "1") != "0"
# Fused no-abort single-job close (pandas mode). TSPOON_FUSED=0 pins the
# two-action path for comparisons/tests.
_FUSED = os.environ.get("TSPOON_FUSED", "1") != "0"
# Driver-side FULL fold (pandas mode, round-12 unloaded-latency floor):
# the epoch's one Spark job is the pre-fold ops projection; the chain
# evaluation itself runs through the vectorized numpy fold
# (tx/driver_cascade.py ops_fold).  TSPOON_OPS_FOLD=0 pins the JVM fold
# for comparisons/tests.  The txn threshold bounds the regime by the
# PREVIOUS epoch's size: paired A/B at sf0.1 shows the fold winning
# across the whole local operating range (100-txn floor -53%, 26k-txn
# pin -66%, 150k-txn pin -46%, ~20k-txn tps epochs +17%), and the
# round-13 boundary probe (tools/ops_fold_threshold_probe.py, sf1,
# 100k keyspace) extends that: 300k/400k/500k/600k/800k-txn epochs run
# 23%/31%/42%/21%/24% faster on the fold with NO crossover, so the
# default sits at the largest measured-win size — epochs past it fall
# back to the fused JVM fold (same driver-frame memory class either
# way — pandas mode always pulls batch-sized control frames).  Cluster
# sessions never take either driver path.
_OPS_FOLD = os.environ.get("TSPOON_OPS_FOLD", "1") != "0"
_OPS_FOLD_MAX_TXNS = int(os.environ.get("TSPOON_OPS_FOLD_MAX_TXNS", "800000"))


class _OpsFoldRetry(Exception):
    """Ops-fold epoch hit a data-dependent ineligibility at pull time:
    re-run the same epoch on the standard path (nothing committed)."""


def _dbg(label: str, t0: float) -> float:
    if _DEBUG:
        print(f"    [tspoon] {label}: {time.time() - t0:.2f}s", flush=True)
    return time.time()


def materialize_mode(spark) -> str:
    """Resolve the materialize mode for this session.

    Explicit TSPOON_MATERIALIZE wins; otherwise key off the master URL:
    'pandas' on local[*] (single-JVM, control frames trivially fit the
    driver), 'reliable' on any cluster master — a cluster session must
    never round-trip epoch control frames through toPandas() without an
    explicit opt-in."""
    if _MATERIALIZE is not None:
        return _MATERIALIZE
    master = spark.sparkContext.master
    # Match single-JVM masters precisely: 'local', 'local[4]',
    # 'local[*,2]'. 'local-cluster[...]' is multi-JVM and must take
    # the no-driver-round-trip branch like any real cluster.
    return "pandas" if re.match(r"local(\[|$)", master) else "reliable"


def materialize(df: DataFrame) -> DataFrame:
    """Cut lineage on a per-epoch DataFrame.

    Modes (TSPOON_MATERIALIZE, default auto — see materialize_mode):
    'pandas' round-trips through Arrow to a LocalRelation —
    pathology-free and right-sized for the control-plane frames of an
    epoch (votes, replay queue, resolved updates), which are bounded by
    batch size, not state size; 'reliable' uses rdd.checkpoint() to the
    checkpoint dir (the cluster default: control frames may exceed
    driver memory); 'ckpt' is eager localCheckpoint (both distributed
    modes showed super-linear per-epoch job slowdowns over long replay
    chains in Spark 4.1 local mode — see tools/dbg_epoch.py)."""
    spark = df.sparkSession
    mode = materialize_mode(spark)
    if mode == "pandas":
        pdf = df.toPandas()
        out = spark.createDataFrame(pdf, schema=df.schema)
        # driver-side twin: control-plane scans (abort counts, the
        # contamination flag, replay counts) read it for free instead
        # of launching a Spark job per check — worth ~0.1-0.2 s/job on
        # the epoch latency floor. Distributed modes skip it and the
        # callers fall back to Spark actions.
        out._tspoon_pdf = pdf
        return out
    if mode == "reliable":
        if not spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
            import tempfile

            spark.sparkContext.setCheckpointDir(tempfile.mkdtemp(prefix="tspoon_ckpt_"))
        # (persist-before-checkpoint measured NO gain here — the epoch
        # control frames are small enough that the checkpoint's lineage
        # recompute is noise against per-job dispatch; see
        # tools/bench_cluster_probe.py + BENCHNOTES round-9 row)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from t_spoon_spark.tx import graph as G
from t_spoon_spark.tx.namespace import Namespace
from t_spoon_spark.tx.vote import ABORT, COMMIT, REPLAY, vote_name

EPOCH_TID_SHIFT = 40  # tid = (epoch+1) << 40 | row-id; replays keep old (smaller) tids

# cascade refold strategy threshold: key-local refold below this abort
# fraction, plain full refold above (module-level so tests can pin
# either path and assert result identity)
FULL_REFOLD_FRAC = 0.05


def _per_key_votes(evaluated: DataFrame) -> DataFrame:
    """Stage-level vote per tid from the per-(key, tid) evaluation:
    global vote = lattice MAX; any_commit = did any single key's link
    commit (per-key granularity — a txn can abort on one key and
    chain-commit another inside the same stage, which is exactly the
    contamination the abort cascade must see)."""
    return evaluated.groupBy("_tid").agg(
        F.max("vote").alias("vote"),
        F.max(F.when(F.col("vote") == COMMIT, 1).otherwise(0)).alias("any_commit"),
    )


def _stage_outputs(evaluated: DataFrame, stage_idx: int) -> tuple[DataFrame, DataFrame]:
    """(link_votes, writes) from a normalized per-(key, tid) evaluation
    frame (key, _tid, value, vote, _ord, __wr): every state impl reduces
    its evaluation through this one helper so the abort cascade can
    rebuild identical outputs from a key-filtered slice of the cached
    frame. link_votes stays UNGROUPED (one row per key-link) — the close
    unions all stages' links and reduces them in a single groupBy,
    saving one shuffle per state stage."""
    votes = evaluated.select("_tid", "vote")
    writes = evaluated.filter(F.col("__wr")).select(
        "key",
        "value",
        "_tid",
        F.col("_ord").cast("long").alias("_ord"),
        F.lit(stage_idx).alias("_stage"),
    )
    return votes, writes


class EpochResult:
    """One epoch's outputs.

    ``results`` is the TransactionResult stream
    (tgraph/TransactionResult.java:8-15): original record + (_tid, _ts,
    vote, updates array<struct<ns,key,value>>).  Its DataFrame is built
    LAZILY on first access — the plan construction (unions + to_json
    over every namespace) costs ~0.3 s of driver time per epoch, pure
    overhead for throughput/latency paths that only read vote_counts()
    off the materialized vote frame."""

    def __init__(
        self,
        epoch: int,
        results,  # DataFrame or zero-arg thunk returning one
        stream: DataFrame,
        spu_results: DataFrame | None,
        n_replay: int,
        votes: DataFrame | None = None,
    ):
        self.epoch = epoch
        self._results = results
        # the transformed stream after all stages (reference exposes it
        # via sinks on the closed TStream; tests golden-check it)
        self.stream = stream
        self.spu_results = spu_results
        self.n_replay = n_replay
        # materialized (_tid, vote:int) frame — lets vote accounting run
        # off the small control frame instead of the results plan
        self.votes = votes

    @property
    def results(self) -> DataFrame:
        if callable(self._results):
            self._results = self._results()
        return self._results

    def vote_counts(self) -> dict[str, int]:
        if self.votes is not None:
            pdf = getattr(self.votes, "_tspoon_pdf", None)
            if pdf is not None:  # driver twin: zero Spark jobs
                from t_spoon_spark.tx.vote import VOTE_NAMES

                counts = pdf["vote"].value_counts()
                return {VOTE_NAMES[int(v)]: int(n) for v, n in counts.items()}
            rows = (
                self.votes.select(vote_name(F.col("vote")).alias("v")).groupBy("v").count().collect()
            )
            return {r["v"]: r["count"] for r in rows}
        rows = self.results.groupBy("vote").count().collect()
        return {r["vote"]: r["count"] for r in rows}


class GraphRunner:
    def __init__(self, env, tgraph: G.TGraph):
        self.env = env
        self.graph = tgraph
        self._replay: DataFrame | None = None  # source cols + _tid
        self._epoch_persisted: list[DataFrame] = []
        # driver-cascade compile cache (per runner — the graph is
        # immutable): None = not tried, False = ineligible, list = twins
        self._dc_compiled = None
        self._stage_ctxs: list = []
        # rendered chain-update SQL per stage (py4j round-trips once per
        # runner, not once per epoch)
        self._chain_sql_cache: dict = {}
        # True when every txn provably reaches a state stage (links
        # cover tids): the driver close then derives the epoch tid set
        # from the pulled links instead of a second source scan + union
        # branch. Computed once — the graph is immutable.
        self._tids_covered: bool | None = None
        # ops-fold hot path (round 12): per-epoch engage flag, static
        # graph eligibility (computed once after compile), last driver
        # epoch's txn count (the small-epoch regime detector), and the
        # retry latch that pins one re-run to the standard path after a
        # data-dependent pull-time ineligibility
        self._ops_fold_epoch = False
        self._of_static: bool | None = None
        self._last_txns: int | None = None
        self._of_retry = False

    # ------------------------------------------------------------------

    def run_epoch(
        self,
        batch: DataFrame | None,
        spus: DataFrame | None = None,
        batch_id: int | None = None,
        query_id: str | None = None,
    ) -> EpochResult:
        # one in-flight epoch per environment: concurrent streaming
        # queries (multi-TGraph) call this from separate foreachBatch
        # threads, and the store admits exactly one epoch at a time.
        # last_lock_wait_s records how long THIS epoch queued behind the
        # other graphs' epochs — the contended-latency bench reads it to
        # split trigger-to-commit into lock wait vs epoch work.
        t_lock = time.time()
        with self.env.epoch_lock:
            self.last_lock_wait_s = time.time() - t_lock
            saved_replay = self._replay
            try:
                return self._run_epoch_locked(batch, spus, batch_id, query_id)
            except _OpsFoldRetry as e:
                # ops-fold pull hit a data-dependent ineligibility:
                # nothing committed — restore the consumed replay queue
                # and run the SAME epoch once on the standard path
                if _DEBUG:
                    print(f"    [tspoon] ops-fold retry: {e}", flush=True)
                self._replay = saved_replay
                self._of_retry = True
                try:
                    return self._run_epoch_locked(batch, spus, batch_id, query_id)
                finally:
                    self._of_retry = False

    def _run_epoch_locked(
        self,
        batch: DataFrame | None,
        spus: DataFrame | None = None,
        batch_id: int | None = None,
        query_id: str | None = None,
    ) -> EpochResult:
        # Session AQE setting is respected as-is: AQE's per-shuffle
        # re-planning costs ~40% wall on SMALL epochs (a latency-floor
        # deployment should disable it on the session, as the latency
        # bench does) but pays for itself on large ones — measured
        # 2.6x PL4 throughput at sf0.1 with AQE on vs off.
        env = self.env
        store = env.store
        epoch = store.committed_epoch() + 1
        self._epoch_persisted = []
        self._stage_ctxs = []
        self._batch_id = batch_id
        self._query_id = query_id

        src, stamped = self._stamp(batch, epoch)
        if self._replay is not None:
            src = src.unionByName(self._replay) if src is not None else self._replay
            self._replay = None
        if src is None:
            raise ValueError("run_epoch: no batch and no pending replays")
        if stamped:
            # monotonically_increasing_id tids are plan-dependent; freeze
            # them so graph execution and replay extraction agree. Sources
            # that ship their own stable `_tid` (all built-in generators,
            # the gate fixtures, the bench) skip this entirely — the
            # cluster-scale path never round-trips the data plane.
            src = materialize(src)

        self._ops_fold_epoch = not self._of_retry and self._ops_fold_ok(
            src, stamped, spus
        )

        df = src.select(
            "*",
            F.col("_tid").alias("_ts"),
            F.array().cast("array<int>").alias("_path"),
            F.lit(True).alias("_alive"),
        )

        if self._tids_covered is None:
            # needs the per-position frames the stage fns see, so it
            # rides the first epoch's stage walk (analysis only, no job)
            self._tids_covered = G.links_cover_tids(self.graph, df)
        state_jobs: list[tuple[DataFrame, G.StateStage, int]] = []
        for idx, stage in enumerate(self.graph.stages):
            if isinstance(stage, G.MapStage):
                df = G.apply_map(df, stage)
            elif isinstance(stage, G.FlatMapStage):
                df = G.apply_flat_map(df, stage)
            elif isinstance(stage, G.FilterStage):
                df = G.apply_filter(df, stage)
            elif isinstance(stage, G.KeyByStage):
                df = G.apply_key_by(df, stage)
            elif isinstance(stage, G.TWindowStage):
                df = G.apply_t_window(df, stage)
            elif isinstance(stage, G.StateStage):
                state_jobs.append((df, stage, idx))
            else:  # pragma: no cover
                raise TypeError(f"unknown stage {stage}")

        # Abort-cascade passes are possible only if some touched
        # namespace can abort at all; persisting the per-stage op frames
        # is only worth it then (a cascade pass refolds from the cached
        # ops instead of re-executing source + graph).
        any_invariant = any(
            self.env.namespaces[s.namespace].invariant
            or self.env.namespaces[s.namespace].py_invariant
            for _, s, _ in state_jobs
        )
        reruns: list = []

        def exec_states(
            excluded: DataFrame | None, full_refold: bool = False
        ) -> tuple[list[DataFrame], dict[str, list[DataFrame]]]:
            votes_parts: list[DataFrame] = []
            writes_parts: dict[str, list[DataFrame]] = {}
            if excluded is None:
                for sdf, stage, idx in state_jobs:
                    votes, writes, rerun = self._run_state(sdf, stage, idx, any_invariant)
                    reruns.append(rerun)
                    votes_parts.append(votes)
                    writes_parts.setdefault(stage.namespace, []).append(writes)
            else:
                for rerun, (_, stage, _) in zip(reruns, state_jobs):
                    votes, writes = rerun(excluded, full_refold)
                    votes_parts.append(votes)
                    writes_parts.setdefault(stage.namespace, []).append(writes)
            return votes_parts, writes_parts

        return self._close(epoch, src, df, exec_states, len(state_jobs), spus)

    def run_to_completion(
        self, batch: DataFrame, spus: DataFrame | None = None, max_epochs: int = 64
    ) -> list[EpochResult]:
        """Run the batch, then drain the replay queue (each drain epoch
        commits at least the oldest pending transaction, so this
        terminates)."""
        out = [self.run_epoch(batch, spus)]
        while out[-1].n_replay > 0:
            if len(out) >= max_epochs:
                raise RuntimeError(f"replay queue not drained after {max_epochs} epochs")
            out.append(self.run_epoch(None))
        return out

    # ------------------------------------------------------------------

    def _stamp(self, batch: DataFrame | None, epoch: int) -> tuple[DataFrame | None, bool]:
        """Returns (stamped batch, needed_plan_dependent_ids)."""
        if batch is None:
            return None, False
        if "_tid" in batch.columns:
            return batch, False
        base = (epoch + 1) << EPOCH_TID_SHIFT
        return batch.withColumn("_tid", F.lit(base) + F.monotonically_increasing_id()), True

    # -- state stage ----------------------------------------------------

    def _run_state(
        self, df: DataFrame, stage: G.StateStage, stage_idx: int, persist_ops: bool
    ) -> tuple[DataFrame, DataFrame, "object"]:
        """Returns (votes (_tid, vote), writes (key, value, _tid, _ord,
        _stage), rerun), where rerun(excluded_tids_df) recomputes the
        stage with the given transactions removed (abort cascade) —
        from the persisted op frame when persist_ops, so a cascade pass
        costs one refold, not a source + graph re-execution."""
        env = self.env
        ns = env.namespaces[stage.namespace]
        snapshot = env.store.read(ns.name)
        ops = df.filter(F.col("_alive")).withColumn("__key", stage.key(df).cast("string"))

        pandas_path = stage.py_update is not None or env.isolation in ("PL0", "PL1")
        if pandas_path:
            impl = self._state_chain_pandas
            kind = "pandas"
        elif stage.epoch_combine:
            impl = self._state_epoch_combine
            kind = "epoch_combine"
        elif env.isolation in ("PL3", "PL4"):
            impl = self._state_chain_expr
            kind = "chain_expr"
        else:
            impl = self._state_expr
            kind = "expr"

        # On the driver-close path each frame has exactly ONE consumer
        # (the pandas pull), so persist() is pure overhead — plan
        # analysis + cache write per epoch. `_dc_compiled is not False`
        # errs toward skipping on the first epoch; if compilation then
        # fails, that one epoch runs the distributed path uncached and
        # the next epoch persists again.
        self._skip_persist = (
            _DRIVER_CASCADE
            and kind != "expr"
            and self._dc_compiled is not False
            and materialize_mode(env.spark) == "pandas"
        )
        if persist_ops and not self._skip_persist:
            ops = ops.persist()
            self._epoch_persisted.append(ops)
        if self._ops_fold_epoch:
            # ops-fold hot path: the chain-fold plan is never BUILT this
            # epoch — per-epoch Catalyst re-analysis of the multi-KB
            # fold expression was the unloaded-latency floor (round 12).
            # The driver close pulls `ops` (a trivial projection) and
            # folds every chain with the vectorized twin; `rerun` below
            # handles evaluated=None by running impl fresh, so the
            # distributed-fallback contract is unchanged.
            votes = writes = evaluated = None
        else:
            votes, writes, evaluated = impl(ops, stage, ns, snapshot, stage_idx)

        # context for the driver-side cascade (tx/driver_cascade.py):
        # the fixpoint refolds from these exact frames when eligible
        from t_spoon_spark.tx.driver_cascade import StageCtx

        if kind in ("epoch_combine",) or (kind == "chain_expr" and stage.pre_combine):
            value_cols = list(stage.pre_combine)
        else:
            value_cols = [c for c in ops.columns if c not in (*G.META_COLS, "__key")]
        self._stage_ctxs.append(
            StageCtx(
                kind=kind,
                stage=stage,
                ns=ns,
                stage_idx=stage_idx,
                ops=ops,
                snapshot=snapshot,
                value_cols=value_cols,
                evaluated=evaluated,
            )
        )

        def rerun(excluded: DataFrame, full: bool = False) -> tuple[DataFrame, DataFrame]:
            # mark (don't drop) the excluded txns' ops: the refold
            # evaluates them against the clean chain without applying
            # their writes, so a contaminated abort can flip back to
            # COMMIT and leave the excluded set (C9 dependency replay)
            exf = excluded.select("_tid").withColumn("__exf", F.lit(1))
            marked = (
                ops.join(exf, "_tid", "left")
                .withColumn("__ex", F.coalesce(F.col("__exf"), F.lit(0)))
                .drop("__exf")
            )
            if evaluated is None or full:
                v, w, _ = impl(marked, stage, ns, snapshot, stage_idx)
                return v, w
            # A cascade pass refolds ONLY the keys where some excluded
            # txn CHAIN-COMMITTED a link in the original evaluation
            # (vote == COMMIT) — an excluded txn's local ABORT never
            # applied its write, so that key's chain folds
            # bit-identically under the exclusion and the original
            # (cached) evaluation stands verbatim, including the
            # excluded txn's own link vote.  Refold cost is therefore
            # proportional to the CONTAMINATED key set, not even the
            # touched key set: at cluster scale an epoch of 10^7 txns
            # with 100 contended keys refolds at most 100 chains.
            # (The caller switches to a full refold when the abort
            # fraction is large — then the extra semi/anti joins cost
            # more than the refold they avoid.)
            affected = (
                evaluated.join(excluded, "_tid", "left_semi")
                .filter(F.col("vote") == COMMIT)
                .select(F.col("key").alias("__key"))
                .distinct()
            )
            marked_aff = marked.join(F.broadcast(affected), "__key", "left_semi")
            nv, nw, _ = impl(marked_aff, stage, ns, snapshot, stage_idx)
            keep_eval = evaluated.join(
                F.broadcast(affected.select(F.col("__key").alias("key"))),
                "key",
                "left_anti",
            )
            ov, ow = _stage_outputs(keep_eval, stage_idx)
            return nv.unionByName(ov), nw.unionByName(ow)

        return votes, writes, rerun

    def _state_expr(
        self,
        ops: DataFrame,
        stage: G.StateStage,
        ns: Namespace,
        snapshot: DataFrame,
        stage_idx: int,
    ) -> tuple[DataFrame, DataFrame, DataFrame | None]:
        """JVM-only path (whole-stage codegen end to end): one window
        aggregate for conflict detection + one join against the
        committed snapshot. This is the 100 TB hot path — no Python."""
        if stage.pre_combine:
            keep = [c for c in ops.columns if c in ("_tid", "_ts", "__key")]
            aggs = [F.expr(f"{how}({col})").alias(col) for col, how in stage.pre_combine.items()]
            ops = ops.groupBy(*keep).agg(*aggs)

        # PL2: everyone reads committed, everyone writes
        executing = F.lit(True)

        snap = snapshot.select(F.col("key").alias("__key"), F.col("value").alias("__v0"))
        joined = ops.join(snap, "__key", "left")
        v0 = F.coalesce(F.col("__v0"), F.lit(ns.default).cast(ns.value_type))
        joined = joined.withColumn("__cand", stage.update(v0))
        ok = _invariant_expr(ns)
        vote = F.when(ok, F.lit(COMMIT)).otherwise(F.lit(ABORT))
        evaluated = joined.select(
            F.col("_tid"),
            F.col("__key").alias("key"),
            F.col("__cand").alias("value"),
            vote.alias("vote"),
            F.col("_tid").alias("_ord"),
            executing.alias("__wr"),
        ).persist()  # consumed by votes, writes, and the results build
        self._epoch_persisted.append(evaluated)
        return (*_stage_outputs(evaluated, stage_idx), evaluated)

    def _state_chain_expr(
        self,
        ops: DataFrame,
        stage: G.StateStage,
        ns: Namespace,
        snapshot: DataFrame,
        stage_idx: int,
    ) -> tuple[DataFrame, DataFrame, DataFrame | None]:
        """PL3/PL4 serial per-key application in tid order, fully JVM.

        collect_list the key's ops sorted by tid, then one SQL
        ``aggregate()`` higher-order fold walks the chain: each element
        computes its candidate from the last *committed* value, checks
        the invariant, and records (tid, vote, value). One shuffle on
        the key (with map-side combine via pre_combine), no Python, no
        replay epochs — the entire conflict chain of a hot key resolves
        inside one epoch (vs one epoch per conflicting txn in the
        reference's optimistic REPLAY loop,
        tgraph/twopc/OpenOperator.java:287-357, with identical final
        state and votes: both realize serial tid-order execution with
        committed-only visibility).

        Skew note: a key's chain is inherently sequential (each link
        reads the previous committed value), so a hot key serializes in
        one task here exactly as it serializes on one shard in the
        reference; pre_combine keeps the array at one element per
        transaction.
        """
        vt = ns.value_type
        # cascade refolds mark rows of currently-excluded txns with
        # __ex=1: those links are EVALUATED against the clean chain
        # (their vote can flip back to COMMIT — reference C9 dependency
        # replay) but never advance it and never write
        has_ex = "__ex" in ops.columns
        ex_cols = [F.col("__ex")] if has_ex else []
        if stage.pre_combine:
            aggs = [
                F.expr(f"{how}({col})").alias(col) for col, how in stage.pre_combine.items()
            ]
            if has_ex:
                aggs.append(F.max("__ex").alias("__ex"))
            # one shuffle, not two: hash-partitioning on __key satisfies
            # the (tid, key) clustering of the pre-combine AND the key
            # clustering of the chain groupBy, so both aggregates run
            # exchange-free on top of a single repartition.  Trade-off
            # at scale: the key shuffle moves raw ops (no map-side
            # combine first), but op count per txn is bounded by the
            # graph's flat_map fan-out — batch-sized either way.
            ops = ops.repartition(F.col("__key"))
            ops = ops.groupBy("_tid", "__key").agg(*aggs)
            value_cols = list(stage.pre_combine)
            # __ex LAST in the struct: sort_array order is decided by
            # the (tid[, path], values) prefix exactly as before
            elem = F.struct(F.col("_tid"), *[F.col(c) for c in value_cols], *ex_cols)
        else:
            value_cols = [
                c for c in ops.columns if c not in (*G.META_COLS, "__key", "__ex")
            ]
            # _path after _tid: intra-transaction ops apply in lineage order
            elem = F.struct(
                F.col("_tid"), F.col("_path"), *[F.col(c) for c in value_cols], *ex_cols
            )

        sql_key = (id(stage), tuple(value_cols))
        cand = self._chain_sql_cache.get(sql_key)
        if cand is None:
            try:
                cand = _chain_update_sql(self.env.spark, stage, value_cols)
            except Exception as e:  # pragma: no cover - exotic expressions
                raise ValueError(
                    f"state('{ns.name}'): cannot derive a SQL chain from the update "
                    f"expression ({e}); supply py_update for the pandas chain path"
                ) from e
            self._chain_sql_cache[sql_key] = cand
        ok = _chain_invariant_sql(ns, cand, vt, value_cols)

        grouped = ops.groupBy("__key").agg(F.sort_array(F.collect_list(elem)).alias("__ops"))
        snap = snapshot.select(F.col("key").alias("__key"), F.col("value").alias("__v0"))
        joined = grouped.join(snap, "__key", "left").withColumn(
            "__v0f", F.coalesce(F.col("__v0"), F.lit(ns.default).cast(vt))
        )
        # applied = the link passed AND its txn is not excluded; only
        # applied links advance the chain or write, but every link's
        # vote is recorded (excluded txns re-evaluate on the clean chain).
        # The fold's accumulated struct stays as LEAN as the variant
        # allows — array_append copies the accumulator per link, so
        # every extra field is O(chain) copies: 'wr' only exists in the
        # __ex variant (round 0 derives it from the vote), 'rec' only
        # when the fused driver pull can use it.
        applied = f"(({ok}) AND x.__ex = 0)" if has_ex else ok
        # single-pass dual output: with a single-column pre-combine the
        # link struct also carries the pre-combined RECORD value ('rec'),
        # so the driver close's fused pull reads both the evaluation AND
        # the refoldable ops from ONE execution of the epoch slice
        # (previously the ops rode a second union branch that re-ran
        # source + graph + the pre-combine shuffle).
        has_rec = bool(stage.pre_combine) and len(value_cols) == 1 and not has_ex
        rec_dt = ops.schema[value_cols[0]].dataType.simpleString() if has_rec else None
        rec_field = f",\n                'rec', x.{value_cols[0]}" if has_rec else ""
        rec_type = f", rec: {rec_dt}" if has_rec else ""
        wr_field = f",\n                'wr', CASE WHEN {applied} THEN true ELSE false END" if has_ex else ""
        wr_type = ", wr: boolean" if has_ex else ""
        fold = f"""aggregate(
            __ops,
            named_struct(
              'value', CAST(__v0f AS {vt}),
              'votes', CAST(array() AS array<struct<tid: bigint, vote: int, value: {vt}{wr_type}{rec_type}>>)),
            (acc, x) -> named_struct(
              'value', CASE WHEN {applied} THEN CAST({cand} AS {vt}) ELSE acc.value END,
              'votes', array_append(acc.votes, named_struct(
                'tid', x._tid,
                'vote', CASE WHEN {ok} THEN {COMMIT} ELSE {ABORT} END,
                'value', CASE WHEN {ok} THEN CAST({cand} AS {vt}) ELSE acc.value END{wr_field}{rec_field}))))"""
        rec_cols = [F.col("__v.rec").alias("__rec")] if has_rec else []
        # round 0 (no __ex): a link writes iff it chain-committed; the
        # __ex variant carries the applied flag explicitly
        wr_col = (
            F.col("__v.wr") if has_ex else (F.col("__v.vote") == COMMIT)
        )
        # cache the PARSED fold Column, not just its SQL text: the
        # multi-KB expression otherwise round-trips through the JVM
        # parser once per epoch (Columns are immutable and reusable
        # across epoch frames)
        fold_key = (id(stage), tuple(value_cols), has_ex, has_rec)
        fold_col = self._chain_sql_cache.get(fold_key)
        if fold_col is None:
            fold_col = F.expr(fold)
            self._chain_sql_cache[fold_key] = fold_col
        evaluated = (
            joined.select(
                "__key", F.posexplode(fold_col.getField("votes")).alias("__pos", "__v")
            )
            .select(
                F.col("__key").alias("key"),
                F.col("__v.tid").alias("_tid"),
                F.col("__v.value").alias("value"),
                F.col("__v.vote").alias("vote"),
                # _ord = CHAIN POSITION, not tid: a txn with several ops
                # on one key (no pre-combine) yields several links with
                # the SAME tid, and a tid-based ordinal would tie the
                # close's last-writer resolution — the position makes
                # "last chain link wins" exact and deterministic.
                F.col("__pos").cast("long").alias("_ord"),
                # only APPLIED links are writes (chain-committed and
                # not excluded); the close's commit filter (global
                # vote) prunes cross-namespace aborts on top.
                wr_col.alias("__wr"),
                *rec_cols,
            )
        )
        # several epoch actions consume this frame (vote merge, writes,
        # contamination check, results build) — cache it executor-side
        # so the collect_list+fold shuffle runs once, not per action.
        # (Driver-close mode: single consumer, skip the cache.)
        if not getattr(self, "_skip_persist", False):
            evaluated = evaluated.persist()
            self._epoch_persisted.append(evaluated)
        return (*_stage_outputs(evaluated, stage_idx), evaluated)

    def _state_epoch_combine(
        self,
        ops: DataFrame,
        stage: G.StateStage,
        ns: Namespace,
        snapshot: DataFrame,
        stage_idx: int,
    ) -> tuple[DataFrame, DataFrame, DataFrame | None]:
        """Associative fold of the whole epoch per key: one groupBy with
        map-side partial aggregation + one join against the snapshot.
        Every transaction votes COMMIT (no invariant, no conflicts) —
        the engine's transactional analogue of the reference's keyed
        continuous reduce (evaluation/SPUBench.java:198-258), but with
        the epoch's atomic commit. The high-throughput path for
        counter/sum state at 100 TB scale."""
        aggs = [F.expr(f"{how}({col})").alias(col) for col, how in stage.pre_combine.items()]
        # cascade refolds mark excluded txns' rows: they contribute
        # nothing to the combine but still vote COMMIT (no invariant can
        # fail here), so their global verdict rests on the chain stages
        contrib = ops.filter(F.col("__ex") == 0) if "__ex" in ops.columns else ops
        combined = contrib.groupBy("__key").agg(*aggs)
        snap = snapshot.select(F.col("key").alias("__key"), F.col("value").alias("__v0"))
        joined = combined.join(snap, "__key", "left")
        v0 = F.coalesce(F.col("__v0"), F.lit(ns.default).cast(ns.value_type))
        # _tid = -1 sentinel: an epoch-combined write belongs to every
        # transaction of the epoch (all COMMIT), so it bypasses the
        # per-transaction commit filter at close.
        writes = joined.select(
            F.col("__key").alias("key"),
            stage.update(v0).alias("value"),
            F.lit(-1).cast("long").alias("_tid"),
            F.lit(0).cast("long").alias("_ord"),
            F.lit(stage_idx).alias("_stage"),
        )
        # link-vote rows (duplicates fine — the close's single groupBy
        # reduces them); every epoch-combined txn commits
        votes = ops.select("_tid", F.lit(COMMIT).alias("vote"))
        # no per-(key, tid) evaluation exists for the associative fold —
        # a cascade pass always refolds in full (has_ec forces it)
        return votes, writes, None

    def _state_chain_pandas(
        self,
        ops: DataFrame,
        stage: G.StateStage,
        ns: Namespace,
        snapshot: DataFrame,
        stage_idx: int,
    ) -> tuple[DataFrame, DataFrame, DataFrame | None]:
        """Arrow-batched per-key fold — the general path for arbitrary
        Python state functions (reference StateFunction.apply) and for
        the dirty-read chains of PL0/PL1."""
        env = self.env
        isolation = env.isolation
        update = stage.py_update
        if update is None:
            raise ValueError(
                f"state('{ns.name}'): PL0/PL1 chains need py_update "
                "(expression updates can't fold through dirty reads)"
            )
        invariant = ns.py_invariant
        default = ns.default
        has_ex = "__ex" in ops.columns
        value_cols = [
            c for c in ops.columns if c not in (*G.META_COLS, "__key", "__ex")
        ]

        snap = snapshot.select(F.col("key").alias("__key"), F.col("value").alias("__v0"))
        joined = ops.join(snap, "__key", "left")

        out_schema = (
            f"key string, _tid long, value {ns.value_type}, vote int, _ord int, _exec boolean"
        )

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.copy()
            pdf["__ord"] = pdf["_path"].map(lambda p: tuple(p) if p is not None else ())
            pdf = pdf.sort_values(["_tid", "__ord"], kind="mergesort")
            key = pdf["__key"].iloc[0]
            v0 = pdf["__v0"].iloc[0]
            if v0 is None or (isinstance(v0, float) and pd.isna(v0)):
                v0 = default
            rows = []
            chain_v = v0
            for pos, (_, r) in enumerate(pdf.iterrows()):
                rec = {c: r[c] for c in value_cols}
                tid = int(r["_tid"])
                # cascade refold: excluded txns evaluate on the clean
                # chain (vote can flip back — C9 replay) but never
                # advance it and never write
                ex = bool(r["__ex"]) if has_ex else False
                # PL3/PL4: serial tid-order chain with committed-only
                # visibility; PL0/PL1: dirty chain; PL2: committed-at-open
                base = chain_v if isolation in ("PL0", "PL1", "PL3", "PL4") else v0
                cand = update(base, rec)
                ok = invariant(cand) if invariant else True
                rows.append((key, tid, cand, COMMIT if ok else ABORT, pos, ok and not ex))
                if isolation in ("PL0", "PL1"):
                    chain_v = cand  # dirty: visible to the next op regardless of outcome
                elif isolation in ("PL3", "PL4") and ok and not ex:
                    chain_v = cand  # committed-only chain
            return pd.DataFrame(
                rows, columns=["key", "_tid", "value", "vote", "_ord", "_exec"]
            )

        evaluated = (
            joined.groupBy("__key")
            .applyInPandas(fold, out_schema)
            .withColumnRenamed("_exec", "__wr")
        )
        if not getattr(self, "_skip_persist", False):
            # the Arrow fold is the expensive part; cache it
            evaluated = evaluated.persist()
            self._epoch_persisted.append(evaluated)
        return (*_stage_outputs(evaluated, stage_idx), evaluated)

    # -- driver cascade eligibility --------------------------------------

    def _ops_fold_ok(self, src, stamped: bool, spus) -> bool:
        """Per-epoch engage test for the ops-fold hot path (round-12
        unloaded-latency floor): skip BUILDING the chain-fold plan
        entirely and evaluate every chain driver-side with the
        vectorized fold.  Conservative by construction — every condition
        a pull can't verify later must hold up front; epochs past the
        size threshold (previous driver epoch > _OPS_FOLD_MAX_TXNS
        txns) fall back to the fused JVM fold.  First eligible epoch is
        the runner's second: the compile (and the size signal) come
        from a standard epoch."""
        if not (_OPS_FOLD and _DRIVER_CASCADE) or stamped or spus is not None:
            return False
        if not isinstance(self._dc_compiled, list):
            return False
        if self._last_txns is None or self._last_txns > _OPS_FOLD_MAX_TXNS:
            return False
        if materialize_mode(self.env.spark) != "pandas":
            return False
        if not (
            self._tids_covered or getattr(src, "_tspoon_pdf", None) is not None
        ):
            return False
        return bool(self._of_static)

    def _driver_cascade_or_none(self, spark):
        """A DriverCascade for this epoch, or None when the distributed
        refold loop must run instead (cluster materialize mode, the
        feature flag, or a stage without a compilable python twin)."""
        from t_spoon_spark.tx import driver_cascade as dcm

        if not _DRIVER_CASCADE or materialize_mode(spark) != "pandas":
            return None
        if not self._stage_ctxs or any(c.kind == "expr" for c in self._stage_ctxs):
            return None
        if self._dc_compiled is False:
            return None
        if self._dc_compiled is None:
            try:
                self._dc_compiled = [
                    dcm.compile_stage(spark, c, self._chain_sql_cache)
                    for c in self._stage_ctxs
                ]
            except dcm.Ineligible as e:
                if _DEBUG:
                    print(f"    [tspoon] driver cascade ineligible: {e}", flush=True)
                self._dc_compiled = False
                return None
            # static ops-fold eligibility, once per runner: the mirror
            # of _vec_init's shape conditions (the data-dependent ones —
            # NaN records — are re-checked at pull time every epoch)
            self._of_static = all(
                c.kind == "chain_expr"
                and bool(c.stage.pre_combine)
                and len(c.value_cols) == 1
                and k.update_vec is not None
                and (k.invariant is None or k.invariant_vec is not None)
                and k.cast is dcm._to_float
                and c.ns.default is not None
                for c, k in zip(self._stage_ctxs, self._dc_compiled)
            )
        return dcm.DriverCascade(
            spark,
            self._stage_ctxs,
            self._dc_compiled,
            ops_fold=self._ops_fold_epoch,
        )

    # -- close ----------------------------------------------------------

    def _merge_votes(self, tids: DataFrame, votes_parts: list[DataFrame]) -> DataFrame:
        """Global vote per transaction: MAX over the lattice across all
        state stages (ReduceVotesFunction + multi-exit second reduce,
        tgraph/TransactionEnvironment.java:338-366, collapsed into one
        groupBy because the epoch barrier already saw every record).

        Also carries ``any_commit`` (did the txn chain-commit at least
        one per-key link on some stage?) so the abort-cascade
        contamination check reads the materialized vote frame instead of
        re-driving the writes plans — one fewer Spark job per cascade
        round."""
        if votes_parts:
            all_votes = votes_parts[0]
            for v in votes_parts[1:]:
                all_votes = all_votes.unionByName(v)
            # one reduce over the flat union of every stage's key-links
            merged = _per_key_votes(all_votes)
        else:
            merged = tids.withColumn("vote", F.lit(COMMIT)).withColumn(
                "any_commit", F.lit(0)
            ).limit(0)
        # In a latency-tuned session (AQE off — small epochs), the
        # static planner would sort-merge the fill join; hint broadcast
        # instead (the frame is collected to the driver right after the
        # join anyway in pandas mode). With AQE on, leave the choice to
        # runtime stats — a 10^7-txn epoch's vote frame should not be
        # force-broadcast.
        spark = tids.sparkSession
        if (
            materialize_mode(spark) == "pandas"
            and spark.conf.get("spark.sql.adaptive.enabled", "true") == "false"
        ):
            merged = F.broadcast(merged)
        # a tid absent from every state stage wrote nothing: it commits
        # and cannot contaminate (any_commit = 0)
        return tids.join(merged, "_tid", "left").fillna(
            COMMIT, subset=["vote"]
        ).fillna(0, subset=["any_commit"])

    def _close(
        self,
        epoch: int,
        src: DataFrame,
        stream: DataFrame,
        exec_states,
        n_state: int,
        spus: DataFrame | None,
    ) -> EpochResult:
        env = self.env
        store = env.store

        t0 = time.time()
        tids = src.select("_tid")
        votes_parts, writes_parts = exec_states(None)
        spark = tids.sparkSession

        # Driver-side close (pandas materialize mode + compiled python
        # twins, tx/driver_cascade.py): ONE Spark job per chain stage —
        # the evaluation pull — then vote merge, abort-cascade fixpoint,
        # and finals resolution all in pandas over batch-sized control
        # frames.  Replaces both the fused union job and the distributed
        # cascade loop; ineligible graphs and cluster sessions fall
        # through to those paths unchanged.
        dc = self._driver_cascade_or_none(spark) if n_state > 0 else None
        if dc is not None:
            from t_spoon_spark.tx.driver_cascade import Ineligible

            try:
                return self._driver_close(epoch, src, stream, tids, spus, dc, t0)
            except Ineligible as e:
                if self._ops_fold_epoch:
                    # the ops-fold epoch never built the evaluation
                    # plans, so there is no in-place fallback — re-run
                    # the whole epoch on the standard path WITHOUT
                    # disabling the driver cascade (the ineligibility is
                    # data-dependent and per-epoch, not structural)
                    raise _OpsFoldRetry(str(e)) from e
                # belt-and-braces: a pull-time ineligibility (shapes the
                # compile gate cannot see) falls back to the distributed
                # close below — nothing was committed yet, and the
                # exec_states frames are untouched
                if _DEBUG:
                    print(f"    [tspoon] driver close fell back: {e}", flush=True)
                self._dc_compiled = False

        # Fused no-abort fast path: ONE Spark job per epoch instead of
        # two. The votes materialize and the commit's state cut are the
        # two per-epoch actions; here they ride a single union frame
        # (tids ∪ link votes ∪ OPTIMISTIC per-key finals — the resolved
        # state assuming every transaction commits). Driver-side we
        # check the votes: all COMMIT → the optimistic finals are exact
        # and the store merges them in pandas with zero further jobs;
        # any ABORT/REPLAY → discard the finals and fall through to the
        # standard cascade + commit path (the wasted work is one window
        # over the already-cached evaluation frame). Only engaged on
        # the local pandas materialize path with small namespaces that
        # share one value type (one union frame needs one value column
        # type) — a cluster session never routes epoch state through
        # the driver (materialize_mode 'reliable').
        fused_updates_pdf = None  # {ns_name: finals pdf} when the fast path lands
        fuse_types = {env.namespaces[n].value_type for n in writes_parts}
        fusable = (
            _FUSED
            and spus is None
            and bool(votes_parts)
            and len(fuse_types) == 1  # one union frame needs one value type
            and all(store.can_commit_pandas(n) for n in writes_parts)
        )
        if fusable and materialize_mode(spark) == "pandas":
            vt = next(iter(fuse_types))
            w = None
            for ns_name, parts in writes_parts.items():
                for p in parts:
                    tagged = p.withColumn("__ns", F.lit(ns_name))
                    w = tagged if w is None else w.unionByName(tagged)
            rn = F.row_number().over(
                W.partitionBy("__ns", "key").orderBy(F.desc("_stage"), F.desc("_ord"))
            )
            finals = w.withColumn("__rn", rn).filter(F.col("__rn") == 1)
            links = votes_parts[0]
            for v in votes_parts[1:]:
                links = links.unionByName(v)
            # _tid, vote AND value use typed sentinels (never nulls) on
            # the parts that don't carry them: a null in an int64 Arrow
            # column degrades the whole pandas column to float64 —
            # stamped tids ((epoch+1)<<40 | row) exceed 2^53 from epoch
            # ~8191 and would collide, and a BIGINT namespace's values
            # past 2^53 would silently round in the merged twin.
            combined = (
                tids.select(
                    F.lit(0).alias("__part"),
                    "_tid",
                    F.lit(-1).cast("int").alias("vote"),
                    F.lit(None).cast("string").alias("__ns"),
                    F.lit(None).cast("string").alias("key"),
                    F.lit(0).cast(vt).alias("value"),
                )
                .unionByName(
                    links.select(
                        F.lit(1).alias("__part"),
                        "_tid",
                        F.col("vote").cast("int"),
                        F.lit(None).cast("string").alias("__ns"),
                        F.lit(None).cast("string").alias("key"),
                        F.lit(0).cast(vt).alias("value"),
                    )
                )
                .unionByName(
                    finals.select(
                        F.lit(2).alias("__part"),
                        F.lit(-1).cast("long").alias("_tid"),
                        F.lit(-1).cast("int").alias("vote"),
                        "__ns",
                        "key",
                        F.col("value").cast(vt),
                    )
                )
            )
            cpdf = getattr(materialize(combined), "_tspoon_pdf", None)
            if cpdf is not None:
                import pandas as pd

                lk = cpdf[cpdf["__part"] == 1]
                gv = (
                    lk.groupby("_tid", as_index=False)
                    .agg(
                        vote=("vote", "max"),
                        any_commit=("vote", lambda s: int((s == COMMIT).any())),
                    )
                    if len(lk)
                    else pd.DataFrame(columns=["_tid", "vote", "any_commit"])
                )
                all_tids = cpdf[cpdf["__part"] == 0][["_tid"]].drop_duplicates()
                gv_pdf = all_tids.merge(gv, on="_tid", how="left")
                gv_pdf["vote"] = gv_pdf["vote"].fillna(COMMIT).astype("int32")
                gv_pdf["any_commit"] = (
                    gv_pdf["any_commit"].fillna(0).astype("int32")
                )
                gvotes = spark.createDataFrame(
                    gv_pdf, schema="_tid long, vote int, any_commit int"
                )
                gvotes._tspoon_pdf = gv_pdf
                if int((gv_pdf["vote"] != COMMIT).sum()) == 0:
                    fin = cpdf[cpdf["__part"] == 2]
                    fused_updates_pdf = {
                        ns_name: fin[fin["__ns"] == ns_name][["key", "value"]]
                        .reset_index(drop=True)
                        for ns_name in writes_parts
                    }
            else:  # pragma: no cover - pandas mode always yields a twin
                gvotes = materialize(self._merge_votes(tids, votes_parts))
        else:
            gvotes = materialize(self._merge_votes(tids, votes_parts))
        t0 = _dbg("gvotes", t0)

        # Forward abort cascade (the epoch-model analogue of the
        # reference's dependency tracking + StrictnessEnforcer replay,
        # tgraph/state/PL4DependencyTrackingStrategy.java:23-44 +
        # StandardDependencyTrackingStrategy.java:10-17): a transaction
        # can chain-commit on one key yet abort globally — another of
        # its keys, or another namespace, failed its invariant. Later
        # chain links on the committed keys were then computed over a
        # value that never commits. Re-run the state stages with the
        # aborted tids excluded until the abort SET is stable.  Each
        # refold EVALUATES excluded txns too (without applying their
        # writes), so a txn whose invariant failed only on a
        # contaminated chain flips back to COMMIT and re-enters — the
        # reference's C9 dependency REPLAY.  The fixpoint E = {txns
        # failing when chains apply exactly the non-E writes} is the
        # unique serial-replay answer: influence flows strictly forward
        # in tid order, so the k-th smallest tid's verdict is stable
        # from round k and the loop terminates in at most
        # longest-dependency-chain rounds. Cost: zero extra passes when
        # nothing aborts.
        driver_res = None
        if n_state > 0 and env.isolation in ("PL3", "PL4"):
            # epoch_combine folds every txn unconditionally, so its sums
            # must always be re-derived when something aborts — the
            # contamination short-circuit below is only sound without it.
            has_ec = any(
                isinstance(s, G.StateStage) and s.epoch_combine for s in self.graph.stages
            )
            prev_set: set = set()
            prev_df: DataFrame | None = None
            rounds = 0
            while True:
                # gvotes is materialized, so these are cheap local
                # scans; the excluded set stays rooted at the local vote
                # frame (broadcast join in rerun) — no driver collect of
                # tids, no extra materialize job. In pandas mode the
                # set diffs come off the driver-side twin with no Spark
                # job at all.
                gpdf = getattr(gvotes, "_tspoon_pdf", None)
                aborted = gvotes.filter(F.col("vote") == ABORT).select("_tid")
                if gpdf is not None:
                    ab_set = set(int(t) for t in gpdf.loc[gpdf["vote"] == ABORT, "_tid"])
                    n_aborted = len(ab_set)
                    if ab_set == prev_set:
                        break
                    has_replays = bool(prev_set - ab_set)
                    if not has_ec and not has_replays:
                        # early exit: no NEWLY aborted txn applied a
                        # single link write, so excluding it changes no
                        # chain — the votes are already the fixpoint.
                        # (Replays always force a refold: their writes
                        # must re-enter the chains.)
                        new_ab = ab_set - prev_set
                        nmask = (gpdf["vote"] == ABORT) & gpdf["_tid"].isin(new_ab)
                        if not bool((gpdf.loc[nmask, "any_commit"] == 1).any()):
                            break
                else:
                    # distributed branch (cluster 'reliable'/'ckpt'
                    # materialize): ONE control job per round instead of
                    # up to four (optimization r15, guide §5 — each
                    # count()/limit(1).count() was a full job dispatch
                    # on the multi-JVM path, and the cascade pays them
                    # EVERY round).  gvotes carries every epoch tid
                    # exactly once (tids left-joined to the per-tid vote
                    # merge), so prev-set membership rides one left join
                    # against the previous (checkpoint-rooted) abort set
                    # and all four control reads collapse into a single
                    # one-row aggregate: n_aborted, n_new (aborted ∧
                    # ∉prev), has_replays (∈prev ∧ no longer aborted),
                    # and the new-contamination flag (new abort that
                    # chain-committed a link) — bitwise the same
                    # break conditions as the four separate scans.
                    gv = (
                        gvotes.join(
                            prev_df.withColumn("__prev", F.lit(1)), "_tid", "left"
                        )
                        if prev_df is not None
                        else gvotes.withColumn("__prev", F.lit(None).cast("int"))
                    )
                    is_ab = F.col("vote") == ABORT
                    is_new = is_ab & F.col("__prev").isNull()
                    ctl = gv.agg(
                        F.sum(is_ab.cast("long")).alias("n_ab"),
                        F.sum(is_new.cast("long")).alias("n_new"),
                        F.max(((~is_ab) & F.col("__prev").isNotNull()).cast("int")).alias(
                            "replays"
                        ),
                        F.max((is_new & (F.col("any_commit") == 1)).cast("int")).alias(
                            "contam"
                        ),
                    ).collect()[0]
                    n_aborted = int(ctl["n_ab"] or 0)
                    n_new = int(ctl["n_new"] or 0)
                    has_replays = bool(ctl["replays"])
                    if n_new == 0 and not has_replays:
                        break
                    if not has_ec and not has_replays and not bool(ctl["contam"]):
                        break
                # Fixpoint, not a fixed cap: per the tid-order argument
                # above the round count is bounded by the epoch's
                # longest dependency chain. A silent cap would commit
                # chain values embedding writes of globally-aborted txns
                # (atomicity violation); the guard only trips on a
                # convergence bug.
                rounds += 1
                if rounds > 100_000:  # pragma: no cover - bug trap
                    raise RuntimeError(
                        "abort cascade failed to converge: aborted set still "
                        f"changing after {rounds} rounds ({n_aborted} aborted)"
                    )
                excluded = aborted
                if gpdf is not None:
                    prev_set = ab_set
                prev_df = aborted
                # key-local refold pays off when aborted txns are a
                # sliver of the epoch (hot-key contention); past ~5%
                # the extra semi/anti joins cost more than the refold
                # they avoid — use the plain full refold there.
                n_txns = len(gpdf) if gpdf is not None else None
                full_refold = (
                    n_txns is not None and n_aborted > FULL_REFOLD_FRAC * n_txns
                )
                votes_parts, writes_parts = exec_states(excluded, full_refold)
                gvotes = materialize(self._merge_votes(tids, votes_parts))
                if _DEBUG:
                    t0 = _dbg(
                        f"cascade_round {rounds} aborted={n_aborted} "
                        f"full={full_refold}",
                        t0,
                    )
            t0 = _dbg("abort_cascade", t0)

        return self._finish_close(
            epoch, src, stream, gvotes, lambda: writes_parts, spus,
            fused_updates_pdf, driver_res, t0,
        )

    def _driver_close(
        self,
        epoch: int,
        src: DataFrame,
        stream: DataFrame,
        tids: DataFrame,
        spus: DataFrame | None,
        dc,
        t0: float,
    ) -> EpochResult:
        """Pandas-mode close via the driver cascade module: pull the
        evaluation links (the epoch's one real Spark job per stage),
        resolve votes/cascade/finals in pandas, re-enter Spark as
        LocalRelations."""
        env = self.env
        store = env.store
        spark = tids.sparkSession
        has_ec = any(
            isinstance(s, G.StateStage) and s.epoch_combine for s in self.graph.stages
        )
        src_pdf = getattr(src, "_tspoon_pdf", None)
        out = dc.close(
            store,
            src_pdf["_tid"] if src_pdf is not None else tids,
            has_ec,
            run_cascade=env.isolation in ("PL3", "PL4"),
            tids_covered=bool(self._tids_covered),
        )
        # small-epoch regime signal for the next epoch's ops-fold
        # decision (the hot path must never engage on a loaded epoch)
        self._last_txns = len(out.gv_pdf)
        gvotes = spark.createDataFrame(
            out.gv_pdf, schema="_tid long, vote int, any_commit int"
        )
        gvotes._tspoon_pdf = out.gv_pdf

        def writes_supplier() -> dict[str, list[DataFrame]]:
            return {
                ns_name: [
                    spark.createDataFrame(
                        w,
                        schema=(
                            f"key string, value {env.namespaces[ns_name].value_type},"
                            " _tid long, _ord long, _stage int"
                        ),
                    )
                    for w in parts
                ]
                for ns_name, parts in out.writes.items()
            }

        t0 = _dbg(f"driver_close rounds={out.rounds}", t0)
        return self._finish_close(
            epoch, src, stream, gvotes, writes_supplier, spus, None, out, t0
        )

    def _finish_close(
        self,
        epoch: int,
        src: DataFrame,
        stream: DataFrame,
        gvotes: DataFrame,
        writes_supplier,
        spus: DataFrame | None,
        fused_updates_pdf,
        driver_res,
        t0: float,
    ) -> EpochResult:
        """Post-cascade close: resolve finals, commit, build results —
        shared by the distributed and driver paths.  The updates /
        results plans are built lazily: an epoch that commits via the
        pandas store twin and is only asked for vote counts never pays
        their construction."""
        env = self.env
        store = env.store

        commit_tids = gvotes.filter(F.col("vote") == COMMIT).select("_tid")
        built: dict[str, object] = {}

        def updates_and_rows() -> tuple[dict[str, DataFrame], list[DataFrame]]:
            # each namespace's final value per key among committed
            # writes, plus the per-txn write-set rows for results
            if "u" in built:
                return built["u"]  # type: ignore[return-value]
            updates: dict[str, DataFrame] = {}
            upd_rows: list[DataFrame] = []
            for ns_name, parts in writes_supplier().items():
                w = parts[0]
                for p in parts[1:]:
                    w = w.unionByName(p)
                wc = w.filter(F.col("_tid") < 0).unionByName(
                    w.filter(F.col("_tid") >= 0).join(commit_tids, "_tid", "left_semi")
                )
                rn = F.row_number().over(
                    W.partitionBy("key").orderBy(F.desc("_stage"), F.desc("_ord"))
                )
                final = (
                    wc.withColumn("__rn", rn).filter(F.col("__rn") == 1).select("key", "value")
                )
                updates[ns_name] = final
                upd_rows.append(
                    wc.select(
                        "_tid",
                        F.lit(ns_name).alias("ns"),
                        "key",
                        F.to_json(F.struct(F.col("value").alias("v"))).alias("value"),
                    )
                )
            built["u"] = (updates, upd_rows)
            return built["u"]  # type: ignore[return-value]

        def build_results() -> DataFrame:
            # TransactionResult stream (tgraph/TransactionResult.java:8-15):
            # committed txns carry their write-set.
            if "r" in built:
                return built["r"]  # type: ignore[return-value]
            _updates, upd_rows = updates_and_rows()
            if upd_rows:
                u = upd_rows[0]
                for p in upd_rows[1:]:
                    u = u.unionByName(p)
                upd_agg = u.groupBy("_tid").agg(
                    F.collect_list(F.struct("ns", "key", "value")).alias("updates")
                )
            else:
                upd_agg = None
            results = src.join(gvotes.select("_tid", "vote"), "_tid").select(
                "*", F.col("_tid").alias("_ts")
            ).withColumn("vote", vote_name(F.col("vote")))
            if upd_agg is not None:
                results = results.join(upd_agg, "_tid", "left")
            else:
                results = results.withColumn(
                    "updates",
                    F.lit(None).cast("array<struct<ns:string,key:string,value:string>>"),
                )
            built["r"] = results
            return results

        spu_results = None
        pandas_commit = spus is None and (
            fused_updates_pdf is not None
            or (
                driver_res is not None
                and all(store.can_commit_pandas(n) for n in driver_res.finals)
            )
        )
        t0 = _dbg("build_updates", t0)
        if pandas_commit:
            # resolved finals already live driver-side (fused no-abort
            # materialize, or the driver close) — pandas merge, zero
            # Spark jobs
            store.commit_pandas(
                epoch,
                fused_updates_pdf if fused_updates_pdf is not None else driver_res.finals,
                batch_id=getattr(self, "_batch_id", None),
                query_id=getattr(self, "_query_id", None),
            )
        else:
            updates, _ = updates_and_rows()
            if spus is not None:
                # single-partition updates run after the epoch's txns
                spu_results, updates = self._apply_spus(spus, updates)
            wal = None
            if env.store.durable:
                results = build_results()
                wal = results.select(
                    "_tid", "_ts", "vote", F.to_json(F.col("updates")).alias("updates_json")
                )
            store.commit(
                epoch,
                updates,
                wal,
                batch_id=getattr(self, "_batch_id", None),
                query_id=getattr(self, "_query_id", None),
            )
        t0 = _dbg("commit", t0)

        # REPLAY queue: original source rows re-enter the next epoch
        # with their original tid (OpenOperator replay,
        # tgraph/twopc/OpenOperator.java:287-357 — ours waits for the
        # next epoch, which is when the conflicting txn has completed).
        # Chained PL3/PL4 resolves conflicts in-epoch, so REPLAY votes
        # only arise from explicitly replay-voting user stages (none of
        # the built-in paths emit them any more) — check cheaply on the
        # materialized vote frame before touching src.
        replay_tids = gvotes.filter(F.col("vote") == REPLAY).select("_tid")
        gpdf = getattr(gvotes, "_tspoon_pdf", None)
        n_replay = (
            int((gpdf["vote"] == REPLAY).sum()) if gpdf is not None else replay_tids.count()
        )
        if n_replay:
            self._replay = materialize(src.join(replay_tids, "_tid"))
        else:
            self._replay = None
        _dbg("replay", t0)

        for p in self._epoch_persisted:
            p.unpersist()
        self._epoch_persisted = []

        return EpochResult(
            epoch=epoch,
            results=build_results,  # lazy: built on first .results access
            stream=stream,
            spu_results=spu_results,
            n_replay=n_replay,
            votes=gvotes,
        )

    # -- SPU ------------------------------------------------------------

    def _apply_spus(
        self, spus: DataFrame, updates: dict[str, DataFrame]
    ) -> tuple[DataFrame, dict[str, DataFrame]]:
        """Single-partition updates (reference §2.5): per-key
        read-modify-write commands executed atomically per key, after
        this epoch's transactional writes (the reference interleaves at
        version-stability points; the epoch barrier is ours —
        tgraph/db/Shard.java:113-154).

        spus schema: (spu_id string, namespace string, key string,
        method string, args array<double>).
        """
        env = self.env
        all_results: list[DataFrame] = []
        new_updates = dict(updates)
        for ns_name in [r["namespace"] for r in spus.select("namespace").distinct().collect()]:
            ns = env.namespaces[ns_name]
            sub = spus.filter(F.col("namespace") == ns_name)
            post = env.store.read(ns_name)
            if ns_name in updates:
                post = env.store._upsert(post, updates[ns_name])
            snap = post.select(F.col("key"), F.col("value").alias("__v0"))
            joined = sub.join(snap, "key", "left")

            commands = dict(ns.commands)
            invariant = ns.py_invariant
            default = ns.default
            out_schema = (
                f"spu_id string, key string, method string, vote int, value {ns.value_type}, _final boolean"
            )

            def make_fold(_cmds, _inv, _def):
                def fold(pdf: pd.DataFrame) -> pd.DataFrame:
                    pdf = pdf.sort_values("spu_id", kind="mergesort")
                    v = pdf["__v0"].iloc[0]
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        v = _def
                    rows = []
                    last_commit_idx = -1
                    for i, (_, r) in enumerate(pdf.iterrows()):
                        fn = _cmds.get(r["method"])
                        if fn is None:
                            rows.append((r["spu_id"], r["key"], r["method"], ABORT, None, False))
                            continue
                        cand = fn(v, *(list(r["args"]) if r["args"] is not None else []))
                        ok = _inv(cand) if _inv else True
                        rows.append(
                            (r["spu_id"], r["key"], r["method"], COMMIT if ok else ABORT, cand, False)
                        )
                        if ok:
                            v = cand
                            last_commit_idx = i
                    if last_commit_idx >= 0:
                        rows[last_commit_idx] = rows[last_commit_idx][:5] + (True,)
                    return pd.DataFrame(
                        rows, columns=["spu_id", "key", "method", "vote", "value", "_final"]
                    )

                return fold

            fold = make_fold(commands, invariant, default)

            evaluated = materialize(joined.groupBy("key").applyInPandas(fold, out_schema))
            all_results.append(
                evaluated.select(
                    "spu_id", F.lit(ns_name).alias("ns"), "key", "method",
                    vote_name(F.col("vote")).alias("vote"),
                )
            )
            spu_final = evaluated.filter(F.col("_final")).select("key", "value")
            if ns_name in new_updates:
                new_updates[ns_name] = env.store._upsert(new_updates[ns_name], spu_final)
            else:
                new_updates[ns_name] = spu_final

        res = all_results[0]
        for p in all_results[1:]:
            res = res.unionByName(p)
        return res, new_updates


_ACC_TOKEN = "__chain_acc__"

# Spark SQL string literals: single- or double-quoted, backslash escapes,
# doubled '' inside single quotes. Captured so re.split keeps them.
_SQL_LITERAL = re.compile(r"""('(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.)*")""")


def _map_outside_literals(sql: str, fn) -> str:
    """Apply a text rewrite only to the parts of a SQL string that are
    NOT inside string literals — a column named `delta` must not rewrite
    the literal in ``... != 'delta'``."""
    parts = _SQL_LITERAL.split(sql)
    return "".join(p if i % 2 else fn(p) for i, p in enumerate(parts))


def _sub_cols(sql: str, cols: list[str], prefix: str = "x") -> str:
    """Rewrite bare/backticked column references to lambda-element field
    accesses (``delta`` -> ``x.delta``) for use inside a SQL
    ``aggregate()`` lambda. Longest names first so one column name being
    a prefix of another can't corrupt the rewrite; string literals are
    never touched."""

    def repl(seg: str) -> str:
        for c in sorted(cols, key=len, reverse=True):
            seg = re.sub(rf"`{re.escape(c)}`", f"{prefix}.{c}", seg)
            # trailing `.` excluded too: a column named `acc` must not
            # rewrite the accumulator reference `acc.value`.
            seg = re.sub(rf"(?<![\w.`]){re.escape(c)}(?![\w`.])", f"{prefix}.{c}", seg)
        return seg

    return _map_outside_literals(sql, repl)


def _chain_update_sql(spark, stage: G.StateStage, value_cols: list[str]) -> str:
    """Turn the stage's expression update (Column -> Column) into a SQL
    fragment usable inside an aggregate() lambda: the accumulator value
    becomes ``acc.value``, record columns become ``x.<col>``.

    Uses Catalyst's Expression.sql() on the unresolved column tree (the
    same rendering EXPLAIN uses); operators come back in function-call
    form (``\\`+\\`(a, b)``), which the Spark SQL parser accepts."""
    jc = stage.update(F.col(_ACC_TOKEN))._jc
    raw = spark._jsparkSession.expression(jc).sql()
    sql = _map_outside_literals(raw, lambda s: re.sub(rf"`?{_ACC_TOKEN}`?", "acc.value", s))
    return _sub_cols(sql, value_cols)


def _chain_invariant_sql(ns: Namespace, cand: str, vt: str, value_cols: list[str]) -> str:
    """Invariant SQL with `value` bound to the candidate chain value."""
    if not ns.invariant:
        return "true"
    marker = "\x00CAND\x00"
    tmpl = _map_outside_literals(ns.invariant, lambda s: re.sub(r"\bvalue\b", marker, s))
    tmpl = _sub_cols(tmpl, value_cols)
    return tmpl.replace(marker, f"(CAST({cand} AS {vt}))")


def _invariant_expr(ns: Namespace) -> Column:
    """Compile the namespace's SQL invariant against the candidate value.

    The invariant references the logical name `value`
    (StateFunction.invariant is evaluated on the updated value,
    tgraph/db/ObjectHandler.java:29-35); the state op materializes the
    candidate as column `__cand`, so a word-boundary rewrite binds it.
    Record columns stay referenceable by their own names.
    """
    if not ns.invariant:
        return F.lit(True)
    return F.expr(
        _map_outside_literals(ns.invariant, lambda s: re.sub(r"\bvalue\b", "__cand", s))
    )
