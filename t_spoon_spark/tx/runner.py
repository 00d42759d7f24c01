"""Epoch executor: runs a TGraph over one micro-batch = one transaction
epoch, resolves votes, commits atomically, and carries the REPLAY queue
to the next epoch.

This file replaces, wholesale, the reference's 2PC machinery
(tgraph/twopc/OpenOperator.java, CloseFunction.java, ReduceVotesFunction.java,
the TCP notification servers) with three Spark aggregates and an atomic
store commit — the epoch barrier makes the out-of-band protocol
unnecessary (SURVEY.md §3.1 "Spark shape").

Isolation semantics (SURVEY.md §4.3, tgraph/state/PL*Strategy.java):

- PL3/PL4: optimistic write-conflict rule — within an epoch only the
  lowest-tid transaction touching a key executes; later ones vote
  REPLAY and re-enter the next epoch with their original tid
  (min-tid-wins ⇒ the oldest transaction always completes ⇒ progress).
  PL4's strict order falls out of tid-ordered execution.
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
_MATERIALIZE = os.environ.get("TSPOON_MATERIALIZE", "pandas")


def _dbg(label: str, t0: float) -> float:
    if _DEBUG:
        print(f"    [tspoon] {label}: {time.time() - t0:.2f}s", flush=True)
    return time.time()


def materialize(df: DataFrame) -> DataFrame:
    """Cut lineage on a per-epoch DataFrame.

    Modes (TSPOON_MATERIALIZE): 'pandas' (default) round-trips through
    Arrow to a LocalRelation — pathology-free and right-sized for the
    control-plane frames of an epoch (votes, replay queue, resolved
    updates), which are bounded by batch size, not state size; 'reliable'
    uses rdd.checkpoint() to the checkpoint dir (use on a cluster where
    control frames exceed driver memory); 'ckpt' is eager localCheckpoint
    (both distributed modes showed super-linear per-epoch job slowdowns
    over long replay chains in Spark 4.1 local mode — see
    tools/dbg_epoch.py)."""
    spark = df.sparkSession
    if _MATERIALIZE == "pandas":
        return spark.createDataFrame(df.toPandas(), schema=df.schema)
    if _MATERIALIZE == "reliable":
        if not spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
            import tempfile

            spark.sparkContext.setCheckpointDir(tempfile.mkdtemp(prefix="tspoon_ckpt_"))
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


@dataclass
class EpochResult:
    epoch: int
    # TransactionResult (tgraph/TransactionResult.java:8-15): original
    # record + (_tid, _ts, vote, updates array<struct<ns,key,value>>)
    results: DataFrame
    # the transformed stream after all stages (reference exposes it via
    # sinks on the closed TStream; tests golden-check it)
    stream: DataFrame
    spu_results: DataFrame | None
    n_replay: int

    def vote_counts(self) -> dict[str, int]:
        rows = self.results.groupBy("vote").count().collect()
        return {r["vote"]: r["count"] for r in rows}


class GraphRunner:
    def __init__(self, env, tgraph: G.TGraph):
        self.env = env
        self.graph = tgraph
        self._replay: DataFrame | None = None  # source cols + _tid

    # ------------------------------------------------------------------

    def run_epoch(self, batch: DataFrame | None, spus: DataFrame | None = None) -> EpochResult:
        env = self.env
        store = env.store
        epoch = store.committed_epoch() + 1

        src = self._stamp(batch, epoch)
        if self._replay is not None:
            src = src.unionByName(self._replay) if src is not None else self._replay
            self._replay = None
        if src is None:
            raise ValueError("run_epoch: no batch and no pending replays")
        # materialize: tids must be identical between graph execution and
        # replay extraction (monotonically_increasing_id is plan-dependent).
        src = materialize(src)

        df = src.select(
            "*",
            F.col("_tid").alias("_ts"),
            F.array().cast("array<int>").alias("_path"),
            F.lit(True).alias("_alive"),
        )

        votes_parts: list[DataFrame] = []
        writes_parts: dict[str, list[DataFrame]] = {}
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
                votes, writes = self._run_state(df, stage, idx)
                votes_parts.append(votes)
                writes_parts.setdefault(stage.namespace, []).append(writes)
            else:  # pragma: no cover
                raise TypeError(f"unknown stage {stage}")

        return self._close(epoch, src, df, votes_parts, writes_parts, spus)

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

    def _stamp(self, batch: DataFrame | None, epoch: int) -> DataFrame | None:
        if batch is None:
            return None
        if "_tid" in batch.columns:
            return batch
        base = (epoch + 1) << EPOCH_TID_SHIFT
        return batch.withColumn("_tid", F.lit(base) + F.monotonically_increasing_id())

    # -- state stage ----------------------------------------------------

    def _run_state(
        self, df: DataFrame, stage: G.StateStage, stage_idx: int
    ) -> tuple[DataFrame, DataFrame]:
        """Returns (votes (_tid, vote), writes (key, value, _tid, _ord, _stage))."""
        env = self.env
        ns = env.namespaces[stage.namespace]
        snapshot = env.store.read(ns.name)
        ops = df.filter(F.col("_alive")).withColumn("__key", stage.key(df).cast("string"))

        pandas_path = stage.py_update is not None or env.isolation in ("PL0", "PL1")
        if pandas_path:
            return self._state_chain_pandas(ops, stage, ns, snapshot, stage_idx)
        return self._state_expr(ops, stage, ns, snapshot, stage_idx)

    def _state_expr(
        self,
        ops: DataFrame,
        stage: G.StateStage,
        ns: Namespace,
        snapshot: DataFrame,
        stage_idx: int,
    ) -> tuple[DataFrame, DataFrame]:
        """JVM-only path (whole-stage codegen end to end): one window
        aggregate for conflict detection + one join against the
        committed snapshot. This is the 100 TB hot path — no Python."""
        env = self.env
        if stage.epoch_combine:
            return self._state_epoch_combine(ops, stage, ns, snapshot, stage_idx)
        if stage.pre_combine:
            keep = [c for c in ops.columns if c in ("_tid", "_ts", "__key")]
            aggs = [F.expr(f"{how}({col})").alias(col) for col, how in stage.pre_combine.items()]
            ops = ops.groupBy(*keep).agg(*aggs)

        if env.isolation in ("PL3", "PL4"):
            wk = W.partitionBy("__key")
            ops = ops.withColumn("__min_tid", F.min("_tid").over(wk))
            executing = F.col("_tid") == F.col("__min_tid")
        else:  # PL2: everyone reads committed, everyone writes
            executing = F.lit(True)

        snap = snapshot.select(F.col("key").alias("__key"), F.col("value").alias("__v0"))
        joined = ops.join(snap, "__key", "left")
        v0 = F.coalesce(F.col("__v0"), F.lit(ns.default).cast(ns.value_type))
        joined = joined.withColumn("__cand", stage.update(v0))
        ok = _invariant_expr(ns)
        vote = (
            F.when(~executing, F.lit(REPLAY))
            .when(ok, F.lit(COMMIT))
            .otherwise(F.lit(ABORT))
        )
        evaluated = joined.select(
            F.col("_tid"),
            F.col("__key").alias("key"),
            F.col("__cand").alias("value"),
            vote.alias("vote"),
            executing.alias("__exec"),
        )
        votes = evaluated.groupBy("_tid").agg(F.max("vote").alias("vote"))
        writes = (
            evaluated.filter(F.col("__exec"))
            .select(
                "key",
                "value",
                "_tid",
                F.col("_tid").alias("_ord"),
                F.lit(stage_idx).alias("_stage"),
            )
        )
        return votes, writes

    def _state_epoch_combine(
        self,
        ops: DataFrame,
        stage: G.StateStage,
        ns: Namespace,
        snapshot: DataFrame,
        stage_idx: int,
    ) -> tuple[DataFrame, DataFrame]:
        """Associative fold of the whole epoch per key: one groupBy with
        map-side partial aggregation + one join against the snapshot.
        Every transaction votes COMMIT (no invariant, no conflicts) —
        the engine's transactional analogue of the reference's keyed
        continuous reduce (evaluation/SPUBench.java:198-258), but with
        the epoch's atomic commit. The high-throughput path for
        counter/sum state at 100 TB scale."""
        aggs = [F.expr(f"{how}({col})").alias(col) for col, how in stage.pre_combine.items()]
        combined = ops.groupBy("__key").agg(*aggs)
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
        votes = ops.select("_tid").distinct().withColumn("vote", F.lit(COMMIT))
        return votes, writes

    def _state_chain_pandas(
        self,
        ops: DataFrame,
        stage: G.StateStage,
        ns: Namespace,
        snapshot: DataFrame,
        stage_idx: int,
    ) -> tuple[DataFrame, DataFrame]:
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
        value_cols = [
            c for c in ops.columns if c not in (*G.META_COLS, "__key")
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
            min_tid = int(pdf["_tid"].min())
            for pos, (_, r) in enumerate(pdf.iterrows()):
                rec = {c: r[c] for c in value_cols}
                tid = int(r["_tid"])
                if isolation in ("PL3", "PL4") and tid != min_tid:
                    rows.append((key, tid, None, REPLAY, pos, False))
                    continue
                base = chain_v if isolation in ("PL0", "PL1", "PL3", "PL4") else v0
                cand = update(base, rec)
                ok = invariant(cand) if invariant else True
                rows.append((key, tid, cand, COMMIT if ok else ABORT, pos, True))
                if isolation in ("PL0", "PL1"):
                    chain_v = cand  # dirty: visible to the next op regardless of outcome
                elif isolation in ("PL3", "PL4") and ok:
                    chain_v = cand  # within-txn chaining only
            return pd.DataFrame(
                rows, columns=["key", "_tid", "value", "vote", "_ord", "_exec"]
            )

        evaluated = joined.groupBy("__key").applyInPandas(fold, out_schema)
        votes = evaluated.groupBy("_tid").agg(F.max("vote").alias("vote"))
        writes = (
            evaluated.filter(F.col("_exec"))
            .select("key", "value", "_tid", "_ord", F.lit(stage_idx).alias("_stage"))
        )
        return votes, writes

    # -- close ----------------------------------------------------------

    def _close(
        self,
        epoch: int,
        src: DataFrame,
        stream: DataFrame,
        votes_parts: list[DataFrame],
        writes_parts: dict[str, list[DataFrame]],
        spus: DataFrame | None,
    ) -> EpochResult:
        env = self.env
        store = env.store

        # global vote per transaction: MAX over the lattice across all
        # state stages (ReduceVotesFunction + multi-exit second reduce,
        # tgraph/TransactionEnvironment.java:338-366, collapsed into one
        # groupBy because the epoch barrier already saw every record).
        t0 = time.time()
        tids = src.select("_tid")
        if votes_parts:
            all_votes = votes_parts[0]
            for v in votes_parts[1:]:
                all_votes = all_votes.unionByName(v)
            merged = all_votes.groupBy("_tid").agg(F.max("vote").alias("vote"))
        else:
            merged = tids.withColumn("vote", F.lit(COMMIT)).limit(0)
        gvotes = tids.join(merged, "_tid", "left").fillna(COMMIT, subset=["vote"])
        if _DEBUG:
            print(
                f"    [tspoon] plan sizes: gvotes={len(gvotes._jdf.queryExecution().analyzed().toString())}"
                f" src={len(src._jdf.queryExecution().analyzed().toString())}",
                flush=True,
            )
        gvotes = materialize(gvotes)
        t0 = _dbg("gvotes", t0)
        commit_tids = gvotes.filter(F.col("vote") == COMMIT).select("_tid")

        # resolve each namespace's final value per key among committed writes
        updates: dict[str, DataFrame] = {}
        upd_rows: list[DataFrame] = []
        for ns_name, parts in writes_parts.items():
            w = parts[0]
            for p in parts[1:]:
                w = w.unionByName(p)
            wc = w.filter(F.col("_tid") < 0).unionByName(
                w.filter(F.col("_tid") >= 0).join(commit_tids, "_tid", "left_semi")
            )
            rn = F.row_number().over(
                W.partitionBy("key").orderBy(F.desc("_stage"), F.desc("_ord"))
            )
            final = wc.withColumn("__rn", rn).filter(F.col("__rn") == 1).select("key", "value")
            updates[ns_name] = final
            upd_rows.append(
                wc.select(
                    "_tid",
                    F.lit(ns_name).alias("ns"),
                    "key",
                    F.to_json(F.struct(F.col("value").alias("v"))).alias("value"),
                )
            )

        # single-partition updates run after the epoch's transactions
        spu_results = None
        if spus is not None:
            spu_results, updates = self._apply_spus(spus, updates)

        # TransactionResult stream (tgraph/TransactionResult.java:8-15):
        # committed txns carry their write-set.
        if upd_rows:
            u = upd_rows[0]
            for p in upd_rows[1:]:
                u = u.unionByName(p)
            upd_agg = u.groupBy("_tid").agg(
                F.collect_list(F.struct("ns", "key", "value")).alias("updates")
            )
        else:
            upd_agg = None
        results = src.join(gvotes, "_tid").select(
            "*", F.col("_tid").alias("_ts")
        ).withColumn("vote", vote_name(F.col("vote")))
        if upd_agg is not None:
            results = results.join(upd_agg, "_tid", "left")
        else:
            results = results.withColumn(
                "updates", F.lit(None).cast("array<struct<ns:string,key:string,value:string>>")
            )

        wal = results.select(
            "_tid", "_ts", "vote", F.to_json(F.col("updates")).alias("updates_json")
        )
        t0 = _dbg("build_updates", t0)
        store.commit(epoch, updates, wal if env.store.durable else None)
        t0 = _dbg("commit", t0)

        # REPLAY queue: original source rows re-enter the next epoch
        # with their original tid (OpenOperator replay,
        # tgraph/twopc/OpenOperator.java:287-357 — ours waits for the
        # next epoch, which is when the conflicting txn has completed).
        replay_tids = gvotes.filter(F.col("vote") == REPLAY).select("_tid")
        replay_src = src.join(replay_tids, "_tid")
        n_replay = replay_src.count()
        self._replay = materialize(replay_src) if n_replay else None
        _dbg("replay", t0)

        return EpochResult(
            epoch=epoch,
            results=results,
            stream=stream,
            spu_results=spu_results,
            n_replay=n_replay,
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
    return F.expr(re.sub(r"\bvalue\b", "__cand", ns.invariant))
