"""StreamRunner: run a transactional graph over a streaming source.

The reference runs its TGraph on Flink's record-at-a-time runtime with
an out-of-band 2PC; here each Structured Streaming micro-batch is one
transaction epoch executed by the same GraphRunner as batch mode — the
`foreachBatch` barrier is the commit point, and REPLAY rows carry over
into the next micro-batch (tgraph/twopc/OpenOperator.java:287-357's
replay-on-watermark becomes replay-on-next-trigger).

Metrics mirror the reference's tracker sinks
(evaluation/ThroughputMeter.java, LatencyTracker*, FinishOnCountSink):
per-epoch wall time, txn counts, vote counts, cumulative throughput.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from t_spoon_spark.tx.runner import GraphRunner


def already_applied(store, query_ident: str | None, batch_id: int) -> bool:
    """Idempotence check for a redelivered micro-batch: true when this
    query's frontier (per-query — multiple streaming queries may
    interleave epochs on one store) already covers `batch_id`. A fresh
    query (no checkpoint identity, or none recorded) is never skipped —
    its batch ids restart at 0 and an old frontier must not drop them."""
    if query_ident is None:
        return False
    last = store.batch_frontiers.get(query_ident)
    return last is not None and batch_id <= last


@dataclass
class StreamMetrics:
    epochs: list[dict] = field(default_factory=list)

    def record(
        self,
        epoch: int,
        n_results: int,
        votes: dict[str, int],
        wall_s: float,
        lock_wait_s: float = 0.0,
    ) -> None:
        self.epochs.append(
            {
                "epoch": epoch,
                "n_results": n_results,
                "votes": votes,
                "wall_s": wall_s,
                # share of the trigger-to-commit wall spent queued on
                # the env epoch lock behind other graphs' epochs
                "lock_wait_s": lock_wait_s,
                "tps": (n_results / wall_s) if wall_s > 0 else 0.0,
            }
        )

    @property
    def total_results(self) -> int:
        return sum(e["n_results"] for e in self.epochs)

    @property
    def throughput(self) -> float:
        wall = sum(e["wall_s"] for e in self.epochs)
        return self.total_results / wall if wall > 0 else 0.0


class StreamRunner:
    """Wraps a GraphRunner in a foreachBatch sink.

    `on_epoch(EpochResult)` lets callers consume TransactionResult
    streams (e.g. append to a results table); `finish_on_count` stops
    the query once that many transactions have closed
    (common/FinishOnCountSink.java behavior).
    """

    def __init__(
        self,
        env,
        tgraph,
        on_epoch=None,
        finish_on_count: int | None = None,
        collect_votes: bool = True,
    ):
        self.runner = GraphRunner(env, tgraph)
        self.metrics = StreamMetrics()
        self.on_epoch = on_epoch
        self.finish_on_count = finish_on_count
        self.collect_votes = collect_votes
        self._query = None

    def start(
        self,
        stream_df: DataFrame,
        trigger: dict | None = None,
        query_name: str | None = None,
        checkpoint_dir: str | None = None,
    ):
        # The idempotence frontier is only meaningful for a resumable
        # query: its identity is the checkpoint location. A fresh query
        # (new or absent checkpoint) restarts batch ids at 0, so skipping
        # against another query's frontier would silently drop every
        # micro-batch — guard only when the identities match.
        query_ident = checkpoint_dir

        def process(batch_df: DataFrame, batch_id: int) -> None:
            # Idempotence guard (tgraph/state/StateOperator.java:317-353
            # replays the WAL above the watermark; ours is the dual —
            # skip below it): after a crash between the store's epoch
            # commit and the Spark checkpoint advance, Structured
            # Streaming re-delivers the micro-batch with its original
            # batch_id. The store's commit marker records the applied
            # frontier + the query identity it belongs to.
            store = self.runner.env.store
            if already_applied(store, query_ident, batch_id):
                return
            has_replays = self.runner._replay is not None
            if batch_df.isEmpty() and not has_replays:
                return
            t0 = time.time()
            res = self.runner.run_epoch(batch_df, batch_id=batch_id, query_id=query_ident)
            votes = res.vote_counts() if self.collect_votes else {}
            n = sum(votes.values()) if votes else res.results.count()
            self.metrics.record(
                res.epoch,
                n,
                votes,
                time.time() - t0,
                getattr(self.runner, "last_lock_wait_s", 0.0),
            )
            if self.on_epoch is not None:
                self.on_epoch(res)
            if (
                self.finish_on_count is not None
                and self.metrics.total_results >= self.finish_on_count
                and self._query is not None
            ):
                # stop asynchronously: stopping inside foreachBatch deadlocks
                import threading

                threading.Thread(target=self._query.stop, daemon=True).start()

        writer = stream_df.writeStream.foreachBatch(process).outputMode("update")
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        if query_name:
            writer = writer.queryName(query_name)
        if trigger:
            writer = writer.trigger(**trigger)
        self._query = writer.start()
        return self._query

    def process_all(self, stream_df: DataFrame, timeout_s: float = 300.0):
        """Convenience for tests/benchmarks: start, drain everything
        available (plus any replay carryover), stop."""
        q = self.start(stream_df)
        q.processAllAvailable()
        # replay carryover needs extra (empty-source) epochs until drained
        while self.runner._replay is not None:
            res = self.runner.run_epoch(None)
            votes = res.vote_counts() if self.collect_votes else {}
            self.metrics.record(res.epoch, sum(votes.values()), votes, 0.0)
            if self.on_epoch is not None:
                self.on_epoch(res)
        q.stop()
        return self.metrics
