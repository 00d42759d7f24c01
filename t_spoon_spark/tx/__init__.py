"""Transactional dataflow layer — the t-spoon capability set rebuilt on
Spark's micro-batch execution model (SURVEY.md §2.1-§2.5, §4.3).

Key mapping decisions (vs the reference's record-at-a-time 2PC):

- one micro-batch (epoch) = one transaction batch; the epoch commit IS
  the 2PC decision point, so the reference's out-of-band TCP close
  protocol (tgraph/twopc/*) disappears;
- the watermark (all-txns-complete frontier,
  tgraph/twopc/TransactionsIndex.java:43-52) = the last committed epoch;
- per-(namespace,key) conflicts within an epoch are resolved by
  min-tid-wins + REPLAY of the losers into the next epoch — exactly the
  optimistic PL3 rule (tgraph/state/PL3Strategy.java:9-13) expressed as
  a window aggregate instead of a lock table;
- MVCC version chains (tgraph/db/Object.java:54-82) survive as the
  per-epoch update log of the snapshot store; snapshot-consistent
  external queries read a pinned committed epoch (tgraph/db/Shard.java:170-184).
"""

from t_spoon_spark.tx.env import TxEnvironment
from t_spoon_spark.tx.namespace import Namespace
from t_spoon_spark.tx.vote import ABORT, COMMIT, REPLAY

__all__ = ["TxEnvironment", "Namespace", "COMMIT", "ABORT", "REPLAY"]
