"""Vote lattice (reference: tgraph/Vote.java:6-20).

Encoded as tinyint severity so the global per-transaction merge is a
plain MAX aggregate: REPLAY > ABORT > COMMIT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COMMIT = 0
ABORT = 1
REPLAY = 2

VOTE_NAMES = {COMMIT: "COMMIT", ABORT: "ABORT", REPLAY: "REPLAY"}


def vote_name(col: Column) -> Column:
    return (
        F.when(col == REPLAY, "REPLAY").when(col == ABORT, "ABORT").otherwise("COMMIT")
    )
