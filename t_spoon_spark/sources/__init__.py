"""Workload sources (reference §2.6 SRC1-SRC4): deterministic seeded
generators for transfers, SPU commands, and state queries, plus
streaming-source helpers. The reference's sources are synthetic
record-at-a-time generators; ours produce DataFrames (batch) or rate
streams (streaming) with the same shapes (FIXTURES.md F1-F3).
"""

from t_spoon_spark.sources.generators import (
    merge_sources,
    query_requests,
    rate_transfer_stream,
    spu_commands,
    transfers,
)

__all__ = [
    "transfers",
    "spu_commands",
    "query_requests",
    "rate_transfer_stream",
    "merge_sources",
]
