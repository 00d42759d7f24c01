"""Seeded workload generators (FIXTURES.md F1-F3; reference:
tgraph/backed/TransferSource.java:59-83,
tgraph/state/DepositsAndWithdrawalsGenerator.java:23-31,
tgraph/query/RandomQuerySupplier.java:28-45).

All generation happens JVM-side from spark.range + deterministic hash
arithmetic — no driver-side row materialization, so a 10^9-row workload
generates in parallel across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIX = 2654435761  # Knuth multiplicative hash


def _h(col, salt: int):
    return (col * MIX + salt * 40503) % (1 << 31)


def transfers(
    spark: SparkSession,
    n: int,
    keyspace: int = 100_000,
    max_amount: int = 100,
    seed: int = 0,
) -> DataFrame:
    """Bank transfers (transfer_id, from_account, to_account, amount,
    _tid): amount = ceil-like integer in [1, max_amount]; from != to
    by construction (reference Transfer.java:34-40)."""
    r = spark.range(n).withColumnRenamed("id", "_tid")
    h1 = _h(F.col("_tid"), seed)
    h2 = _h(F.col("_tid"), seed + 1)
    h3 = _h(F.col("_tid"), seed + 2)
    frm = h1 % keyspace
    to = (frm + 1 + h2 % (keyspace - 1)) % keyspace  # never equal to frm
    return r.select(
        F.concat(F.lit("t"), F.col("_tid").cast("string")).alias("transfer_id"),
        F.concat(F.lit("a"), frm.cast("string")).alias("from_account"),
        F.concat(F.lit("a"), to.cast("string")).alias("to_account"),
        (h3 % max_amount + 1).cast("double").alias("amount"),
        "_tid",
    )


def spu_commands(
    spark: SparkSession,
    n: int,
    namespace: str = "balances",
    keyspace: int = 100_000,
    max_amount: int = 100,
    seed: int = 100,
) -> DataFrame:
    """Deposit/withdrawal SPU stream (FIXTURES.md F2)."""
    r = spark.range(n).withColumnRenamed("id", "i")
    h1 = _h(F.col("i"), seed)
    h2 = _h(F.col("i"), seed + 1)
    return r.select(
        F.concat(F.lit("s"), F.col("i").cast("string")).alias("spu_id"),
        F.lit(namespace).alias("namespace"),
        F.concat(F.lit("a"), (h1 % keyspace).cast("string")).alias("key"),
        F.when(h2 % 2 == 0, "deposit").otherwise("withdrawal").alias("method"),
        F.array((h2 % max_amount + 1).cast("double")).alias("args"),
    )


def query_requests(
    spark: SparkSession,
    n: int,
    namespace: str = "balances",
    keyspace: int = 100_000,
    avg_keys: int = 5,
    seed: int = 200,
) -> DataFrame:
    """Key-query request stream (FIXTURES.md F3): each request carries
    1..2*avg_keys distinct keys (RandomQuerySupplier's gaussian size
    becomes a uniform hash-derived size — deterministic)."""
    r = spark.range(n).withColumnRenamed("id", "i")
    size = (_h(F.col("i"), seed) % (2 * avg_keys)) + 1
    keys = F.transform(
        F.sequence(F.lit(0), size - 1),
        lambda j: F.concat(
            F.lit("a"), (_h(F.col("i") * 131 + j, seed + 1) % keyspace).cast("string")
        ),
    )
    return r.select(
        F.concat(F.lit("q"), F.col("i").cast("string")).alias("query_id"),
        F.lit(namespace).alias("namespace"),
        F.array_distinct(keys).alias("keys"),
        F.lit(None).cast("string").alias("predicate"),
    )


def merge_sources(sources: list[DataFrame], offset_col: str = "_offset") -> DataFrame:
    """Deterministic multi-source merge (SURVEY §7 hard part).

    Each source must carry a stable per-source ``offset_col`` (range id,
    Kafka offset, file row number — anything replay-stable). The global
    transaction id is the round-robin interleave

        _tid = offset * n_sources + source_index

    which is (a) deterministic across runs and partitionings — it is
    pure per-row arithmetic on replay-stable inputs, no shuffle, no
    sort, no monotonically_increasing_id; (b) order-fair — sources
    alternate in offset order, matching the reference's intent where it
    instead forces the open operator to parallelism 1 to get a stable
    arrival order (tgraph/AbstractTStream.java:69-72); (c) collision-
    free across sources. PL4's tid-order apply then yields identical
    outcomes on every run and every cluster layout.
    """
    n = len(sources)
    if n == 0:
        raise ValueError("merge_sources: need at least one source")
    merged = None
    for i, src in enumerate(sources):
        stamped = src.withColumn(
            "_tid", F.col(offset_col) * F.lit(n) + F.lit(i)
        ).drop(offset_col)
        merged = stamped if merged is None else merged.unionByName(stamped)
    return merged


def rate_transfer_stream(
    spark: SparkSession, rows_per_second: int = 1000, keyspace: int = 100_000
) -> DataFrame:
    """Streaming transfer source on Spark's rate source (SRC1 analogue
    of the reference's rate-limited TransferSource)."""
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    )
    h1 = _h(F.col("value"), 0)
    h2 = _h(F.col("value"), 1)
    h3 = _h(F.col("value"), 2)
    frm = h1 % keyspace
    to = (frm + 1 + h2 % (keyspace - 1)) % keyspace
    return rate.select(
        F.concat(F.lit("t"), F.col("value").cast("string")).alias("transfer_id"),
        F.concat(F.lit("a"), frm.cast("string")).alias("from_account"),
        F.concat(F.lit("a"), to.cast("string")).alias("to_account"),
        (h3 % 100 + 1).cast("double").alias("amount"),
        F.col("value").alias("_tid"),
    )
