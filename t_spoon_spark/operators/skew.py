"""Skew- and shuffle-management utilities for 100 TB operation.

Two complementary tools the query layer composes:

- `salted_join`: hot-key-safe equi-join. AQE's skew-join split
  (enabled in build_spark) handles sort-merge skew after the fact;
  salting handles it structurally when a single join key carries an
  outsized share of the fact side (the Zipf head), by splitting each
  key across `n_salts` reducers and replicating the (small) build side
  once per salt. Shuffle volume: facts unchanged, dims * n_salts.

- `write_bucketed` / co-located joins: repeated large-large joins on a
  stable key (orders x lineitem every query) should not re-shuffle
  either side each time. Writing both sides bucketed+sorted by the key
  lets sort-merge join read co-located buckets with NO Exchange on
  either side (asserted by tests/test_plans.py::test_bucketed_join_has
  _no_exchange). This is Spark's answer to the reference's fixed
  key-partitioned state placement (tgraph state ops pin keys to
  partitions; a bucketed table is the at-rest equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `facts` with `dims` on `key`, salting the fact side so
    a hot key spreads across `n_salts` reducers instead of one.

    The salt is a deterministic uniform hash of the whole fact row
    (xxhash64), so repeated runs shuffle identically; the dim side is
    replicated once per salt value (explode of a literal range — cheap
    for dimension tables, which is the only side this should be used
    on). Result equals the plain join exactly; only the physical
    distribution changes. Supported `how`: inner / left (the replicated
    side must be the non-preserved side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    f = facts.withColumn("_salt", salt)
    d = dims.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist `df` hash-bucketed and sorted by `key` (external table at
    `path` when given). Two tables bucketed by the same key with the
    same bucket count sort-merge-join with no Exchange on either side.

    At 100 TB this is the amortizer for repeated joins on a stable key:
    one write-time shuffle, zero read-time shuffles thereafter (and
    bucket pruning for `key = literal` predicates)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
