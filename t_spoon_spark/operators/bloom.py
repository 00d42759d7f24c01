"""Bloom-filter semi-join: build a real bitmap Bloom filter over the
small side's keys as a Spark aggregate, broadcast it, pre-filter the
probe side with pure bit arithmetic, then close with an exact semi-join
so false positives never reach the result.

This is the runtime-filter pattern (Spark's own
spark.sql.optimizer.runtime.bloomFilter.* applies it inside the
optimizer for equi-joins; exposing it as an operator lets non-equi or
multi-stage pipelines use it explicitly). At 100 TB the payoff is
scan-side: the bit test drops most probe rows BEFORE the shuffle/join
work, and the bitmap is constant-size (8 KiB here) no matter how large
the build side grows — unlike a broadcast hash set.

Determinism: hash functions are the engine-portable md5 variant
(operators/text.md5_long with per-hash salts), the bitmap is a bit_or
aggregate (order-independent), and the final semi-join makes the
result exactly the plain semi-join — which is what oracles run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import md5_long

BLOOM_BITS = 1 << 16  # m = 65,536 bits -> 1,024 longs (8 KiB bitmap)
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 3  # hash functions


def _positions(key: Column) -> list[Column]:
    """K bit positions for a key: salted md5 hashes mod m."""
    return [
        F.pmod(
            md5_long(F.concat(F.lit(f"bloom{i}:"), key.cast("string"))),
            F.lit(BLOOM_BITS),
        )
        for i in range(BLOOM_K)
    ]


def bloom_build(build: DataFrame, key: str) -> DataFrame:
    """Aggregate the build side into a 1-row bitmap frame
    (`words: array<long>`).

    Shape: explode K positions per key (linear), partial bit_or per
    64-bit word map-side, final groupBy over at most BLOOM_WORDS rows,
    then one dense-array assembly — constant-size output regardless of
    build cardinality."""
    pos = build.select(F.explode(F.array(*_positions(F.col(key)))).alias("pos"))
    words = (
        pos.select(
            F.expr("shiftright(pos, 6)").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos & 63 as int))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    # dense array (missing words are 0), via a map keyed by word index
    return words.agg(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(BLOOM_WORDS - 1).cast("long")),
            lambda i: F.coalesce(
                F.element_at(
                    F.map_from_arrays(F.collect_list("w"), F.collect_list("word")),
                    i,
                ),
                F.lit(0).cast("long"),
            ),
        ).alias("words")
    )


def bloom_might_contain(words: Column, key: Column) -> Column:
    """True iff all K bits for `key` are set in the bitmap column."""
    test = None
    for p in _positions(key):
        w = F.element_at(words, F.shiftright(p, 6).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        hit = w.bitwiseAND(mask) != F.lit(0)
        test = hit if test is None else (test & hit)
    return test


def bloom_semi_join(probe: DataFrame, build: DataFrame, key: str) -> DataFrame:
    """probe ⋉ build on `key`, Bloom-accelerated: broadcast the 8 KiB
    bitmap, bit-test each probe row (scan-stage filter, no probe
    shuffle), then exact semi-join only the survivors. Result-identical
    to `probe.join(build, key, "left_semi")` by construction."""
    bitmap = bloom_build(build, key)
    probed = probe.crossJoin(F.broadcast(bitmap))
    candidates = probed.filter(
        bloom_might_contain(F.col("words"), F.col(key))
    ).drop("words")
    # no broadcast hint on the closing join: a huge build side must be
    # allowed to shuffle (AQE broadcasts it anyway when it is small) —
    # forcing broadcast would reintroduce exactly the linear-memory
    # build-side cost the 8 KiB bitmap exists to avoid
    return candidates.join(build.select(key).distinct(), key, "left_semi")
