"""Distributed sketches with engine-portable determinism: HyperLogLog
distinct counting and count-min-sketch frequency estimation.

Both are built from the same md5-derived hash primitive as the dedup
family and use ONLY integer-exact intermediate math, so the DuckDB
oracles match bit-for-bit:

- HLL registers hold small ints; the harmonic sum Σ 2^-M_j is scaled by
  2^SCALE_POW into an exact BIGINT sum (float summation order would not
  be bit-stable across engines). Only the final estimate performs float
  ops, as one fixed literal*int/int expression — identical IEEE result
  everywhere. The small-range (linear counting) correction needs ln(),
  whose libm rounding is not bit-portable; we emit the raw estimator
  and the zero-register count instead, leaving presentation-layer bias
  correction to the caller.

- Count-min uses the MinHash permutation constants over a Mersenne
  prime; counters are exact BIGINTs.

Scale shapes: an HLL build is one groupBy over (bucket) — m rows of
state total, mergeable across partitions/epochs by max; a CMS build is
one groupBy over (row, column) — d*w counters; heavy-hitter probes
broadcast the tiny sketch against the candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from t_spoon_spark.operators.dedup import MINHASH_P, PERMS
from t_spoon_spark.operators.text import md5_long

HLL_P = 9  # 2^9 = 512 registers
HLL_M = 1 << HLL_P
HLL_W = 48  # width of the rho-domain bits taken from the 60-bit md5 hash
SCALE_POW = 50  # Σ 2^(SCALE_POW - M_j) stays an exact BIGINT (m * 2^50 < 2^62)
# alpha_m * m^2 * 2^SCALE_POW as one literal, so both engines evaluate the
# same constant: 0.7213/(1 + 1.079/m) * m^2 * 2^50
HLL_ALPHA_NUM = repr(0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(1 << SCALE_POW))


def hll_registers(values: DataFrame, col: str) -> DataFrame:
    """(bucket, rho_max) — the HLL sketch of a column. bucket = low p
    bits of the 60-bit md5 hash; rho = leading-zeros+1 of the remaining
    HLL_W bits, computed exactly as HLL_W - bitlength(w) + 1 (bitlength
    via the base-2 string — no float log2)."""
    hdf = values.select(md5_long(F.col(col).cast("string")).alias("__h"))
    # integer div, not float: __h is 60-bit, beyond double's 53-bit mantissa
    w = F.expr(f"(__h div {HLL_M}) % {1 << HLL_W}")
    bits = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(HLL_W + 1)).otherwise(F.lit(HLL_W) + 1 - bits).cast("long")
    return (
        hdf.select((F.col("__h") % F.lit(HLL_M)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One row: (n_buckets_used, zero_registers, est) from a register
    table. The harmonic sum over all HLL_M registers (absent bucket =>
    register 0 => term 2^SCALE_POW) is an exact BIGINT; the estimate is
    the raw HLL formula evaluated in one double expression."""
    # per-register term 2^(SCALE_POW - rho_max) is an exact integer
    # (rho_max <= HLL_W+1 < SCALE_POW... pow result < 2^53 so the double
    # is exact); summing BIGINTs is order-independent, unlike doubles
    term = F.pow(F.lit(2.0), F.lit(SCALE_POW) - F.col("rho_max")).cast("long")
    agg = registers.agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(term).alias("s_used"),
    )
    s_total = F.col("s_used") + (F.lit(HLL_M) - F.col("used")) * F.lit(1 << SCALE_POW)
    return agg.select(
        F.col("used").alias("n_buckets_used"),
        (F.lit(HLL_M) - F.col("used")).alias("zero_registers"),
        F.floor(F.expr(HLL_ALPHA_NUM) / s_total.cast("double")).cast("long").alias("est"),
    )


CMS_D = 4  # hash rows (reuses the first 4 MinHash permutations)
CMS_W = 256  # counters per row


def cms_col(h: Column, j: int) -> Column:
    a, b = PERMS[j]
    return ((h % F.lit(MINHASH_P)) * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P) % F.lit(CMS_W)


def cms_sketch(values: DataFrame, col: str) -> DataFrame:
    """(row, col, cnt) count-min sketch of a column: d*w exact BIGINT
    counters, one groupBy (map-side combinable)."""
    h = md5_long(F.col(col).cast("string"))
    rows = values.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("r"), cms_col(h, j).alias("c"))
                    for j in range(CMS_D)
                ]
            )
        ).alias("rc")
    )
    return (
        rows.select(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    values: DataFrame, col: str, threshold: int
) -> DataFrame:
    """(value, est) for candidate values whose count-min estimate (min
    over the d row counters) reaches `threshold`. The sketch (d*w rows)
    is broadcast against the candidate distinct values; estimates are
    upper bounds, exact integers."""
    sk = cms_sketch(values, col)
    h = md5_long(F.col(col).cast("string"))
    cands = values.select(
        F.col(col).alias("value"),
        *[cms_col(h, j).alias(f"c{j}") for j in range(CMS_D)],
    ).distinct()
    est = None
    out = cands
    for j in range(CMS_D):
        skj = F.broadcast(
            sk.filter(F.col("r") == j).select(
                F.col("c").alias(f"c{j}"), F.col("cnt").alias(f"cnt{j}")
            )
        )
        out = out.join(skj, f"c{j}")
        e = F.col(f"cnt{j}")
        est = e if est is None else F.least(est, e)
    return (
        out.select("value", est.alias("est"))
        .filter(F.col("est") >= threshold)
    )
