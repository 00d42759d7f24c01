"""Cross-engine determinism helpers.

The driver value-hashes result cells after sorting columns by name and
rows by value; Spark and DuckDB must therefore produce *bit-identical*
values. Floating-point SUM/AVG over different partition orders is not
bit-stable, so every money/measure aggregate goes through a fixed-point
integer scaling: round half-up at scale `s` per row (exact, same IEEE
double ops in both engines), sum as BIGINT (exact, order-independent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fixed(col: Column | str, scale: int = 100) -> Column:
    """Per-row fixed-point: floor(x*scale + 0.5) as BIGINT (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def dd_fixed(expr: str, scale: int = 100) -> str:
    """DuckDB-side twin of ``fixed``."""
    return f"CAST(FLOOR(({expr}) * {float(scale)} + 0.5) AS BIGINT)"


def micros(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # parquet NTZ timestamps + UTC session tz: the cast is identity on
    # the instant, and unix_micros then matches DuckDB's epoch_us().
    return F.unix_micros(c.cast("timestamp"))


def dd_micros(expr: str) -> str:
    return f"CAST(epoch_us({expr}) AS BIGINT)"
