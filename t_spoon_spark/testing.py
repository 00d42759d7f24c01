"""Shared oracle-compare utilities (used by tests/ and tools/oracle_check.py).

Mirrors the driver's correctness gate: sort columns by name, sort rows,
require exact cell equality (floats must be bit-identical — the query
corpus guarantees this via fixed-point integer scaling).
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        errs.append(f"columns: spark={sc} duck={dc}")
        return errs
    if errs:
        return errs
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        # The driver's value hash is type-strict: DuckDB HUGEINT (from
        # SUM(BIGINT)) materializes as float64 and hash-mismatches an
        # int64 Spark column even when values are equal. Flag it here.
        if str(a[c].dtype) != str(b[c].dtype):
            errs.append(f"col {c}: dtype spark={a[c].dtype} duck={b[c].dtype}")
    for c in a.columns:
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist()))
            if not cells_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            errs.append(f"col {c}: {len(bad)} mismatches; first at row {i}: spark={x!r} duck={y!r}")
    return errs


def duckdb_connection(sf_dir: str):
    import os

    import duckdb

    con = duckdb.connect()
    for tname in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{tname}.parquet")
        if os.path.isdir(p):
            # Spark-written dataset directory (the amplified scale-
            # rehearsal tables): glob the part files
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')")
    return con
