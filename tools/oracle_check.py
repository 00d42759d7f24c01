"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables, compare row count, column names, and
exact values (columns sorted by name, rows sorted by all values).

Usage: python tools/oracle_check.py [--vanilla] [--first N] [sf_dir] [query_name ...]

``--vanilla`` runs against a driver-like SparkSession (no build_spark
confs) — round 1's events-loader bug only reproduced in such a session,
so the gate replication must cover it.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = len(argv) != len(sys.argv) - 1
    first = 0  # --first N: exactly the driver's N-entry window prefix
    if "--first" in argv:
        i = argv.index("--first")
        try:
            first = int(argv[i + 1])
        except (IndexError, ValueError):
            print(
                "usage: oracle_check.py [--vanilla] [--first N] [sf_dir] [query ...]\n"
                "       --first requires an integer window size"
            )
            return 2
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.testing import compare_frames, duckdb_connection

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("oracle_check_vanilla")
            .config("spark.driver.memory", "24g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = build_spark(app_name="oracle_check")
    con = duckdb_connection(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if first:
        qs = dict(list(qs.items())[:first])
        # an explicitly named query outside the window is a user error,
        # not something to skip silently (ADVICE r11)
        for miss in sorted(only - set(qs)):
            print(f"WARN  {miss}: outside the --first {first} window, skipped")
    n_pass = n_fail = n_nosql = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"NOSQL {name}: rows={len(spark_pdf)} ({time.time()-t0:.1f}s)")
            n_nosql += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        errs = compare_frames(spark_pdf, duck_pdf)
        if errs:
            n_fail += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for e in errs:
                print(f"      {e}")
        else:
            n_pass += 1
            print(f"PASS  {name}: rows={len(spark_pdf)} ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
