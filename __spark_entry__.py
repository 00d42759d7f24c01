"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` surface the engine's full corpus from
t_spoon_spark.registry (each entry is a PySpark impl + DuckDB oracle
pair; non-SQL-expressible stateful ops omit the oracle).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from t_spoon_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from t_spoon_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from t_spoon_spark.registry import all_oracles

    return all_oracles()
