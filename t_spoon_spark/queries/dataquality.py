"""Data-quality audit operators (the dbt-test / Deequ surface): cross-
table referential-integrity checks and per-column profiles. These are
the checks a production pipeline schedules after every load — and the
operators a reference user would expect an analytics engine to run at
corpus scale.

Audit outputs are tiny (per-relation / per-column rows) no matter the
input size; every check is an anti-join or a partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

# (child table, FK column, parent table, PK column)
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _dd_fk_union() -> str:
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        parts.append(
            f"""
            SELECT '{child}.{fk}' AS relation,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child,
                   CAST(COUNT(*) AS BIGINT) AS n_orphans
            FROM {child} c
            WHERE c.{fk} IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
            """
        )
    return " UNION ALL ".join(parts)


@register(
    "dq_referential_integrity",
    f"""
    SELECT relation, n_child, n_orphans,
           CASE WHEN n_orphans = 0 THEN 'pass' ELSE 'fail' END AS verdict
    FROM ({_dd_fk_union()})
    ORDER BY relation
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the whole star schema: orphan
    counts for every FK edge (child rows whose key has no parent). Each
    check is one left-anti join — broadcast when the parent is a
    dimension, shuffle on the key otherwise — and the report is one row
    per edge. The dbt `relationships` test, engine-side. A healthy
    load reports zero orphans everywhere; the gate pins both the zero
    and the row-count denominators."""
    out = None
    for child, fk, parent, pk in _FK_EDGES:
        c = t(spark, sf_dir, child)
        p = t(spark, sf_dir, parent).select(F.col(pk).alias(fk))
        # denominator stays in the plan (crossJoin of a 1-row count
        # aggregate) — an eager c.count() here would run one extra full
        # scan per edge at plan-construction time, outside the audit's
        # own measured execution
        denom = c.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        orphans = (
            c.filter(F.col(fk).isNotNull())
            .join(p, fk, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            .crossJoin(F.broadcast(denom))
            .select(
                F.lit(f"{child}.{fk}").alias("relation"),
                "n_child",
                "n_orphans",
            )
        )
        out = orphans if out is None else out.unionByName(orphans)
    return out.select(
        "relation",
        "n_child",
        "n_orphans",
        F.when(F.col("n_orphans") == 0, "pass").otherwise("fail").alias("verdict"),
    ).orderBy("relation")


# (column, duckdb canonical-string expr, spark canonical-string expr):
# doubles and timestamps stringify through integers (cents / epoch_us)
# because double/timestamp-to-string rendering differs across engines
_PROFILE_COLS = [
    (
        "o_orderkey",
        "CAST(o_orderkey AS VARCHAR)",
        "cast(o_orderkey as string)",
    ),
    (
        "o_custkey",
        "CAST(o_custkey AS VARCHAR)",
        "cast(o_custkey as string)",
    ),
    (
        "o_totalprice",
        "CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR)",
        "cast(cast(floor(o_totalprice * 100.0 + 0.5) as bigint) as string)",
    ),
    (
        "o_orderdate",
        "CAST(CAST(epoch_us(o_orderdate) AS BIGINT) AS VARCHAR)",
        "cast(unix_micros(cast(o_orderdate as timestamp)) as string)",
    ),
    (
        "o_orderpriority",
        "o_orderpriority",
        "o_orderpriority",
    ),
    (
        "o_orderstatus",
        "o_orderstatus",
        "o_orderstatus",
    ),
]


def _dd_profile_union() -> str:
    parts = []
    for col, dd_expr, _ in _PROFILE_COLS:
        parts.append(
            f"""
            SELECT '{col}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
                   MIN({dd_expr}) AS min_str,
                   MAX({dd_expr}) AS max_str
            FROM orders
            """
        )
    return " UNION ALL ".join(parts)


@register(
    "dq_column_profile_orders",
    f"""
    SELECT * FROM ({_dd_profile_union()})
    ORDER BY column_name
    """,
)
def dq_column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table: null count, distinct count,
    lexicographic min/max (stringified so one schema fits every type) —
    the Deequ/dbt-style profiling snapshot load monitoring diffs
    against the previous run. One pass per column (Spark fuses the
    aggregates per table scan); at 100 TB the distinct counts would
    switch to the grouped-HLL entry's mergeable sketches."""
    orders = t(spark, sf_dir, "orders")
    out = None
    for col, _, sp_expr in _PROFILE_COLS:
        prof = orders.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias("n_null"),
            F.count_distinct(col).cast("long").alias("n_distinct"),
            F.min(F.expr(sp_expr)).alias("min_str"),
            F.max(F.expr(sp_expr)).alias("max_str"),
        ).select(F.lit(col).alias("column_name"), "*")
        out = prof if out is None else out.unionByName(prof)
    return out.orderBy("column_name")
