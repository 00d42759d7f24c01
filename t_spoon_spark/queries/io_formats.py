"""Source/sink format coverage gates: the corpus round-trips through
CSV and JSON (Spark's own writers/readers) and must aggregate to the
same answer as the parquet original — pinning that the engine's format
surface (SURVEY §2.6 SNK2/SNK3: "connectors come from Spark") actually
preserves values, quoting, and types end to end.

The oracle reads the parquet original directly, so any row loss,
quoting bug, type coercion, or encoding drift in the round-trip breaks
the hash match.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"


def _roundtrip(df: DataFrame, fmt: str, **read_opts) -> DataFrame:
    """Write `df` with Spark's `fmt` writer, read it back with the
    matching reader + explicit schema (schema inference is not part of
    the contract under test).

    The write goes to ONE session-scoped directory per format
    (mode=overwrite), not a fresh mkdtemp per call — repeated gate and
    bench rounds would otherwise accumulate a corpus copy per run until
    /tmp fills. The read is lazy, so the directory must outlive the
    returned frame; overwrite-in-place bounds disk at one copy."""
    spark = df.sparkSession
    path = os.path.join(tempfile.gettempdir(), f"tspoon_io_roundtrip_{fmt}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true").option("quoteAll", "true")
    if fmt == "xml":
        # Spark 4 built-in XML source (the spark-xml integration):
        # one <doc> element per row; entity escaping round-trips the
        # free-text column bit-exactly (probed on the real corpus)
        writer = writer.option("rowTag", "doc")
    writer.format(fmt).save(path)
    reader = spark.read.schema(df.schema)
    if fmt == "csv":
        # multiLine: quoted embedded newlines must re-parse as one
        # record — without it the reader splits them and the gate would
        # blame phantom engine drift
        reader = reader.option("header", "true").option("multiLine", "true")
    for k, v in read_opts.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


_DOCS_SUMMARY_SQL = f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(len({DD_TOKS})) AS BIGINT) AS sum_tokens,
           COUNT(DISTINCT md5(text)) AS n_distinct
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""


def _docs_summary(df: DataFrame) -> DataFrame:
    from t_spoon_spark.operators.text import tokens

    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.size(tokens(F.col("text")))).cast("long").alias("sum_tokens"),
            F.count_distinct(F.md5("text")).alias("n_distinct"),
        )
        .orderBy("lang")
    )


@register("io_csv_roundtrip_docs", _DOCS_SUMMARY_SQL)
def io_csv_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> CSV (quoted, headered) -> read back with explicit
    schema -> per-language summary. The free-text column is the hard
    case for CSV (quoting, embedded delimiters); the distinct-hash
    column catches any corruption the counts would miss. Scale note:
    format round-trips are embarrassingly parallel (per-file); the gate
    aggregate is a lang-keyed partial agg."""
    docs = t(spark, sf_dir, "documents")
    return _docs_summary(_roundtrip(docs, "csv"))


@register("io_xml_roundtrip_docs", _DOCS_SUMMARY_SQL)
def io_xml_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> XML (Spark 4 built-in source, one <doc> element per
    row) -> read back with explicit schema -> per-language summary
    (round 14: the format surface gains the markup family).  Free text
    is the hard case for XML too — entity escaping of <>&'" and
    whitespace preservation inside elements; the distinct-hash column
    catches any drift (probed bit-exact on the real corpus before
    registration).  Scale note: identical shape to the CSV/JSON gates —
    per-file parallel round-trip, lang-keyed partial agg."""
    docs = t(spark, sf_dir, "documents")
    return _docs_summary(_roundtrip(docs, "xml", rowTag="doc"))


@register("io_json_roundtrip_docs", _DOCS_SUMMARY_SQL)
def io_json_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSON lines -> read back with explicit schema ->
    the same per-language summary (unicode escaping is JSON's hard
    case for free text)."""
    docs = t(spark, sf_dir, "documents")
    return _docs_summary(_roundtrip(docs, "json"))


@register(
    "io_bucketed_colocated_join",
    """
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR((o.o_totalprice) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def io_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via BUCKETED TABLES — the 100 TB amortizer for
    repeated large-large joins on a stable key: both sides are written
    hash-bucketed + sorted by the join key (ONE write-time shuffle
    each), and every subsequent join on that key sort-merge-joins with
    ZERO read-time Exchange on either side (plan-asserted in
    tests/test_plans.py and tests/test_plans_round7.py).  The oracle
    joins the parquet originals directly, so the gate also pins that
    the bucketed write/read round-trip loses nothing.  Same
    session-scoped overwrite-in-place disk contract as the CSV/JSON
    round-trip entries (one copy, no temp leak)."""
    from t_spoon_spark.operators.skew import bucketed, write_bucketed
    from t_spoon_spark.queries.helpers import fixed

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    base = os.path.join(tempfile.gettempdir(), "tspoon_bucketed")
    write_bucketed(orders, "tspoon_b_orders", "o_custkey", 8, path=os.path.join(base, "orders"))
    write_bucketed(cust, "tspoon_b_customer", "o_custkey", 8, path=os.path.join(base, "customer"))
    j = (
        bucketed(spark, "tspoon_b_orders")
        .hint("merge")
        .join(bucketed(spark, "tspoon_b_customer"), "o_custkey")
    )
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(fixed("o_totalprice")).cast("long").alias("revenue_c"),
        )
        .orderBy("segment")
    )
