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
    the contract under test)."""
    spark = df.sparkSession
    path = os.path.join(tempfile.mkdtemp(prefix=f"tspoon_{fmt}_"), "data")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true").option("quoteAll", "true")
    writer.format(fmt).save(path)
    reader = spark.read.schema(df.schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
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


@register("io_json_roundtrip_docs", _DOCS_SUMMARY_SQL)
def io_json_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSON lines -> read back with explicit schema ->
    the same per-language summary (unicode escaping is JSON's hard
    case for free text)."""
    docs = t(spark, sf_dir, "documents")
    return _docs_summary(_roundtrip(docs, "json"))


SAMPLE_W_K = 30


@register(
    "sample_weighted_priority",
    f"""
    WITH pri AS (
      SELECT doc_id, lang, n_chars,
             CAST(FLOOR(
               ln((({{h}}) % 1000000 + 1) / 1000001.0) / n_chars * 1e9
             ) AS BIGINT) AS nlp_c
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY nlp_c DESC, doc_id) AS rnk FROM pri
    )
    SELECT rnk, doc_id, lang, n_chars FROM ranked WHERE rnk <= {SAMPLE_W_K}
    ORDER BY rnk
    """.format(
        h="('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    ),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-ES in log space): each row draws a deterministic uniform u from
    its md5 hash and gets priority ln(u)/w (w = n_chars); the top-K
    priorities are the weighted sample. Deterministic u makes the
    sample reproducible and the estimator auditable; top-K by priority
    is mergeable (bottom-k union rule), so Spark executes it as
    per-partition partial top-K — the same scale shape as the uniform
    reservoir entry. ln is evaluated once per row on a ratio of small
    integers and scaled at 1e9; ranking ties are broken by doc_id."""
    from t_spoon_spark.operators.text import md5_long

    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(1_000_000)) + 1) / F.lit(
        1_000_001.0
    )
    pri = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.floor(F.log(u) / F.col("n_chars") * 1e9).cast("long").alias("nlp_c"),
    )
    top = pri.orderBy(F.desc("nlp_c"), F.asc("doc_id")).limit(SAMPLE_W_K)
    from pyspark.sql import Window as W

    return (
        top.withColumn(
            "rnk", F.row_number().over(W.orderBy(F.desc("nlp_c"), F.asc("doc_id")))
        )
        .select("rnk", "doc_id", "lang", "n_chars")
        .orderBy("rnk")
    )
