"""Sequence-packing planner: assign documents to fixed-token-budget
training sequences with the concat-and-chunk policy (concatenate the
token stream per source shard, cut every PACK_BUDGET tokens — the
GPT-style packing that wastes zero tokens, letting documents span
chunk boundaries).

The plan is a pure prefix-sum: one window cumsum per source partition,
then row-local integer division — no iteration, no Python. At 100 TB
the partition key becomes (source, shard) so each ordered cumsum stays
within a bounded shard; pack ids then offset by a per-shard base, which
is the same two-level scan-then-offset scheme Spark uses for
monotonically increasing ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import tokens
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

PACK_BUDGET = 512

DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"


@register(
    "packing_concat_chunk_plan",
    f"""
    WITH tok AS (
      SELECT source, doc_id, len({DD_TOKS}) AS n_tok FROM documents
    ),
    cum AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tok
      FROM tok WHERE n_tok > 0
    )
    SELECT source, doc_id, n_tok,
           CAST((cum_tok - n_tok) // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST((cum_tok - n_tok) % {PACK_BUDGET} AS BIGINT) AS pack_offset,
           CAST((cum_tok - 1) // {PACK_BUDGET}
                - (cum_tok - n_tok) // {PACK_BUDGET} AS BIGINT)
             AS n_boundaries_crossed
    FROM cum
    ORDER BY source, doc_id
    """,
)
def packing_concat_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing assignment: which PACK_BUDGET(512)-token
    training sequence each document starts in, at what offset, and how
    many chunk boundaries it crosses. All BIGINT: cumsum of token
    counts, then div/mod — deterministic and shuffle-minimal (one
    hash partition on source + in-partition sort)."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum_tok", F.sum("n_tok").over(w))
    return cum.select(
        "source",
        "doc_id",
        "n_tok",
        F.expr(f"(cum_tok - n_tok) div {PACK_BUDGET}").alias("pack_id"),
        F.expr(f"(cum_tok - n_tok) % {PACK_BUDGET}").alias("pack_offset"),
        F.expr(
            f"(cum_tok - 1) div {PACK_BUDGET} - (cum_tok - n_tok) div {PACK_BUDGET}"
        ).alias("n_boundaries_crossed"),
    ).orderBy("source", "doc_id")


@register(
    "packing_greedy_whole_doc",
    f"""
    WITH RECURSIVE tok AS (
      SELECT source, doc_id,
             LEAST(len({DD_TOKS}), {PACK_BUDGET}) AS n_tok
      FROM documents
      WHERE len({DD_TOKS}) > 0
    ),
    rn AS (
      SELECT source, doc_id, n_tok,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM tok
    ),
    rec(source, rn, doc_id, n_tok, pack_id, fill) AS (
      SELECT source, rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok
      FROM rn WHERE rn = 1
      UNION ALL
      SELECT r.source, r.rn, r.doc_id, r.n_tok,
             CASE WHEN rec.fill + r.n_tok > {PACK_BUDGET}
                  THEN rec.pack_id + 1 ELSE rec.pack_id END,
             CASE WHEN rec.fill + r.n_tok > {PACK_BUDGET}
                  THEN r.n_tok ELSE rec.fill + r.n_tok END
      FROM rec JOIN rn r ON r.source = rec.source AND r.rn = rec.rn + 1
    )
    SELECT source, doc_id, n_tok, pack_id,
           CAST(fill - n_tok AS BIGINT) AS pack_offset
    FROM rec
    ORDER BY source, doc_id
    """,
)
def packing_greedy_whole_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document greedy packing: documents never split across
    sequences (truncated to the budget if longer); a doc that would
    overflow the open pack starts the next one. The fold is inherently
    sequential per shard, so it runs as an Arrow `applyInPandas` over
    the source partitions — shards pack in parallel, each shard's fold
    is a linear numpy-free loop over its (bounded) document list. The
    oracle replays the identical fold as a recursive CTE. This is the
    padding-free packer used when truncation-at-boundary is not
    acceptable (instruction tuning, long-context evals)."""
    import pandas as pd

    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        F.least(F.size(tokens(F.col("text"))), F.lit(PACK_BUDGET))
        .cast("long")
        .alias("n_tok"),
    ).filter(F.size(tokens(F.col("text"))) > 0)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, offsets = [], []
        pack, fill = 0, 0
        for n in pdf["n_tok"]:
            if fill + n > PACK_BUDGET:
                pack += 1
                fill = 0
            pack_ids.append(pack)
            offsets.append(fill)
            fill += n
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    out = base.groupBy("source").applyInPandas(
        fold,
        schema="source string, doc_id bigint, n_tok bigint, "
        "pack_id bigint, pack_offset bigint",
    )
    return out.orderBy("source", "doc_id")
