"""Chunking, decontamination, and data-layout operators — the last
mile between a curated corpus and what actually ships to training or
retrieval:

- overlapping token-window chunking (RAG / long-context splitting);
- benchmark decontamination by 8-gram shingle overlap (the eval-leak
  scan every serious training pipeline runs);
- z-order layout statistics (what multi-dimensional clustering buys at
  the file-skipping level).

All JVM-side column work; determinism via the usual contracts (md5
hash primitive, integer-scaled ratios, total tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import tokens
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"

CHUNK_SIZE = 64
CHUNK_STRIDE = 32


@register(
    "text_chunk_windows",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents),
    chunks AS (
      SELECT doc_id,
             r.i AS chunk_idx,
             list_slice(toks, r.i * {CHUNK_STRIDE} + 1,
                        r.i * {CHUNK_STRIDE} + {CHUNK_SIZE}) AS chunk
      FROM tok,
           LATERAL unnest(range(0, GREATEST((len(toks) - {CHUNK_SIZE}
             + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}, 0) + 1)) AS r(i)
      WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tok,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunking for retrieval/long-context training:
    64-token windows with stride 32, the final (shorter) window kept so
    no token is dropped. Pure array slicing inside codegen — each doc
    expands to ceil((n-size)/stride)+1 rows, linear in corpus length.
    The chunk hash (md5 over the joined tokens) is what downstream
    chunk-level dedup and vector indexing key on."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    n_chunks = F.greatest(
        F.ceil((F.size("toks") - CHUNK_SIZE) / CHUNK_STRIDE).cast("long"),
        F.lit(0).cast("long"),
    ) + F.lit(1)
    ex = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_SIZE
    )
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


DECON_NGRAM = 8
N_BENCH_DOCS = 5  # doc_id < 5 plays the held-out benchmark set


@register(
    "decontamination_ngram_overlap",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(toks) - {DECON_NGRAM} + 2),
               i -> md5(array_to_string(list_slice(toks, i, i + {DECON_NGRAM} - 1), ' '))
             )) AS gs
      FROM tok WHERE len(toks) >= {DECON_NGRAM}
    ),
    ex AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    bench AS (SELECT DISTINCT g FROM ex WHERE doc_id < {N_BENCH_DOCS}),
    hits AS (
      SELECT e.doc_id, COUNT(*) AS n_hits
      FROM ex e JOIN bench b USING (g)
      WHERE e.doc_id >= {N_BENCH_DOCS}
      GROUP BY e.doc_id
    )
    SELECT g.doc_id,
           CAST(len(g.gs) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS flagged
    FROM grams g LEFT JOIN hits h USING (doc_id)
    WHERE g.doc_id >= {N_BENCH_DOCS}
    ORDER BY g.doc_id
    """,
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    8-gram with the held-out set (docs 0-4 stand in for an eval
    benchmark). The canonical eval-leak scan (GPT-3 appendix C /
    PaLM-style): shingle both sides with the same hash, semi-join on
    the shingle. Scale shape: the benchmark side is tiny (evals are
    thousands of docs), so its distinct shingle set broadcasts; the
    corpus side streams through one explode + one broadcast-join +
    one per-doc count — no corpus x benchmark product ever exists."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= DECON_NGRAM
    )
    grams = base.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - DECON_NGRAM),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("toks"), i + 1, DECON_NGRAM), " ")
                ),
            )
        ).alias("gs"),
    )
    ex = grams.select("doc_id", F.explode("gs").alias("g"))
    bench = (
        ex.filter(F.col("doc_id") < N_BENCH_DOCS).select("g").distinct()
    )
    hits = (
        ex.filter(F.col("doc_id") >= N_BENCH_DOCS)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        grams.filter(F.col("doc_id") >= N_BENCH_DOCS)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.size("gs").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            F.when(F.coalesce(F.col("n_hits"), F.lit(0)) > 0, 1)
            .otherwise(0)
            .alias("flagged"),
        )
        .orderBy("doc_id")
    )


Z_BITS = 8  # bits per dimension interleaved into the z-value


def _z_expr_sql(a: str, b: str) -> str:
    """DuckDB bit-interleave of two 8-bit values (SQL twin of _z_expr)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _z_expr(a, b):
    """Bit-interleave two 8-bit columns into a 16-bit z-value."""
    out = F.lit(0).cast("long")
    for i in range(Z_BITS):
        out = out + F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i
        ).cast("long")
        out = out + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        ).cast("long")
    return out


@register(
    "layout_zorder_stats",
    f"""
    WITH keyed AS (
      SELECT o_orderkey,
             (o_custkey % 256) AS ka,
             ((epoch_us(o_orderdate) // 86400000000) % 256) AS kb
      FROM orders
    ),
    z AS (
      SELECT o_orderkey, ka, kb, {_z_expr_sql('ka', 'kb')} AS zval FROM keyed
    ),
    binned AS (SELECT *, zval // 4096 AS file_id FROM z)
    SELECT file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(ka) AS BIGINT) AS min_cust, CAST(MAX(ka) AS BIGINT) AS max_cust,
           CAST(MIN(kb) AS BIGINT) AS min_day, CAST(MAX(kb) AS BIGINT) AS max_day
    FROM binned
    GROUP BY file_id
    ORDER BY file_id
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order data layout: interleave the low 8 bits of customer key
    and order day into a z-value, bin into 16 'files', and report each
    file's per-dimension min/max — the zone-map statistics that make a
    point/range predicate on EITHER dimension prune most files (the
    Delta/Iceberg OPTIMIZE ZORDER effect, shown mechanically). In
    production the binned write is `repartitionByRange(zval)` +
    sortWithinPartitions; here the stats table itself is the gate.
    Bit interleaving is exact integer work in both engines."""
    orders = t(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("ka"),
        F.expr(
            "(unix_micros(cast(o_orderdate as timestamp)) div 86400000000) % 256"
        ).alias("kb"),
    )
    z = keyed.select(
        "o_orderkey", "ka", "kb", _z_expr(F.col("ka"), F.col("kb")).alias("zval")
    )
    binned = z.withColumn("file_id", F.expr("zval div 4096"))
    return (
        binned.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("ka").cast("long").alias("min_cust"),
            F.max("ka").cast("long").alias("max_cust"),
            F.min("kb").cast("long").alias("min_day"),
            F.max("kb").cast("long").alias("max_day"),
        )
        .orderBy("file_id")
    )
