"""Distribution-drift monitoring: KL divergence and chi-square of each
source's token distribution against the whole-corpus distribution — the
statistics a training pipeline tracks to catch a crawl source going
stale, spammy, or off-domain between snapshots.

Determinism: per-term KL contributions round a single `ln` over a
ratio of exact integer products (the idf discipline) and then sum as
BIGINTs; chi-square contributions are one IEEE division of two exact
BIGINT-representable values (division is correctly rounded, so both
engines produce the identical double) scaled and floored per term, then
integer-summed. No order-dependent float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import tokens
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"


@register(
    "drift_token_distribution",
    f"""
    WITH tok AS (
      SELECT source, unnest({DD_TOKS}) AS term FROM documents
    ),
    sc AS (SELECT source, term, COUNT(*) AS o FROM tok GROUP BY source, term),
    st AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ts FROM sc GROUP BY source),
    gc AS (SELECT term, CAST(SUM(o) AS BIGINT) AS g FROM sc GROUP BY term),
    gt AS (SELECT CAST(SUM(g) AS BIGINT) AS tg FROM gc),
    terms AS (
      SELECT sc.source, sc.o, gc.g, st.ts, gt.tg,
             sc.o * CAST(FLOOR(ln((CAST(sc.o AS DOUBLE) * gt.tg)
                                  / (CAST(gc.g AS DOUBLE) * st.ts))
                               * 1000000 + 0.5) AS BIGINT) AS kl_num,
             CAST(FLOOR(
               CAST(sc.o * gt.tg - gc.g * st.ts AS DOUBLE)
               * CAST(sc.o * gt.tg - gc.g * st.ts AS DOUBLE)
               / (CAST(gc.g AS DOUBLE) * st.ts * gt.tg) * 1000 + 0.5
             ) AS BIGINT) AS chisq_c
      FROM sc
      JOIN st USING (source)
      JOIN gc USING (term)
      CROSS JOIN gt
    )
    SELECT source,
           CAST(MAX(ts) AS BIGINT) AS n_tokens,
           CAST(SUM(kl_num) AS BIGINT) // CAST(MAX(ts) AS BIGINT) AS kl_c,
           CAST(SUM(chisq_c) AS BIGINT) AS chisq_c
    FROM terms
    GROUP BY source
    ORDER BY source
    """,
)
def drift_token_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift vs the whole corpus: KL(source ||
    corpus) and the chi-square statistic over the shared vocabulary.
    The corpus-sized work is one tokenize scan + one (source, term)
    partial-aggregated groupBy; everything after operates on
    vocabulary-sized tables, with the global term table broadcast.
    KL is Σ o·ln(o·Tg / (g·Ts)) div Ts, each ln rounded once at 1e6;
    chi-square per term is (o·Tg − g·Ts)²/(g·Ts·Tg), with the square
    taken in doubles (the BIGINT square would overflow beyond sf0.1
    corpora) — every per-term float op is the identical IEEE expression
    in both engines, then rounded once — so both statistics are
    bit-stable under any partitioning, unlike naive float accumulation. Terms absent from a
    source contribute 0 to its KL by convention (0·ln(0) = 0), which
    the inner-join form encodes for free."""
    docs = t(spark, sf_dir, "documents")
    ex = docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    sc = ex.groupBy("source", "term").agg(F.count(F.lit(1)).alias("o"))
    st = sc.groupBy("source").agg(F.sum("o").cast("long").alias("ts"))
    gc = sc.groupBy("term").agg(F.sum("o").cast("long").alias("g"))
    gt = gc.agg(F.sum("g").cast("long").alias("tg"))
    terms = (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(gc), "term")
        .crossJoin(F.broadcast(gt))
    )
    kl_num = F.col("o") * F.floor(
        F.log(
            (F.col("o").cast("double") * F.col("tg"))
            / (F.col("g").cast("double") * F.col("ts"))
        )
        * 1e6
        + 0.5
    ).cast("long")
    # square in DOUBLE: the BIGINT square can overflow past sf0.1-scale
    # corpora (Spark would wrap, DuckDB would raise — either way wrong);
    # both engines run the identical IEEE multiply instead
    diff = (F.col("o") * F.col("tg") - F.col("g") * F.col("ts")).cast("double")
    chisq = F.floor(
        diff
        * diff
        / (F.col("g").cast("double") * F.col("ts") * F.col("tg"))
        * 1000
        + 0.5
    ).cast("long")
    contrib = terms.select(
        "source", "ts", kl_num.alias("kl_num"), chisq.alias("chisq_c")
    )
    return (
        contrib.groupBy("source")
        .agg(
            F.max("ts").cast("long").alias("n_tokens"),
            F.expr("cast(sum(kl_num) as bigint) div cast(max(ts) as bigint)").alias(
                "kl_c"
            ),
            F.sum("chisq_c").cast("long").alias("chisq_c"),
        )
        .orderBy("source")
    )
