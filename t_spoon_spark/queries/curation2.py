"""Corpus-curation operators, round 13: length-band filtering, source
mix rebalancing, per-group sampling caps, and truncation-duplicate
detection — the remaining staples of a training-data curation pass
(reference scope: §2.9 mandated LLM-pipeline surface; the reference
engine itself has no analogue — these are the operations its users
would run downstream of it).

All four are pure `pyspark.sql.functions` column algebra (no UDFs, no
driver loops): per-group windows and aggregations whose shuffle key is
the curation group, so at 100 TB each operator is one shuffle on
(source[, lang]) — bounded groups, no skew beyond the source mix
itself, and every output is a control-plane-sized summary or a capped
selection.  Exact-hash determinism: integer token counts, integer-div
rank arithmetic ((n+3) DIV 4, not float quantiles), md5-ordered
sampling, total tiebreaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import tokens
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"

# per-(source, lang) document cap for sample_group_capped — the "data
# mixing cap" a corpus build applies so no shard dominates a mixture
GROUP_CAP = 3

# document-prefix length (tokens) for truncation-duplicate detection
PREFIX_TOKENS = 32


@register(
    "curation_length_quantile_band",
    f"""
    WITH tok AS (
        SELECT source, doc_id, len({DD_TOKS}) AS n_tok
        FROM documents
    ),
    ranked AS (
        SELECT source, n_tok,
               row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS r,
               count(*) OVER (PARTITION BY source) AS n
        FROM tok
    ),
    banded AS (
        SELECT source, n_tok,
               max(CASE WHEN r = (n + 3) // 4 THEN n_tok END)
                 OVER (PARTITION BY source) AS p25,
               max(CASE WHEN r = (3 * n + 3) // 4 THEN n_tok END)
                 OVER (PARTITION BY source) AS p75
        FROM ranked
    )
    SELECT source,
           max(p25) AS p25_tok,
           max(p75) AS p75_tok,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN n_tok BETWEEN p25 AND p75 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_docs,
           CAST(SUM(CASE WHEN n_tok BETWEEN p25 AND p75 THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM banded
    GROUP BY source
    ORDER BY source
    """,
)
def curation_length_quantile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source interquartile length band: exact discrete P25/P75 of
    token counts (value at rank ceil(q*n), integer-div arithmetic so
    both engines compute the identical rank) and the doc/token mass the
    band keeps — the classic "drop the too-short and too-long tails"
    curation filter, reported per source so a build can audit what the
    filter costs each shard.  Scale shape: one shuffle on source for
    the window, one for the final group-by; the window state per group
    is O(1).  At 100 TB the exact rank needs the per-source sort the
    window already implies — for quantiles over truly unbounded groups
    the sketch_histogram_quantiles entry is the approximate path."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))
    w = Window.partitionBy("source")
    ranked = tok.select(
        "source",
        "n_tok",
        F.row_number().over(w.orderBy("n_tok", "doc_id")).alias("r"),
        F.count("*").over(w).alias("n"),
    )
    banded = ranked.select(
        "source",
        "n_tok",
        F.max(
            F.when(F.col("r") == F.expr("(n + 3) DIV 4"), F.col("n_tok"))
        ).over(w).alias("p25"),
        F.max(
            F.when(F.col("r") == F.expr("(3 * n + 3) DIV 4"), F.col("n_tok"))
        ).over(w).alias("p75"),
    )
    in_band = (F.col("n_tok") >= F.col("p25")) & (F.col("n_tok") <= F.col("p75"))
    return (
        banded.groupBy("source")
        .agg(
            F.max("p25").alias("p25_tok"),
            F.max("p75").alias("p75_tok"),
            F.count("*").alias("n_docs"),
            F.sum(F.when(in_band, 1).otherwise(0)).alias("kept_docs"),
            F.sum(F.when(in_band, F.col("n_tok")).otherwise(0)).alias("kept_tokens"),
        )
        .orderBy("source")
    )


@register(
    "curation_mix_rebalance_plan",
    f"""
    WITH tot AS (
        SELECT source, CAST(SUM(len({DD_TOKS})) AS BIGINT) AS tokens_total
        FROM documents
        GROUP BY source
    ),
    floor_tok AS (SELECT min(tokens_total) AS target FROM tot)
    SELECT source,
           tokens_total,
           (target * 1000000) // tokens_total AS rate_ppm
    FROM tot, floor_tok
    ORDER BY source
    """,
)
def curation_mix_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing plan: the per-source sampling rate (parts
    per million, integer-div) that levels every source down to the
    smallest source's token mass — the uniform-mix variant of the
    temperature mixture sampler (sample_mixture_temperature).  Scale
    shape: one group-by for the totals, then a broadcast of the 1-row
    floor frame (`crossJoin(F.broadcast(...))` of a scalar — control
    plane, the repo-wide pattern for scalar totals); the plan output is
    |sources| rows, which a 100 TB build applies as a hash-gated filter
    in its next pass."""
    docs = t(spark, sf_dir, "documents")
    tot = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).alias("tokens_total")
    )
    floor_tok = tot.agg(F.min("tokens_total").alias("target"))
    return (
        tot.crossJoin(F.broadcast(floor_tok))
        .select(
            "source",
            "tokens_total",
            F.expr("(target * 1000000) DIV tokens_total").alias("rate_ppm"),
        )
        .orderBy("source")
    )


@register(
    "sample_group_capped",
    f"""
    WITH hashed AS (
        SELECT source, lang, doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS hk
        FROM documents
    ),
    ranked AS (
        SELECT source, lang, doc_id,
               row_number() OVER (PARTITION BY source, lang ORDER BY hk, doc_id)
                 AS pick_rank
        FROM hashed
    )
    SELECT source, lang, doc_id, pick_rank
    FROM ranked
    WHERE pick_rank <= {GROUP_CAP}
    ORDER BY source, lang, pick_rank
    """,
)
def sample_group_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) document cap: keep at most GROUP_CAP docs per
    cell, chosen by md5(doc_id) order (a deterministic uniform shuffle —
    the same hash-gated determinism contract as every sampler in
    queries/sampling.py) with doc_id as the total tiebreak.  This is
    the "no shard dominates the mixture" cap a corpus build applies
    before concatenation.  Scale shape: one shuffle on (source, lang);
    the rank-K window keeps O(1) state per group and the output is
    capped at GROUP_CAP * |cells| rows by construction."""
    docs = t(spark, sf_dir, "documents")
    hashed = docs.select(
        "source", "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hk")
    )
    w = Window.partitionBy("source", "lang").orderBy("hk", "doc_id")
    return (
        hashed.select("source", "lang", "doc_id", F.row_number().over(w).alias("pick_rank"))
        .filter(F.col("pick_rank") <= GROUP_CAP)
        .orderBy("source", "lang", "pick_rank")
    )


@register(
    "dedup_prefix_hash_groups",
    f"""
    WITH tok AS (
        SELECT doc_id, {DD_TOKS} AS toks FROM documents
    ),
    pre AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(toks, 1, {PREFIX_TOKENS}), ' ')) AS h
        FROM tok
    )
    SELECT substr(h, 1, 16) AS prefix_hash,
           count(*) AS n_docs,
           min(doc_id) AS keep_doc_id
    FROM pre
    GROUP BY h
    HAVING count(*) > 1
    ORDER BY keep_doc_id
    """,
)
def dedup_prefix_hash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-duplicate groups: documents sharing their first
    PREFIX_TOKENS tokens (md5 of the joined prefix) — catches the
    truncated/extended copies that exact-md5 dedup misses and full
    near-dup (MinHash) pays a banding pass for.  Keep-rule: lowest
    doc_id survives, the group row reports the hash prefix and group
    size.  Scale shape: embarrassingly parallel hash + one group-by on
    the digest (identical to dedup_exact_md5's shape; the prefix slice
    keeps the hashed payload O(PREFIX_TOKENS) per doc regardless of
    document length — at 100 TB this hashes ~32 tokens/doc instead of
    whole documents)."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    pre = docs.select(
        "doc_id",
        F.md5(F.array_join(F.slice(toks, 1, PREFIX_TOKENS), " ")).alias("h"),
    )
    return (
        pre.groupBy("h")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
        .select(
            F.substring("h", 1, 16).alias("prefix_hash"), "n_docs", "keep_doc_id"
        )
        .orderBy("keep_doc_id")
    )


# -- leakage-safe split (round 13, entry 5) ---------------------------------

from t_spoon_spark.operators.text import dd_md5_long, md5_long  # noqa: E402
from t_spoon_spark.queries.dedup import _DD_SIMHASH_CTES  # noqa: E402


@register(
    "sample_leakage_safe_split",
    f"""
    WITH RECURSIVE {_DD_SIMHASH_CTES},
    pairs AS (
      SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    ),
    cc AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    assign AS (
      SELECT d.doc_id,
             COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
    )
    SELECT doc_id,
           cluster_id,
           CASE
             WHEN {dd_md5_long("CAST(cluster_id AS VARCHAR)")} % 10 < 8 THEN 'train'
             WHEN {dd_md5_long("CAST(cluster_id AS VARCHAR)")} % 10 = 8 THEN 'val'
             ELSE 'test'
           END AS split
    FROM assign
    ORDER BY doc_id
    """,
)
def sample_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split decision hashes the
    near-dup CLUSTER label, not the document, so two near-duplicate
    documents can never land in different splits (the eval-contamination
    mode a doc-level split invites — a train doc's near-copy scoring as
    "held out").  Clusters come from the SimHash connected-components
    operator (dedup_clusters_connected's kernel, pair cache shared);
    docs in no near-dup pair are their own singleton cluster.  The
    80/10/10 assignment is md5(cluster_id) mod 10 — hash-gated
    determinism, the same contract as every sampler here, and the
    DuckDB twin recomputes clusters by recursive transitive closure so
    exact agreement pins BOTH the clustering and the split rule.
    Scale shape: the CC frame is only pair-involved docs (the dup
    fraction of the corpus); the assignment is one left join on doc_id
    plus a map-side hash — no new shuffle class beyond the cluster
    operator itself.  Reference scope: §2.9 pipeline surface (the
    reference engine has no analogue)."""
    from t_spoon_spark.queries.dedup import dedup_clusters_connected

    docs = t(spark, sf_dir, "documents")
    cc = dedup_clusters_connected(spark, sf_dir)
    assign = docs.select("doc_id").join(
        cc.withColumnRenamed("doc_id", "cc_doc"),
        docs["doc_id"] == F.col("cc_doc"),
        "left",
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    bucket = md5_long(F.col("cluster_id").cast("string")) % 10
    return assign.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias("split"),
    ).orderBy("doc_id")
