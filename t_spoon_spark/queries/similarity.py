"""Similarity-search queries over the embeddings table.

DuckDB twins compute the identical fixed-point integer dot products
(list_transform over index ranges), so scores match bit-for-bit
including the LSH bucket assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.similarity import (
    IVF_NPROBE,
    IVF_STRIDE,
    N_PLANES,
    PLANES,
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    lsh_multiprobe_topk,
    lsh_topk,
)
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

N_QUERIES = 5

DD_EI = "list_transform(embedding, x -> CAST(FLOOR(x * 1000 + 0.5) AS BIGINT))"
DD_DOT_SELF = "list_sum(list_transform(range(1, len(ei) + 1), i -> ei[i] * ei[i]))"
DD_DOT_AB = "list_sum(list_transform(range(1, len(a.ei) + 1), i -> a.ei[i] * b.ei[i]))"


def _dd_base() -> str:
    return f"""
    WITH base AS (
      SELECT vec_id, {DD_EI} AS ei FROM embeddings
    ),
    normed AS (
      SELECT vec_id, ei, sqrt(CAST({DD_DOT_SELF} AS DOUBLE)) AS norm FROM base
    )
    """


def _dd_bucket_expr(alias: str) -> str:
    terms = []
    for j, plane in enumerate(PLANES):
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        dot = f"list_sum(list_transform(range(1, len({alias}.ei) + 1), i -> {alias}.ei[i] * ({lit})[i]))"
        terms.append(f"(CASE WHEN {dot} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {j})")
    return "(" + " + ".join(terms) + ")"


@register(
    "similarity_bruteforce_topk",
    f"""
    {_dd_base()},
    q AS (SELECT * FROM normed WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             CAST(FLOOR(CAST({DD_DOT_AB} AS DOUBLE) * 1e6 / (a.norm * b.norm) + 0.5) AS BIGINT) AS cos_c
      FROM q a JOIN normed b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_c DESC, c_id) AS rnk
      FROM scored
    )
    SELECT q_id, c_id, cos_c, rnk FROM ranked WHERE rnk <= 5
    ORDER BY q_id, rnk
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(emb, queries, k=5)
    return out.select("q_id", "c_id", "cos_c", "rnk").orderBy("q_id", "rnk")


@register(
    "similarity_lsh_topk",
    f"""
    {_dd_base()},
    bucketed AS (
      SELECT n.vec_id, n.ei, n.norm, {_dd_bucket_expr('n')} AS bucket
      FROM normed n
    ),
    q AS (SELECT * FROM bucketed WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             CAST(FLOOR(CAST({DD_DOT_AB} AS DOUBLE) * 1e6 / (a.norm * b.norm) + 0.5) AS BIGINT) AS cos_c
      FROM q a JOIN bucketed b USING (bucket)
      WHERE a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_c DESC, c_id) AS rnk
      FROM scored
    )
    SELECT q_id, c_id, cos_c, rnk FROM ranked WHERE rnk <= 5
    ORDER BY q_id, rnk
    """,
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path: same top-k but candidates restricted to the query's
    8-bit hyperplane-LSH bucket (deterministic recall loss, identical
    in both engines)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = lsh_topk(emb, queries, k=5)
    return out.select("q_id", "c_id", "cos_c", "rnk").orderBy("q_id", "rnk")


@register(
    "similarity_lsh_multiprobe_topk",
    f"""
    {_dd_base()},
    bucketed AS (
      SELECT n.vec_id, n.ei, n.norm, {_dd_bucket_expr('n')} AS bucket
      FROM normed n
    ),
    qp AS (
      SELECT b.vec_id AS q_id, b.ei AS qe, b.norm AS qnorm,
             unnest(list_concat(
               list_concat(
                 [b.bucket],
                 list_transform(range(0, {N_PLANES}),
                   j -> xor(b.bucket, CAST(1 AS BIGINT) << j))),
               flatten(list_transform(range(0, {N_PLANES}), j ->
                 list_transform(range(j + 1, {N_PLANES}), k ->
                   xor(b.bucket, xor(CAST(1 AS BIGINT) << j,
                                     CAST(1 AS BIGINT) << k))))))) AS bucket
      FROM bucketed b WHERE b.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT a.q_id, b.vec_id AS c_id,
             CAST(FLOOR(CAST(list_sum(list_transform(range(1, len(a.qe) + 1),
                  i -> a.qe[i] * b.ei[i])) AS DOUBLE) * 1e6
                  / (a.qnorm * b.norm) + 0.5) AS BIGINT) AS cos_c
      FROM qp a JOIN bucketed b USING (bucket)
      WHERE a.q_id <> b.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_c DESC, c_id) AS rnk
      FROM scored
    )
    SELECT q_id, c_id, cos_c, rnk FROM ranked WHERE rnk <= 5
    ORDER BY q_id, rnk
    """,
)
def similarity_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe hyperplane LSH: the standard recall fix for
    single-bucket probing (Lv et al., multi-probe LSH) — each query
    also probes every bucket one or two sign-flips away (1 + 8 + 28 =
    37 probes), a bounded candidate fan-out that stays a pure
    equi-join (probe keys exploded on the broadcast query side; corpus
    bucketing unchanged).  The similarity_ann_recall_report entry
    measures exactly what this buys over the single-probe entry on the
    same corpus — and what the extra fan-out costs."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = lsh_multiprobe_topk(emb, queries, k=5)
    return out.select("q_id", "c_id", "cos_c", "rnk").orderBy("q_id", "rnk")


def _dd_dot(x_ei: str, y_ei: str) -> str:
    return f"list_sum(list_transform(range(1, len({x_ei}) + 1), i -> {x_ei}[i] * {y_ei}[i]))"


def _dd_cos(x_ei: str, y_ei: str, x_norm: str, y_norm: str) -> str:
    return (
        f"CAST(FLOOR(CAST({_dd_dot(x_ei, y_ei)} AS DOUBLE) * 1e6"
        f" / ({x_norm} * {y_norm}) + 0.5) AS BIGINT)"
    )


@register(
    "similarity_ivf_topk",
    f"""
    {_dd_base()},
    cents AS (
      SELECT vec_id AS cent_id, ei AS ce, norm AS cnorm FROM normed
      WHERE vec_id % {IVF_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_dd_cos('n.ei', 'c.ce', 'n.norm', 'c.cnorm')} DESC, c.cent_id
               ) AS crnk
        FROM normed n CROSS JOIN cents c
      ) WHERE crnk = 1
    ),
    probes AS (
      SELECT vec_id AS q_id, cent_id FROM (
        SELECT n.vec_id, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY {_dd_cos('n.ei', 'c.ce', 'n.norm', 'c.cnorm')} DESC, c.cent_id
               ) AS crnk
        FROM normed n CROSS JOIN cents c
        WHERE n.vec_id < {N_QUERIES}
      ) WHERE crnk <= {IVF_NPROBE}
    ),
    scored AS (
      SELECT p.q_id, a.vec_id AS c_id,
             {_dd_cos('qn.ei', 'bn.ei', 'qn.norm', 'bn.norm')} AS cos_c
      FROM probes p
        JOIN assign a USING (cent_id)
        JOIN normed qn ON qn.vec_id = p.q_id
        JOIN normed bn ON bn.vec_id = a.vec_id
      WHERE a.vec_id <> p.q_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_c DESC, c_id) AS rnk
      FROM scored
    )
    SELECT q_id, c_id, cos_c, rnk FROM ranked WHERE rnk <= 5
    ORDER BY q_id, rnk
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: deterministic coarse centroids (every 100th
    vec_id), corpus bucketed into inverted lists by nearest-centroid
    assignment, queries probe the 2 nearest lists with exact cosine —
    the inverted-file counterpart to the hyperplane-LSH scale path."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = ivf_topk(emb, queries, k=5)
    return out.select("q_id", "c_id", "cos_c", "rnk").orderBy("q_id", "rnk")


N_BANDS = 4
BAND_BITS = 2
MAX_BUCKET = 10_000  # skew guard; >> n/2^band_bits at gate SFs, binds at scale


def _dd_band_key(alias: str, band: int, band_bits: int) -> str:
    from t_spoon_spark.operators.similarity import _plane

    terms = []
    for i in range(band_bits):
        lit = "[" + ", ".join(str(v) for v in _plane(band * band_bits + i)) + "]"
        dot = f"list_sum(list_transform(range(1, len({alias}.ei) + 1), i -> {alias}.ei[i] * ({lit})[i]))"
        terms.append(f"(CASE WHEN {dot} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {i})")
    return "(" + " + ".join(terms) + ")"


def _dd_bands() -> str:
    parts = [
        f"SELECT n.vec_id, {j} AS band, {_dd_band_key('n', j, BAND_BITS)} AS bkey FROM normed n"
        for j in range(N_BANDS)
    ]
    return " UNION ALL ".join(parts)


@register(
    "dedup_embedding_cosine",
    f"""
    {_dd_base()},
    bands AS ({_dd_bands()}),
    capped AS (
      SELECT * FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY band, bkey) <= {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
      FROM capped x JOIN capped y USING (band, bkey)
      WHERE x.vec_id < y.vec_id
    ),
    pairs AS (
      SELECT id_a, id_b,
             CAST(FLOOR(CAST({DD_DOT_AB} AS DOUBLE) * 1e6 / (a.norm * b.norm) + 0.5) AS BIGINT) AS cos_c
      FROM cand JOIN normed a ON id_a = a.vec_id JOIN normed b ON id_b = b.vec_id
    )
    SELECT id_a, id_b, cos_c FROM pairs
    WHERE cos_c >= 500000
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.5 on the scaled
    score) among banded-LSH candidates — no all-pairs product; the
    oracle recomputes the identical band keys, cap, and candidate set."""
    emb = t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(
        emb,
        threshold_c=500_000,
        n_bands=N_BANDS,
        band_bits=BAND_BITS,
        max_bucket=MAX_BUCKET,
    ).orderBy("id_a", "id_b")


@register(
    "similarity_sq8_topk",
    f"""
    WITH code AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> GREATEST(-127, LEAST(127, CAST(ROUND(x * 254) AS BIGINT)))) AS code
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, code AS qcode FROM code WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id, c.vec_id AS c_id,
             list_sum(list_transform(range(1, len(qcode) + 1),
               i -> (qcode[i] - c.code[i]) * (qcode[i] - c.code[i]))) AS d2
      FROM q JOIN code c ON c.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d2, c_id) AS rnk
      FROM scored
    )
    SELECT q_id, c_id, CAST(d2 AS BIGINT) AS d2, rnk
    FROM ranked WHERE rnk <= 5
    ORDER BY q_id, rnk
    """,
)
def similarity_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) nearest neighbours — the FAISS-SQ8
    memory-compression move: codes are 4x smaller than float32, the
    distance is EXACT integer L2 over codes (bit-identical across
    engines, no float tie risk), and at 100 TB the code column replaces
    the float column on the scan side (composable with the IVF entry's
    list pruning). Queries broadcast; corpus never shuffles."""
    from t_spoon_spark.operators.similarity import sq8_topk

    emb = t(spark, sf_dir, "embeddings")
    out = sq8_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), k=5)
    return out.select("q_id", "c_id", F.col("d2").cast("long").alias("d2"), "rnk").orderBy(
        "q_id", "rnk"
    )


@register(
    "knn_label_vote_accuracy",
    f"""
    {_dd_base()},
    lab AS (SELECT vec_id, label FROM embeddings),
    q AS (SELECT * FROM normed WHERE vec_id < 50),
    scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             CAST(FLOOR(CAST({DD_DOT_AB} AS DOUBLE) * 1e6 / (a.norm * b.norm) + 0.5) AS BIGINT) AS cos_c
      FROM q a JOIN normed b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_c DESC, c_id) AS rnk
      FROM scored
    ),
    votes AS (
      SELECT r.q_id, l.label, COUNT(*) AS n_votes
      FROM ranked r JOIN lab l ON r.c_id = l.vec_id
      WHERE r.rnk <= 5
      GROUP BY r.q_id, l.label
    ),
    pred AS (
      SELECT q_id, label AS pred_label,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY n_votes DESC, label) AS vr
      FROM votes
    )
    SELECT ql.label AS true_label,
           COUNT(*) AS n_queries,
           COUNT(*) FILTER (WHERE p.pred_label = ql.label) AS n_correct
    FROM pred p JOIN lab ql ON p.q_id = ql.vec_id
    WHERE p.vr = 1
    GROUP BY ql.label
    ORDER BY true_label
    """,
)
def knn_label_vote_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality evaluation: 5-NN majority-label vote for the
    first 50 vectors, scored against their own labels per class — the
    eval loop a training pipeline runs to sanity-check an embedding
    space (kNN probe). Deterministic end to end: fixed-point cosine,
    (score, id) neighbour tiebreak, (votes, label) vote tiebreak. Reuses
    the broadcast-queries brute-force scan; at 100 TB the same vote
    composes over the IVF/SQ8 candidate generators instead."""
    from pyspark.sql import Window as PW

    emb = t(spark, sf_dir, "embeddings")
    lab = emb.select("vec_id", "label")
    topk = brute_force_topk(emb, emb.filter(F.col("vec_id") < 50), k=5)
    votes = (
        topk.join(lab.withColumnRenamed("vec_id", "c_id"), "c_id")
        .groupBy("q_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    vr = F.row_number().over(
        PW.partitionBy("q_id").orderBy(F.desc("n_votes"), F.asc("label"))
    )
    pred = votes.withColumn("vr", vr).filter(F.col("vr") == 1).select(
        "q_id", F.col("label").alias("pred_label")
    )
    scored = pred.join(
        lab.select(F.col("vec_id").alias("q_id"), F.col("label").alias("true_label")),
        "q_id",
    )
    return (
        scored.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .orderBy("true_label")
    )
