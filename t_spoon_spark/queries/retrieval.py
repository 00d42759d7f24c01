"""Retrieval / relevance operators over the documents table: TF-IDF
term weighting, BM25 ranked search, and PMI collocation mining — the
index-side text operators a corpus pipeline runs to support search,
keyword extraction, and phrase discovery.

Determinism contract (see registry docstring): the only floating-point
step is a single `ln` over a ratio of small integers, immediately
rounded half-up at 1e6 scale — every downstream product / division is
exact BIGINT arithmetic (`div` in Spark, `//` in DuckDB), so scores are
bit-identical across engines regardless of partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import tokens
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"

# BM25 parameters k1=1.2, b=0.75 — folded into integer constants below
# (den * 10T = 10*T*tf + k1*(1-b)*10T + k1*b*10*dl*D = 10T*tf + 3T + 9*dl*D).
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "hash"),
    (0, "join"),
    (1, "window"),
    (1, "agg"),
    (2, "stream"),
    (2, "batch"),
    (3, "customer"),
    (3, "query"),
    (3, "fast"),
]


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf) — explode + partial-aggregated groupBy.
    Shuffles once on (doc_id, term); linear in corpus token count."""
    docs = t(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    return ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


@register(
    "text_tfidf_top_terms",
    f"""
    WITH tok AS (SELECT doc_id, unnest({DD_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, d.df,
             tf.tf * CAST(FLOOR(ln((nd.n_docs + 1.0) / (d.df + 1.0)) * 1000000 + 0.5) AS BIGINT)
               AS score_c
      FROM tf JOIN dfreq d USING (term) CROSS JOIN nd
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_c DESC, term) AS rnk
      FROM scored
    )
    SELECT doc_id, term, tf, df, score_c, rnk FROM ranked WHERE rnk <= 5
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 keywords per document by TF-IDF (idf = ln((N+1)/(df+1)),
    smoothed). The document-frequency table is vocabulary-sized, so it
    broadcasts; at a 100 TB corpus with an open vocabulary the df join
    falls back to a shuffle join on the term hash — still one shuffle,
    map-side combined. idf is integer-scaled once per distinct term;
    tf * idf_c stays exact BIGINT."""
    tf = _tf(spark, sf_dir)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = t(spark, sf_dir, "documents").select(F.count(F.lit(1)).alias("n_docs"))
    idf_c = F.floor(
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) * 1e6 + 0.5
    ).cast("long")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", "tf", "df", (F.col("tf") * idf_c).alias("score_c"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_c"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "term", "tf", "df", "score_c", "rnk")
        .orderBy("doc_id", "rnk")
    )


def _dd_bm25_queries() -> str:
    rows = ", ".join(f"({q}, '{term}')" for q, term in BM25_QUERIES)
    return f"(VALUES {rows}) AS q(q_id, term)"


@register(
    "text_bm25_search",
    f"""
    WITH tok AS (SELECT doc_id, unnest({DD_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    tot AS (SELECT (SELECT COUNT(*) FROM documents) AS d_docs,
                   (SELECT COUNT(*) FROM tok) AS t_tokens),
    q AS (SELECT CAST(q_id AS BIGINT) AS q_id, term FROM {_dd_bm25_queries()}),
    contrib AS (
      SELECT q.q_id, tf.doc_id,
             (CAST(FLOOR(ln((tot.d_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * 1000000 + 0.5) AS BIGINT)
              * tf.tf * 22 * tot.t_tokens)
             // (10 * tot.t_tokens * tf.tf + 3 * tot.t_tokens + 9 * dl.dl * tot.d_docs)
               AS score_c
      FROM q
      JOIN tf USING (term)
      JOIN dl USING (doc_id)
      JOIN dfreq d USING (term)
      CROSS JOIN tot
    ),
    scored AS (
      SELECT q_id, doc_id, CAST(SUM(score_c) AS BIGINT) AS score_c
      FROM contrib GROUP BY q_id, doc_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score_c DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT q_id, doc_id, score_c, rnk FROM ranked WHERE rnk <= 10
    ORDER BY q_id, rnk
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed query set,
    top-10 docs per query. The length normalization is algebraically
    cleared of floats: den*10T = 10T*tf + 3T + 9*dl*D, all BIGINT, and
    each term's contribution is (idf_c * tf * 22T) div den10T — exact
    integer division in both engines. Scale shape: the query set
    broadcasts to the posting lists (tf semi-joined on term), dl and df
    are one groupBy each, and the final per-(query, doc) sum shuffles
    only matched postings — the classic impact-ordered retrieval plan,
    never the full corpus x queries product."""
    docs = t(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # the posting list (tf) is the ONE artifact built from the token
    # stream; document length and the corpus token total both derive
    # from it (dl = SUM tf per doc, t_tokens = SUM tf — identical
    # counts, docs without tokens appear in neither) — the old shape
    # re-ran the corpus-sized explode three times (optimization r14,
    # guide §2.1).  Materialized executor-side for its three readers;
    # this is exactly the index artifact a search pipeline persists.
    tf = (
        ex.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tot = docs.select(F.count(F.lit(1)).alias("d_docs")).crossJoin(
        tf.select(F.sum("tf").alias("t_tokens"))
    )
    qdf = spark.createDataFrame(
        [(int(q), term) for q, term in BM25_QUERIES], "q_id: bigint, term: string"
    )
    joined = (
        F.broadcast(qdf)
        .join(tf, "term")
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(tot))
    )
    idf_c = F.floor(
        F.log((F.col("d_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0) * 1e6
        + 0.5
    ).cast("long")
    contrib = joined.select(
        "q_id",
        "doc_id",
        (idf_c * F.col("tf") * F.lit(22) * F.col("t_tokens")).alias("num"),
        (
            F.lit(10) * F.col("t_tokens") * F.col("tf")
            + F.lit(3) * F.col("t_tokens")
            + F.lit(9) * F.col("dl") * F.col("d_docs")
        ).alias("den"),
    ).select("q_id", "doc_id", F.expr("num div den").alias("score_c"))
    scored = contrib.groupBy("q_id", "doc_id").agg(
        F.sum("score_c").cast("long").alias("score_c")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score_c"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "doc_id", "score_c", "rnk")
        .orderBy("q_id", "rnk")
    )


PMI_WINDOW = 4  # co-occurrence window: pairs (w_i, w_j), j in i+1..i+4


@register(
    "text_pmi_collocations",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents),
    pairs AS (
      SELECT CASE WHEN a < b THEN a ELSE b END AS w1,
             CASE WHEN a < b THEN b ELSE a END AS w2
      FROM (
        SELECT toks[i] AS a, toks[i + k] AS b
        FROM tok,
             LATERAL unnest(range(1, len(toks) + 1)) AS r1(i),
             LATERAL unnest(range(1, {PMI_WINDOW} + 1)) AS r2(k)
        WHERE i + k <= len(toks)
      )
      WHERE a <> b
    ),
    pc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY w1, w2),
    uni AS (
      SELECT w, COUNT(*) AS n_w FROM (
        SELECT unnest(toks) AS w FROM tok
      ) GROUP BY w
    ),
    tot AS (SELECT (SELECT CAST(SUM(n_pair) AS BIGINT) FROM pc) AS p_tot,
                   (SELECT CAST(SUM(n_w) AS BIGINT) FROM uni) AS u_tot),
    scored AS (
      SELECT pc.w1, pc.w2, pc.n_pair,
             CAST(FLOOR(ln(
               (pc.n_pair * tot.u_tot * tot.u_tot)
               / (CAST(tot.p_tot AS DOUBLE) * u1.n_w * u2.n_w)
             ) * 1000000 + 0.5) AS BIGINT) AS pmi_c
      FROM pc
      JOIN uni u1 ON pc.w1 = u1.w
      JOIN uni u2 ON pc.w2 = u2.w
      CROSS JOIN tot
      WHERE pc.n_pair >= 50
    )
    SELECT w1, w2, n_pair, pmi_c,
           ROW_NUMBER() OVER (ORDER BY pmi_c DESC, w1, w2) AS rnk
    FROM scored
    ORDER BY rnk
    LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining: pointwise mutual information of token
    pairs co-occurring within a 4-token sliding window, top-20 pairs
    with support >= 50. The pair stream is linear in corpus length
    (each position emits at most 4 pairs — never the per-doc distinct
    vocabulary square), and both count tables are vocabulary-sized
    partial aggregates. The PMI ratio is assembled as one exact
    integer product over an exact double quotient, then ln + round —
    the same single-rounding discipline as idf."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks"))
    # posexplode + self-pairing via element_at(i+k): linear expansion
    ex = base.select(
        F.posexplode("toks").alias("i", "a"), F.col("toks")
    )
    pairs = (
        ex.select(
            "a",
            F.explode(
                F.slice(F.col("toks"), F.col("i") + 2, PMI_WINDOW)
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("w1"),
            F.greatest("a", "b").alias("w2"),
        )
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = base.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("n_w")
    )
    tot = pc.select(F.sum("n_pair").cast("long").alias("p_tot")).crossJoin(
        uni.select(F.sum("n_w").cast("long").alias("u_tot"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    scored = (
        pc.filter(F.col("n_pair") >= 50)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.floor(
                F.log(
                    (F.col("n_pair") * F.col("u_tot") * F.col("u_tot"))
                    / (
                        F.col("p_tot").cast("double")
                        * F.col("n_w1")
                        * F.col("n_w2")
                    )
                )
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("pmi_c"),
        )
    )
    # TakeOrderedAndProject top-20 first, then rank the 20-row result —
    # the global row_number window pushed the whole bigram vocabulary
    # through one partition (optimization r14)
    top = scored.orderBy(F.desc("pmi_c"), F.asc("w1"), F.asc("w2")).limit(20)
    return (
        top.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("pmi_c"), F.asc("w1"), F.asc("w2"))
            ),
        )
        .orderBy("rnk")
    )


LM_V_SMOOTH = 50  # Laplace smoothing: vocabulary-size constant


@register(
    "text_lm_bigram_score",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents),
    big AS (
      SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      FROM tok, LATERAL unnest(range(1, len(toks))) AS r(i)
      WHERE len(toks) >= 2
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY w1, w2),
    cu AS (SELECT w1, COUNT(*) AS cu FROM big GROUP BY w1),
    scored AS (
      SELECT b.doc_id,
             CAST(FLOOR(ln((cb.cb + 1.0) / (cu.cu + {LM_V_SMOOTH}.0)) * 1000000 + 0.5)
                  AS BIGINT) AS lp_c
      FROM big b JOIN cb USING (w1, w2) JOIN cu USING (w1)
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(-(SUM(lp_c) // COUNT(*)) AS BIGINT) AS nll_per_bigram_c
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality score: each document's
    average negative log-likelihood under a Laplace-smoothed bigram
    model trained on the corpus itself (high NLL = out-of-distribution
    / junk; the signal CCNet thresholds to tier CommonCrawl). The model
    tables are vocabulary-sized (broadcast); the per-doc score is one
    bigram explode + two broadcast joins + a groupBy — linear, one
    shuffle on doc_id. Each bigram's log-prob is rounded once at 1e6
    and summed as BIGINTs (the idf discipline), so the score is
    bit-stable under any partitioning. In production the model is
    trained on a held-out reference corpus and applied to the crawl;
    self-scoring here keeps the gate single-table."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    big = base.select(
        "doc_id",
        F.posexplode(F.slice("toks", 1, F.size("toks") - 1)).alias("i", "w1"),
        F.col("toks"),
    ).select(
        "doc_id", "w1", F.element_at("toks", F.col("i") + 2).alias("w2")
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    lp = F.floor(
        F.log((F.col("cb") + 1.0) / (F.col("cu") + float(LM_V_SMOOTH))) * 1e6 + 0.5
    ).cast("long")
    scored = (
        big.join(F.broadcast(cb), ["w1", "w2"])
        .join(F.broadcast(cu), "w1")
        .select("doc_id", lp.alias("lp_c"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("cast(-(sum(lp_c) div count(1)) as bigint)").alias(
                "nll_per_bigram_c"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "index_compression_estimate",
    f"""
    WITH tok AS (SELECT doc_id, unnest({DD_TOKS}) AS term FROM documents),
    postings AS (SELECT DISTINCT term, doc_id FROM tok),
    deltas AS (
      SELECT term, doc_id,
             doc_id - LAG(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS delta
      FROM postings
    ),
    bits AS (
      SELECT term,
             COUNT(*) AS df,
             CAST(SUM(CASE WHEN delta IS NULL THEN 64
                           WHEN delta = 0 THEN 1
                           ELSE length(bin(delta)) END) AS BIGINT) AS delta_bits,
             CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits
      FROM deltas GROUP BY term
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(df) AS BIGINT) AS n_postings,
           CAST(SUM(raw_bits) AS BIGINT) AS raw_bits,
           CAST(SUM(delta_bits) AS BIGINT) AS delta_bits,
           CAST(FLOOR(SUM(raw_bits) * 100.0 / SUM(delta_bits)) AS BIGINT)
             AS compression_x100
    FROM bits
    """,
)
def index_compression_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index storage planning: per-term posting lists are
    delta-encoded (sorted doc-id gaps), and the entry reports the
    minimal bit budget (bit_length of each gap; 64 for each list head)
    against raw 64-bit postings — the d-gap estimate that decides
    codec and block size before building a real index. One explode +
    distinct, one per-term LAG window (partitioned by term — fully
    parallel), and a global roll-up; bit_length computes exactly as
    length(bin(x)) in both engines."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    postings = tok.select("term", "doc_id").distinct()
    w = Window.partitionBy("term").orderBy("doc_id")
    deltas = postings.withColumn(
        "delta", F.col("doc_id") - F.lag("doc_id").over(w)
    )
    bit_len = (
        F.when(F.col("delta").isNull(), F.lit(64))
        .when(F.col("delta") == 0, F.lit(1))
        .otherwise(F.length(F.conv(F.col("delta").cast("string"), 10, 2)))
    )
    bits = deltas.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(bit_len).cast("long").alias("delta_bits"),
        (F.count(F.lit(1)) * 64).cast("long").alias("raw_bits"),
    )
    return bits.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum("raw_bits").cast("long").alias("raw_bits"),
        F.sum("delta_bits").cast("long").alias("delta_bits"),
        F.floor(F.sum("raw_bits") * 100.0 / F.sum("delta_bits"))
        .cast("long")
        .alias("compression_x100"),
    )
