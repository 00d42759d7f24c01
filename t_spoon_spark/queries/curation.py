"""Data-curation operators over the documents table — the quality /
repetition / PII / boilerplate / packing signals a production
training-data pipeline runs between raw crawl and tokenization
(C4/Gopher-style rules re-expressed as Spark column work).

Everything here is JVM-side (no Python in the data plane): splits,
regexes, higher-order array functions, joins on hashes. Ratios are
integer-scaled (floor at fixed scale) so the DuckDB twins match
bit-for-bit. Scale notes per entry in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import STOPWORDS, tokens
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"
DD_STOP_ARR = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@register(
    "text_repetition_scores",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY doc_id, tok),
    top AS (SELECT doc_id, MAX(c) AS top_cnt FROM cnt GROUP BY doc_id),
    base AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             len(toks) - 2 AS n_3grams,
             len(list_distinct(list_transform(
               range(1, len(toks) - 2 + 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             ))) AS n_distinct_3grams
      FROM tok WHERE len(toks) >= 3
    )
    SELECT b.doc_id,
           b.n_tokens,
           CAST(FLOOR(b.n_distinct * 1000.0 / b.n_tokens) AS BIGINT) AS distinct_frac_c,
           CAST(FLOOR(t.top_cnt * 1000.0 / b.n_tokens) AS BIGINT) AS top_token_frac_c,
           CAST(FLOOR((b.n_3grams - b.n_distinct_3grams) * 1000.0 / b.n_3grams) AS BIGINT)
             AS dup_3gram_frac_c
    FROM base b JOIN top t USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher repetition
    filters): distinct-token fraction, most-frequent-token fraction,
    duplicate-3-gram fraction. The per-doc top-token count is an
    explode + two-level groupBy (shuffles on (doc_id, tok) then
    doc_id — both partial-aggregated map-side); the n-gram stats are
    pure higher-order array expressions inside codegen. At 100 TB each
    doc's work is independent and linear in its token count."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    ex = base.select("doc_id", F.explode("toks").alias("tok"))
    top = (
        ex.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_cnt"))
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
        ),
    )
    stats = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        (F.size("toks") - 2).alias("n_3grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_3grams"),
    )
    return (
        stats.join(top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("n_distinct") * 1000.0 / F.col("n_tokens"))
            .cast("long")
            .alias("distinct_frac_c"),
            F.floor(F.col("top_cnt") * 1000.0 / F.col("n_tokens"))
            .cast("long")
            .alias("top_token_frac_c"),
            F.floor(
                (F.col("n_3grams") - F.col("n_distinct_3grams"))
                * 1000.0
                / F.col("n_3grams")
            )
            .cast("long")
            .alias("dup_3gram_frac_c"),
        )
        .orderBy("doc_id")
    )


# deterministic PII fabrication: the synthetic corpus carries no PII, so
# inject it (same expression in both engines) — the operator under test
# is the detect/scrub pass, not the corpus
_PII_SUFFIX_SQL = """
CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com now'
     WHEN doc_id % 3 = 1 THEN ' call 555-' || CAST(1000 + doc_id % 9000 AS STRING) || ' today'
     ELSE '' END ||
CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS STRING) || '.0.7' ELSE '' END
"""

_EMAIL_RE = "[a-z0-9]+@[a-z0-9.]+[a-z]"
_PHONE_RE = "555-[0-9]{4}"
_IP_RE = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"


@register(
    "text_pii_scrub",
    f"""
    WITH aug AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS text2 FROM documents),
    det AS (
      SELECT doc_id, text2,
             len(regexp_extract_all(text2, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text2, '{_PHONE_RE}')) AS n_phones,
             len(regexp_extract_all(text2, '{_IP_RE}')) AS n_ips
      FROM aug
    )
    SELECT doc_id, n_emails, n_phones, n_ips,
           length(regexp_replace(regexp_replace(regexp_replace(
             text2, '{_EMAIL_RE}', '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g'),
             '{_IP_RE}', '[IP]', 'g')) AS scrubbed_len
    FROM det
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (email / phone / IPv4) as pure
    `regexp_count` / `regexp_replace` column work — the pattern set a
    curation pipeline runs before publishing a corpus. The corpus is
    synthetic, so deterministic PII strings are injected first (same
    SQL in both engines); patterns stay in the RE2-compatible subset so
    Spark's Java regex and DuckDB's RE2 agree. One scan, no shuffle,
    no Python — at 100 TB this is codegen over the text column."""
    docs = t(spark, sf_dir, "documents")
    aug = docs.select("doc_id", F.expr(f"text || {_PII_SUFFIX_SQL}").alias("text2"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text2"), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ),
        _IP_RE,
        "[IP]",
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("text2"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text2"), F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(F.col("text2"), F.lit(_IP_RE)).cast("long").alias("n_ips"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    ).orderBy("doc_id")


@register(
    "quality_filter_composite",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents),
    sig AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE CAST(FLOOR(list_sum(list_transform(toks, w -> length(w))) * 100.0
                            / len(toks)) AS BIGINT) END AS mean_len_c,
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE CAST(FLOOR(len(list_filter(toks, w -> list_contains({DD_STOP_ARR}, w)))
                            * 1000.0 / len(toks)) AS BIGINT) END AS stop_frac_c
      FROM tok
    )
    SELECT doc_id, n_tokens, mean_len_c, stop_frac_c,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN n_tokens > 100000 THEN 'too_long'
                WHEN mean_len_c < 200 THEN 'tokens_too_short'
                WHEN mean_len_c > 1200 THEN 'tokens_too_long'
                WHEN stop_frac_c < 10 THEN 'no_stopwords'
                ELSE 'keep' END AS verdict
    FROM sig
    ORDER BY doc_id
    """,
)
def quality_filter_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite keep/drop gate (C4/Gopher rule stack): token-count
    bounds, mean-token-length bounds, stopword-presence floor — first
    failing rule names the drop reason. All signals are one scan of
    higher-order array expressions; the filter itself is a CASE chain
    Catalyst folds into the same codegen stage. The real pipeline runs
    this BEFORE the expensive dedup/embedding stages, cutting their
    input — order preserved here by making it a standalone gate."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sig = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.when(F.size(toks) == 0, F.lit(0))
        .otherwise(
            F.floor(
                F.aggregate(toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
                * 100.0
                / F.size(toks)
            )
        )
        .cast("long")
        .alias("mean_len_c"),
        F.when(F.size(toks) == 0, F.lit(0))
        .otherwise(
            F.floor(
                F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
                * 1000.0
                / F.size(toks)
            )
        )
        .cast("long")
        .alias("stop_frac_c"),
    )
    verdict = (
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("n_tokens") > 100_000, "too_long")
        .when(F.col("mean_len_c") < 200, "tokens_too_short")
        .when(F.col("mean_len_c") > 1200, "tokens_too_long")
        .when(F.col("stop_frac_c") < 10, "no_stopwords")
        .otherwise("keep")
    )
    return sig.select(
        "doc_id", "n_tokens", "mean_len_c", "stop_frac_c", verdict.alias("verdict")
    ).orderBy("doc_id")


@register(
    "docs_length_histogram",
    f"""
    WITH tok AS (SELECT doc_id, len({DD_TOKS}) AS n FROM documents)
    SELECT LEAST(n // 64, 15) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens
    FROM tok
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram (64-token buckets, capped at 15) — the
    input to batch/packing planning for training: how many documents
    and tokens land in each length class. One scan + one tiny groupBy;
    partial aggregation makes the shuffle a few dozen rows regardless
    of corpus size."""
    docs = t(spark, sf_dir, "documents")
    n = F.size(tokens(F.col("text")))
    return (
        docs.select(F.least(F.floor(n / 64), F.lit(15)).cast("long").alias("bucket"), n.alias("n"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").cast("bigint").alias("total_tokens"))
        .orderBy("bucket")
    )


@register(
    "dedup_boilerplate_fraction",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(toks) - 2 + 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             )) AS shingles
      FROM tok WHERE len(toks) >= 3
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh),
    df AS (SELECT sh, COUNT(DISTINCT doc_id) AS n_docs FROM ex GROUP BY sh),
    boiler AS (SELECT sh FROM df WHERE n_docs >= 5),
    per_doc AS (
      SELECT e.doc_id,
             COUNT(*) AS n_shingles,
             COUNT(*) FILTER (WHERE b.sh IS NOT NULL) AS n_boiler
      FROM ex e LEFT JOIN boiler b USING (sh)
      GROUP BY e.doc_id
    )
    SELECT doc_id, n_shingles, n_boiler,
           CAST(FLOOR(n_boiler * 1000.0 / n_shingles) AS BIGINT) AS boiler_frac_c
    FROM per_doc
    ORDER BY doc_id
    """,
)
def dedup_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate measurement at sub-document
    granularity (the C4 line-dedup idea on 3-gram shingles): a shingle
    present in >= 5 distinct documents is boilerplate; each document
    reports what fraction of its distinct shingles are boilerplate.
    Scale shape: explode distinct shingles (linear), document-frequency
    groupBy on the shingle hash (shuffle, map-side combined), then a
    shingle-keyed join back — the join's build side is only the
    boilerplate shingles (high-DF tail), which is the small side by
    construction on real corpora."""
    docs = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 3)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
        ),
    )
    ex = base.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("sh")
    )
    # (doc_id, sh) rows are already distinct — the explode is over
    # array_distinct per doc — so COUNT(*) == COUNT(DISTINCT doc_id)
    # here, and the plain count is a single-phase map-side-combinable
    # aggregate where count_distinct planned a 2x expand + two-phase
    # shuffle (optimization r14, guide §2.4).
    boiler = (
        ex.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 5)
        .select("sh", F.lit(1).alias("__b"))
    )
    per_doc = (
        ex.join(boiler, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__b").alias("n_boiler"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        F.floor(F.col("n_boiler") * 1000.0 / F.col("n_shingles"))
        .cast("long")
        .alias("boiler_frac_c"),
    ).orderBy("doc_id")
