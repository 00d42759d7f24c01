"""Text-analysis queries over the documents table (training-data
pipeline surface: token stats, quality, lang-ID, fingerprints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from t_spoon_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_pred,
    quality_components,
    tokens,
)
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

# DuckDB twins of the token/stopword primitives
DD_TOKS = "list_filter(string_split_regex(text, '\\s+'), w -> w <> '')"
DD_STOP_ARR = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@register(
    "text_token_stats",
    f"""
    WITH tok AS (SELECT doc_id, n_chars, {DD_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           n_chars,
           CAST(FLOOR(list_sum(list_transform(toks, w -> length(w))) * 100.0 / len(toks)) AS BIGINT)
             AS mean_tok_len_c
    FROM tok
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        "n_chars",
        F.floor(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
            * 100.0
            / F.size(toks)
        )
        .cast("long")
        .alias("mean_tok_len_c"),
    ).orderBy("doc_id")


@register(
    "text_quality_scores",
    f"""
    WITH tok AS (SELECT doc_id, text, {DD_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           length(text) AS n_chars_calc,
           length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
           CAST(FLOOR(len(list_intersect(toks, {DD_STOP_ARR})) * 10000.0 / len(toks)) AS BIGINT)
             AS stop_ratio_c,
           CAST(FLOOR(len(list_distinct(toks)) * 10000.0 / len(toks)) AS BIGINT) AS uniq_ratio_c
    FROM tok
    ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    comps = quality_components(F.col("text"))
    return docs.select(
        "doc_id",
        comps["n_tokens"].alias("n_tokens"),
        comps["n_chars_calc"].alias("n_chars_calc"),
        comps["n_punct"].alias("n_punct"),
        comps["stop_ratio_c"].alias("stop_ratio_c"),
        comps["uniq_ratio_c"].alias("uniq_ratio_c"),
    ).orderBy("doc_id")


def _dd_lang_case() -> str:
    score = {
        lang: f"len(list_intersect(toks, [{', '.join(repr(m) for m in ms)}]))"
        for lang, ms in LANG_MARKERS.items()
    }
    # argmax with deterministic tiebreak: language order en, es, fr, de
    order = list(LANG_MARKERS)
    best = " OR ".join([])  # readability only
    conds = []
    for i, lang in enumerate(order):
        others = [
            f"{score[lang]} >= {score[o]}" if j > i else f"{score[lang]} > {score[o]}"
            for j, o in enumerate(order)
            if o != lang
        ]
        conds.append(f"WHEN {score[lang]} > 0 AND {' AND '.join(others)} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " ELSE 'unknown' END"


@register(
    "text_lang_id",
    f"""
    WITH tok AS (SELECT doc_id, {DD_TOKS} AS toks FROM documents)
    SELECT doc_id, {_dd_lang_case()} AS lang_pred
    FROM tok
    ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pred = lang_pred(tokens(F.col("text")))
    return docs.select("doc_id", pred.alias("lang_pred")).orderBy("doc_id")


@register(
    "text_fingerprints",
    """
    SELECT doc_id,
           md5(array_to_string(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> ''), ' '))
             AS fp
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")


@register(
    "text_bpe_token_counts",
    f"""
    WITH b AS (
      SELECT doc_id, regexp_extract_all(text, '{{BPE}}') AS toks FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_bpe,
           len(list_filter(toks, w -> regexp_matches(w, '^[A-Za-z]+$'))) AS n_word,
           len(list_filter(toks, w -> regexp_matches(w, '^[0-9]+$'))) AS n_num
    FROM b ORDER BY doc_id
    """.replace("{BPE}", "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"),
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword pre-tokenization counts (letter runs, digit
    runs, single punctuation — the GPT-2 split approximated with an
    engine-portable regex): total subword count plus word/number class
    counts per document."""
    from t_spoon_spark.operators.text import bpe_tokens

    docs = t(spark, sf_dir, "documents")
    toks = bpe_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe"),
        F.size(F.filter(toks, lambda w: w.rlike("^[A-Za-z]+$"))).alias("n_word"),
        F.size(F.filter(toks, lambda w: w.rlike("^[0-9]+$"))).alias("n_num"),
    ).orderBy("doc_id")


@register(
    "text_winnow_fingerprints",
    """
    WITH n AS (
      SELECT doc_id,
             array_to_string(list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> ''), ' ') AS norm
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             CASE WHEN length(norm) < 12 THEN CAST([] AS BIGINT[])
             ELSE list_transform(range(1, length(norm) - 7 + 1),
                  j -> (('0x' || substr(md5(substr(norm, j, 8)), 1, 15))::BIGINT))
             END AS hs
      FROM n
    ),
    fp AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 0) + 1),
               i -> list_min(hs[i:i+3])
             )) AS fps
      FROM h
    )
    SELECT doc_id, len(fps) AS n_fp,
           list_min(fps) AS min_fp, list_max(fps) AS max_fp
    FROM fp ORDER BY doc_id
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS-style rolling-hash) fingerprints: char 8-gram
    hashes over the normalized token stream, min per 4-window, distinct
    mins — any shared substring of length >= 11 chars contributes a
    shared fingerprint. Reported per doc as (count, min, max) so the
    cross-engine hash compares scalars."""
    from t_spoon_spark.operators.text import winnow_fingerprints

    docs = t(spark, sf_dir, "documents")
    fps = winnow_fingerprints(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(fps).alias("n_fp"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    ).orderBy("doc_id")


NGRAM_SPAN_K = 8  # span length (tokens) for cross-doc duplicate detection
NGRAM_SPAN_TOP = 20


@register(
    "text_duplicate_ngram_spans",
    f"""
    WITH tok AS (SELECT doc_id, {{DD_TOKS}} AS toks FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(toks[i:i+{NGRAM_SPAN_K}-1], ' ') AS gram
      FROM tok, LATERAL unnest(range(1, len(toks) - {NGRAM_SPAN_K} + 2)) AS g(i)
      WHERE len(toks) >= {NGRAM_SPAN_K}
    ),
    agg AS (
      SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM grams GROUP BY gram
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, n_occ DESC, gram) AS rnk
      FROM agg WHERE n_docs >= 2
    )
    SELECT rnk, gram, n_docs, n_occ FROM ranked
    WHERE rnk <= {NGRAM_SPAN_TOP} ORDER BY rnk
    """.replace("{DD_TOKS}", DD_TOKS),
)
def text_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate n-gram spans: every token 8-gram that
    appears in >= 2 distinct documents, ranked by document spread then
    raw occurrence count. The span-level signal behind exact-substring
    training-data dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): a suffix-array pass finds maximal repeated
    substrings; the fixed-K token-gram formulation is its bounded,
    shuffle-friendly equivalent — one explode (linear in corpus tokens),
    one hash aggregate keyed on the gram. At 100 TB the gram aggregate
    is the only shuffle; K bounds the blowup at (tokens - K + 1) rows
    per doc, and map-side partial aggregation collapses within-doc
    repeats before the exchange. Reference analogue: the reference's
    windowed word-count chain (queries/windows.py W6) over spans
    instead of single tokens."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= NGRAM_SPAN_K
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - NGRAM_SPAN_K + 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, NGRAM_SPAN_K)),
            )
        ).alias("gram"),
    )
    agg = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occ"),
    )
    # top-K via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps + driver k-merge) instead of a global row_number window,
    # which shuffled EVERY distinct gram string into one partition for
    # a full sort before keeping 20 rows (optimization r14); the rank
    # window then runs over the 20-row result only.
    w = Window.orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("gram"))
    top = (
        agg.filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("gram"))
        .limit(NGRAM_SPAN_TOP)
    )
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("rnk", "gram", "n_docs", "n_occ")
        .orderBy("rnk")
    )


BPE_ROUNDS = 6


def _dd_bpe_oracle(rounds: int) -> str:
    """Generate the K-round merge-learning oracle: each round counts
    adjacent symbol pairs over the segmented vocabulary, picks the
    argmax with the (count desc, lhs, rhs) tiebreak, and re-segments
    via the same delimited-string replace the Spark side uses."""
    ctes = [
        "w AS (SELECT word, COUNT(*) AS freq FROM ("
        "SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word "
        "FROM documents) WHERE word <> '' GROUP BY 1)",
        "seg_0 AS (SELECT word, freq, "
        "regexp_replace(word, '(.)', '|\\1|', 'g') AS seg FROM w)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"pairs_{k} AS (SELECT p[1] AS lhs, p[2] AS rhs, SUM(freq) AS cnt "
            f"FROM (SELECT freq, unnest(list_transform(range(1, len(syms)), "
            f"i -> [syms[i], syms[i+1]])) AS p "
            f"FROM (SELECT freq, string_split(trim(seg, '|'), '||') AS syms "
            f"FROM seg_{k - 1})) GROUP BY 1, 2)"
        )
        ctes.append(
            f"best_{k} AS (SELECT CAST({k} AS BIGINT) AS step, lhs, rhs, "
            f"CAST(cnt AS BIGINT) AS pair_n FROM pairs_{k} "
            f"ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"seg_{k} AS (SELECT word, freq, "
            f"replace(seg, '|' || b.lhs || '||' || b.rhs || '|', "
            f"'|' || b.lhs || b.rhs || '|') AS seg "
            f"FROM seg_{k - 1} CROSS JOIN best_{k} b)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM best_{k}" for k in range(1, rounds + 1))
    return "WITH " + ",\n    ".join(ctes) + f"\n    SELECT * FROM ({union}) ORDER BY step"


@register("text_bpe_learn_merges", _dd_bpe_oracle(BPE_ROUNDS))
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN a BPE merge table (Sennrich et al.), the tokenizer-training
    loop itself — distinct from text_bpe_token_counts, which only
    APPLIES a fixed pre-tokenization.  The corpus collapses once into a
    word-frequency vocabulary (the classic BPE trick: training never
    touches the corpus again), then each of K rounds counts adjacent
    symbol pairs weighted by word frequency, takes the argmax with a
    total-order tiebreak (count desc, lhs, rhs), and re-segments every
    word by one left-to-right non-overlapping replace on a
    '|sym||sym|'-delimited string — the identical primitive in Spark
    and DuckDB, so the learned table matches bit-for-bit.  Scale shape
    at 100 TB: the ONLY corpus-sized job is the word-count aggregate
    (map-side partial, one shuffle on word); every round then runs on
    the vocabulary table (~1e7 rows regardless of corpus size) — pair
    counts partial-aggregate, the argmax plans as TakeOrderedAndProject
    (no global sort), the merge application is a map-only projection,
    and a per-round localCheckpoint cuts the growing lineage exactly as
    the kmeans/pagerank kernels do.  The K driver-side collects are
    1-row control frames (the learned merge), the same bounded
    control-plane pattern as the kmeans centroid pull."""
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # the vocabulary is materialized ONCE (it is tiny relative to the
    # corpus); each round re-applies the k merges learned so far as one
    # nested replace projection on top of it — no per-round shuffle or
    # checkpoint.  At a real 32k-merge vocabulary you would checkpoint
    # every ~64 rounds to cap expression depth; at K=6 the chain is
    # trivially shallow.
    seg0 = (
        words.select(
            "word", "freq", F.regexp_replace("word", "(.)", r"|$1|").alias("seg")
        )
        .coalesce(4)
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, BPE_ROUNDS + 1):
        resegment = F.col("seg")
        for _, lhs, rhs, _ in merges:
            resegment = F.replace(
                resegment, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|")
            )
        pairs = (
            seg0.select("freq", resegment.alias("seg"))
            .select(
                "freq",
                F.split(F.expr("trim(BOTH '|' FROM seg)"), r"\|\|").alias("syms"),
            )
            .filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] AS lhs, syms[i + 1] AS rhs))"
                    )
                ).alias("p"),
            )
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs")).limit(1).collect()
        if not top:
            break
        b = top[0]
        merges.append((step, b.lhs, b.rhs, int(b.cnt)))
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("step", LongType()),
            StructField("lhs", StringType()),
            StructField("rhs", StringType()),
            StructField("pair_n", LongType()),
        ]
    )
    return spark.createDataFrame(merges, schema).orderBy("step")
