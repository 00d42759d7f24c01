"""End-to-end training-data-prep pipeline: the composed form of the
individual operators (quality filter -> exact dedup -> SimHash near-dup
removal -> per-language corpus report), as one gate entry with a
bit-exact DuckDB oracle.

Stage order is the 100 TB cost order: the cheap row-local quality
filter shrinks the corpus first, exact dedup is one shuffle on the
content hash, SimHash near-dup candidates are banded (never all-pairs)
over the already-shrunk survivor set, and the removal is a broadcast-
able anti-join on the dropped ids. Every stage is JVM Column code; no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.dedup import SIMHASH_BANDS, SIMHASH_BITS, simhash_pairs
from t_spoon_spark.operators.text import dd_md5_long, lang_pred, quality_components, tokens
from t_spoon_spark.queries.relational import t
from t_spoon_spark.queries.text import DD_TOKS, _dd_lang_case
from t_spoon_spark.registry import register

MIN_TOKENS = 40
MIN_UNIQ_C = 4000  # uniq-token ratio >= 0.40 (1e4 fixed-point)

_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
_BAND_MASK = (1 << _BAND_BITS) - 1


@register(
    "pipeline_training_data_prep",
    f"""
    WITH tok0 AS (SELECT doc_id, text, {DD_TOKS} AS toks FROM documents),
    quality AS (
      SELECT doc_id, text, toks, len(toks) AS n_tokens
      FROM tok0
      WHERE len(toks) >= {MIN_TOKENS}
        AND CAST(FLOOR(len(list_distinct(toks)) * 10000.0 / len(toks)) AS BIGINT)
              >= {MIN_UNIQ_C}
    ),
    keep_exact AS (SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    deduped AS (SELECT q.* FROM quality q JOIN keep_exact USING (doc_id)),
    stok AS (
      SELECT doc_id, {dd_md5_long('w.w')} AS h
      FROM deduped, unnest(list_distinct(toks)) AS w(w)
    ),
    bits AS (
      SELECT doc_id,
             {", ".join(f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(SIMHASH_BITS))}
      FROM stok GROUP BY doc_id
    ),
    sim AS (
      SELECT doc_id,
             ({" + ".join(f"(CASE WHEN s{j} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {j})" for j in range(SIMHASH_BITS))}) AS sim
      FROM bits
    ),
    bands AS (
      SELECT doc_id, sim, b.band,
             (sim >> (b.band * {_BAND_BITS})) & {_BAND_MASK} AS band_key
      FROM sim, unnest(range({SIMHASH_BANDS})) AS b(band)
    ),
    dropped AS (
      SELECT DISTINCT b.doc_id
      FROM bands a JOIN bands b USING (band, band_key)
      WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3
    ),
    survivors AS (
      SELECT d.* FROM deduped d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
    )
    SELECT {_dd_lang_case()} AS lang_pred,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM survivors
    GROUP BY 1
    ORDER BY lang_pred
    """,
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed data-prep pipeline over documents: Gopher/C4-style
    quality gate (length + lexical-diversity), exact dedup keeping the
    lowest doc_id per content hash, SimHash near-dup removal (banded
    candidates, hamming <= 3, drop the higher id of each pair), then a
    per-detected-language report of the surviving corpus."""
    docs = t(spark, sf_dir, "documents")
    comps = quality_components(F.col("text"))
    quality = docs.select(
        "doc_id",
        "text",
        comps["n_tokens"].alias("n_tokens"),
        comps["uniq_ratio_c"].alias("uniq_ratio_c"),
    ).filter((F.col("n_tokens") >= MIN_TOKENS) & (F.col("uniq_ratio_c") >= MIN_UNIQ_C))

    keep_exact = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = quality.join(keep_exact.select("doc_id"), "doc_id", "left_semi")

    pairs = simhash_pairs(deduped.select("doc_id", "text"), max_hamming=3)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = deduped.join(dropped, "doc_id", "left_anti")

    return (
        survivors.select(lang_pred(tokens(F.col("text"))).alias("lang_pred"), "n_tokens")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang_pred")
    )


# the composed pipeline reuses the STANDALONE operators' constants and
# rate-case builders — editing the standalone op retunes the pipeline,
# which is the composition contract this entry pins
from t_spoon_spark.queries.chunking import DECON_NGRAM as DECON_N
from t_spoon_spark.queries.chunking import N_BENCH_DOCS as BENCH_DOCS
from t_spoon_spark.queries.packing import PACK_BUDGET as PACK_B
from t_spoon_spark.queries.sampling import LANG_RATES as V2_RATES
from t_spoon_spark.queries.sampling import _DEFAULT_RATE, _dd_rate_case

_dd_v2_rate_case = _dd_rate_case


@register(
    "pipeline_corpus_build_v2",
    f"""
    WITH tok0 AS (
      SELECT doc_id, lang, source, text, {DD_TOKS} AS toks FROM documents
    ),
    quality AS (
      SELECT doc_id, lang, source, text, toks, len(toks) AS n_tok
      FROM tok0
      WHERE len(toks) >= {MIN_TOKENS}
        AND CAST(FLOOR(len(list_distinct(toks)) * 10000.0 / len(toks)) AS BIGINT)
              >= {MIN_UNIQ_C}
    ),
    keep_exact AS (SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    deduped AS (SELECT q.* FROM quality q JOIN keep_exact USING (doc_id)),
    bench AS (
      SELECT DISTINCT md5(array_to_string(list_slice(toks, i, i + {DECON_N} - 1), ' ')) AS gh
      FROM tok0, LATERAL unnest(range(1, len(toks) - {DECON_N} + 2)) AS r(i)
      WHERE doc_id < {BENCH_DOCS} AND len(toks) >= {DECON_N}
    ),
    contaminated AS (
      SELECT DISTINCT d.doc_id
      FROM deduped d,
           LATERAL unnest(range(1, len(d.toks) - {DECON_N} + 2)) AS r(i)
      JOIN bench b
        ON md5(array_to_string(list_slice(d.toks, i, i + {DECON_N} - 1), ' ')) = b.gh
      WHERE d.doc_id >= {BENCH_DOCS} AND len(d.toks) >= {DECON_N}
    ),
    clean AS (
      SELECT * FROM deduped
      WHERE doc_id >= {BENCH_DOCS}
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    sampled AS (
      SELECT * FROM clean
      WHERE ({dd_md5_long("CAST(doc_id AS VARCHAR)")} % 1000) < {_dd_v2_rate_case()}
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           (CAST(SUM(n_tok) AS BIGINT) + {PACK_B - 1}) // {PACK_B} AS n_packs
    FROM sampled
    GROUP BY source
    ORDER BY source
    """,
)
def pipeline_corpus_build_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 composed corpus build: quality gate -> exact dedup
    -> benchmark decontamination (drop docs sharing any 8-gram with the
    held-out docs 0-4, and the held-out docs themselves) -> stratified
    language downsampling (hash-gated, en downsampled) -> per-source
    manifest with concat-chunk pack counts (ceil(tokens/512) — the
    zero-waste packer needs no window for the count).

    Stage order is the 100 TB cost order: row-local gates first (shrink
    before shuffling), the one content-hash shuffle next, then the
    broadcast decontamination semi-join over the survivors, then a
    row-local sampling gate, and a final partial-aggregated manifest.
    Every stage reuses the standalone operator's exact definition, so
    this entry pins that the operators COMPOSE without semantic drift —
    the property a real pipeline depends on."""
    docs = t(spark, sf_dir, "documents")
    comps = quality_components(F.col("text"))
    toks = tokens(F.col("text"))
    quality = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        toks.alias("toks"),
        comps["n_tokens"].alias("n_tok"),
        comps["uniq_ratio_c"].alias("uniq_ratio_c"),
    ).filter(
        (F.col("n_tok") >= MIN_TOKENS) & (F.col("uniq_ratio_c") >= MIN_UNIQ_C)
    )
    keep_exact = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = quality.join(keep_exact.select("doc_id"), "doc_id", "left_semi")

    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - DECON_N),
        lambda i: F.md5(F.array_join(F.slice(F.col("toks"), i + 1, DECON_N), " ")),
    )
    raw_toks = docs.select("doc_id", toks.alias("toks"))
    bench = (
        raw_toks.filter(
            (F.col("doc_id") < BENCH_DOCS) & (F.size("toks") >= DECON_N)
        )
        .select(F.explode(F.array_distinct(grams)).alias("gh"))
        .distinct()
    )
    contaminated = (
        deduped.filter(
            (F.col("doc_id") >= BENCH_DOCS) & (F.size("toks") >= DECON_N)
        )
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("gh"))
        .join(F.broadcast(bench), "gh")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.filter(F.col("doc_id") >= BENCH_DOCS).join(
        contaminated, "doc_id", "left_anti"
    )

    from t_spoon_spark.operators.text import md5_long

    bucket = F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(1000))
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in reversed(V2_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    sampled = clean.filter(bucket < rate)

    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.expr(f"(cast(sum(n_tok) as bigint) + {PACK_B - 1}) div {PACK_B}").alias(
                "n_packs"
            ),
        )
        .orderBy("source")
    )
