"""Multimodal pipeline queries: binary payload stats + stubbed feature
extraction (deterministic fake decode; see operators/multimodal.py).

The oracle recomputes the fake-decode arithmetic in SQL (payloads are
ASCII here, so byte values == code points); the Spark side goes through
the real mapInPandas plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from t_spoon_spark.operators.multimodal import binarize_documents, extract_features
from t_spoon_spark.queries.relational import t
from t_spoon_spark.registry import register

DD_KIND = """
CASE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3
  WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
"""


@register(
    "multimodal_payload_stats",
    f"""
    SELECT {DD_KIND} AS kind,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MIN(octet_length(encode(text))) AS min_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents
    GROUP BY 1
    ORDER BY kind
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column handling: payload sizes per media kind — the scan
    stays columnar; no decode."""
    mm = binarize_documents(t(spark, sf_dir, "documents"))
    return (
        mm.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.min(F.octet_length("payload")).alias("min_bytes"),
            F.max(F.octet_length("payload")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


@register(
    "multimodal_feature_extract",
    f"""
    WITH mm AS (
      SELECT doc_id, {DD_KIND} AS kind, text,
             octet_length(encode(text)) AS n,
             list_sum(list_transform(range(1, least(16, length(text)) + 1),
                                     i -> ascii(substr(text, i, 1)))) AS head
      FROM documents
    )
    SELECT doc_id, kind,
           CAST(n AS INT) AS n_bytes,
           CAST(CASE WHEN kind = 'image' THEN 160 + head % 480 ELSE 0 END AS INT) AS width,
           CAST(CASE WHEN kind = 'image' THEN 120 + n % 360 ELSE 0 END AS INT) AS height,
           CAST(CASE WHEN kind = 'image' THEN 1 ELSE n % 300 + 1 END AS INT) AS n_frames,
           substr(md5(text), 1, 16) AS sig
    FROM mm
    ORDER BY doc_id
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stubbed decode path end to end: binary payloads through
    Arrow-batched mapInPandas producing typed features (real schema,
    batching, and partitioning; fake deterministic decode)."""
    mm = binarize_documents(t(spark, sf_dir, "documents"))
    return extract_features(mm, fake=True).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    f"""
    WITH mm AS (
      SELECT doc_id, {DD_KIND} AS kind,
             octet_length(encode(text)) AS n,
             substr(md5(text), 1, 16) AS sig
      FROM documents
    ),
    vid AS (
      SELECT doc_id, kind, CAST(n % 300 + 1 AS INT) AS n_frames, sig
      FROM mm WHERE kind = 'video'
    )
    SELECT doc_id, CAST(i.i AS INT) AS frame_idx,
           substr(md5(sig || '-' || CAST(i.i AS VARCHAR)), 1, 16) AS frame_sig
    FROM vid, unnest(range(0, n_frames, 30)) AS i(i)
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for video payloads: every 30th frame index
    with a deterministic per-frame signature — the row set a real
    decoder would fetch (sample-then-decode, so the expensive step
    touches n_frames/30 frames)."""
    from t_spoon_spark.operators.multimodal import sample_frames

    mm = binarize_documents(t(spark, sf_dir, "documents"))
    feats = extract_features(mm, fake=True).filter(F.col("kind") == "video")
    return sample_frames(feats, every_k=30).select(
        "doc_id", "frame_idx", "frame_sig"
    ).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_resize_plan",
    f"""
    WITH mm AS (
      SELECT doc_id, {DD_KIND} AS kind, text,
             octet_length(encode(text)) AS n,
             list_sum(list_transform(range(1, least(16, length(text)) + 1),
                                     i -> ascii(substr(text, i, 1)))) AS head
      FROM documents
    ),
    img AS (
      SELECT doc_id,
             CAST(160 + head % 480 AS INT) AS width,
             CAST(120 + n % 360 AS INT) AS height
      FROM mm WHERE kind = 'image'
    )
    SELECT doc_id, width, height,
           LEAST(256000 // width, 256000 // height, 1000) AS scale_c,
           CAST(width * LEAST(256000 // width, 256000 // height, 1000) // 1000 AS INT) AS out_w,
           CAST(height * LEAST(256000 // width, 256000 // height, 1000) // 1000 AS INT) AS out_h
    FROM img
    ORDER BY doc_id
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize geometry for image payloads: fit-within-256x256 with
    aspect preserved, in exact integer fixed-point — the work plan the
    stubbed pixel resampler would execute per Arrow batch."""
    from t_spoon_spark.operators.multimodal import resize_plan

    mm = binarize_documents(t(spark, sf_dir, "documents"))
    feats = extract_features(mm, fake=True).filter(F.col("kind") == "image")
    return resize_plan(feats).orderBy("doc_id")


# -- perceptual near-dup (round-13 verdict #4) --------------------------

# DuckDB twin of operators/multimodal.dhash_images: same 8x9 block-mean
# luma thumbnail from the same fixture bytes, same 64-bit dHash split
# into two 32-bit words (DuckDB rejects 1 << 63).  Payloads are ASCII
# (module convention), so ascii(substr(...)) == byte value.
_DHASH_CTES = r"""
    img AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      FROM documents
      WHERE CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 3 = 0
        AND length(text) >= 72
    ),
    codes AS (
      SELECT doc_id, n,
             list_transform(range(1, CAST(n AS INT) + 1),
                            i -> ascii(substr(text, CAST(i AS INT), 1))) AS cs
      FROM img
    ),
    luma AS (
      SELECT doc_id,
        list_transform(range(0, 72), p ->
          list_sum(list_slice(cs, CAST((p*n)//72 + 1 AS INT),
                                  CAST(((p+1)*n)//72 AS INT)))
          // (((p+1)*n)//72 - (p*n)//72)) AS L
      FROM codes
    ),
    h AS (
      SELECT doc_id,
        CAST(list_sum(list_transform(range(0, 32), b ->
          CASE WHEN L[CAST((b//8)*9 + b%8 + 1 AS INT)]
                  < L[CAST((b//8)*9 + b%8 + 2 AS INT)]
               THEN CAST(1 AS BIGINT) << CAST(b AS INT)
               ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS lo,
        CAST(list_sum(list_transform(range(32, 64), b ->
          CASE WHEN L[CAST((b//8)*9 + b%8 + 1 AS INT)]
                  < L[CAST((b//8)*9 + b%8 + 2 AS INT)]
               THEN CAST(1 AS BIGINT) << CAST(b - 32 AS INT)
               ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS hi
      FROM luma
    )
"""


@register(
    "dedup_phash_images",
    f"""
    WITH {_DHASH_CTES}
    SELECT doc_id, lo AS dhash_lo, hi AS dhash_hi
    FROM h
    ORDER BY doc_id
    """,
)
def dedup_phash_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit perceptual dHash per image payload (visual near-dup
    family staple, round-13 verdict #4): deterministic fake-decode
    8x9 block-mean luma thumbnail -> classic difference hash, all
    integer fixed-point JVM column algebra — the oracle recomputes the
    identical hash from the same fixture bytes, pinning every bit of
    the thumbnail + hash arithmetic.

    The pair KERNEL (banded Hamming join, `operators/multimodal
    .dhash_pairs`) is gated separately: this corpus's image near-dups
    are length-perturbed, and a positional byte-stream hash smears a
    length change across every block boundary (measured min Hamming 13
    at sf0.01 / 11 at sf0.1 — far above the 8-band pigeonhole bound of
    7), so the in-corpus pair set is legitimately empty; the kernel's
    exactness gate runs on length-preserving perturbations in
    tests/test_phash.py instead, where the Hamming spectrum is real."""
    from t_spoon_spark.operators.multimodal import dhash_images

    mm = binarize_documents(t(spark, sf_dir, "documents"))
    return dhash_images(mm).orderBy("doc_id")


@register(
    "dedup_phash_band_stats",
    f"""
    WITH {_DHASH_CTES},
    bands AS (
      SELECT doc_id, CAST(b.band AS INT) AS band,
             CASE WHEN b.band < 4
                  THEN (lo >> CAST(8 * b.band AS INT)) & 255
                  ELSE (hi >> CAST(8 * (b.band - 4) AS INT)) & 255 END AS band_key
      FROM h CROSS JOIN (SELECT unnest(range(0, 8)) AS band) b
    ),
    buckets AS (
      SELECT band, band_key, COUNT(*) AS c FROM bands GROUP BY 1, 2
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_colliding,
           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_candidates
    FROM buckets
    GROUP BY band
    ORDER BY band
    """,
)
def dedup_phash_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-occupancy diagnostics for the dHash LSH kernel: per band,
    bucket count, colliding-bucket count, and the candidate-pair volume
    the Hamming verify stage would scan.  This is the scale dial a
    100 TB deployment reads before running visual dedup — candidate
    volume vs corpus size tells you whether the 8-band layout holds or
    the bands need widening.  The oracle recomputes the same banding
    arithmetic from the same hashes, so the gate pins the band
    extraction (shift/mask on both words) end to end."""
    from t_spoon_spark.operators.multimodal import dhash_bands, dhash_images

    mm = binarize_documents(t(spark, sf_dir, "documents"))
    b = dhash_bands(dhash_images(mm))
    buckets = b.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("c"))
    return (
        buckets.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum((F.col("c") >= 2).cast("long")).alias("n_colliding"),
            F.sum(F.floor(F.col("c") * (F.col("c") - 1) / 2))
            .cast("long")
            .alias("n_candidates"),
        )
        .orderBy("band")
    )


# DuckDB twin of operators/multimodal.audio_fingerprints: 33 block-mean
# energy frames over the audio payload bytes -> 32-bit difference
# fingerprint in one BIGINT word.
@register(
    "dedup_audio_fingerprints",
    r"""
    WITH aud AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      FROM documents
      WHERE CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 3 = 1
        AND length(text) >= 33
    ),
    codes AS (
      SELECT doc_id, n,
             list_transform(range(1, CAST(n AS INT) + 1),
                            i -> ascii(substr(text, CAST(i AS INT), 1))) AS cs
      FROM aud
    ),
    frames AS (
      SELECT doc_id,
        list_transform(range(0, 33), p ->
          list_sum(list_slice(cs, CAST((p*n)//33 + 1 AS INT),
                                  CAST(((p+1)*n)//33 AS INT)))
          // (((p+1)*n)//33 - (p*n)//33)) AS E
      FROM codes
    )
    SELECT doc_id,
      CAST(list_sum(list_transform(range(0, 32), b ->
        CASE WHEN E[CAST(b + 1 AS INT)] < E[CAST(b + 2 AS INT)]
             THEN CAST(1 AS BIGINT) << CAST(b AS INT)
             ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fingerprint
    FROM frames
    ORDER BY doc_id
    """,
)
def dedup_audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit difference fingerprint per audio payload (round 14 — the
    1-D analogue of dedup_phash_images, completing the perceptual
    near-dup family across media kinds): 33 block-mean energy frames,
    bit i set iff energy[i] < energy[i+1] — the shape of spectral-delta
    fingerprints, under the deterministic fake-decode convention.  The
    oracle recomputes the identical fingerprint from the same fixture
    bytes.  The pair kernel (`audio_fingerprint_pairs`, 4-band
    exhaustive at hamming <= 3) is gated on length-preserving
    perturbations in tests/test_phash.py, same rationale as the image
    entry."""
    from t_spoon_spark.operators.multimodal import audio_fingerprints

    mm = binarize_documents(t(spark, sf_dir, "documents"))
    return audio_fingerprints(mm).orderBy("doc_id")
