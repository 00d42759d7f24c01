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
