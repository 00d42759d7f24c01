"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no decode libraries (PIL/ffmpeg), so the actual
decode is STUBBED: `decode_stub` raises NotImplementedError unless
`fake=True`, in which case it produces deterministic pseudo-features
from the bytes (so the Spark-side plumbing — schema, batching,
partitioning — is real and testable). A production deployment swaps
`_decode_real` in; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes int, width int, height int, "
    "n_frames int, sig string"
)


def binarize_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a multimodal table from documents: the utf-8 bytes of
    `text` stand in for an encoded media payload, `source` maps to a
    media kind. At 100 TB the payload column stays columnar (parquet
    BINARY) and is never materialized wider than one Arrow batch."""
    kind = (
        F.when(F.regexp_extract("source", r"(\d+)", 1).cast("int") % 3 == 0, "image")
        .when(F.regexp_extract("source", r"(\d+)", 1).cast("int") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _decode_real(payload: bytes, kind: str) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg/torchaudio — not in this container; "
        "swap this function in a deployment image"
    )


def extract_features(mm: DataFrame, fake: bool = True, batch_size_hint: int = 256) -> DataFrame:
    """Feature extraction over the binary payload.

    Everything derivable by pure column ops stays JVM-side (codegen):
    `sig` = md5 prefix, `n_bytes` = octet_length. Only the decode itself
    crosses into Python, via Arrow-batched mapInPandas — the fake path
    is fully vectorized over each batch (numpy, no per-row iteration);
    the real path (`fake=False`) is necessarily per-payload library
    calls. Partitioning: inherit the scan's partitions — payload batches
    are the unit of decode parallelism."""
    mm = mm.select(
        "doc_id",
        "kind",
        "payload",
        F.octet_length("payload").alias("n_bytes"),
        F.substring(F.md5("payload"), 1, 16).alias("sig"),
    )

    if fake:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                n = pdf["n_bytes"].to_numpy(dtype=np.int64)
                # head-sum of the first 16 bytes: O(16) per element over
                # the Arrow buffer — the only non-columnar step the
                # pseudo-decode needs.
                head = np.fromiter(
                    (sum(b[:16]) if len(b) else 0 for b in pdf["payload"]),
                    dtype=np.int64,
                    count=len(pdf),
                )
                is_img = (pdf["kind"] == "image").to_numpy()
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "kind": pdf["kind"],
                        "n_bytes": n,
                        "width": np.where(is_img, 160 + head % 480, 0),
                        "height": np.where(is_img, 120 + n % 360, 0),
                        "n_frames": np.where(is_img, 1, n % 300 + 1),
                        "sig": pdf["sig"],
                    }
                )

    else:  # pragma: no cover - needs decode libs

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                feats = []
                for _, r in pdf.iterrows():
                    f = _decode_real(bytes(r["payload"]), r["kind"])
                    f.update(doc_id=r["doc_id"], kind=r["kind"], n_bytes=r["n_bytes"], sig=r["sig"])
                    feats.append(f)
                yield pd.DataFrame(
                    feats,
                    columns=["doc_id", "kind", "n_bytes", "width", "height", "n_frames", "sig"],
                )

    return mm.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(features: DataFrame, every_k: int = 30) -> DataFrame:
    """Deterministic frame sampling over decoded features: indices
    0, k, 2k, ... < n_frames, each with a per-frame signature
    md5(sig-idx). The sampling PLAN (which frames to fetch) is pure
    JVM Column work either way; in a deployment the per-frame pixel
    fetch would run in a mapInPandas decode keyed by (doc_id,
    frame_idx) over exactly these rows — sampling first means the
    decoder touches n_frames/k frames, not all of them."""
    return features.select(
        "doc_id",
        "kind",
        "n_frames",
        "sig",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    ).withColumn(
        "frame_sig",
        F.substring(
            F.md5(F.concat(F.col("sig"), F.lit("-"), F.col("frame_idx").cast("string"))),
            1,
            16,
        ),
    )


def resize_plan(features: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Fit-within-box resize geometry (aspect preserved) in exact
    integer fixed-point: scale = min(max_w*1000 div w, max_h*1000 div
    h, 1000), out = dim*scale div 1000. The pixel resample itself is
    the stubbed decode step; the geometry (and the thumbnail identity
    signature) is engine-side and feeds partition-sized work units to
    the decoder."""
    s = F.expr(
        f"least({max_w * 1000} div width, {max_h * 1000} div height, 1000)"
    ).alias("scale_c")
    out = features.select("doc_id", "width", "height", s)
    return out.select(
        "doc_id",
        "width",
        "height",
        "scale_c",
        F.expr("width * scale_c div 1000").cast("int").alias("out_w"),
        F.expr("height * scale_c div 1000").cast("int").alias("out_h"),
    )
