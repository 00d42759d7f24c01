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


def _decode_fake(payload: bytes, kind: str) -> dict:
    """Deterministic pseudo-decode: feature values derived from byte
    content only (stable across engines/runs)."""
    n = len(payload)
    head = sum(payload[:16]) if n else 0
    return {
        "n_bytes": n,
        "width": 160 + (head % 480) if kind == "image" else 0,
        "height": 120 + (n % 360) if kind == "image" else 0,
        "n_frames": 1 if kind == "image" else (n % 300) + 1,
    }


def extract_features(mm: DataFrame, fake: bool = True, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over the binary payload.

    Arrow ships each partition as pandas batches; the UDF touches bytes
    only (no JVM round trips per row). Partitioning: inherit the scan's
    partitions — payload batches are the unit of decode parallelism."""
    decode = _decode_fake if fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                f = decode(payload, r["kind"])
                f["doc_id"] = r["doc_id"]
                f["kind"] = r["kind"]
                f["sig"] = hashlib.md5(payload).hexdigest()[:16]
                feats.append(f)
            yield pd.DataFrame(
                feats,
                columns=["doc_id", "kind", "n_bytes", "width", "height", "n_frames", "sig"],
            )

    return mm.mapInPandas(run, FEATURE_SCHEMA)
