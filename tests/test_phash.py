"""Perceptual dHash near-dup (round-13 verdict #4): hash exactness is
oracle-gated (dedup_phash_images / dedup_phash_band_stats); this suite
gates the PAIR kernel on a corpus where the Hamming spectrum is real —
length-PRESERVING in-place edits, the regime a positional byte-stream
thumbnail is sensitive to (the parquet corpus's near-dups are
length-perturbed, which smears every block boundary; documented in the
entry docstring).  Plus the 100 TB plan gate: no Python in the plan,
banding join on (band, band_key).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from t_spoon_spark.operators.multimodal import (
    binarize_documents,
    dhash_bands,
    dhash_images,
    dhash_pairs,
)


def _text(seed: str, n: int = 720) -> str:
    """Deterministic printable-ASCII string (no random module — the
    repo determinism contract)."""
    out = []
    i = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.extend(chr(32 + (ord(c) * 7) % 95) for c in h)
        i += 1
    return "".join(out[:n])


def _mm(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return binarize_documents(docs)


def test_inplace_edits_yield_low_hamming_pair(spark):
    base = _text("base")
    # overwrite three 10-char spans in place (one full luma block each):
    # length unchanged, so block boundaries stay put, the touched
    # blocks' means jump, and a couple of comparison bits flip —
    # measured hamming 2 of 64
    edited = list(base)
    for pos in (100, 360, 650):
        for k in range(10):
            edited[pos + k] = "~"
    near = "".join(edited)
    far = _text("far")
    mm = _mm(
        spark,
        [(1, "src0", base), (2, "src0", near), (3, "src0", far)],
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dhash_pairs(mm, max_hamming=7).collect()
    }
    assert (1, 2) in pairs, pairs
    assert 0 < pairs[(1, 2)] <= 7
    # the unrelated doc is not paired with either
    assert all(3 not in p for p in pairs)


def test_exact_dup_hamming_zero_and_hamming_matches_hashes(spark):
    base = _text("dup")
    mm = _mm(spark, [(1, "src0", base), (2, "src0", base)])
    pairs = dhash_pairs(mm, max_hamming=7).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0
    # cross-check the reported hamming against the raw hash words
    h = {r["doc_id"]: (r["dhash_lo"], r["dhash_hi"]) for r in dhash_images(mm).collect()}
    lo_x = h[1][0] ^ h[2][0]
    hi_x = h[1][1] ^ h[2][1]
    assert bin(lo_x).count("1") + bin(hi_x).count("1") == 0


def test_pigeonhole_threshold_enforced(spark):
    mm = _mm(spark, [(1, "src0", _text("a"))])
    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_pairs(mm, max_hamming=8)


def test_short_payloads_excluded(spark):
    mm = _mm(spark, [(1, "src0", "tiny"), (2, "src0", _text("ok"))])
    got = {r["doc_id"] for r in dhash_images(mm).collect()}
    assert got == {2}


def test_non_image_kinds_excluded(spark):
    # source ids 1/2 -> audio/video: no dHash rows
    mm = _mm(spark, [(1, "src1", _text("a")), (2, "src2", _text("b"))])
    assert dhash_images(mm).count() == 0


def test_phash_plan_no_python_and_band_join(spark):
    """100 TB gate: the only Python crossing in the pipeline is the
    documented Arrow decode seam (`MapInArrow` over (doc_id, payload)
    in `_block_mean_grid`, optimization r15) — everything downstream
    (hash, banding, verify) stays JVM-side, and no row-at-a-time
    BatchEvalPython or per-expression ArrowEvalPython appears
    anywhere.  The candidate join keys on the exploded band."""
    from t_spoon_spark.plans.explain import executed_plan

    mm = _mm(spark, [(i, "src0", _text(str(i))) for i in range(1, 5)])
    plan = executed_plan(dhash_pairs(mm, max_hamming=7))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "band" in plan  # candidates join through the band explode
    bplan = executed_plan(dhash_bands(dhash_images(mm)))
    assert "Generate" in bplan  # posexplode, not a python loop


# -- audio fingerprint (1-D analogue) ----------------------------------


def test_audio_inplace_edit_low_hamming_pair(spark):
    from t_spoon_spark.operators.multimodal import audio_fingerprint_pairs

    base = _text("wave", 660)  # 33 frames x 20 bytes
    edited = list(base)
    for k in range(20):  # overwrite exactly one frame
        edited[200 + k] = "~"
    near = "".join(edited)
    far = _text("noise", 660)
    mm = _mm(spark, [(1, "src1", base), (2, "src1", near), (3, "src1", far)])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in audio_fingerprint_pairs(mm, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and 0 < pairs[(1, 2)] <= 3, pairs
    assert all(3 not in p for p in pairs)


def test_audio_pigeonhole_and_kind_filter(spark):
    from t_spoon_spark.operators.multimodal import (
        audio_fingerprint_pairs,
        audio_fingerprints,
    )

    mm = _mm(spark, [(1, "src1", _text("a"))])
    with pytest.raises(ValueError, match="pigeonhole"):
        audio_fingerprint_pairs(mm, max_hamming=4)
    # image/video kinds excluded; fingerprint fits in 32 bits
    mixed = _mm(spark, [(1, "src0", _text("i")), (2, "src1", _text("a"))])
    rows = audio_fingerprints(mixed).collect()
    assert [r["doc_id"] for r in rows] == [2]
    assert 0 <= rows[0]["fingerprint"] < (1 << 32)


def test_entry_plans_minimal_shuffles(spark):
    """Entry-level 100 TB gate: the hash entries are map-only plus the
    oracle-determinism sort (1 shuffle); band stats adds the two
    aggregation exchanges (3 total).  The byte math crosses once
    through the Arrow decode seam (MapInArrow, optimization r15); no
    row-at-a-time BatchEvalPython, no cartesian, ever."""
    from t_spoon_spark.plans.explain import count_shuffles, executed_plan
    from t_spoon_spark.registry import _REGISTRY, all_queries

    all_queries()
    bounds = {
        "dedup_phash_images": 1,
        "dedup_audio_fingerprints": 1,
        "dedup_phash_band_stats": 3,
    }
    for name, max_shuffles in bounds.items():
        df = _REGISTRY[name].spark_fn(spark, "/root/testdata/sf0.001")
        plan = executed_plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert count_shuffles(df) <= max_shuffles, (name, count_shuffles(df))


def test_streaming_dhash_dedup_keep_first(spark, tmp_path):
    """Streaming twin: a near-dup arriving AFTER its original is
    flagged, the original and unrelated docs are not — arrival order
    (doc_id-ordered stream) decides keep-first, exactly like the
    simhash streaming dedup."""
    from t_spoon_spark.operators.multimodal import dhash_bands, dhash_images
    from t_spoon_spark.streaming.windows import (
        dhash_dedup_stateful,
        drain_stream,
        file_stream,
    )

    base = _text("sbase")
    edited = list(base)
    for pos in (100, 360, 650):
        for k in range(10):
            edited[pos + k] = "~"
    near = "".join(edited)
    far = _text("sfar")
    mm = _mm(spark, [(1, "src0", base), (2, "src0", near), (3, "src0", far)])
    bands = dhash_bands(dhash_images(mm))
    stream = file_stream(spark, bands, n_slices=2, time_ordered="doc_id")
    per_band = drain_stream(dhash_dedup_stateful(stream), output_mode="update")
    got = {
        r["doc_id"]: r["is_dup"]
        for r in per_band.groupBy("doc_id")
        .agg(F.max("is_dup").cast("int").alias("is_dup"))
        .collect()
    }
    assert got == {1: 0, 2: 1, 3: 0}, got


def test_streaming_dhash_threshold_guard(spark):
    from t_spoon_spark.streaming.windows import dhash_dedup_stateful

    with pytest.raises(ValueError, match="pigeonhole"):
        dhash_dedup_stateful(None, max_hamming=8)
