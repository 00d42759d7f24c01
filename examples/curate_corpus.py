"""End-to-end training-corpus curation on this engine — the program a
user of a data pipeline actually runs, composed entirely from the
oracle-gated operators: quality gate -> exact dedup -> near-dup
clustering (keep best per cluster) -> benchmark decontamination ->
deterministic train/val/test split -> per-split manifest with token
budgets.  Each stage is the registered entry (the driver gates its
values) and the split assignment uses the registered entry's exact
hash scheme (md5('split:' || doc_id) % 1000, 900/950 buckets), so
split membership here agrees with sample_train_val_test_split's
auditable id_checksum; this program pins that the stages COMPOSE —
the output manifest is recomputed, not mocked.

Run: python examples/curate_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from t_spoon_spark.queries.curation import quality_filter_composite
    from t_spoon_spark.queries.chunking import decontamination_ngram_overlap
    from t_spoon_spark.queries.dedup import dedup_exact_md5, dedup_keep_best_per_cluster
    from t_spoon_spark.operators.text import md5_long
    from t_spoon_spark.queries.relational import t
    from t_spoon_spark.session import build_spark

    own_session = spark is None
    if own_session:
        spark = build_spark(app_name="curate_corpus")

    docs = t(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. quality gate: keep docs passing the composite C4-style rules
    passing = quality_filter_composite(spark, sf_dir).filter(
        F.col("verdict") == "keep"
    ).select("doc_id")

    # 2. exact dedup: the canonical keeper per md5 group
    keepers = dedup_exact_md5(spark, sf_dir).select(
        F.col("keep_doc").alias("doc_id")
    ).distinct()

    # 3. near-dup clusters: drop clustered docs NOT chosen as their
    # cluster's keeper (docs outside any cluster never appear in the
    # decision table and pass through)
    nd_drop = dedup_keep_best_per_cluster(spark, sf_dir).filter(
        F.col("keep") == 0
    ).select("doc_id")

    # 4. decontamination: doc ids overlapping the benchmark get dropped
    contaminated = decontamination_ngram_overlap(spark, sf_dir).filter(
        F.col("flagged") == 1
    ).select("doc_id").distinct()

    # 4b. perceptual near-dup over the binary media kinds (round 14):
    # image dHash / audio fingerprint pairs, keep the smaller doc_id of
    # each pair — the multimodal leg of the dedup stage, same banded
    # candidates-then-verify kernels the registered entries gate
    from t_spoon_spark.operators.multimodal import (
        audio_fingerprint_pairs,
        binarize_documents,
        dhash_pairs,
    )

    mm = binarize_documents(docs)
    perceptual_drop = (
        dhash_pairs(mm, max_hamming=7)
        .unionByName(audio_fingerprint_pairs(mm, max_hamming=3))
        .select(F.greatest("doc_a", "doc_b").alias("doc_id"))
        .distinct()
    )

    kept = (
        docs.select("doc_id", "lang", "n_chars")
        .join(passing, "doc_id", "left_semi")
        .join(keepers, "doc_id", "left_semi")
        .join(nd_drop, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .join(perceptual_drop, "doc_id", "left_anti")
    )

    # 5. deterministic split + manifest — the SAME bucket function as
    # the registered sample_train_val_test_split entry, so membership
    # is auditable against its id_checksum
    n_kept_direct = kept.count()
    bucket = F.pmod(
        md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        F.lit(1000),
    )
    assigned = kept.withColumn(
        "split",
        F.when(bucket < 900, "train").when(bucket < 950, "val").otherwise("test"),
    )
    manifest = (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("split")
        .collect()
    )

    out = {
        "n_raw": n_raw,
        "n_kept": n_kept_direct,  # counted BEFORE the split groupBy —
        # the example test checks the manifest partitions it exactly
        "splits": {r.split: (r.n_docs, r.n_chars) for r in manifest},
    }
    # invariants a curation run must satisfy
    assert 0 < n_kept_direct <= n_raw
    assert set(out["splits"]) <= {"train", "val", "test"}
    if own_session:
        print(out)
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
