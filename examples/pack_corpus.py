"""End-to-end tokenize-and-pack on this engine — the shard-preparation
program that follows curation (examples/curate_corpus.py) in a training
pipeline, composed from the round-10 oracle-gated operators:

  semantic dedup (SemDeDup cluster-bounded cosine pruning)
  -> BPE tokenization (per-doc token counts under the learned merges)
  -> best-fit-decreasing whole-doc packing into fixed token budgets
  -> per-source manifest (bins, tokens, padding waste)

Each stage is the registered entry's own machinery (the driver gates
its values); this program pins that the stages COMPOSE — the manifest
is recomputed from the packed assignment, not mocked.  Documents whose
embedding survived dedup keep their text; embeddings map to documents
by id (the testdata convention: vec_id = doc_id where both exist, and
docs without an embedding are kept — dedup can only act where a vector
exists).

Run: python examples/pack_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from t_spoon_spark.queries.corpus_ops import (
        PACK_BUDGET,
        bfd_pack,
        semdedup_members_and_dups,
        text_bpe_apply_tokenize,
    )
    from t_spoon_spark.queries.relational import t
    from t_spoon_spark.session import build_spark

    own_session = spark is None
    if own_session:
        spark = build_spark(app_name="pack_corpus")

    docs = t(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. semantic dedup: drop docs whose embedding is a within-cluster
    # near-duplicate of a lower-id member
    _, dups = semdedup_members_and_dups(spark, sf_dir)
    dup_ids = dups.select(F.col("vec_id").alias("doc_id"))
    kept = docs.join(dup_ids, "doc_id", "left_anti").select("doc_id", "source")
    n_dropped = n_raw - kept.count()

    # 2. tokenize: per-doc BPE token counts under the learned merges
    toks = text_bpe_apply_tokenize(spark, sf_dir).select("doc_id", "n_bpe")

    # 3. pack the kept docs' BPE counts best-fit-decreasing per source
    base = (
        kept.join(toks, "doc_id")
        .select(
            "source",
            "doc_id",
            F.least(F.col("n_bpe"), F.lit(PACK_BUDGET)).cast("long").alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
    )
    packed = bfd_pack(base)

    # 4. manifest: bins, token totals, and padding waste per source
    manifest = (
        packed.groupBy("source")
        .agg(
            (F.max("bin_id") + 1).cast("long").alias("n_bins"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "padding_waste", F.col("n_bins") * PACK_BUDGET - F.col("n_tokens")
        )
        .orderBy("source")
        .collect()
    )

    out = {
        "n_raw": n_raw,
        "n_dropped_semantic": n_dropped,
        "n_packed_docs": sum(r.n_docs for r in manifest),
        "n_bins": sum(r.n_bins for r in manifest),
        "n_tokens": sum(r.n_tokens for r in manifest),
        "padding_waste": sum(r.padding_waste for r in manifest),
        "manifest": [r.asDict() for r in manifest],
    }
    if own_session:
        for k, v in out.items():
            if k != "manifest":
                print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
