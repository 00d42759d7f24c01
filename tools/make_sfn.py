"""Amplify the driver testdata to a larger scale factor for local
scale rehearsals (SCALING.md): replicate every scaling table N times
with disjoint key offsets so primary keys stay unique and foreign keys
stay consistent within each copy.  Fixed dims (region, nation) are
copied once.

Document texts and embedding vectors are PERTURBED per copy with a
deterministic salt (round-6 verdict missing #4: verbatim replication
made sf1 ~90% exact duplicates, so the dedup/similarity rehearsal rows
measured a pathological corpus).  Copy 0 is verbatim; copy k>0 mutates
~1 token in 8 (hash-gated on (doc_id, copy, position)) and nudges
~1 embedding component in 4 by a small deterministic offset — the
amplified corpus then carries a realistic NEAR-duplicate spectrum
(shingle overlap ~0.75-0.95, cosine ~0.99) instead of exact copies.
``--verbatim`` restores the old behavior for worst-case stress runs.

Usage: python tools/make_sfn.py [--copies 10] [--src /root/testdata/sf0.1]
                                [--out /root/repo/.scratch/sf1] [--verbatim]

The output dir is scratch (gitignored) — TESTDATA.md's sf dirs are
read-only and never touched.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# key columns to offset, with a stride comfortably above the sf0.1 max
# key so every copy's id space is disjoint
OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    # event_id stride = the sf0.1 ROW COUNT (event_ids there are dense
    # 0..99,999): copies stay disjoint AND the amplified id space stays
    # dense 0..N-1.  The old 10M stride left 99% tid-space gaps, so the
    # bench's tid-range epoch slices (rate*seconds ids per epoch) fed
    # ~1% of the intended rows at sf1 — the round-11 sf1 sweep's
    # tid-sliced pin rows measured near-empty epochs (SCALING.md
    # round-12 correction).  `tid = event_id` is a bench contract
    # (oracle parity), so density is the GENERATOR's job.
    "events": {"event_id": 100_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=str(REPO / ".scratch" / "sf1"))
    ap.add_argument(
        "--verbatim",
        action="store_true",
        help="replicate payloads unmodified (exact-duplicate stress corpus)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from t_spoon_spark.session import build_spark

    spark = build_spark(app_name="make_sfn")
    os.makedirs(args.out, exist_ok=True)

    for t in COPY_ONCE:
        df = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(args.out, f"{t}.parquet"))
        print(f"{t}: copied")

    # events carries TIMESTAMP(NANOS): under nanosAsLong (set by
    # build_spark) `ts` reads as a raw-nanos BIGINT and writes back as
    # BIGINT, which load_events' LongType branch normalizes on read —
    # the amplified file round-trips through the same loader.
    copies = F.explode(
        F.array(*[F.lit(k) for k in range(args.copies)])
    ).alias("_copy")
    for t, offs in OFFSETS.items():
        src = os.path.join(args.src, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        raw = spark.read.parquet(src)
        if t == "events":
            # density contract (see OFFSETS note): stride = max id + 1
            # of THIS source, so any --src keeps disjoint AND dense ids
            ev_stride = int(raw.agg(F.max("event_id")).collect()[0][0]) + 1
            offs = {**offs, "event_id": ev_stride}
        df = raw.select("*", copies)
        if not args.verbatim and t == "documents":
            # hash-gated token mutation: ~1/8 of positions get a salted
            # token on copies > 0; deterministic in (doc_id, copy, pos)
            toks = F.split(F.col("text"), " ")
            idx = F.sequence(F.lit(0), F.size(toks) - 1)
            salted = F.transform(
                idx,
                lambda i: F.when(
                    (F.col("_copy") > 0)
                    & (
                        F.pmod(
                            F.hash(F.col("doc_id"), F.col("_copy"), i), F.lit(8)
                        )
                        == 0
                    ),
                    F.concat(
                        F.element_at(toks, i + 1),
                        F.lit("v"),
                        F.col("_copy").cast("string"),
                    ),
                ).otherwise(F.element_at(toks, i + 1)),
            )
            df = df.withColumn("text", F.array_join(salted, " ")).withColumn(
                "n_chars", F.length("text")
            )
        if not args.verbatim and t == "embeddings":
            # nudge ~1/4 of components by ±[0, 0.02): cosine vs copy 0
            # lands ~0.99 — near-duplicate, not identical
            emb = F.col("embedding")
            idx = F.sequence(F.lit(0), F.size(emb) - 1)
            nudged = F.transform(
                idx,
                lambda i: (
                    F.element_at(emb, i + 1)
                    + F.when(
                        (F.col("_copy") > 0)
                        & (
                            F.pmod(
                                F.hash(F.col("vec_id"), F.col("_copy"), i), F.lit(4)
                            )
                            == 0
                        ),
                        (
                            F.pmod(
                                F.hash(i, F.col("vec_id"), F.col("_copy")), F.lit(400)
                            ).cast("float")
                            - F.lit(200.0)
                        )
                        / F.lit(10000.0),
                    ).otherwise(F.lit(0.0))
                ).cast("float"),
            )
            df = df.withColumn("embedding", nudged)
        for col, stride in offs.items():
            df = df.withColumn(col, F.col(col) + F.col("_copy").cast("long") * stride)
        out = os.path.join(args.out, f"{t}.parquet")
        df.drop("_copy").write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
