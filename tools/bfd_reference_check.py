"""sf1 oracle alternative for packing_best_fit_decreasing (round-10
verdict #7): the DuckDB recursive-CTE oracle replays the fold one doc
per iteration with the fill LIST as state and takes >10 min at sf1's
2,500-doc shards, so the entry was engine-only at sf1 — the only gap in
the sf1 exact-hash family coverage.

This tool closes it with a BOUNDED reference: token counts come from
DuckDB (the oracle's exact ``string_split_regex`` semantics — NOT the
engine's tokenizer, so tokenization stays cross-checked), and the
best-fit-decreasing fold is replayed in plain Python per source shard
(fullest-feasible-bin, lowest-index tiebreak — a linear pass per doc,
seconds at sf1, independent of the engine's pandas/Arrow fold).  The
full frames are then compared with the driver's own ``compare_frames``
(column names, row count, exact values) — the same gate, different
oracle engine.

Usage: python tools/bfd_reference_check.py [sf_dir]   (default .scratch/sf1)
Exit 0 on exact match.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def reference_frame(sf_dir: str):
    """(source, doc_id, n_tok, bin_id, bin_offset) via DuckDB token
    counts + a plain-Python BFD fold, ordered like the engine entry."""
    from t_spoon_spark.queries.corpus_ops import _DD_TOKS, PACK_BUDGET
    from t_spoon_spark.testing import duckdb_connection

    # duckdb_connection registers the standard views for both layouts
    # (single parquet file and Spark-written dataset directories — the
    # amplified sf1 tables are the latter)
    con = duckdb_connection(sf_dir)
    rows = con.execute(
        f"""
        SELECT source, doc_id, LEAST(len({_DD_TOKS}), {PACK_BUDGET}) AS n_tok
        FROM documents
        WHERE len({_DD_TOKS}) > 0
        ORDER BY source, n_tok DESC, doc_id
        """
    ).fetchall()

    out = []  # (source, doc_id, n_tok, bin_id, bin_offset)
    cur_source = None
    fills: list[int] = []
    for source, doc_id, n_tok in rows:
        if source != cur_source:
            cur_source, fills = source, []
        best, best_fill = -1, -1
        for i, f in enumerate(fills):
            if f + n_tok <= PACK_BUDGET and f > best_fill:
                best, best_fill = i, f
        if best < 0:
            out.append((source, doc_id, n_tok, len(fills), 0))
            fills.append(int(n_tok))
        else:
            out.append((source, doc_id, n_tok, best, best_fill))
            fills[best] = best_fill + int(n_tok)

    import pandas as pd

    return (
        pd.DataFrame(
            out, columns=["source", "doc_id", "n_tok", "bin_id", "bin_offset"]
        )
        .astype(
            {"doc_id": "int64", "n_tok": "int64", "bin_id": "int64",
             "bin_offset": "int64"}
        )
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".scratch" / "sf1")

    from t_spoon_spark.queries.corpus_ops import packing_best_fit_decreasing
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.testing import compare_frames

    t0 = time.time()
    ref = reference_frame(sf_dir)
    t_ref = time.time() - t0

    spark = build_spark(app_name="bfd_reference_check")
    t0 = time.time()
    eng = packing_best_fit_decreasing(spark, sf_dir).toPandas()
    t_eng = time.time() - t0

    errs = compare_frames(eng, ref)
    if errs:
        print(f"FAIL  packing_best_fit_decreasing @ {sf_dir}")
        for e in errs:
            print(f"      {e}")
        return 1
    print(
        f"PASS  packing_best_fit_decreasing @ {sf_dir}: rows={len(eng)} "
        f"(engine {t_eng:.1f}s, python+duckdb reference {t_ref:.1f}s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
