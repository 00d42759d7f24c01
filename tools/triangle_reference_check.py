"""sf1 oracle alternative for graph_triangle_parts (round-11 verdict
next-round #7): the DuckDB oracle's wedge join (oriented x oriented +
EXISTS close) spills >80 GB of temp at sf1's ~edge volume, so the entry
was engine-only at sf1 — the last member of the oracle-exclusion class
after round 11 closed BFD.

This tool closes it with a BOUNDED reference, the same recipe as
tools/bfd_reference_check.py: the EDGE BUILD comes from DuckDB (the
oracle's exact lineitem self-join + DISTINCT LEAST/GREATEST semantics —
so edge construction stays cross-checked against a second engine), and
the degree orientation + wedge-close count is replayed driver-side in
vectorized numpy (CSR adjacency, chunked searchsorted membership —
linear passes bounded by the oriented wedge volume, which orientation
caps near m*sqrt(m); minutes at sf1, no join materialization anywhere).
The single-row (n_edges, n_triangles) frames are then compared with the
driver's own ``compare_frames`` — the same gate, different oracle
engine.  tests/test_plans_round5b.py pins this reference against the
engine entry at sf0.001 so the two implementations cannot drift apart
silently.

Usage: python tools/triangle_reference_check.py [sf_dir]  (default .scratch/sf1)
Exit 0 on exact match.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# wedge rows processed per numpy chunk (~8 int64 arrays of this length
# live at once -> a few hundred MB peak, independent of graph size)
WEDGE_BUDGET = 25_000_000


def reference_counts(sf_dir: str) -> tuple[int, int]:
    """(n_edges, n_triangles) of the parts-co-order graph: DuckDB edge
    build + numpy degree-oriented wedge-close replay of the query's
    exact semantics (queries/graph.py graph_triangle_parts)."""
    from t_spoon_spark.testing import duckdb_connection

    con = duckdb_connection(sf_dir)
    pairs = con.execute(
        """
        SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS x,
                        GREATEST(a.l_partkey, b.l_partkey) AS y
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchnumpy()
    x = pairs["x"].astype(np.int64)
    y = pairs["y"].astype(np.int64)
    n_edges = len(x)
    if n_edges == 0:
        return 0, 0

    K = int(max(x.max(), y.max())) + 1
    if K * K >= 2**62:  # edge codes below must fit int64
        raise ValueError(f"vertex id space too large for int64 codes: {K}")
    # symmetric degree (each undirected edge contributes to both ends)
    deg = np.bincount(np.concatenate([x, y]), minlength=K)
    # orientation: every edge points from the (degree, id)-smaller
    # endpoint — identical tiebreak to the Spark entry and its SQL oracle
    x_first = (deg[x] < deg[y]) | ((deg[x] == deg[y]) & (x < y))
    src = np.where(x_first, x, y)
    dst = np.where(x_first, y, x)

    # CSR out-adjacency by src, plus a sorted edge-code array for the
    # triangle-closing membership test
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    starts = np.searchsorted(src_s, np.arange(K))
    ends = np.searchsorted(src_s, np.arange(K), side="right")
    outdeg = (ends - starts).astype(np.int64)
    codes = np.sort(src * K + dst)

    # wedge volume per edge = outdeg(dst); chunk edges so each numpy
    # pass stays under WEDGE_BUDGET wedge rows
    wedge_cum = np.cumsum(outdeg[dst])
    n_tri = 0
    lo = 0
    t0 = time.time()
    while lo < n_edges:
        base = wedge_cum[lo - 1] if lo else 0
        hi = int(np.searchsorted(wedge_cum, base + WEDGE_BUDGET)) + 1
        hi = min(max(hi, lo + 1), n_edges)
        a, b = src[lo:hi], dst[lo:hi]
        cnt = outdeg[b]
        total = int(cnt.sum())
        if total:
            # for edge (a, b): candidates c are b's out-neighbors; the
            # wedge (a, b, c) closes iff oriented edge (a, c) exists
            run_off = np.repeat(np.cumsum(cnt) - cnt, cnt)
            idx = np.repeat(starts[b], cnt) + (np.arange(total) - run_off)
            c = dst_s[idx]
            q = np.repeat(a, cnt) * K + c
            pos = np.searchsorted(codes, q)
            hit = (pos < len(codes)) & (codes[np.minimum(pos, len(codes) - 1)] == q)
            n_tri += int(hit.sum())
        lo = hi
    print(
        f"# reference wedge pass: {int(wedge_cum[-1]):,} wedges, "
        f"{time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    return int(n_edges), int(n_tri)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".scratch" / "sf1")

    import pandas as pd

    t0 = time.time()
    ref_edges, ref_tris = reference_counts(sf_dir)
    t_ref = time.time() - t0
    print(f"# reference: edges={ref_edges:,} triangles={ref_tris:,} ({t_ref:.1f}s)")

    from t_spoon_spark.queries.graph import graph_triangle_parts
    from t_spoon_spark.session import build_spark
    from t_spoon_spark.testing import compare_frames

    spark = build_spark(app_name="triangle_reference_check")
    t0 = time.time()
    engine_pdf = graph_triangle_parts(spark, sf_dir).toPandas()
    t_eng = time.time() - t0
    spark.stop()
    print(f"# engine:    {engine_pdf.to_dict('records')} ({t_eng:.1f}s)")

    ref_pdf = pd.DataFrame(
        {"n_edges": [ref_edges], "n_triangles": [ref_tris]}
    ).astype("int64")
    errs = compare_frames(engine_pdf, ref_pdf)
    if errs:
        for e in errs:
            print(f"FAIL  {e}")
        return 1
    print(f"PASS  graph_triangle_parts vs bounded reference at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
