"""Property-based checks for the round-5 pipeline operators:
connected-component clustering against a pure-Python union-find, and
SQ8 integer distances against a direct recomputation. Small randomized
cases (hypothesis) — the oracle gate covers the real corpus; these pin
algorithmic correctness on adversarial shapes (chains, stars, merges)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, pairs):
    from pyspark.sql import functions as F

    from t_spoon_spark.operators.dedup import connected_components

    norm = [(min(a, b), max(a, b)) for a, b in pairs]
    df = spark.createDataFrame(norm, "doc_a long, doc_b long").distinct()
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    want = _uf_components(norm)
    # union-find roots ARE the component minima after min-union
    want_min = {}
    comp = {}
    for x, r in want.items():
        comp.setdefault(r, []).append(x)
    for r, xs in comp.items():
        m = min(xs)
        for x in xs:
            want_min[x] = m
    assert got == want_min


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.floats(-0.5, 0.5, allow_nan=False, width=32), min_size=8, max_size=8),
        min_size=4,
        max_size=10,
    )
)
def test_sq8_topk_matches_direct_recompute(spark, vecs):
    from pyspark.sql import functions as F

    from t_spoon_spark.operators.similarity import sq8_topk

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sq8_topk(df, df.filter(F.col("vec_id") < 2), k=3)
    got = {(r["q_id"], r["rnk"]): (r["c_id"], r["d2"]) for r in out.collect()}

    def code(v):
        # mirror the operator exactly: float32 payload -> float64 -> x*254,
        # HALF_UP (away from zero) like Spark's round — NOT Python's
        # banker's rounding
        import math

        import numpy as np

        def half_up(x):
            return int(math.copysign(math.floor(abs(x) + 0.5), x))

        return [
            max(-127, min(127, half_up(float(np.float32(x)) * 254))) for x in v
        ]

    codes = {i: code(v) for i, v in rows}
    for qid in (0, 1):
        if qid >= len(rows):
            continue
        ds = sorted(
            (sum((a - b) * (a - b) for a, b in zip(codes[qid], codes[c])), c)
            for c in codes
            if c != qid
        )
        for rnk, (d2, cid) in enumerate(ds[:3], start=1):
            assert got[(qid, rnk)] == (cid, d2), (qid, rnk, got.get((qid, rnk)), (cid, d2))
