"""Property-based checks for the late round-5 operators: the Bloom
semi-join must equal the plain semi-join on adversarial key sets, the
greedy packing fold must match a pure-Python replay, and bottom-k
priority sampling must be mergeable (bottom-k of a union == bottom-k of
per-part bottom-ks). Small randomized cases — the oracle gate covers
the real corpus; these pin the algebra on shapes the corpus may not
contain."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    build=st.lists(st.integers(0, 60), min_size=0, max_size=25),
    probe=st.lists(st.integers(0, 60), min_size=1, max_size=40),
)
def test_bloom_semi_join_property(spark, build, probe):
    from t_spoon_spark.operators.bloom import bloom_semi_join

    bdf = spark.createDataFrame([(int(k),) for k in build] or [(None,)], "k long")
    if not build:
        bdf = bdf.filter("k is not null")
    pdf = spark.createDataFrame([(i, int(k)) for i, k in enumerate(probe)], "i long, k long")
    got = sorted(r.i for r in bloom_semi_join(pdf, bdf, "k").collect())
    want = sorted(i for i, k in enumerate(probe) if k in set(build))
    assert got == want


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(1, 700), min_size=1, max_size=30),
)
def test_greedy_packing_matches_python_fold(spark, toks):
    from t_spoon_spark.queries.packing import PACK_BUDGET

    # replicate the operator's fold on a synthetic single-source frame
    import pandas as pd

    from pyspark.sql import functions as F

    rows = [("s0", i, min(n, PACK_BUDGET)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        out_pack, out_off = [], []
        pack, fill = 0, 0
        for n in pdf["n_tok"]:
            if fill + n > PACK_BUDGET:
                pack += 1
                fill = 0
            out_pack.append(pack)
            out_off.append(fill)
            fill += n
        pdf["pack_id"] = pd.Series(out_pack, dtype="int64")
        pdf["pack_offset"] = pd.Series(out_off, dtype="int64")
        return pdf

    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in df.groupBy("source")
        .applyInPandas(
            fold,
            schema="source string, doc_id bigint, n_tok bigint, pack_id bigint, pack_offset bigint",
        )
        .collect()
    }
    pack, fill = 0, 0
    for i, n in enumerate(toks):
        n = min(n, PACK_BUDGET)
        if fill + n > PACK_BUDGET:
            pack += 1
            fill = 0
        assert got[i] == (pack, fill), (i, got[i], (pack, fill))
        fill += n


@settings(**_SETTINGS)
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    k=st.integers(1, 8),
    split=st.integers(1, 59),
)
def test_bottomk_priority_is_mergeable(spark, ids, k, split):
    """bottom-k(priorities(A ∪ B)) == bottom-k(bottom-k(A) ∪ bottom-k(B))
    — the merge law TakeOrderedAndProject relies on, checked through the
    engine's md5 priority."""
    import hashlib

    def pri(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    a, b = ids[:split], ids[split:]
    whole = sorted(ids, key=lambda x: (pri(x), x))[:k]
    pa = sorted(a, key=lambda x: (pri(x), x))[:k]
    pb = sorted(b, key=lambda x: (pri(x), x))[:k]
    merged = sorted(pa + pb, key=lambda x: (pri(x), x))[:k]
    assert whole == merged
