"""Property-based parity for the driver-cascade expression compiler:
random update-expression trees and invariant predicates must evaluate
BIT-IDENTICALLY in the compiled Python twin and in Catalyst itself —
including null propagation, three-valued logic, and float semantics.

Each hypothesis example carries a BATCH of expressions evaluated in one
Spark job (per-expression jobs would be prohibitively slow), against a
fixed panel of (acc, delta) sample points that covers nulls, zeros,
negatives, and magnitude extremes.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from t_spoon_spark.tx import driver_cascade as dcm
from t_spoon_spark.tx import graph as G
from t_spoon_spark.tx.runner import _chain_update_sql

# (acc, delta) sample panel — None exercises Spark NULL propagation
SAMPLES = [
    (0.0, 0.0),
    (1.5, -2.5),
    (None, 3.0),
    (2.0, None),
    (-7.25, 0.5),
    (1048576.0, -0.001),
    (3.0, 4.0),
    (None, None),
]

_lits = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=32).map(
        lambda x: round(x, 3)
    ),
)


def _trees(depth: int):
    leaf = st.one_of(
        st.just(("acc",)),
        st.just(("col",)),
        _lits.map(lambda v: ("lit", v)),
    )
    if depth == 0:
        return leaf
    sub = _trees(depth - 1)
    nonzero = st.one_of(
        st.integers(min_value=1, max_value=5),
        st.floats(min_value=0.5, max_value=4.0, allow_nan=False, width=32).map(
            lambda x: round(x, 3)
        ),
    )
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["+", "-", "*"]), sub, sub),
        # divisor is a NONZERO literal: a zero divisor raises in BOTH
        # engines under ANSI, which would abort the whole batch select
        st.tuples(st.just("div"), sub, nonzero.map(lambda v: ("lit", v))),
        st.tuples(st.just("neg"), sub),
        st.tuples(st.just("abs"), sub),
        st.tuples(st.just("greatest"), sub, sub),
        st.tuples(st.just("least"), sub, sub),
        st.tuples(
            st.just("case"), st.sampled_from([">", "<=", "=="]), sub, sub, sub, sub
        ),
    )


def _to_column(tree, acc, col):
    k = tree[0]
    if k == "acc":
        return acc
    if k == "col":
        return col
    if k == "lit":
        return F.lit(tree[1])
    if k == "neg":
        return -_to_column(tree[1], acc, col)
    if k == "abs":
        return F.abs(_to_column(tree[1], acc, col))
    if k == "div":
        return _to_column(tree[1], acc, col) / _to_column(tree[2], acc, col)
    if k in ("greatest", "least"):
        fn = F.greatest if k == "greatest" else F.least
        return fn(_to_column(tree[1], acc, col), _to_column(tree[2], acc, col))
    if k == "case":
        _, op, a, b, then, els = tree
        ca, cb = _to_column(a, acc, col), _to_column(b, acc, col)
        cond = {"<=": ca <= cb, ">": ca > cb, "==": ca == cb}[op]
        return F.when(cond, _to_column(then, acc, col)).otherwise(
            _to_column(els, acc, col)
        )
    l, r = _to_column(tree[1], acc, col), _to_column(tree[2], acc, col)
    return {"+": l + r, "-": l - r, "*": l * r}[k]


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(trees=st.lists(_trees(3), min_size=1, max_size=8))
def test_compiled_update_matches_catalyst(spark, trees):
    sample_df = spark.createDataFrame(SAMPLES, "acc double, delta double")
    compiled = []
    cols = []
    for i, tree in enumerate(trees):
        update = lambda v, _t=tree: _to_column(_t, v, F.col("delta"))
        stage = G.StateStage("ns", key=lambda df: F.col("k"), update=update)
        sql = _chain_update_sql(spark, stage, ["delta"])
        compiled.append(dcm.compile_fragment(sql, ["delta"]))
        cols.append(
            _to_column(tree, F.col("acc"), F.col("delta")).alias(f"e{i}")
        )
    truth_rows = sample_df.select(*cols).collect()
    for si, (acc, delta) in enumerate(SAMPLES):
        for i, run in enumerate(compiled):
            want = _canon(truth_rows[si][f"e{i}"])
            got = _canon(run(acc, {"delta": delta}))
            assert got == want or (
                isinstance(want, float)
                and isinstance(got, float)
                and want == got
            ), (trees[i], acc, delta, want, got)


_PREDS = st.lists(
    st.tuples(
        st.sampled_from([">=", ">", "<", "<=", "=", "!="]),
        _lits,
        st.sampled_from(["", " AND delta > -3", " OR delta <= 1", " AND NOT (delta = 0)"]),
    ).map(lambda t: f"value {t[0]} {t[1]}{t[2]}"),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(preds=_PREDS)
def test_compiled_invariant_matches_catalyst(spark, preds):
    """Raw invariant SQL (the namespace contract) against Catalyst's
    own three-valued evaluation over (value, delta) samples."""
    sample_df = spark.createDataFrame(SAMPLES, "value double, delta double")
    cols = [F.expr(p).alias(f"p{i}") for i, p in enumerate(preds)]
    compiled = [dcm.compile_fragment(p, ["delta"]) for p in preds]
    truth_rows = sample_df.select(*cols).collect()
    for si, (value, delta) in enumerate(SAMPLES):
        for i, run in enumerate(compiled):
            want = truth_rows[si][f"p{i}"]
            got = run(None, {"delta": delta}, value)
            assert got == want, (preds[i], value, delta, want, got)


_NN_SAMPLES = [(a, d) for a, d in SAMPLES if a is not None and d is not None]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(trees=st.lists(_trees(3), min_size=1, max_size=8))
def test_vec_compile_matches_scalar(spark, trees):
    """The vec (numpy-array) compile of the SAME rendered SQL must agree
    elementwise with the scalar compile on null-free inputs — the vec
    eligibility gate guarantees null-free, so that is the domain to pin.
    Trees the vec whitelist rejects (division) must raise Ineligible,
    never compile wrong."""
    import numpy as np

    import t_spoon_spark.tx.driver_cascade as dcm_mod

    accs = np.array([a for a, _ in _NN_SAMPLES], dtype=np.float64)
    deltas = np.array([d for _, d in _NN_SAMPLES], dtype=np.float64)
    for tree in trees:
        update = lambda v, _t=tree: _to_column(_t, v, F.col("delta"))
        stage = G.StateStage("ns", key=lambda df: F.col("k"), update=update)
        sql = _chain_update_sql(spark, stage, ["delta"])
        scalar = dcm.compile_fragment(sql, ["delta"])
        try:
            vec = dcm.compile_fragment(sql, ["delta"], vec=True)
        except dcm_mod.Ineligible:
            continue  # whitelisted rejection (e.g. division) is correct
        got = np.asarray(vec(accs, {"delta": deltas}), dtype=np.float64)
        for i, (a, d) in enumerate(_NN_SAMPLES):
            want = scalar(a, {"delta": d})
            g = float(got[i]) if got.ndim else float(got)
            assert (want == g) or (
                isinstance(want, float) and math.isnan(want) and math.isnan(g)
            ), (tree, a, d, want, g)
