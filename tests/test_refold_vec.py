"""Scalar-vs-vectorized refold equivalence (round-10).

The position-wise numpy refold (`_refold_keys_vec`) must reproduce the
scalar per-key fold (`_refold_key`) LINK FOR LINK — tid, vote, value,
position, and applied flag — on any chain content, exclusion set, and
replace-then-append round pattern.  Pure pandas/numpy (no Spark), so
hundreds of randomized workloads cost milliseconds; the end-to-end
parity battery (test_driver_cascade) separately pins both against the
distributed path through real epochs.

Also pins the vec compile gate: expressions whose numpy semantics could
diverge from Spark's (division's ANSI error channel, NULL-propagating
constructs) must be Ineligible in vec mode, not silently compiled.
"""

from __future__ import annotations

import random
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

from t_spoon_spark.tx import driver_cascade as dcm
from t_spoon_spark.tx.driver_cascade import (
    DriverCascade,
    Ineligible,
    _StageState,
    _to_float,
    compile_fragment,
)

# rendered-SQL shapes the JVM fold actually produces (function-call
# form) plus raw invariants — each must compile in BOTH modes
CASES = [
    ("`+`(acc.value, x.delta)", "value >= 0"),
    ("`+`(acc.value, x.delta)", None),
    ("greatest(`+`(acc.value, x.delta), -50.0)", "value >= -25"),
    (
        "CASE WHEN `>`(x.delta, 0) THEN `+`(acc.value, x.delta) "
        "ELSE `+`(acc.value, `*`(x.delta, 2)) END",
        "value >= 0 AND value <= 10000",
    ),
    ("`-`(abs(`+`(acc.value, x.delta)), 1.0)", "NOT (value < -1000)"),
    ("least(`+`(acc.value, x.delta), 1000.0)", "value <= 999 OR delta < 0"),
]


def _mk_comp(upd_sql: str, inv_sql: str | None):
    upd = compile_fragment(upd_sql, ["delta"])
    upd_v = compile_fragment(upd_sql, ["delta"], vec=True)
    inv = inv_v = None
    if inv_sql:
        inv = compile_fragment(inv_sql, ["delta"])
        inv_v = compile_fragment(inv_sql, ["delta"], vec=True, forbid_acc=True)
    return dcm._Compiled(
        update=lambda acc, rec: upd(acc, rec),
        invariant=(lambda v, rec: inv(None, rec, v)) if inv else None,
        cast=_to_float,
        update_vec=lambda acc, rec: upd_v(acc, rec),
        invariant_vec=(lambda v, rec: inv_v(None, rec, v)) if inv_v else None,
    )


def _mk_state(rng, comp, n_keys: int, n_links: int):
    keys = [f"k{i}" for i in range(n_keys)]
    rows = [
        (rng.randrange(0, 60), rng.choice(keys), float(rng.randint(-80, 80)))
        for _ in range(n_links)
    ]
    ops = pd.DataFrame(rows, columns=["_tid", "__key", "delta"])
    ns = SimpleNamespace(default=100.0, value_type="double", invariant=None)
    ctx = SimpleNamespace(
        kind="chain_expr",
        stage=SimpleNamespace(pre_combine={"delta": "sum"}),
        ns=ns,
        value_cols=["delta"],
        ops=None,
    )
    st = _StageState(ctx=ctx, comp=comp)
    # pre-combined per (tid, key), like _pull_stage_ops' chain path
    gb = ops.groupby(["_tid", "__key"], sort=False)
    st.ops_pdf = pd.DataFrame({"delta": gb["delta"].sum()}).reset_index()
    st.v0 = {k: float(rng.randint(-20, 200)) for k in keys if rng.random() < 0.7}
    st.v0_ready = True
    return st


def _dc(st):
    dc = DriverCascade.__new__(DriverCascade)
    dc.states = [st]
    return dc


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_vec_refold_matches_scalar(case_idx):
    upd_sql, inv_sql = CASES[case_idx]
    comp = _mk_comp(upd_sql, inv_sql)
    for seed in range(40):
        rng = random.Random(seed * 101 + case_idx)
        st_s = _mk_state(rng, comp, n_keys=rng.randint(1, 8), n_links=rng.randint(1, 60))
        st_v = _StageState(ctx=st_s.ctx, comp=comp)
        st_v.ops_pdf = st_s.ops_pdf
        st_v.v0 = st_s.v0
        st_v.v0_ready = True
        dc_s, dc_v = _dc(st_s), _dc(st_v)
        st_v.vec = dc_v._vec_init(st_v)
        assert st_v.vec, "workload unexpectedly not vec-eligible"
        all_keys = list(st_s.ops_pdf["__key"].unique())
        excluded: set = set()
        for _round in range(rng.randint(1, 3)):
            # replace-then-append: re-touch a random key subset under a
            # randomly mutated exclusion set each round
            excluded = excluded ^ set(rng.sample(range(60), rng.randint(0, 6)))
            touched = rng.sample(all_keys, rng.randint(1, len(all_keys)))
            excl_arr = np.sort(np.fromiter(excluded, dtype=np.int64, count=len(excluded)))
            # scalar path
            dc_s._ensure_chains(st_s, touched)
            for key in touched:
                st_s.overrides[key] = dc_s._refold_key(st_s, key, excluded)
            dc_s._update_ov_links(st_s, set(touched))
            # vec path
            aff = dc_v._refold_keys_vec(
                st_v, np.asarray(touched, dtype=object), excl_arr
            )
            # link-for-link comparison, (key, tid, pos)-indexed
            want = sorted(
                (key, tid, pos, vote, round(val, 9), wr)
                for key, links in st_s.overrides.items()
                for tid, vote, val, pos, wr in links
            )
            got = sorted(
                (k, int(t), int(p), int(vo), round(float(va), 9), bool(w))
                for k, t, vo, va, p, w in zip(
                    st_v.ov_flat["key"],
                    st_v.ov_flat["_tid"],
                    st_v.ov_flat["vote"],
                    st_v.ov_flat["value"],
                    st_v.ov_flat["_ord"],
                    st_v.ov_flat["wr"],
                )
            )
            assert got == want, (case_idx, seed, _round)
            # affected = exactly the refolded (touched) keys' chain tids;
            # earlier-round overrides of untouched keys are not re-reported
            assert sorted(int(t) for t in aff) == sorted(
                {int(t) for key in touched for t, *_ in st_s.overrides[key]}
            )


def test_vec_compile_gate():
    """Null/error-channel constructs must refuse vec compilation."""
    for sql in (
        "`/`(acc.value, x.delta)",          # ANSI divide error channel
        "`%`(acc.value, x.delta)",
        "CASE WHEN `>`(x.delta, 0) THEN acc.value END",  # no ELSE -> NULL
        "NULL",
        "acc.value IS NULL",
    ):
        with pytest.raises(Ineligible):
            compile_fragment(sql, ["delta"], vec=True)
    # and the invariant scope must reject accumulator references
    with pytest.raises(Ineligible):
        compile_fragment("`+`(acc.value, 0.0)", ["delta"], vec=True, forbid_acc=True)
    # while the same fragments stay compilable in scalar mode
    compile_fragment("`/`(acc.value, x.delta)", ["delta"])
    compile_fragment("CASE WHEN `>`(x.delta, 0) THEN acc.value END", ["delta"])


def test_vec_ineligible_on_none_default():
    """A namespace created with the API default (default=None) must
    fall back to the scalar fold, not crash float(None) — round-10
    review finding: the epoch close raised TypeError on the first
    cascade round for such graphs."""
    comp = _mk_comp("`+`(acc.value, x.delta)", None)
    rng = random.Random(7)
    st = _mk_state(rng, comp, n_keys=3, n_links=12)
    st.ctx.ns.default = None
    assert _dc(st)._vec_init(st) is False


def test_vec_ineligible_on_integer_record_column():
    """Integer deltas must fall back to the scalar fold even under
    2^53: Spark and the scalar fold evaluate record-only integer
    sub-expressions exactly and round once, while the numpy twin
    rounds per float64 op (delta=190000003 diverges delta*delta+delta
    in the last ulp) — round-10 review finding."""
    comp = _mk_comp(
        "`+`(acc.value, `+`(`*`(x.delta, x.delta), x.delta))", None
    )
    rng = random.Random(11)
    st = _mk_state(rng, comp, n_keys=2, n_links=8)
    st.ops_pdf["delta"] = pd.Series(
        [190000003] * len(st.ops_pdf), dtype="int64"
    )
    assert _dc(st)._vec_init(st) is False
    # the float-typed path stays eligible (the bench workloads' shape)
    st2 = _mk_state(rng, comp, n_keys=2, n_links=8)
    assert _dc(st2)._vec_init(st2) is not False
