"""Property parity for the incremental cascade vote merge.

`_merge_votes_delta` updates the global-vote frame for only the tids
affected by a round's refolded keys; `_merge_votes` recomputes it from
every stage's full link set.  They must agree EXACTLY after every round
of any cascade — this pins the delta path's correctness independent of
the end-to-end runner parity tests (which only exercise the workloads
they run).  Pure pandas: no Spark session, so the whole property sweep
is milliseconds per example.

Reference semantics being preserved: the global vote is a MAX lattice
over per-key link votes (tgraph/twopc/ReduceVotesFunction.java), with
`any_commit` flagging transactions holding at least one COMMIT link
(the dependency-contamination signal the cascade iterates on).
"""

from __future__ import annotations

import random
from types import SimpleNamespace

import pandas as pd

from t_spoon_spark.tx.driver_cascade import DriverCascade, _StageState
from t_spoon_spark.tx.vote import ABORT, COMMIT


def _mk_stage(rng, tids, keys, kind="chain_expr"):
    """A stage with one eval link per (tid, key) pair drawn randomly."""
    rows = []
    for tid in tids:
        for key in rng.sample(keys, rng.randint(1, min(3, len(keys)))):
            rows.append((key, tid, float(rng.randint(0, 9)),
                         rng.choice([COMMIT, ABORT]), 0, True))
    ep = pd.DataFrame(
        rows, columns=["key", "_tid", "value", "vote", "_ord", "__wr"]
    )
    st = _StageState(ctx=SimpleNamespace(kind=kind), comp=None)
    st.eval_pdf = ep
    # chains: fold order per key over the tids that touched it
    chains: dict = {}
    for key, tid in zip(ep["key"], ep["_tid"]):
        chains.setdefault(key, []).append((int(tid), {"delta": 1.0}))
    st.chains = chains
    return st


def _mk_ec_stage(rng, tids):
    ops = pd.DataFrame(
        {"_tid": [t for t in tids if rng.random() < 0.7], "__key": "k"}
    )
    st = _StageState(ctx=SimpleNamespace(kind="epoch_combine"), comp=None)
    st.ops_pdf = ops
    return st


def _dc(states):
    dc = DriverCascade.__new__(DriverCascade)
    dc.states = states
    return dc


def _simulate(seed: int, with_ec: bool):
    rng = random.Random(seed)
    tids = list(range(rng.randint(5, 40)))
    keys = [f"k{i}" for i in range(rng.randint(2, 8))]
    states = [
        _mk_stage(rng, tids, keys)
        for _ in range(rng.randint(1, 3))
    ]
    if with_ec:
        states.append(_mk_ec_stage(rng, tids))
    dc = _dc(states)

    all_tids = pd.Series(tids, dtype="int64")
    tid_index = pd.Index(all_tids)
    gv = dc._merge_votes(all_tids)
    excluded: set = set()
    for _round in range(rng.randint(1, 4)):
        # flip the exclusion status of a random slice of tids — since
        # the C9-replay fix the excluded set can both grow (new aborts)
        # and shrink (replays), and the delta contract must hold for any
        # status-change pattern
        changed = set(rng.sample(tids, rng.randint(1, 5)))
        if not changed:
            continue
        excluded = excluded ^ changed
        affected = set(changed)
        for st in dc.states:
            if st.ctx.kind == "epoch_combine":
                continue
            ep = st.eval_pdf
            touched = ep.loc[ep["_tid"].isin(changed), "key"].unique()
            tset = set()
            for key in touched:
                # refold: EVERY chain member re-votes (excluded links
                # evaluate without applying — their wr is False); any
                # votes are legal — the merge must be exact for ALL
                # link contents
                st.overrides[key] = [
                    (tid, rng.choice([COMMIT, ABORT]), 1.0, pos,
                     tid not in excluded and rng.random() < 0.8)
                    for pos, (tid, _rec) in enumerate(st.chains[key])
                ]
                tset.add(key)
                for tid, _rec in st.chains[key]:
                    affected.add(tid)
            dc._update_ov_links(st, tset)
        gv = dc._merge_votes_delta(gv, tid_index, affected)
        full = dc._merge_votes(all_tids)
        pd.testing.assert_frame_equal(
            gv[["_tid", "vote", "any_commit"]].reset_index(drop=True),
            full[["_tid", "vote", "any_commit"]].reset_index(drop=True),
            check_dtype=False,
        )


def test_delta_merge_matches_full_merge_chain_only():
    for seed in range(60):
        _simulate(seed, with_ec=False)


def test_delta_merge_matches_full_merge_with_epoch_combine():
    for seed in range(60):
        _simulate(seed + 1000, with_ec=True)


def test_ov_links_replace_then_append():
    """A key re-touched in a later round must have its earlier override
    links REPLACED, not duplicated, in the flat frame."""
    st = _StageState(ctx=SimpleNamespace(kind="chain_expr"), comp=None)
    dc = _dc([st])
    st.overrides["a"] = [(1, COMMIT, 1.0, 0, True), (2, ABORT, 1.0, 1, True)]
    dc._update_ov_links(st, {"a"})
    assert len(st.ov_links) == 2
    st.overrides["a"] = [(1, COMMIT, 1.0, 0, True)]
    st.overrides["b"] = [(3, COMMIT, 1.0, 0, True)]
    dc._update_ov_links(st, {"a", "b"})
    assert sorted(zip(st.ov_links["key"], st.ov_links["_tid"])) == [
        ("a", 1), ("b", 3)
    ]
