"""Property-based checks for the round-7 primitives — no Spark session
needed; the oracle gate covers the real corpus, these pin the
algorithmic cores on adversarial shapes:

1. The BPE delimited-string merge (`replace('|a||b|', '|ab|')`) against
   a reference greedy left-to-right fold over the symbol list — the
   boundary-safety of the encoding (a merge must never fire across a
   symbol boundary) and the non-overlapping greedy semantics are
   exactly what Python's ``str.replace`` shares with Spark's
   ``replace`` and DuckDB's ``replace`` (all three scan left-to-right,
   consuming matches).

2. The prefix-filter pigeonhole bounds: any pair with Jaccard >= tau
   shares a prefix element (symmetric), and any pair with containment
   C(A->B) >= tau shares an element of A's prefix (asymmetric) — the
   completeness arguments dedup_prefix_filter_jaccard and
   dedup_containment_join rest on.

3. The sign-bit signature: Hamming distance on the packed 2x32-bit
   words equals the number of dimensions whose signs disagree.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

SYM = st.text(alphabet="ab", min_size=1, max_size=3)


def _delim(syms: list[str]) -> str:
    return "".join(f"|{s}|" for s in syms)


def _greedy_merge(syms: list[str], lhs: str, rhs: str) -> list[str]:
    """Reference: one left-to-right non-overlapping merge pass."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    syms=st.lists(SYM, min_size=1, max_size=12),
    lhs=SYM,
    rhs=SYM,
)
@settings(max_examples=300, deadline=None)
def test_bpe_delimited_replace_equals_greedy_fold(syms, lhs, rhs):
    got = _delim(syms).replace(f"|{lhs}||{rhs}|", f"|{lhs}{rhs}|")
    assert got == _delim(_greedy_merge(syms, lhs, rhs))


@given(
    a=st.sets(st.integers(0, 60), min_size=1, max_size=25),
    b=st.sets(st.integers(0, 60), min_size=1, max_size=25),
    tau=st.integers(1, 100),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_pigeonhole_bounds(a, b, tau):
    # rarest-first here = any fixed total order; use sorted()
    def prefix(s, t):
        ordered = sorted(s)
        keep = len(s) - math.ceil(len(s) * t / 100.0) + 1
        return set(ordered[: max(int(keep), 0)])

    inter = len(a & b)
    jac = inter * 100 // len(a | b)
    if jac >= tau:
        assert prefix(a, tau) & prefix(b, tau), (a, b, tau)
    cont = inter * 100 // len(a)
    if cont >= tau:
        assert prefix(a, tau) & b, (a, b, tau)
        # and the asymmetric length filter: |B| >= tau% of |A|
        assert len(b) * 100 >= len(a) * tau


@given(
    a=st.sets(st.integers(0, 60), min_size=1, max_size=25),
    b=st.sets(st.integers(0, 60), min_size=1, max_size=25),
    tau=st.integers(1, 100),
)
@settings(max_examples=300, deadline=None)
def test_index_prefix_pigeonhole_bound(a, b, tau):
    """PPJoin indexing/probing asymmetry (optimization r15,
    queries/dedup2.py): for a qualifying pair oriented so |x| <= |y|
    (ties broken consistently), x's shorter INDEX prefix
    (sz - ceil(2*tau*sz/(100+tau)) + 1) still intersects y's probing
    prefix — the candidate generation that joins only index-side x
    rows against probe-side y rows loses nothing at the threshold."""

    def take(s, keep):
        return set(sorted(s)[: max(int(keep), 0)])

    x, y = (a, b) if (len(a), min(a)) <= (len(b), min(b)) else (b, a)
    if len(x) > len(y):
        x, y = y, x
    inter = len(x & y)
    jac = inter * 100 // len(x | y)
    if jac >= tau:
        ix = len(x) - math.ceil(len(x) * 2 * tau / (100.0 + tau)) + 1
        py = len(y) - math.ceil(len(y) * tau / 100.0) + 1
        assert take(x, ix) & take(y, py), (x, y, tau)
        # the length filter the candidate join applies alongside it
        assert len(x) * 100 >= len(y) * tau


@given(v=st.lists(st.integers(-5, 5), min_size=64, max_size=64))
@settings(max_examples=200, deadline=None)
def test_signature_hamming_counts_sign_disagreements(v):
    def words(x):
        w0 = sum(1 << i for i in range(32) if x[i] > 0)
        w1 = sum(1 << i for i in range(32) if x[32 + i] > 0)
        return w0, w1

    ref = [1 if x > 0 else 0 for x in v]
    flipped = [-x for x in v]
    aw, bw = words(v), words(flipped)
    ham = bin(aw[0] ^ bw[0]).count("1") + bin(aw[1] ^ bw[1]).count("1")
    # flipping every sign disagrees exactly where the value is nonzero
    assert ham == sum(1 for x in v if x != 0)
    # self-distance is zero
    assert bin(aw[0] ^ aw[0]).count("1") + bin(aw[1] ^ aw[1]).count("1") == 0
