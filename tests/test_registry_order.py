"""Driver-window ordering policy (registry._ordered): high-risk
mechanisms first, then entries with no driver evidence, then entries
whose last driver run was red, then the rest by staleness (oldest
driver evidence first) — so a new or last-known-broken entry can never
sit outside the checked window indefinitely, and the stable suite
cycles through it without starving (round-4 verdict, "What's wrong" #3).
"""

from __future__ import annotations

from t_spoon_spark import registry


def test_priority_order_high_never_red_then_stalest(monkeypatch):
    registry._load_all()
    names = list(registry._REGISTRY)
    high = [n for n in names if n.startswith(registry._HIGH_RISK_PREFIXES)]
    non_high = [n for n in names if n not in set(high)]
    never, red, stale, fresh = non_high[0], non_high[1], non_high[2], non_high[3]

    last_round = {n: 4 for n in names if n != never}
    last_round[stale] = 1  # oldest evidence
    last_round[red] = 4
    monkeypatch.setattr(
        registry, "_correctness_history", lambda: (last_round, {red}, 5)
    )
    ordered = [e.name for e in registry._ordered()]

    n_high = len(high)
    assert set(ordered[:n_high]) == set(high)
    assert ordered[n_high] == never
    assert ordered[n_high + 1] == red
    # the stalest stable entry leads the remainder
    assert ordered[n_high + 2] == stale
    assert ordered.index(stale) < ordered.index(fresh)
    assert len(ordered) == len(names) == len(set(ordered))


def test_checked_entries_cycle_to_the_back(monkeypatch):
    """An entry checked in the latest round becomes the freshest and
    moves behind everything with older evidence — the self-balancing
    rotation."""
    registry._load_all()
    names = list(registry._REGISTRY)
    non_high = [n for n in names if not n.startswith(registry._HIGH_RISK_PREFIXES)]
    a, b = non_high[0], non_high[1]

    hist_a_old = {n: 3 for n in names}
    hist_a_old[a] = 1
    monkeypatch.setattr(
        registry, "_correctness_history", lambda: (hist_a_old, set(), 4)
    )
    o1 = [e.name for e in registry._ordered()]
    assert o1.index(a) < o1.index(b)

    hist_a_fresh = {n: 3 for n in names}
    hist_a_fresh[b] = 1
    monkeypatch.setattr(
        registry, "_correctness_history", lambda: (hist_a_fresh, set(), 4)
    )
    o2 = [e.name for e in registry._ordered()]
    assert o2.index(b) < o2.index(a)
