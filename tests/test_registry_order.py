"""Driver-window ordering policy (registry._ordered): high-risk
mechanisms first, then entries with no driver evidence, then entries
whose last driver run was red, then the rotating stable tail — so a
new or last-known-broken entry can never sit outside the checked
window indefinitely (round-4 verdict, "What's wrong" #3).
"""

from __future__ import annotations

from t_spoon_spark import registry


def test_priority_order_high_never_red_rest(monkeypatch):
    registry._load_all()
    names = list(registry._REGISTRY)
    high = [n for n in names if n.startswith(registry._HIGH_RISK_PREFIXES)]
    non_high = [n for n in names if n not in set(high)]
    never, red = non_high[0], non_high[1]

    monkeypatch.setattr(
        registry,
        "_correctness_history",
        lambda: (set(names) - {never}, {red}, 3),
    )
    ordered = [e.name for e in registry._ordered()]

    n_high = len(high)
    assert set(ordered[:n_high]) == set(high)
    assert ordered[n_high] == never
    assert ordered[n_high + 1] == red
    assert len(ordered) == len(names)
    assert len(set(ordered)) == len(names)


def test_rotation_phase_advances_with_round_count(monkeypatch):
    # with every entry driver-green, the order is high + rotated rest;
    # the rotation phase must move with the round count so the stable
    # tail cycles through the checked window across rounds
    registry._load_all()
    all_names = {e.name for e in registry._REGISTRY.values()}
    orders = []
    for rounds in (1, 2):
        monkeypatch.setattr(
            registry, "_correctness_history", lambda r=rounds: (all_names, set(), r)
        )
        orders.append([e.name for e in registry._ordered()])
    o1, o2 = orders
    assert set(o1) == set(o2)
    assert o1 != o2  # the stable tail rotated between rounds
