"""Driver correctness-window ordering (VERDICT r4 #1).

The driver checks the first ~50 registry entries per round. The order is
generated from CORRECTNESS_r*.json history: never-driver-checked entries
first (statically deprioritized degenerate twins at the back of that
tier), then previously-checked entries oldest-round first. These tests
pin the generated-order invariants so registry growth can never again
push unchecked entries past the window.
"""

from whoosh_spark.entry_queries import (
    _WINDOW_DEPRIORITIZE,
    _correctness_history,
    _driver_window_order,
    registry,
)


def _tier(last, demoted, name):
    return last.get(name, 0.5 if name in demoted else 0.0)


def test_registry_order_is_monotone_in_check_history():
    names = list(registry())
    last = _correctness_history()
    demoted = set(_WINDOW_DEPRIORITIZE)
    tiers = [_tier(last, demoted, n) for n in names]
    assert tiers == sorted(tiers), "registry order must be never-checked first, then oldest-checked"


def test_never_checked_entries_lead_the_window():
    names = list(registry())
    last = _correctness_history()
    if not last:  # fresh checkout: fallback order, nothing to assert
        return
    never = [n for n in names if n not in last and n not in set(_WINDOW_DEPRIORITIZE)]
    # every non-demoted never-checked entry must sit in the head
    # |never| slots — i.e. before anything already checked.
    assert set(names[: len(never)]) == set(never)


def test_deprioritized_twins_follow_the_never_checked_tier():
    names = list(registry())
    last = _correctness_history()
    if not last:
        return
    demoted_present = [n for n in _WINDOW_DEPRIORITIZE if n in names and n not in last]
    checked_positions = [i for i, n in enumerate(names) if n in last]
    for n in demoted_present:
        assert names.index(n) < min(checked_positions, default=len(names))


def test_fallback_order_without_history(monkeypatch):
    import whoosh_spark.entry_queries as eq

    monkeypatch.setattr(eq, "_correctness_history", lambda: {})
    names = list(eq.registry())
    order = eq._driver_window_order(names)
    assert sorted(order) == sorted(names)
    head = [n for n in eq._WINDOW_FIRST if n in set(names)]
    assert order[: len(head)] == head


def test_order_is_a_permutation():
    names = list(registry())
    order = _driver_window_order(names)
    assert sorted(order) == sorted(names)
