"""Driver-window rotation policy: oldest-verdict-first is arithmetically
sound (VERDICT.md round 6, ask #2).

The driver checks only the first ``_DRIVER_SLOTS`` registry entries per
round; with N declared queries the policy must guarantee every query a
driver verdict at least every ceil(N/S) rounds. These tests pin:

* the bound itself, by simulating the policy for many rounds from several
  adversarial starting histories (including the real one on disk);
* the live registry invariants — never-checked queries sort first, verdict
  rounds are nondecreasing along the declared order, determinism;
* that the policy is a pure function of the CORRECTNESS records (no
  hand-curated lists left to drift).
"""

from __future__ import annotations

import math

from cehrbert_data_spark.queries import (
    _DRIVER_SLOTS,
    all_oracles,
    all_queries,
    rotation_order,
    verdict_history,
)


def _simulate(names, hist, slots, rounds, start_round):
    """Run the policy: each round, check the first ``slots`` of the computed
    order and record the verdict. Returns max observed verdict age AFTER the
    warm-up period (every query has at least one simulated verdict by then)."""
    hist = dict(hist)
    period = math.ceil(len(names) / slots)
    max_age = 0
    for offset in range(rounds):
        rnd = start_round + offset
        order = rotation_order(names, hist)
        for name in order[:slots]:
            hist[name] = rnd
        if offset >= period:  # warm-up: every query now has a simulated verdict
            max_age = max(max_age, max(rnd - hist[n] for n in names))
    return max_age


def test_policy_bound_from_empty_history():
    names = [f"q{i:03d}" for i in range(115)]
    period = math.ceil(len(names) / _DRIVER_SLOTS)  # 3 for 115/50
    max_age = _simulate(names, {}, _DRIVER_SLOTS, rounds=20, start_round=1)
    assert max_age <= period - 1, (
        f"verdict age {max_age} exceeds the ceil(N/S)-1 = {period - 1} bound"
    )


def test_policy_bound_from_adversarial_histories():
    names = [f"q{i:03d}" for i in range(115)]
    period = math.ceil(len(names) / _DRIVER_SLOTS)
    adversarial = [
        # everything checked the same round: pure declaration-order ties
        {n: 5 for n in names},
        # deterministic scatter of stale/fresh verdicts
        {n: (i * 7) % 4 + 1 for i, n in enumerate(names)},
        # one pathological laggard plus a fresh majority
        {**{n: 6 for n in names}, names[-1]: 1},
    ]
    for hist in adversarial:
        max_age = _simulate(
            names, hist, _DRIVER_SLOTS, rounds=20, start_round=max(hist.values()) + 1
        )
        assert max_age <= period - 1


def test_policy_bound_on_real_registry_state():
    names = list(all_queries())
    hist = verdict_history()
    period = math.ceil(len(names) / _DRIVER_SLOTS)
    start = max(hist.values(), default=0) + 1
    max_age = _simulate(names, hist, _DRIVER_SLOTS, rounds=20, start_round=start)
    assert max_age <= period - 1


def test_never_checked_queries_fill_head_first():
    names = list(all_queries())
    hist = verdict_history()
    never = [n for n in names if n not in hist]
    head = names[:_DRIVER_SLOTS]
    # every never-checked query is in the driver window (or the window is
    # entirely never-checked queries, if there are more than S of them)
    for n in never[:_DRIVER_SLOTS]:
        assert n in head, f"never-driver-checked query {n} not promoted to head"


def test_declared_order_is_oldest_first():
    names = list(all_queries())
    hist = verdict_history()
    rounds = [hist.get(n, 0) for n in names]
    assert rounds == sorted(rounds), "registry order is not oldest-verdict-first"


def test_rotation_order_deterministic_and_total():
    names = [f"q{i}" for i in range(10)]
    hist = {"q3": 2, "q1": 1, "q7": 2}
    order1 = rotation_order(names, hist)
    order2 = rotation_order(list(names), dict(hist))
    assert order1 == order2
    assert sorted(order1) == sorted(names)
    # never-checked before checked; among checked, older first; ties by name
    assert order1[:7] == ["q0", "q2", "q4", "q5", "q6", "q8", "q9"]
    assert order1[7:] == ["q1", "q3", "q7"]


def test_rotation_ties_break_by_name_not_declaration_order():
    """The r10 verdict's reproducibility nit: the window's tie-class picks
    must re-derive from the CORRECTNESS records alone. Declaration order
    shifts when a query module is added to the merge list, so ties break by
    name — the computed order must be invariant to any permutation of the
    declared-name list."""
    names = ["zeta", "alpha", "mid", "beta"]  # declaration order != name order
    hist = {"mid": 1, "alpha": 1}
    order = rotation_order(names, hist)
    assert order == ["beta", "zeta", "alpha", "mid"]
    # permuting the declaration order (module reshuffle) changes nothing
    for perm in (list(reversed(names)), sorted(names), names[2:] + names[:2]):
        assert rotation_order(perm, hist) == order


def test_registry_shape():
    qs = all_queries()
    oracles = all_oracles()
    assert len(qs) >= 115
    assert set(oracles) <= set(qs)
    # every query in a CORRECTNESS record still exists (no silent renames
    # leaving stale history behind)
    for name in verdict_history():
        assert name in qs, f"CORRECTNESS record references unknown query {name}"
