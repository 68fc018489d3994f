"""The rotation-policy invariants (OPERATORS.md capacity policy),
enforced by the suite instead of verified by hand each round: zero red
latest rows, nothing staler than the ⌈N/50⌉ bound unless it is in the
current window, and no registered entry silently dropped from the
rotation pipeline."""

from __future__ import annotations

import importlib.util
import os


def _audit():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "window_audit.py",
    )
    spec = importlib.util.spec_from_file_location("window_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.audit()


def test_rotation_policy_invariants():
    v = _audit()
    assert v["red_latest_rows"] == [], v
    assert v["stale_beyond_bound"] == [], v
    assert v["dropped_entries"] == [], v
    assert v["ok"], v


def test_freshness_histogram_is_bounded():
    v = _audit()
    bound = v["max_age_bound"]
    over = {
        k: c
        for k, c in v["freshness_histogram"].items()
        if int(k.split("_")[1]) > bound
    }
    assert not over, v


# ---- simulated-history regime tests (the capacity policy's validity
# range must outlive the corpus's planned growth — r11 VERDICT #4/#3:
# the audit computes ⌈N/50⌉ as a formula, so these pin that the N=200
# boundary, the N=201 regime change, and the designated-slip handoff
# exemption all behave without touching the live repo state) ----

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}


def _mod():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "window_audit.py",
    )
    spec = importlib.util.spec_from_file_location("window_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sim(n, rounds=4):
    """n entries rowed in 50-entry cohorts across `rounds` rounds
    (cohort c rowed in round c+1); entries beyond 50*rounds never
    rowed. Returns (queries, hist, cohorts)."""
    names = [f"e{i:03d}" for i in range(n)]
    queries = {name: (lambda spark, sf: None) for name in names}
    cohorts = [names[50 * c: 50 * (c + 1)] for c in range(rounds)]
    hist = {
        c + 1: {name: dict(GREEN) for name in cohorts[c]}
        for c in range(rounds)
    }
    return queries, hist, cohorts


def test_simulated_n200_steady_state_is_green():
    """N=200 is the last round of the ⌈N/50⌉=4 regime: with four
    50-entry cohorts aged 1–4 and the oldest cohort composed as the
    current window (greedy most-stale-first), the audit is green."""
    mod = _mod()
    queries, hist, cohorts = _sim(200)
    v = mod.audit(
        hist=hist, queries=queries,
        first_50=tuple(cohorts[0]), next_plan=(),
    )
    assert v["n_entries"] == 200 and v["max_age_bound"] == 4
    assert v["ok"], v
    assert v["freshness_histogram"] == {
        "age_1": 50, "age_2": 50, "age_3": 50, "age_4": 50,
    }


def test_simulated_n200_handoff_exemption():
    """The designated-slip handoff (ADVICE r11): the round-N artifact
    has landed but the round-(N+1) FIRST_50 swap has not, so the
    oldest cohort sits at EXACTLY the bound outside the live window.
    With those entries in the pre-composed next plan the audit stays
    green (and reports them); without the plan it goes red."""
    mod = _mod()
    queries, hist, cohorts = _sim(200)
    stale_window = tuple(cohorts[3])  # swap not landed: window = newest
    v = mod.audit(
        hist=hist, queries=queries,
        first_50=stale_window, next_plan=tuple(cohorts[0]),
    )
    assert v["ok"], v
    assert v["at_bound_exempt_via_next_plan"] == sorted(cohorts[0])
    v_no_plan = mod.audit(
        hist=hist, queries=queries,
        first_50=stale_window, next_plan=(),
    )
    assert not v_no_plan["ok"]
    assert v_no_plan["stale_beyond_bound"] == sorted(cohorts[0])


def test_simulated_beyond_bound_not_excused_by_plan():
    """Next-plan membership excuses ONLY age == bound — an entry that
    already blew past the bound is a policy violation no plan can
    retroactively fix."""
    mod = _mod()
    queries, hist, cohorts = _sim(200)
    # e000 was rowed one round earlier than its cohort and never since
    hist[0] = {"e000": dict(GREEN)}
    del hist[1]["e000"]
    v = mod.audit(
        hist=hist, queries=queries,
        first_50=tuple(cohorts[3]), next_plan=tuple(cohorts[0]),
    )
    assert not v["ok"]
    assert v["stale_beyond_bound"] == ["e000"]


def test_r13_handoff_projection_is_green():
    """The r12→r13 handoff, projected BEFORE it happens (the composer
    convention: prove the next round's audit state at composition
    time): take the real committed history through round 11, land a
    synthetic all-green round-12 artifact for exactly the r12 window,
    and audit with the live registry. The nineteen r12 slips sit at
    exactly the age bound and must be exempted through
    R13_FIRST_50_PLAN; nothing else may flag. Pinned to rounds ≤ 11 +
    synthetic r12 so the test stays stable after the real r12
    artifact lands."""
    import glob
    import json

    from sales_data_warehouse_spark.queries.corpus import (
        QUERIES,
        R12_FIRST_50_PLAN,
        R13_FIRST_50_PLAN,
    )

    mod = _mod()
    hist = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        if rnd <= 11:
            with open(path) as fh:
                hist[rnd] = json.load(fh)
    hist[12] = {name: dict(GREEN) for name in R12_FIRST_50_PLAN}
    v = mod.audit(
        hist=hist,
        queries=QUERIES,
        first_50=tuple(R12_FIRST_50_PLAN),
        next_plan=tuple(R13_FIRST_50_PLAN),
    )
    assert v["ok"], v
    # the nineteen r12 slips are exactly the at-bound exemptions
    assert len(v["at_bound_exempt_via_next_plan"]) == 19, v
    # pending-next-window in this simulated handoff: the r12
    # registration #170 (first in line in the r13 plan) plus any LIVE
    # registration made after the simulated point-in-time — #171
    # (registered in r13, first in line for r14) and #172 (registered
    # in r14, first in line for r15)
    assert v["never_rowed_pending_next_window"] == [
        "importance_model_report",
        "quality_classifier_scores",
        "quality_ngram_scores",
    ], v


def test_simulated_n201_regime_change():
    """At N=201 the bound relaxes to ⌈201/50⌉=5: the same four-cohort
    history that filled the N=200 regime is comfortably inside the
    bound even with a window that re-rows the NEWEST cohort, because
    age 4 < 5 — the policy's slips-per-round pressure resets exactly
    when the staleness regime widens (N−150 at 150<N≤200 becomes
    N−200 at 200<N≤250)."""
    mod = _mod()
    queries, hist, cohorts = _sim(201)
    v = mod.audit(
        hist=hist, queries=queries,
        first_50=tuple(cohorts[3]), next_plan=(),
    )
    assert v["max_age_bound"] == 5
    # the one never-rowed entry (e200) has no registration docstring,
    # so it is not "dropped"; staleness is green across the board
    assert v["stale_beyond_bound"] == []
    assert v["never_rowed_total"] == 1
    assert v["ok"], v
