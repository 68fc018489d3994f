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
