"""Driver-window rotation audit: the OPERATORS.md capacity-policy
invariants, checked programmatically instead of by hand.

Reads every committed ``CORRECTNESS_r*.json`` plus the live registry
(``FIRST_50``, registration order) and verifies:

  1. GREEN HISTORY — every entry's LATEST hard driver row is green
     (rows_match, schema_match, and hash_match where present). A red
     latest row is the one thing the policy never tolerates.
  2. STALENESS BOUND — every previously-rowed entry either has a row
     within the last ``max_age`` rounds (⌈N/50⌉: 4 for 150 < N ≤ 200,
     5 for 200 < N ≤ 250 — the audit computes the formula, not a
     constant, so the bound tracks corpus growth), is in the CURRENT
     window (about to be re-rowed), or sits at EXACTLY the bound while
     appearing in the pre-composed next-round window plan
     (``R{round}_FIRST_50_PLAN`` — the designated-slip handoff: the
     round-N correctness artifact lands before the round-(N+1)
     ``FIRST_50`` swap is composed, and without this exemption the
     artifact commit itself would turn the tree red even though the
     slips are exactly where the policy wants them, first in line).
  3. NEVER-ROWED PIPELINE — a never-rowed entry must not outlive the
     "first in line for the next window" promise: its registration
     round comes from the entry docstring's "(round N, corpus entry
     #M)" convention, and a never-rowed entry registered in round R
     must be rowed by round R+1 — i.e. it is DROPPED once the round
     being built exceeds R+1 and it is still not in the current
     window. Entries without a parsable registration round are
     skipped (pre-convention registrations all carry rows).

Prints the freshness histogram (the OPERATORS.md table, derived rather
than hand-written) and one JSON verdict line; exits non-zero on any
violation so the round wrap-up can gate on it:

    python tools/window_audit.py
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history() -> dict[int, dict]:
    """round -> {entry: row} for every committed correctness file.
    Files matching the glob but not the strict ``_r<digits>.json``
    name (stray backups and the like) are skipped, not crashed on."""
    hist = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        with open(path) as fh:
            hist[int(m.group(1))] = json.load(fh)
    return hist


def row_green(row: dict) -> bool:
    """A hard driver row is green when every *_match flag it carries is
    true (hash_match is absent on rows-only checks — those count as
    green if rows/schema match, which is exactly the driver's weaker
    gate for non-SQL-expressible entries)."""
    flags = [v for k, v in row.items() if k.endswith("_match")]
    return bool(flags) and all(bool(v) for v in flags)


def audit(
    hist: dict[int, dict] | None = None,
    queries: dict | None = None,
    first_50: tuple | None = None,
    next_plan: tuple | None = None,
) -> dict:
    """The four injectable parameters exist for the suite's simulated
    histories (e.g. the N=200 regime test); the CLI passes none and
    audits the live repo."""
    from sales_data_warehouse_spark.queries import corpus

    if queries is None:
        queries = corpus.QUERIES
    if first_50 is None:
        first_50 = corpus.FIRST_50
    if hist is None:
        hist = load_history()
    if not hist:
        return {"ok": False, "error": "no CORRECTNESS files found"}
    current_round = max(hist) + 1  # the round being built now
    if next_plan is None:
        # the pre-composed window for the round being built, when the
        # composer has written it (the FIRST_50 swap may not have
        # landed yet — that is the exact gap the exemption covers)
        next_plan = getattr(
            corpus, f"R{current_round}_FIRST_50_PLAN", ()
        )
    n = len(queries)
    max_age = math.ceil(n / 50)

    latest: dict[str, int] = {}
    latest_green: dict[str, bool] = {}
    for rnd in sorted(hist):
        for name, row in hist[rnd].items():
            if name not in queries:
                continue  # renamed/retired entries are out of scope
            latest[name] = rnd
            latest_green[name] = row_green(row)

    red = sorted(k for k, v in latest_green.items() if not v)
    order = list(queries)
    window = set(first_50)
    planned_next = set(next_plan)

    stale = sorted(
        name
        for name, rnd in latest.items()
        if current_round - rnd > max_age - 1
        and name not in window
        # at EXACTLY the bound and already designated first-in-line in
        # the pre-composed next window: the handoff state between the
        # driver's round-N artifact landing and the round-(N+1) swap —
        # beyond the bound, next-window membership excuses nothing
        and not (
            current_round - rnd == max_age and name in planned_next
        )
    )
    never = [name for name in order if name not in latest]

    def registered_round(name: str) -> int | None:
        doc = (queries[name].__doc__ or "")
        m = re.search(r"\(round (\d+),\s+corpus\s+entry\s+#\d+", doc)
        return int(m.group(1)) if m else None

    dropped = sorted(
        name
        for name in never
        if name not in window
        and name not in planned_next
        and (r := registered_round(name)) is not None
        and current_round > r + 1
    )

    ages: dict[int, int] = {}
    for name, rnd in latest.items():
        ages[current_round - rnd] = ages.get(current_round - rnd, 0) + 1

    at_bound_exempt = sorted(
        name
        for name, rnd in latest.items()
        if current_round - rnd == max_age
        and name not in window
        and name in planned_next
    )
    verdict = {
        "ok": not (red or stale or dropped),
        "round_being_built": current_round,
        "n_entries": n,
        "max_age_bound": max_age,
        "at_bound_exempt_via_next_plan": at_bound_exempt,
        "red_latest_rows": red,
        "stale_beyond_bound": stale,
        "never_rowed_total": len(never),
        "never_rowed_pending_next_window": sorted(
            x for x in never if x not in window
        ),
        "never_rowed_in_current_window": sorted(
            x for x in never if x in window
        ),
        "dropped_entries": dropped,
        "freshness_histogram": {
            f"age_{a}": c for a, c in sorted(ages.items())
        },
    }
    return verdict


def main() -> int:
    v = audit()
    print(json.dumps(v, indent=1, sort_keys=True))
    return 0 if v.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
