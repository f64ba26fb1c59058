#!/usr/bin/env python
"""Rotation-schedule audit for the driver's 50-key correctness window.

The external driver hash-checks only the FIRST 50 keys of
``queries()`` each round, and every registered key must re-green
within 5 rounds of its last green (the staleness bound the judge
audits). This script recomputes last-green per key from the committed
``CORRECTNESS_r*.json`` artifacts and reports:

  - keys whose last green is >= (bound-1) rounds old that are NOT in
    the current window (these become contract debt next round);
  - the cohort that MUST rotate into the NEXT round's window;
  - window keys that are not registered (typos) and vice versa.

PERMANENTLY EXCLUDED from staleness checks: the two rows-only-by-
design keys (non-deterministic Spark-native sketches whose evidence
is their hash-green ``*_det`` twins + tests/test_bounds.py) — see the
window note in okera_trino_spark/registry.py.

r14 (verdict #2): also emits a LOOKAHEAD SCHEDULE — a greedy
stalest-first simulation of the next ``--horizon`` windows under a
declared ``--new-keys-per-round`` budget (each simulated round: the
due-cohort is mandatory, the new-key budget is reserved, remaining
slots backfill the stalest keys). The run FAILS LOUDLY if any future
window would need more than 50 slots — the capacity arithmetic the
r13 verdict flagged (231 keys x 5-round bound vs 50 slots leaves ~19
slots of lifetime slack; an unbudgeted ~5 new keys/round breaches
near r17). The registry's new-key budget is the printed contract:
adding MORE keys than the budget in a round silently steals slack
from a later round, and this audit is where that shows up first.

r15 (verdict #3): the END-OF-ROUND state is now detected and handled.
Right after a round's artifacts land, the committed ``_PRIORITY`` is
still the JUST-GRADED window (>= 80% of its keys last-green at the
latest artifact round) while the due cohort for the next grading
round sits outside it — grading that stale window as "re-greens next
round" produced a false INFEASIBLE + exit 1 (reproduced on the
end-of-r14 tree). In that state the audit now simulates the grading
round's window REBUILD with the same greedy rule the lookahead uses
(due cohort first + new-key budget + stalest backfill) and prints the
cohort that the rebuild must include. Mid-round (window already
rebuilt, mostly not-yet-green keys) the actual window is graded and
an uncovered due key is still a hard failure.

Usage: python scripts/rotation_audit.py [--next-round N]
           [--horizon H] [--new-keys-per-round B]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STALENESS_BOUND = 5

#: Window-ineligible by design (see registry.py window note): their
#: driver check is rows-only and they are deliberately kept OUT of the
#: 50-key hash window; do not flag them as stale.
ROWS_ONLY_EXEMPT = frozenset({
    "q_agg_approx_distinct",
    "q_agg_approx_percentile",
})


def last_green_by_key() -> tuple[dict[str, int], int]:
    last: dict[str, int] = {}
    latest_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        latest_round = max(latest_round, rnd)
        for key, res in json.load(open(path)).items():
            # hash_match may be absent ONLY for the rows-only-by-design
            # keys; for every other key a missing hash_match must NOT
            # count as green (r12 ADVICE — an artifact that drops the
            # field would otherwise silently pass the staleness audit).
            hash_ok = (res.get("hash_match") is True
                       or (key in ROWS_ONLY_EXEMPT
                           and res.get("hash_match") is None)
                       ) if isinstance(res, dict) else False
            ok = (isinstance(res, dict) and res.get("rows_match")
                  and res.get("schema_match") and hash_ok)
            if ok:
                last[key] = max(last.get(key, 0), rnd)
    return last, latest_round


def lookahead_schedule(last: dict[str, int], registry_keys: set[str],
                       window: list[str], grading_round: int,
                       horizon: int, new_budget: int,
                       window_size: int = 50,
                       sim_rounds: int = 30,
                       ) -> tuple[bool, list[str], int | None]:
    """Simulate future windows greedily (stalest-first backfill,
    ``new_budget`` slots reserved per round for keys that don't exist
    yet). Lines are reported for ``horizon`` rounds, but the
    simulation runs ``sim_rounds`` ahead so a breach just past the
    horizon is still FOUND (r15 review: bumping the horizon 6 -> 8
    merely moved the blind spot — under any sustained positive budget
    the registry eventually hits the window_size x STALENESS_BOUND
    ceiling, and the audit must SAY where, not go quiet). Returns
    (feasible_within_horizon, report_lines, first_breach_round —
    None if no breach inside ``sim_rounds``).

    Assumes the CURRENT window re-greens at ``grading_round`` (the
    driver checks it this round); a red key would only make the
    schedule tighter, which the next run of this audit catches."""
    sim = {k: v for k, v in last.items() if k in registry_keys}
    for k in registry_keys:
        # A never-green key OUTSIDE the window gets the PESSIMISTIC
        # seed (immediately due next round) — treating it as "greening
        # now" would defer its due date 5 rounds and overstate the
        # schedule's slack (r14 review). In-window never-green keys
        # (new keys awaiting their first check) green this round via
        # the window loop below.
        sim.setdefault(k, grading_round - STALENESS_BOUND)
    for k in window:
        sim[k] = grading_round
    lines = []
    feasible = True
    first_breach = None
    n_new = 0
    for r in range(grading_round + 1,
                   grading_round + 1 + max(horizon, sim_rounds)):
        due = sorted(k for k, g in sim.items() if g + STALENESS_BOUND <= r)
        need = len(due) + new_budget
        in_horizon = r <= grading_round + horizon
        if need > window_size:
            if first_breach is None:
                first_breach = r
            if in_horizon:
                lines.append(
                    f"  r{r}: INFEASIBLE — {len(due)} due + {new_budget} "
                    f"new-key budget = {need} > {window_size} slots")
                feasible = False
            # keep simulating so the report shows the full horizon
            backfill = []
        else:
            rest = sorted((g, k) for k, g in sim.items() if k not in due)
            backfill = [k for _, k in rest[:window_size - need]]
            if in_horizon:
                lines.append(
                    f"  r{r}: {len(due)} due + {new_budget} new-key "
                    f"budget + {len(backfill)} backfill = "
                    f"{len(due) + new_budget + len(backfill)}/"
                    f"{window_size} (registry {len(sim)})")
        for k in due + backfill:
            sim[k] = r
        for _ in range(new_budget):
            n_new += 1
            sim[f"_new_r{r}_{n_new}"] = r
    return feasible, lines, first_breach


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--next-round", type=int, default=None,
                    help="round the CURRENT window will be graded in "
                         "(default: latest artifact round + 1)")
    ap.add_argument("--horizon", type=int, default=8,
                    help="rounds of lookahead schedule to simulate "
                         "(default 8 = a full staleness cycle plus "
                         "slack — r15 ADVICE: a 6-round horizon "
                         "passed while the breach sat at round 7)")
    ap.add_argument("--new-keys-per-round", type=int, default=3,
                    help="declared budget of NEW registry keys per "
                         "future round (the contract: stay within it)")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from okera_trino_spark.registry import _PRIORITY, load_all_queries

    registry = load_all_queries()
    window = list(registry)[:50]
    last, latest = last_green_by_key()
    grading_round = args.next_round or latest + 1

    bad_window = [k for k in _PRIORITY if k not in registry]
    if bad_window:
        print(f"ERROR: _PRIORITY keys not registered: {bad_window}")
        return 1

    never_green = sorted(k for k in registry
                         if k not in last and k not in ROWS_ONLY_EXEMPT
                         and k not in window)
    print(f"registered keys: {len(registry)}; window: {len(window)}; "
          f"latest artifact round: r{latest}; grading as r{grading_round}")
    if never_green:
        print(f"WARNING: {len(never_green)} key(s) never driver-green and "
              f"not in window: {never_green}")

    eligible = {k for k in registry if k not in ROWS_ONLY_EXEMPT}
    due = sorted(k for k, rnd in last.items()
                 if k in eligible and grading_round - rnd >= STALENESS_BOUND)
    uncovered = [k for k in due if k not in window]
    # END-OF-ROUND detection (r15, verdict #3): if the committed window
    # is the JUST-GRADED one (>= 80% of its keys last-green at the
    # latest artifact round) and the due cohort sits outside it, the
    # window simply hasn't been rebuilt yet — grade the REBUILD the
    # rotation note prescribes (due cohort + new-key budget + stalest
    # backfill, the lookahead's own greedy rule), not the stale list.
    frac_just = (sum(1 for k in window if last.get(k) == latest)
                 / max(1, len(window)))
    simulated = bool(uncovered) and frac_just >= 0.8
    if simulated:
        rest = sorted((g, k) for k, g in last.items()
                      if k in eligible and k not in due)
        slots = len(window) - len(due) - args.new_keys_per_round
        if slots < 0:
            print(f"ERROR: r{grading_round} rebuild infeasible — "
                  f"{len(due)} due + {args.new_keys_per_round} new-key "
                  f"budget > {len(window)} slots")
            return 1
        window_eff = due + [k for _, k in rest[:slots]]
        print(f"END-OF-ROUND state detected ({frac_just:.0%} of the "
              f"committed window last-green at r{latest}): simulating "
              f"the r{grading_round} window rebuild — {len(due)} due + "
              f"{args.new_keys_per_round} new-key budget + "
              f"{len(window_eff) - len(due)} backfill. The rebuilt "
              f"_PRIORITY MUST include the due cohort: {due}")
        # the rebuild's new keys green at grading_round and come due
        # STALENESS_BOUND rounds later — materialize them in the sim
        # or the lookahead undercounts the due set from
        # grading_round+5 on (r15 review)
        window_eff = window_eff + [
            f"_rebuild_new_r{grading_round}_{i + 1}"
            for i in range(args.new_keys_per_round)]
    else:
        window_eff = [k for k in window if k in eligible]

    debt = []
    for key, rnd in sorted(last.items()):
        if key not in eligible:
            continue
        age_after = grading_round - rnd
        if key in window_eff:
            continue  # re-greens this round
        if age_after >= STALENESS_BOUND:
            debt.append((key, rnd, age_after))
    if debt:
        print(f"STALE (out-of-window, age >= {STALENESS_BOUND} at "
              f"r{grading_round}):")
        for key, rnd, age in debt:
            print(f"  {key}  last green r{rnd}  age {age}")
    else:
        print("window OK: no out-of-window key reaches the bound "
              f"at r{grading_round}")

    must_next = sorted(
        k for k, rnd in last.items()
        if k in eligible and k not in window_eff
        and grading_round + 1 - rnd >= STALENESS_BOUND)
    print(f"must rotate into the r{grading_round + 1} window "
          f"({len(must_next)}): {must_next}")

    feasible, lines, first_breach = lookahead_schedule(
        {k: v for k, v in last.items() if k in eligible}, eligible,
        window_eff, grading_round,
        args.horizon, args.new_keys_per_round)
    print(f"lookahead (next {args.horizon} rounds, "
          f"{args.new_keys_per_round} new keys/round budget):")
    for ln in lines:
        print(ln)
    if not feasible:
        print("ERROR: lookahead schedule INFEASIBLE — shrink the "
              "registry (consolidate singleton keys) or lower the "
              "new-key budget before adding keys")
    elif first_breach is not None:
        # a sustained positive budget ALWAYS saturates the
        # window_size x STALENESS_BOUND ceiling eventually; the
        # contract is to say WHERE, not to go quiet past the horizon
        print(f"WARNING: schedule saturates BEYOND the horizon — "
              f"first INFEASIBLE round under a sustained "
              f"+{args.new_keys_per_round}/round budget is "
              f"r{first_breach} (eligible-registry ceiling = "
              f"window 50 x staleness bound {STALENESS_BOUND}). "
              f"Consolidate or lower the budget before r{first_breach}.")
    if never_green:
        print("ERROR: never-green keys outside the window are a "
              "contract violation (the driver can never re-green "
              "them) — rotate them in or remove them")
    return 1 if (debt or not feasible or never_green) else 0


if __name__ == "__main__":
    sys.exit(main())
