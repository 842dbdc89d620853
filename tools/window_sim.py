"""Simulate the driver's 50-query correctness window at HEAD.

Every round's slot arithmetic (own-changed/new first, then
oldest-green-first drains) has been re-derived inline; this commits
the simulation so the budget check is one command:

    python tools/window_sim.py [window_size]

Prints the window's vintage composition, the fronted (new/own-changed)
queries, and — the planning number — how many of the OLDEST cohort
fall outside the window (must be 0 before registering another query,
or the drain the verdict demands slips a round).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def main() -> int:
    from etl_sales_pandas_sqlserver_spark.plans.rotation import (
        Fingerprinter,
        load_manifest,
        ordered_names,
        worktree_reader,
    )
    from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import (
        QUERIES,
    )

    order = ordered_names(QUERIES)
    man = load_manifest()
    window, rest = order[:WINDOW], order[WINDOW:]

    # own-fingerprint audit: exactly the queries that FRONT (tier 1 of
    # the rotation sort) — the round's slot spend, printed so the
    # budget check needs no hand-rolled script
    fper = Fingerprinter(worktree_reader)
    own_changed: list[tuple[str, str, str]] = []
    for name, (fn, _sql) in QUERIES.items():
        e = man.get(name) or {}
        own = fper.query_own_fingerprint(fn.__module__, fn.__qualname__)
        # Two distinct triggers, printed apart so a stale manifest is
        # visible: "head-stale" = the manifest's head_* field no longer
        # matches the worktree (regenerate the manifest to clear);
        # "changed-since-green" = the code really differs from what the
        # last green round verified (a genuine slot spend).
        head_stale = e.get("head_own_fingerprint") != own
        changed = bool(e.get("own_fingerprint")) and e["own_fingerprint"] != own
        if head_stale or changed:
            lg = e.get("last_green_round")
            why = "changed-since-green" if changed else "head-stale"
            own_changed.append((f"r{lg}" if lg else "new", name, why))
    if own_changed:
        oldest_v = min(
            (e["last_green_round"] for e in man.values()), default=0
        )
        spend = sum(
            1 for v, _, _ in own_changed if v != f"r{oldest_v}"
        )
        print(
            f"own-changed (fronting) [{len(own_changed)}; "
            f"{spend} non-r{oldest_v} = slot spend]:"
        )
        for v, n, why in sorted(own_changed):
            print(f"  {v:>4} {n} [{why}]")

    def vintage(name: str) -> str:
        e = man.get(name)
        return "new" if e is None else f"r{e['last_green_round']}"

    comp = Counter(vintage(n) for n in window)
    print(f"registry: {len(order)} queries; window: {WINDOW}")
    print("window vintages:", dict(sorted(comp.items())))
    fronted = [n for n in window if n not in man]
    if fronted:
        print(f"never-verified (new) in window [{len(fronted)}]:",
              ", ".join(fronted))

    outside = Counter(vintage(n) for n in rest)
    print("outside window:", dict(sorted(outside.items())))
    oldest = min(
        (e["last_green_round"] for e in man.values()), default=None
    )
    if oldest is not None:
        stranded = [
            n for n in rest
            if n in man and man[n]["last_green_round"] == oldest
        ]
        print(
            f"oldest cohort r{oldest} stranded outside window: "
            f"{len(stranded)}"
            + (f" — {', '.join(stranded)}" if stranded else "")
        )
        if stranded:
            print("WARNING: the oldest cohort no longer drains this "
                  "round; remove/verify own-changed queries first")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
