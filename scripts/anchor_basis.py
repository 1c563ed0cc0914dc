#!/usr/bin/env python3
"""Compute the closing-anchor basis from N full-run bench_full.json
files, applying the round-15 clean-run gate (Bench.anchorBasis,
BenchSpec-pinned): runs with more than MAX_CLEAN_RERUNS stall re-runs
are excluded from the median — the per-query stall machinery firing in
the double digits means the host window was bad for the whole run, and
admitting it into a median-of-3 drags the committed anchor (round 14:
one 18-re-run 343.5 s window vs two clean runs at 288.5/303.9). With
fewer than two clean runs the gate can't adjudicate and the median of
ALL runs is used (and flagged).

Usage:
    python3 scripts/anchor_basis.py /tmp/bench_full_run1.json \
        /tmp/bench_full_run2.json /tmp/bench_full_run3.json

Prints each run's engine total + re-run count, which runs the gate
excluded, and the anchor (median of the basis). The MEDIAN-RUN file
among the basis is what gets committed as bench_full.json (its
per-query values are the next round's stall thresholds).
"""
import json
import statistics
import sys

MAX_CLEAN_RERUNS = 6  # keep in sync with Bench.MaxCleanAnchorReruns


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        runs.append((p, float(d["value"]), int(d.get("reruns", 0)),
                     int(d.get("failed", 0))))
    for p, v, r, fl in runs:
        print(f"  {v:8.2f} s  reruns={r:3d}  failed={fl}  {p}")
    # a failed run is refused outright (round-16 advice: "clean" now
    # folds failed==0 in; the basis must apply the same rule) — its
    # total omits the failed query's cost, so it is not comparable
    for p, _, _, fl in runs:
        if fl > 0:
            print(f"gate: REFUSING failed run {p} (failed={fl})")
    runs = [(p, v, r) for p, v, r, fl in runs if fl == 0]
    # an explicit refusal beats a StatisticsError traceback when the
    # failed-run gate refused every input (round-17 advice)
    if not runs:
        sys.exit("all runs refused (failed>0 in every input) — "
                 "no basis; collect clean runs first")
    clean = [(p, v) for p, v, r in runs if r <= MAX_CLEAN_RERUNS]
    if len(clean) >= 2:
        basis = clean
        excluded = [p for p, _, r in runs if r > MAX_CLEAN_RERUNS]
        if excluded:
            print(f"gate: excluded {len(excluded)} stall-heavy "
                  f"run(s): {excluded}")
        else:
            print("gate: all runs clean")
    else:
        basis = [(p, v) for p, v, _ in runs]
        print(f"gate: fewer than two clean runs — falling back to the "
              f"median of ALL {len(basis)} runs (flagged)")
    vals = sorted(v for _, v in basis)
    anchor = statistics.median(vals)
    # the basis run closest to the anchor is the one to commit
    commit = min(basis, key=lambda pv: abs(pv[1] - anchor))
    print(f"anchor (median of {len(basis)}-run basis): {anchor:.2f} s")
    print(f"commit this run's bench_full.json: {commit[0]} "
          f"({commit[1]:.2f} s)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
