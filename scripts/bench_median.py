#!/usr/bin/env python3
"""Median-of-N standalone bench harness (round-7, verdict item 7).

The driver's per-round bench is one sample per query on a shared host
that charges multi-second stalls to arbitrary queries (17 stall re-runs
in the round-6 run; a contiguous regressed block q107-q110/q132-q135).
When a query lands >2x its BASELINE.md anchor in a driver run, this
script produces the number to adjudicate FROM: the per-query median of
N fresh-JVM runs, each a full cold start (new SparkSession, new scratch
generation, warm-up set, noop sink) via Bench's SPARK_GRAFT_BENCH_ONLY
knob.

Usage:
    python3 scripts/bench_median.py q107_iqr_outliers q132_quantized_topk
    python3 scripts/bench_median.py --n 5 --sf /root/testdata/sf0.1 q55_dup_clusters

Notes:
  - Pass FULL query names (as registered in SparkEntry.queries).
  - Shared-scratch families: each fresh JVM rebuilds the scratch, so an
    OWNER run times the honest build. To time a pure CONSUMER's
    read-only cost, include its owner in the same invocation (qNN order
    makes the owner pay, as in the full suite): e.g.
    `bench_median.py q107_iqr_outliers q113_winsorized_mean` times q113
    as the cheap CDF read it is in the suite.
  - Results print per query: n, min, median, max; medians are what
    BASELINE.md's re-attribution table records.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(queries, sf_dir, cpus):
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(queries)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = cpus
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(os.path.join(REPO, "bench_full.json")) as f:
        return json.load(f)["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+", help="full query names")
    ap.add_argument("--n", type=int, default=5, help="runs (default 5)")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    # each Bench invocation overwrites the repo's committed full-suite
    # bench_full.json with its subset map — save and restore it, or the
    # judge's per-query source silently becomes a 4-query artifact
    bf = os.path.join(REPO, "bench_full.json")
    orig = open(bf).read() if os.path.exists(bf) else None

    samples = {}  # short key -> [sec]

    def restore():
        # each Bench run overwrites bench_full.json with its subset map,
        # and Bench reads the file at STARTUP for its relative stall
        # thresholds — restore the committed anchors before EVERY run,
        # not just at the end, or runs 2..N compute their re-run rules
        # from run N-1's samples instead of the committed anchors
        if orig is not None:
            with open(bf, "w") as f:
                f.write(orig)
        elif os.path.exists(bf):
            os.remove(bf)

    try:
        for i in range(args.n):
            restore()
            qs = one_run(args.queries, args.sf, args.cpus)
            for k, v in qs.items():
                if v >= 0:
                    samples.setdefault(k, []).append(v)
            print(f"run {i + 1}/{args.n}: "
                  + " ".join(f"{k}={v:.2f}"
                             for k, v in sorted(qs.items())),
                  file=sys.stderr)
    finally:
        # final restore: never leave a subset artifact where the judge
        # (and Bench's threshold source) expects the full-suite map
        restore()

    print(f"{'query':<12} {'n':>3} {'min':>8} {'median':>8} {'max':>8}")
    for k in sorted(samples):
        s = sorted(samples[k])
        print(f"{k:<12} {len(s):>3} {s[0]:>8.3f} "
              f"{statistics.median(s):>8.3f} {s[-1]:>8.3f}")


if __name__ == "__main__":
    main()
