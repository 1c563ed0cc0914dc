#!/usr/bin/env bash
# Closing-battery harness (round-16 verdict items 1 + 5): run N full
# bench passes with the host-health preflight gate enabled, preserving
# each run's bench_full.json and restoring the committed per-query
# anchors between runs (Bench reads the committed file as stall-re-run
# thresholds BEFORE overwriting it). A run the preflight skips costs
# ~10 s instead of the ~6 min the round-16 battery paid per discarded
# degraded-window run (4 of its 8 runs were gate-excluded after the
# fact).
#
# Usage: scripts/bench_battery.sh [N_RUNS] [OUT_DIR] [START_INDEX]
# Then:  python3 scripts/anchor_basis.py OUT_DIR/bench_full_run*.json
# START_INDEX lets a battery be extended run-by-run (degraded-host
# rule: keep going until >=2 clean runs) without clobbering earlier
# runs' artifacts.
set -u
N="${1:-4}"
OUT="${2:-/tmp/battery}"
START="${3:-1}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
# ANCHOR-GRADE preflight band, read from its ONE source of truth:
# Bench.AnchorPreflightBandSec (the in-code PreflightBandSec 1.5 s is
# the looser stall-grade default — the two-band rationale lives in the
# Bench scaladoc). Override per-battery via SPARK_GRAFT_PREFLIGHT_BAND
# if the host is legitimately busy all day.
DEFAULT_BAND="$(grep -o 'AnchorPreflightBandSec = [0-9.]*' \
  src/main/scala/graft/Bench.scala | grep -o '[0-9.]*$')"
BAND="${SPARK_GRAFT_PREFLIGHT_BAND:-${DEFAULT_BAND:-0.6}}"
echo "preflight band: $BAND s (default from Bench.AnchorPreflightBandSec)"
mkdir -p "$OUT"
for i in $(seq "$START" $((START + N - 1))); do
  rm -rf target/scratch
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_PREFLIGHT_GATE=1 \
    SPARK_GRAFT_PREFLIGHT_BAND="$BAND" \
    sbt -batch "runMain graft.Bench" >"$OUT/bench$i.log" 2>&1
  if grep -q '"metric":"preflight_skip"' "$OUT/bench$i.log"; then
    echo "run $i: SKIPPED by preflight gate:" \
      "$(grep -o '"preflight_sec":[0-9.]*' "$OUT/bench$i.log" | head -1)"
    continue
  fi
  if [ -f bench_full.json ] && ! git diff --quiet -- bench_full.json; then
    cp bench_full.json "$OUT/bench_full_run$i.json"
    # bench_compact.json is untracked — naming it here would abort the
    # whole checkout with a pathspec error and leave the anchors
    # clobbered for the next run
    git checkout -- bench_full.json || true
    echo "run $i: $(grep -o '"value":[0-9.]*\|"reruns":[0-9]*\|"clean":[a-z]*\|"failed":[0-9]*\|"preflight_sec":[0-9.]*' \
      "$OUT/bench_full_run$i.json" | tr '\n' ' ')"
  else
    echo "run $i: NO ARTIFACT (crashed run?) — see $OUT/bench$i.log"
  fi
done
echo "== anchor basis over the collected runs =="
python3 scripts/anchor_basis.py "$OUT"/bench_full_run*.json 2>/dev/null ||
  echo "(fewer than one run collected, or anchor_basis.py refused)"
