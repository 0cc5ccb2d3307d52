#!/usr/bin/env bash
# Round-4 pending on-hardware measurements (docs/PERF.md "Pending on-hardware
# A/B") in dependency order, each under a timeout so a dying tunnel cannot
# wedge the session.  Run from the repo root with the TPU reachable:
#
#   bash tools/hardware_day.sh [logdir]
#
# Results land in <logdir>/*.log (default /tmp/hwday).  Decisions (flip
# KingConfig.indexed_panels, words_multiple default, chunk/vmem defaults,
# u16 verdict) stay MANUAL — see PERF.md for the decision rules.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/hwday}"   # relative paths resolve under the repo root
mkdir -p "$LOGDIR"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  tail -n 25 "$LOGDIR/$name.log"
  echo "=== $name exit=$rc ==="
}

run tpu_smoke       900 python tools/tpu_smoke.py
run ab_indexed_u16 2400 python tools/ab_indexed_u16.py
run tune_long      2400 python tools/tune_pallas.py --long
run tune_100k      2400 python tools/tune_pallas.py
run bench          1800 python bench.py
run scaling        1200 python tools/scaling_bench.py
echo "all done; logs in $LOGDIR"
