#!/usr/bin/env bash
# On-hardware measurement chain, in dependency order, each under a timeout
# so a dying tunnel cannot wedge the session.  Run from the repo root with
# the TPU reachable:
#
#   bash tools/hardware_day.sh [logdir]
#
# Results land in <logdir>/*.log (default /tmp/hwday).
#
# The round-4 pending A/Bs were all executed in round 5 and their
# decisions are merged (docs/PERF.md "Round-5 measured verdicts"):
# indexed_panels=True, words_multiple=64, u16 Mosaic-blocked, tile/chunk
# defaults confirmed optimal.  What REMAINS hardware-gated is the
# multi-chip story — on a real slice, `scaling` below measures pairs/s/chip
# vs device count (target ≥85% at N≥2, BASELINE.md) and the
# ppermute/compute overlap from the trace; everything else is a regression
# re-check of the merged defaults.
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
run chip_probe     1200 python tools/chip_probe.py          # honest kernel ms (8->32 chains)
run tune_100k      2400 python tools/tune_pallas.py         # regression re-check of defaults
run tune_long      2400 python tools/tune_pallas.py --long
run bench          1800 env BENCH_BUDGET_S=1500 python bench.py
run scaling        2400 python tools/scaling_bench.py       # THE multi-chip measurement
run trace          1800 python tools/trace_report.py
echo "all done; logs in $LOGDIR"
