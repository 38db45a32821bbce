#!/bin/bash
# Canary-gated scaling attempts (BENCH.md "scaling efficiency"
# methodology).  The VM's effective multi-core throughput swings >10x
# on minute-scale windows; an interleaved 2->8 attempt launched inside
# a depressed window measures the window, not the code.  This harness
# probes host health (scripts/host_canary.py) every PROBE_S seconds
# and fires one attempt (bench.py --scaling) only when TWO consecutive
# probes clear the gate — attempt 14 of the round showed a single
# healthy probe can precede a window that collapses before the legs
# run.  Every launched attempt is still reported in BENCH.md per the
# disclosed methodology; the gate only schedules, never filters
# results.
#
# Usage: scripts/gated_scaling.sh [MAX_ATTEMPTS] [MAX_MIN]
# Gate: eight_gbps >= GATE_EIGHT and steal_pct_under_load <= GATE_STEAL
# (calibration in host_canary.py: fast windows show eight >= ~20).
# NOTE: meaningless while anything else loads the host (pytest, bench,
# another Spark session) — the probe would read your own load.
cd "$(dirname "$0")/.."
MAX_ATTEMPTS=${1:-2}
MAX_MIN=${2:-75}
GATE_EIGHT=${GATE_EIGHT:-8}
GATE_STEAL=${GATE_STEAL:-2}
PROBE_S=${PROBE_S:-240}
CONFIRM_S=${CONFIRM_S:-60}
t_end=$(( $(date +%s) + MAX_MIN * 60 ))
done_n=0

probe_ok() {
  local c
  c=$(timeout 180 python scripts/host_canary.py 2>/dev/null)
  echo "canary: $c" >&2
  python - "$c" "$GATE_EIGHT" "$GATE_STEAL" <<'PY'
import json, sys
try:
    d = json.loads(sys.argv[1])
    ok = (d["eight_gbps"] >= float(sys.argv[2])
          and d["steal_pct_under_load"] <= float(sys.argv[3]))
    print(1 if ok else 0)
except Exception:
    print(0)
PY
}

while [ "$(date +%s)" -lt "$t_end" ] && [ "$done_n" -lt "$MAX_ATTEMPTS" ]; do
  if [ "$(probe_ok)" = "1" ]; then
    sleep "$CONFIRM_S"
    if [ "$(probe_ok)" = "1" ]; then
      echo "=== window OK twice, launching attempt $((done_n+1)) ==="
      SPARK_GRAFT_SCALE_N=2 SPARK_GRAFT_SCALE_REP=8 \
        SPARK_GRAFT_SCALE_ROUNDS=3 \
        timeout 2400 python bench.py --scaling 2>/dev/null | tail -1
      done_n=$((done_n+1))
    else
      echo "confirm probe failed — window shorter than ${CONFIRM_S}s"
    fi
  else
    sleep "$PROBE_S"
  fi
done
echo "gated-scaling finished: $done_n attempts"
