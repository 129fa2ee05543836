#!/bin/bash
# Round-5 campaign, take 2: bench already validated (out/bench_r5.json).
# Adds a metrics-freshness watchdog: the known tunnel failure mode hangs a
# jax client forever mid-RPC (CLAUDE.md), which would otherwise burn a
# row's multi-hour timeout. Epoch cadence is ~10 s; if no out/metrics file
# is touched for STALE seconds (GRACE before the first event, covering
# dataset gen + cold compiles), kill the row's process tree by exact PID
# (never by pattern) and move on after re-probing the tunnel.
cd /root/repo || exit 1
mkdir -p out
STALE=1500
GRACE=2400

probe_tunnel() {
  for _ in 1 2 3 4 5 6; do
    timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1 && return 0
    echo "tunnel probe failed; retrying in 240s $(date -u +%H:%M:%S)"
    sleep 240
  done
  return 1
}

run_row() {
  ROW="$1"
  echo "=== ROW $ROW $(date -u +%H:%M:%S)"
  python tools/evidence.py --only "$ROW" --tag r5s --out out/RESULTS_scratch.md &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    LATEST=$(find out/metrics -type f -name '*.jsonl' -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1)
    LATEST=${LATEST:-0}
    if [ "$LATEST" -gt "$START" ]; then REF=$LATEST; LIMIT=$STALE; else REF=$START; LIMIT=$GRACE; fi
    if [ $((NOW - REF)) -gt "$LIMIT" ]; then
      KIDS=$(cat /proc/$PID/task/*/children 2>/dev/null)
      GKIDS=""
      for c in $KIDS; do GKIDS="$GKIDS $(cat /proc/$c/task/*/children 2>/dev/null)"; done
      echo "WATCHDOG: '$ROW' stale $((NOW - REF))s; killing $PID $KIDS $GKIDS $(date -u +%H:%M:%S)"
      kill $PID $KIDS $GKIDS 2>/dev/null
      sleep 5
      kill -9 $PID $KIDS $GKIDS 2>/dev/null
      probe_tunnel || echo "WATCHDOG: tunnel still dead after probes"
      break
    fi
  done
  wait "$PID" 2>/dev/null
  echo "=== ROW $ROW done rc=$? $(date -u +%H:%M:%S)"
}

{
  run_row "flagship"
  run_row "ct_tau"
  run_row "grid search"
  run_row "selection analysis"

  echo "=== pregather probe $(date -u +%H:%M:%S)"
  timeout 3600 python tools/exp_pregather.py > out/pregather_r5.json 2> out/pregather_r5.err
  echo "=== pregather rc=$? $(date -u +%H:%M:%S)"
  probe_tunnel

  run_row "100-epoch"
  echo "=== ALL DONE $(date -u +%H:%M:%S)"
} >> out/evidence_r5.log 2>&1
