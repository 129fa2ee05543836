#!/bin/bash
# Round-5 campaign, take 3: remaining rows after the flagship recovery.
# Same hang watchdog as take 2, plus per-row RETRIES — the products rows
# now carry ckpt_every/resume overrides (tools/evidence.py MATRIX_BIG), so
# a kill+relaunch resumes from the last checkpoint instead of restarting.
# Waits for the resilient flagship-CE runner (one TPU process at a time).
cd /root/repo || exit 1

CE_PID="$1"
while [ -n "$CE_PID" ] && [ -e "/proc/$CE_PID" ]; do sleep 30; done

probe_tunnel() {
  for _ in 1 2 3 4 5 6; do
    timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >/dev/null 2>&1 && return 0
    echo "tunnel probe failed; retry in 240s $(date -u +%H:%M:%S)"
    sleep 240
  done
  return 1
}

run_row_retry() {
  ROW="$1"; TRIES="$2"; STALE="$3"; GRACE="$4"
  for T in $(seq 1 "$TRIES"); do
    echo "=== ROW $ROW try $T $(date -u +%H:%M:%S)"
    python tools/evidence.py --only "$ROW" --tag r5s --out out/RESULTS_scratch.md &
    PID=$!
    START=$(date +%s)
    KILLED=0
    while kill -0 "$PID" 2>/dev/null; do
      sleep 45
      NOW=$(date +%s)
      LATEST=$(find out/metrics -type f -name '*.jsonl' -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1)
      LATEST=${LATEST:-0}
      if [ "$LATEST" -gt "$START" ]; then REF=$LATEST; LIMIT=$STALE; else REF=$START; LIMIT=$GRACE; fi
      if [ $((NOW - REF)) -gt "$LIMIT" ]; then
        KIDS=$(cat /proc/$PID/task/*/children 2>/dev/null)
        GKIDS=""
        for c in $KIDS; do GKIDS="$GKIDS $(cat /proc/$c/task/*/children 2>/dev/null)"; done
        echo "WATCHDOG: '$ROW' try $T stale $((NOW - REF))s; killing $PID $KIDS $GKIDS $(date -u +%H:%M:%S)"
        kill $PID $KIDS $GKIDS 2>/dev/null
        sleep 5
        kill -9 $PID $KIDS $GKIDS 2>/dev/null
        KILLED=1
        break
      fi
    done
    wait "$PID" 2>/dev/null
    echo "=== ROW $ROW try $T done killed=$KILLED $(date -u +%H:%M:%S)"
    if [ "$KILLED" -eq 0 ]; then return 0; fi
    probe_tunnel || echo "WATCHDOG: tunnel still dead after probes"
  done
  return 1
}

{
  run_row_retry "ct_tau" 3 420 1800
  run_row_retry "grid search" 2 900 2400
  run_row_retry "selection analysis" 2 900 2400

  echo "=== pregather probe $(date -u +%H:%M:%S)"
  timeout 3600 python tools/exp_pregather.py > out/pregather_r5.json 2> out/pregather_r5.err
  echo "=== pregather rc=$? $(date -u +%H:%M:%S)"
  probe_tunnel

  run_row_retry "100-epoch" 4 420 1800
  echo "=== ALL DONE $(date -u +%H:%M:%S)"
} >> out/evidence_r5.log 2>&1
