#!/bin/bash
# Flagship CE half with auto-retry: the tunnel intermittently drops an RPC
# and freezes the jax client (3 hangs on 2026-08-22). Epochs are ~8 s, so
# a metrics stream stale for 7+ min is decisively hung, not compiling
# (compiles only precede the FIRST event; grace covers those). Runs are
# deterministic per (seed, run), so a retry reproduces the same
# trajectories; the last complete attempt's printed result is the row's
# baseline branch.
cd /root/repo || exit 1
MET="out/metrics/dt822_ogbn-products_id90_baseline_coteaching_sage_noise_rand_pair0.3_lay3_hid256_lr0.001_epo50_bs512_drop0.5_tk15_cttau1.2_neigh15105.jsonl"
OV='{"base": "config_products.yml", "ov": {"train_type": "baseline", "compare_loss": "normal", "num_runs": 5, "batch_id": 90, "exact_leaf": true}}'

for ATT in 1 2 3 4; do
  echo "=== CE attempt $ATT $(date -u +%H:%M:%S)" >> out/flagship_ce.err
  python tools/evidence.py --one "$OV" > out/flagship_ce.json 2>> out/flagship_ce.err &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 45
    NOW=$(date +%s)
    LAST=$(stat -c %Y "$MET" 2>/dev/null || echo 0)
    if [ "$LAST" -gt "$START" ]; then REF=$LAST; LIMIT=420; else REF=$START; LIMIT=1200; fi
    if [ $((NOW - REF)) -gt "$LIMIT" ]; then
      KIDS=$(cat /proc/$PID/task/*/children 2>/dev/null)
      echo "CE WATCHDOG: attempt $ATT stale $((NOW - REF))s, kill $PID $KIDS" >> out/flagship_ce.err
      kill $PID $KIDS 2>/dev/null; sleep 5; kill -9 $PID $KIDS 2>/dev/null
      break
    fi
  done
  wait "$PID"
  RC=$?
  echo "=== CE attempt $ATT rc=$RC $(date -u +%H:%M:%S)" >> out/flagship_ce.err
  if [ "$RC" -eq 0 ] && grep -q '"baseline"' out/flagship_ce.json 2>/dev/null; then
    echo "=== CE DONE $(date -u +%H:%M:%S)" >> out/flagship_ce.err
    exit 0
  fi
  sleep 30
done
echo "=== CE FAILED all attempts $(date -u +%H:%M:%S)" >> out/flagship_ce.err
exit 1
