#!/bin/bash
# tau-0.5 co-teaching at the 100-epoch budget (2 runs, nalgo only): does
# mild discard still pay once the 50-epoch transient is gone? Paired
# against the CE-100 diagnostic's runs 0-1 by (seed, run) keying.
cd /root/repo || exit 1
MET="out/metrics/dt822_ogbn-products_id97_nalgo_coteaching_sage_noise_rand_pair0.3_lay3_hid256_lr0.001_epo100_bs512_drop0.5_tk15_cttau0.5_neigh15105.jsonl"
OV='{"base": "config_products.yml", "ov": {"train_type": "nalgo", "num_runs": 2, "batch_id": 97, "exact_leaf": true, "ct_tau": 0.5, "max_epochs": 100, "ckpt_every": 10, "resume": true}}'

for ATT in 1 2 3; do
  echo "=== TAU100 attempt $ATT $(date -u +%H:%M:%S)" >> out/tau100.err
  python tools/evidence.py --one "$OV" > out/tau100_probe.json 2>> out/tau100.err &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 45
    NOW=$(date +%s)
    LAST=$(stat -c %Y "$MET" 2>/dev/null || echo 0)
    if [ "$LAST" -gt "$START" ]; then REF=$LAST; LIMIT=420; else REF=$START; LIMIT=1200; fi
    if [ $((NOW - REF)) -gt "$LIMIT" ]; then
      KIDS=$(cat /proc/$PID/task/*/children 2>/dev/null)
      echo "TAU100 WATCHDOG: attempt $ATT stale $((NOW - REF))s, kill $PID $KIDS" >> out/tau100.err
      kill $PID $KIDS 2>/dev/null; sleep 5; kill -9 $PID $KIDS 2>/dev/null
      break
    fi
  done
  wait "$PID"
  RC=$?
  echo "=== TAU100 attempt $ATT rc=$RC $(date -u +%H:%M:%S)" >> out/tau100.err
  if [ "$RC" -eq 0 ] && grep -q '"nalgo"' out/tau100_probe.json 2>/dev/null; then
    echo "=== TAU100 DONE $(date -u +%H:%M:%S)" >> out/tau100.err
    exit 0
  fi
  sleep 30
done
echo "=== TAU100 FAILED $(date -u +%H:%M:%S)" >> out/tau100.err
exit 1
