#!/bin/bash
# CE-only 100-epoch memorization diagnostic (supplementary evidence for
# the carried 100-epoch table row): per-epoch test-acc, train-acc-on-noisy
# and corrupted-subset noisy_fit curves at the doubled budget, on the same
# (seed, run)-keyed draws as the 100-epoch row (batch_id 95 names only).
# Same retrying watchdog as the flagship CE recovery.
cd /root/repo || exit 1
MET="out/metrics/dt822_ogbn-products_id95_baseline_coteaching_sage_noise_rand_pair0.3_lay3_hid256_lr0.001_epo100_bs512_drop0.5_tk15_cttau1.2_neigh15105.jsonl"
OV='{"base": "config_products.yml", "ov": {"train_type": "baseline", "compare_loss": "normal", "num_runs": 3, "batch_id": 95, "exact_leaf": true, "max_epochs": 100}}'

for ATT in 1 2 3; do
  echo "=== CE100 attempt $ATT $(date -u +%H:%M:%S)" >> out/ce100.err
  python tools/evidence.py --one "$OV" > out/ce100_curves.json 2>> out/ce100.err &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 45
    NOW=$(date +%s)
    LAST=$(stat -c %Y "$MET" 2>/dev/null || echo 0)
    if [ "$LAST" -gt "$START" ]; then REF=$LAST; LIMIT=420; else REF=$START; LIMIT=1200; fi
    if [ $((NOW - REF)) -gt "$LIMIT" ]; then
      KIDS=$(cat /proc/$PID/task/*/children 2>/dev/null)
      echo "CE100 WATCHDOG: attempt $ATT stale $((NOW - REF))s, kill $PID $KIDS" >> out/ce100.err
      kill $PID $KIDS 2>/dev/null; sleep 5; kill -9 $PID $KIDS 2>/dev/null
      break
    fi
  done
  wait "$PID"
  RC=$?
  echo "=== CE100 attempt $ATT rc=$RC $(date -u +%H:%M:%S)" >> out/ce100.err
  if [ "$RC" -eq 0 ] && grep -q '"baseline"' out/ce100_curves.json 2>/dev/null; then
    echo "=== CE100 DONE $(date -u +%H:%M:%S)" >> out/ce100.err
    exit 0
  fi
  sleep 30
done
echo "=== CE100 FAILED $(date -u +%H:%M:%S)" >> out/ce100.err
exit 1
