#!/bin/bash
# Round-5 measurement campaign, priority-ordered so a wall-clock cut
# preserves the most important rows (VERDICT r4 next #1/#2/#7/#8).
# Each row runs via tools/evidence.py --only into a scratch tag; the full
# r5 artifact dir + RESULTS.md are assembled afterwards from the combined
# stdout log (evidence.py --from-log) plus r4 carries, with no TPU work.
cd /root/repo || exit 1
mkdir -p out
LOG=out/evidence_r5.log

{
  echo "=== bench validation $(date -u +%H:%M:%S)"
  timeout 2400 python bench.py > out/bench_r5.json 2> out/bench_r5.err
  echo "=== bench rc=$? $(date -u +%H:%M:%S)"

  for ROW in "flagship" "ct_tau" "grid search" "selection analysis"; do
    echo "=== ROW $ROW $(date -u +%H:%M:%S)"
    python tools/evidence.py --only "$ROW" --tag r5s --out out/RESULTS_scratch.md
    echo "=== ROW $ROW done $(date -u +%H:%M:%S)"
  done

  echo "=== pregather probe $(date -u +%H:%M:%S)"
  timeout 3600 python tools/exp_pregather.py > out/pregather_r5.json 2> out/pregather_r5.err
  echo "=== pregather rc=$? $(date -u +%H:%M:%S)"

  echo "=== ROW 100-epoch $(date -u +%H:%M:%S)"
  python tools/evidence.py --only "100-epoch" --tag r5s --out out/RESULTS_scratch.md
  echo "=== ROW 100-epoch done $(date -u +%H:%M:%S)"

  echo "=== ALL DONE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
