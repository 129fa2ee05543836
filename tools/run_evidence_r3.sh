#!/bin/bash
# Round-3 evidence refresh: every row re-measured on the v3 synthetic
# generator (heavy-tailed per-node difficulty). Rows run ONE AT A TIME on
# the TPU (each in its own subprocess via evidence.py --one); priority
# order = judge-requested small rows first, then the big refreshes.
# Usage: run_evidence_r3.sh [pid-to-wait-for]
set -u
cd "$(dirname "$0")/.."
LOG=out/evidence_r3_rest.log
if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
run() { python tools/evidence.py --only "$1" --out /tmp/R_part.md >> "$LOG" 2>&1; }
python tools/evidence.py --quick --out /tmp/R_part.md >> "$LOG" 2>&1
run "ogbn-arxiv rand_pair 0.3 co-teaching"
run "CTP"
run "pseudo-label"
run "_test3"
run "contrastive (rand_pair"
run "contrastive pretrain"
echo "ALL ROWS DONE" >> "$LOG"
