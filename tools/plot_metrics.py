"""Render a metrics JSONL as the reference's multi-panel PNG.

    python tools/plot_metrics.py out/metrics/<run>.jsonl [-o plot.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

from noise_gnn_tpu.utils.plotting import plot_metrics_file

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics_file")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()
    out = plot_metrics_file(args.metrics_file, args.out)
    print(f"wrote {out}" if out else "nothing to plot")
