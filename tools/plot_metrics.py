"""Render the per-run metrics JSONL as the reference's multi-panel PNG
(reference plots: src/pipeline.py:315-360). Usage:

    python tools/plot_metrics.py out/metrics/<run>.jsonl [-o plot.png]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics_file")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.metrics_file)]
    epochs = [r for r in rows if r.get("event", "").startswith("epoch")]
    if not epochs:
        raise SystemExit("no epoch records found")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("accuracy", ["train_acc_1", "train_acc_2", "val_acc_1", "val_acc_2",
                      "train_acc", "val_acc"]),
        ("test accuracy", ["test_acc_1", "test_acc_2", "test_acc"]),
        ("pure ratio", ["pure_ratio_1", "pure_ratio_2"]),
        ("loss", ["loss_1", "loss_2", "loss", "loss_cont_1", "loss_cont_2",
                  "loss_semi", "loss_cont", "loss_cr_1", "loss_cr_2"]),
    ]
    fig, axs = plt.subplots(len(panels), 1, figsize=(10, 15))
    for ax, (title, keys) in zip(axs, panels):
        plotted = False
        for k in keys:
            ys = [r[k] for r in epochs if k in r]
            if ys:
                ax.plot(ys, label=k)
                plotted = True
        ax.set_title(title)
        if plotted:
            ax.legend(fontsize=7)
    plt.tight_layout()
    out = args.out or args.metrics_file.replace(".jsonl", ".png")
    plt.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
