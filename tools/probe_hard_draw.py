"""Probe: does co-teaching RECOVER on the hard flagship noise draw given a
longer epoch budget?

Round-3 flagship measurement (docs/RESULTS.md): the (seed=1232, run=1)
rand_pair realization on synthetic ogbn-products collapses co-teaching to
best 0.220 at the reference's 50-epoch budget while the paired CE baseline
reaches 0.720 — the selection purity stays flat at the clean fraction, and
CT's test accuracy was still climbing roughly linearly at the cut. This
script re-trains the SAME draw (the (seed, run)-keyed flip makes it a pure
function of the config seed) with max_epochs=N to distinguish "diverged"
from "converging slowly".

Measured 2026-08-21 (TPU v5e): best 0.768 over 100 epochs — 0.70 already by
epoch 50, selection purity rising to 0.751 — ABOVE the paired CE baseline's
0.720. The evidence-run failure is an initialization-sensitive collapse of
the mutual small-loss selection under a hard pair-noise permutation (purity
locked at the clean fraction for that init), not a property of the draw.

Usage (real TPU, one process at a time):
    python tools/probe_hard_draw.py [epochs=100]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from noise_gnn_tpu.utils.config import load_config  # noqa: E402


def main(epochs: int = 100):
    from noise_gnn_tpu.train.pipelines import PipelineCO

    cfg = load_config(os.path.join("configs", "config_products.yml"))
    cfg.update(
        train_type="nalgo", compare_loss="normal", num_runs=1,
        max_epochs=epochs, batch_id=95, exact_leaf=True,
    )

    class HardDrawCO(PipelineCO):
        # force every (re)flip onto the run-1 realization of the paired
        # evidence measurement (run index is the only key besides seed)
        def _flip_labels(self, run=None):
            super()._flip_labels(1 if run is not None else None)

    pipe = HardDrawCO(cfg)
    mean, std = pipe.loop()["nalgo"]
    print({"hard_draw_ct_best": round(float(mean), 4), "epochs": epochs})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
