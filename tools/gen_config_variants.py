"""Generate the numbered config variants of the reference hypervolume.

The reference ships 36 YAML files; beyond the 12 distinct experiment shapes
(already in configs/), the numbered clones (config_cora2-8, config_arxiv2-10,
config_test_s2-9 — reference config/ listing) differ only in a handful of
knobs: train_type/compare_loss (A/B direction), module (sage vs gcn),
noise_rate/noise_type sweeps, `what` experiment tag, batch_id. This tool
regenerates that hypervolume over OUR base configs: each emitted file = our
same-shape base + the reference variant's knob values, so
`python main.py -config configs/config_coraN.yml` dispatches the same
experiment the reference's numbered file does.

Run: python tools/gen_config_variants.py   (writes configs/, idempotent)
"""

from __future__ import annotations

import os
import sys

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "configs")

# (variant name, base file, reference citation, knob overrides)
# Knob values are the reference variant's absolutes (diffed against its own
# base); keys the reference variant DELETES fall back to our defaults.
VARIANTS = [
    # -- cora sweeps (reference config/config_cora2-8.yml): noise-rate sweep
    #    on sage + backward-correction, then the same sweep on gcn + plain CE
    ("config_cora2", "config_cora.yml", "config/config_cora2.yml",
     dict(batch_id=1, noise_rate=0.3)),
    ("config_cora3", "config_cora.yml", "config/config_cora3.yml",
     dict(batch_id=1, noise_rate=0.4)),
    ("config_cora4", "config_cora.yml", "config/config_cora4.yml",
     dict(batch_id=2, noise_rate=0.45)),
    ("config_cora5", "config_cora.yml", "config/config_cora5.yml",
     dict(batch_id=2, module="gcn", compare_loss="normal")),
    ("config_cora6", "config_cora.yml", "config/config_cora6.yml",
     dict(batch_id=2, module="gcn", compare_loss="normal", noise_rate=0.3)),
    ("config_cora7", "config_cora.yml", "config/config_cora7.yml",
     dict(batch_id=3, module="gcn", compare_loss="normal", noise_rate=0.4)),
    ("config_cora8", "config_cora.yml", "config/config_cora8.yml",
     dict(module="gcn", compare_loss="normal", noise_rate=0.45)),
    # -- arxiv variants (reference config/config_arxiv2-10.yml): baseline-
    #    direction A/Bs, gcn module swap, _test2 noise sweep, `what: 6` runs
    ("config_arxiv2", "config_arxiv.yml", "config/config_arxiv2.yml",
     dict(train_type="baseline", compare_loss="back")),
    ("config_arxiv3", "config_arxiv.yml", "config/config_arxiv3.yml",
     dict(module="gcn", module_compare="gcn", train_type="baseline")),
    ("config_arxiv4", "config_arxiv.yml", "config/config_arxiv4.yml",
     dict(batch_id=2, module="gcn", module_compare="gcn",
          train_type="baseline", compare_loss="back")),
    ("config_arxiv5", "config_arxiv.yml", "config/config_arxiv5.yml",
     dict(batch_id=2, what="_test2", module="sage", train_type="baseline",
          compare_loss="back", noise_rate=0.2, noise_type="rand_pair")),
    ("config_arxiv6", "config_arxiv.yml", "config/config_arxiv6.yml",
     dict(batch_id=2, what="_test2", module="sage", train_type="baseline",
          compare_loss="back", noise_rate=0.3, noise_type="rand_pair")),
    ("config_arxiv7", "config_arxiv.yml", "config/config_arxiv7.yml",
     dict(batch_id=2, what="_test2", module="sage", train_type="baseline",
          compare_loss="back", noise_rate=0.4, noise_type="rand_pair")),
    ("config_arxiv8", "config_arxiv.yml", "config/config_arxiv8.yml",
     dict(batch_id=10, what="6", module="sage", train_type="nalgo",
          dropout=0.5, num_runs=1, do_plot=True, epoch_logger=True,
          noise_rate=0.4)),
    ("config_arxiv9", "config_arxiv.yml", "config/config_arxiv9.yml",
     dict(batch_id=10, what="6", module="sage", train_type="nalgo",
          dropout=0.5, num_runs=1, do_plot=True, epoch_logger=True,
          noise_rate=0.45)),
    ("config_arxiv10", "config_arxiv.yml", "config/config_arxiv10.yml",
     dict(batch_id=10, what="6", module="sage", train_type="nalgo",
          dropout=0.5, num_runs=1, do_plot=True, epoch_logger=True,
          noise_rate=0.3)),
    # -- computers _test3 variants (reference config/config_test_s2-9.yml)
    ("config_test_s2", "config_test_s.yml", "config/config_test_s2.yml",
     dict(train_type="baseline", compare_loss="back")),
    ("config_test_s3", "config_test_s.yml", "config/config_test_s3.yml",
     dict(module="gcn", module_compare="gcn", train_type="baseline")),
    ("config_test_s4", "config_test_s.yml", "config/config_test_s4.yml",
     dict(batch_id=2, module_compare="gcn", train_type="baseline",
          compare_loss="back")),
    ("config_test_s5", "config_test_s.yml", "config/config_test_s5.yml",
     dict(batch_id=10, module="gcn", module_compare="gcn",
          train_type="baseline", compare_loss="back", noise_rate=0.4,
          noise_type="sym")),
    ("config_test_s6", "config_test_s.yml", "config/config_test_s6.yml",
     dict(batch_id=8, module="gcn", module_compare="gcn",
          train_type="baseline", compare_loss="normal", noise_rate=0.3)),
    ("config_test_s7", "config_test_s.yml", "config/config_test_s7.yml",
     dict(batch_id=8, module="gcn", module_compare="gcn",
          train_type="baseline", compare_loss="normal", noise_rate=0.4)),
    ("config_test_s8", "config_test_s.yml", "config/config_test_s8.yml",
     dict(batch_id=8, module="gcn", module_compare="gcn",
          train_type="baseline", compare_loss="normal", noise_rate=0.45)),
    ("config_test_s9", "config_test_s.yml", "config/config_test_s9.yml",
     dict(dataset_name="cora", what="_test2", module_compare="sage",
          compare_loss="normal", max_epochs=50, batch_size_full=False,
          noise_rate=0.5, noise_type="sym", ct_tk=15)),
]


def main():
    sys.path.insert(0, ROOT)
    from noise_gnn_tpu.utils.config import validate_config, DEFAULTS

    for name, base, ref, over in VARIANTS:
        with open(os.path.join(CFG, base)) as f:
            cfg = yaml.safe_load(f)
        cfg.update(over)
        merged = dict(DEFAULTS)
        merged.update(cfg)
        validate_config(merged)
        knobs = ", ".join(f"{k}={v}" for k, v in over.items())
        body = yaml.safe_dump(cfg, sort_keys=False, default_flow_style=None)
        with open(os.path.join(CFG, name + ".yml"), "w") as f:
            f.write(
                f"# GENERATED by tools/gen_config_variants.py — do not edit.\n"
                f"# Hypervolume variant of {base} mirroring the reference's\n"
                f"# {ref}: {knobs}\n" + body
            )
        print(f"wrote configs/{name}.yml")


if __name__ == "__main__":
    main()
