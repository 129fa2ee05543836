"""CLI entry: ``python main.py -config configs/config_cora.yml``.

Mirrors the reference dispatch (reference main.py:21-44): algo_type x what x
dataset_name select the pipeline. The reference imports PipelineH but never
dispatches to it; here ``algo_type: hpseudo`` reaches it.
"""

from __future__ import annotations

import argparse

import jax

from noise_gnn_tpu.train.pipelines import (
    PipelineA,
    PipelineCO,
    PipelineCT,
    PipelineCTP,
    PipelineH,
    PipelineS,
    PipelineSG,
    PipelineTE,
    PipelineTES,
)
from noise_gnn_tpu.utils.config import load_config

OGB = ("ogbn-arxiv", "ogbn-products")


def main(config: dict):
    from noise_gnn_tpu.utils.memory import configure_jax_cache, configure_malloc

    # library-entry callers (tools/evidence.py) need the slow-first-touch
    # mitigation just as much as the CLI __main__ path
    configure_malloc()
    configure_jax_cache()
    algo = config["algo_type"]
    if algo in ("codi", "coteaching"):
        if config.get("what") in ("_test2", "_test3"):
            cls = PipelineTE if config["dataset_name"] in OGB else PipelineTES
        else:
            cls = PipelineCO if config["dataset_name"] in OGB else PipelineS
    elif algo == "ctp":
        cls = PipelineCTP
    elif algo == "contrastive":
        cls = PipelineCT
    elif algo == "grid":
        cls = PipelineSG
    elif algo == "analysis":
        cls = PipelineA
    elif algo == "hpseudo":
        cls = PipelineH
    elif algo == "baseline":
        config["train_type"] = "baseline"
        cls = PipelineCO if config["dataset_name"] in OGB else PipelineS
    else:
        raise ValueError(f"wrong algo type {algo!r}")
    pipeline = cls(config)
    return pipeline.loop()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-config", "--config", required=True, type=str,
                        help="configuration file path")
    args = parser.parse_args()
    config = load_config(args.config)
    if config.get("device") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from noise_gnn_tpu.utils.memory import configure_malloc, warm_heap

    configure_malloc()
    warm_gb = float(config.get("warm_heap_gb", 0))
    if warm_gb > 0:
        print(f"warming {warm_gb:g} GB of heap ...")
        warm_heap(int(warm_gb * (1 << 30)))
    print(f"devices: {jax.devices()}")
    main(config)
