"""Comm-volume accounting for the halo-exchange edge partition at products
scale — the *prediction* side of the >=80 % scaling target (BASELINE.md)
that single-chip hardware cannot measure directly.

Host-only (numpy + the pack-time partitioner); safe to run next to a TPU
job with the tunnel-free env:

    env -u PALLAS_AXON_POOL_IPS PYTHONPATH= JAX_PLATFORMS=cpu \
        python tools/halo_accounting.py --shards 8

Prints per-layer all_to_all bytes (actual / padded) vs the replicated-psum
design it replaced, plus the predicted comm/compute ratio on a v5e pod
(ICI ~45 GB/s/link bidirectional, SpMM compute at the measured kernel
rate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--feat", type=int, default=256)
    ap.add_argument("--dataset", default="ogbn-products")
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--reorder", action="store_true",
                    help="apply locality_order (balanced label propagation)")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from noise_gnn_tpu.graph.datasets import load_network
    from noise_gnn_tpu.parallel.halo import build_halo_partition
    from noise_gnn_tpu.utils.memory import configure_malloc

    configure_malloc()
    t0 = time.time()
    g = load_network({
        "dataset_name": args.dataset, "synthetic_scale": args.scale,
        "whole_test_set": True, "seed": 0,
    })
    print(f"graph: {g.num_nodes} nodes, {g.edge_index.shape[1]} edges "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)

    t0 = time.time()
    edges = g.edge_index
    if args.reorder:
        from noise_gnn_tpu.parallel.halo import locality_order

        order, inv = locality_order(edges, g.num_nodes, args.shards,
                                    iters=args.iters)
        edges = inv[edges]
        print(f"locality_order: {time.time() - t0:.0f}s", file=sys.stderr)
        t0 = time.time()
    part = build_halo_partition(edges, g.num_nodes, args.shards)
    print(f"partition: {time.time() - t0:.0f}s", file=sys.stderr)

    f = args.feat
    comm = part.comm_bytes_per_layer(f, bytes_per_el=2)  # bf16 activations
    n_f_bytes = g.num_nodes * f * 2
    # v5e: ~45 GB/s aggregate ICI per chip (order of magnitude); kernel rate
    # from BENCH (single-stream SpMM ~104 M edges/s/chip)
    ici = 45e9
    edges = g.edge_index.shape[1]
    spmm_s = edges / args.shards / 104e6
    out = {
        "shards": args.shards,
        "reorder": bool(args.reorder),
        "nodes": g.num_nodes,
        "edges": int(edges),
        "boundary_rows_total": int(part.boundary_rows_total),
        "boundary_fraction_of_nodes": round(
            part.boundary_rows_total / g.num_nodes, 4),
        "alltoall_bytes_actual": int(comm["actual"]),
        "wire_bytes_offdiag": int(comm.get("actual_wire", comm["actual"])),
        "alltoall_bytes_padded": int(comm["padded"]),
        "ppermute_rounds_bytes": int(comm.get("ppermute_rounds", 0)),
        "replicated_psum_equiv_bytes": int(comm["replicated_psum_equiv"]),
        "comm_reduction_vs_psum": round(
            comm["replicated_psum_equiv"] / max(comm["actual"], 1), 1),
        "per_chip_alltoall_s_at_45GBps": round(
            comm["actual"] / args.shards / ici, 4),
        "per_chip_spmm_s_at_104Meps": round(spmm_s, 4),
        "predicted_scaling_efficiency": round(
            spmm_s / (spmm_s + comm.get("actual_wire", comm["actual"])
                      / args.shards / ici), 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
