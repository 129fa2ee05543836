"""Train-step microbenchmark: sampled-leaf vs exact-leaf co-teaching step.

Generates a random regular-ish CSR graph ON DEVICE (host->device through the
dev tunnel runs ~10-20 MB/s, docs/DESIGN.md) and times the whole-epoch scan
driver for a fixed number of steps. Timing forces a scalar fetch.

Usage: python tools/bench_trainstep.py [--nodes 1200000] [--deg 26] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=1_200_000)
    ap.add_argument("--deg", type=int, default=26)
    ap.add_argument("--feat", type=int, default=100)
    ap.add_argument("--classes", type=int, default=47)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--fanouts", default="15,10,5")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--modes", default="sampled,exact")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from noise_gnn_tpu.graph.containers import CSRGraph
    from noise_gnn_tpu.models import nets
    from noise_gnn_tpu.ops.leaf_agg import fused_leaf_table
    from noise_gnn_tpu.train import steps as S
    from noise_gnn_tpu.utils.memory import configure_malloc

    configure_malloc()
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, platform: {dev.platform}")

    n, deg = args.nodes, args.deg
    e = n * deg
    fanouts = tuple(int(f) for f in args.fanouts.split(","))
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # on-device graph: fixed-degree CSR with uniform random sources
    indptr = jnp.arange(n + 1, dtype=jnp.int32) * deg
    indices = jax.random.randint(k1, (e,), 0, n, jnp.int32)
    csr = CSRGraph(indptr=indptr, indices=indices, num_nodes=n)
    x = jax.random.normal(k2, (n, args.feat), jnp.dtype(args.dtype))
    y = jax.random.randint(k3, (n,), 0, args.classes, jnp.int32)
    data = S.GraphData(x=x, y=y, yhn=y, clean=jnp.ones((n,), bool), csr=csr)
    float(data.x.sum())  # force (tunnel-safe)

    spec = nets.NetSpec(
        module="sage", in_size=args.feat, hidden_size=args.hidden,
        out_size=args.classes, num_layers=len(fanouts), dropout=0.5,
        compute_dtype=args.dtype,
    )
    opt = optax.adam(1e-3)
    seeds = jax.random.randint(k4, (args.steps, args.batch), 0, n, jnp.int32)
    masks = jnp.ones((args.steps, args.batch), bool)

    results = {}
    for mode in args.modes.split(","):
        exact = mode == "exact"
        d = data
        if exact:
            t0 = time.perf_counter()
            indptr_np = np.arange(n + 1, dtype=np.int64) * deg
            table = fused_leaf_table(x, csr, indptr_np=indptr_np, aggr="mean")
            float(table.sum())  # force (tunnel-safe)
            log(f"[{mode}] leaf-agg precompute ({e / 1e6:.0f} M edges): "
                f"{time.perf_counter() - t0:.2f}s")
            d = data._replace(leaf_agg=table)
        epoch_fn = S.make_ct_epoch(spec, opt, fanouts, exact_leaf=exact)

        def run(d=d, epoch_fn=epoch_fn):
            s1 = S.init_state(jax.random.key(1), spec, opt)
            s2 = S.init_state(jax.random.key(2), spec, opt)
            _, _, m = epoch_fn(s1, s2, d, seeds, masks, jax.random.key(9),
                               jnp.float32(0.2))
            return m["loss_1"]

        t0 = time.perf_counter()
        float(run())  # compile + 1st run
        log(f"[{mode}] compile+first: {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            ts.append(time.perf_counter() - t0)
        per_step = min(ts) / args.steps
        results[mode] = per_step
        tree = args.batch * (1 + np.cumprod(fanouts).sum())
        log(f"[{mode}] {per_step * 1e3:.2f} ms/step "
            f"({tree / per_step / 1e6:.1f} M tree-slots/s)")

    if len(results) == 2:
        log(f"speedup exact vs sampled: {results['sampled'] / results['exact']:.2f}x")


if __name__ == "__main__":
    main()
