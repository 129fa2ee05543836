"""Scaling-efficiency harness: DP co-teaching step throughput at 1 vs N
devices (BASELINE.md target: >=80 % edges/s scaling efficiency).

On real multi-chip hardware this measures ICI scaling; on a single host it
can still validate the mechanics with virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py --devices 1 8

(virtual CPU devices share one physical host, so CPU numbers validate
correctness of the harness, not hardware scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(n_devices: int, args) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from noise_gnn_tpu.graph.datasets import synthetic_graph
    from noise_gnn_tpu.models import nets
    from noise_gnn_tpu.noise import flip_label, noise_or_not
    from noise_gnn_tpu.parallel import make_dp_ct_step, make_mesh, shard_batch
    from noise_gnn_tpu.parallel.mesh import replicated
    from noise_gnn_tpu.train import steps as S
    from noise_gnn_tpu.utils.profiling import tree_edges_per_batch

    mesh = make_mesh(n_devices)
    rep = replicated(mesh)
    g = synthetic_graph(args.nodes, args.feat, 16, args.nodes * 16, seed=0)
    yhn, _ = flip_label(g.y, 16, "sym", 0.3, np.random.default_rng(0))
    data = jax.device_put(
        S.GraphData(
            x=jnp.asarray(g.x),
            y=jnp.asarray(g.y),
            yhn=jnp.asarray(yhn),
            clean=jnp.asarray(noise_or_not(g.y, yhn)),
            csr=g.csr(),
        ),
        rep,
    )
    spec = nets.NetSpec("sage", args.feat, args.hidden, 16, 3, 0.5)
    opt = optax.adam(1e-3)
    fanouts = (15, 10, 5)
    bs = args.batch_per_device * n_devices
    step = make_dp_ct_step(spec, opt, fanouts, mesh)
    s1 = jax.device_put(S.init_state(jax.random.key(1), spec, opt), rep)
    s2 = jax.device_put(S.init_state(jax.random.key(2), spec, opt), rep)
    batch = shard_batch(
        S.Batch(jnp.arange(bs, dtype=jnp.int32) % args.nodes, jnp.ones(bs, bool)),
        mesh,
    )
    fr = jnp.float32(0.2)

    def once(i):
        nonlocal s1, s2
        s1, s2, m = step(s1, s2, data, batch, jax.random.key(i), fr)
        return m

    float(once(0)["loss_1"])  # compile
    t0 = time.perf_counter()
    m = None
    for i in range(args.iters):
        m = once(i + 1)
    float(m["loss_1"])  # sync
    dt = (time.perf_counter() - t0) / args.iters
    edges = tree_edges_per_batch(bs, fanouts)
    rate = edges / dt
    log(f"{n_devices} devices: {dt * 1e3:.1f} ms/step, {rate / 1e6:.1f} M edges/s "
        f"(global batch {bs})")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1])
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--batch-per-device", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    rates = {n: measure(n, args) for n in args.devices}
    base_n = min(rates)
    out = {
        "metric": "dp_scaling_efficiency",
        "rates_edges_per_s": rates,
        "efficiency": {
            n: rates[n] / (rates[base_n] * n / base_n) for n in rates
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
