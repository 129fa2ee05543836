"""Split the hybrid SpMM into gather-only vs reduce-only timings.

The full-graph SpMM (ops/pallas_spmm.py) is two serial stages under one jit:
XLA gather into block-aligned order, then the Pallas one-hot reduce. bench.py
times the whole op; this tool times each stage separately at bench shapes so
optimization effort goes where the time is.

Usage: python tools/bench_spmm_split.py [--nodes N --edges E --feat F]
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


def fetch_time(fn, iters=5):
    float(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=32_000_000)
    ap.add_argument("--feat", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from noise_gnn_tpu.utils.memory import configure_malloc

    configure_malloc()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from noise_gnn_tpu.ops import pallas_spmm as ps

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, platform: {dev.platform}")

    n, e, f = args.nodes, args.edges, args.feat
    deg = e // n
    e = deg * n
    key = jax.random.key(0)
    x = jax.random.normal(key, (n, f), jnp.dtype(args.dtype))

    # same graph construction as bench.py: uniform-degree CSR, random srcs
    indptr_np = np.arange(n + 1, dtype=np.int64) * deg
    indices = jax.random.randint(jax.random.key(1), (e,), 0, n, jnp.int32)
    t0 = time.perf_counter()
    op = ps.PallasSpmmDevice(indptr_np, indices, n)
    # scalar fetch forces the device pack (block_until_ready is unreliable
    # through the dev tunnel and inflates this timing)
    float(op._parts[0][0].sum())
    log(f"pack: {time.perf_counter() - t0:.1f}s, groups={len(op._groups)}, "
        f"g_edges={op._g_edges}, g_nblocks={op._g_nblocks}")

    # whole op (one jit)
    t = fetch_time(lambda: op.apply(x).sum(dtype=jnp.float32), args.iters)
    log(f"whole op:     {t * 1e3:8.1f} ms  -> {e / t / 1e6:6.1f} M edges/s")

    # gather-only: same jnp.take calls as _traced, reduce replaced by a sum
    def gathers(x, parts):
        s = jnp.float32(0)
        for src_g, *_ in parts:
            s += jnp.take(x, src_g, axis=0).sum(dtype=jnp.float32)
        return s

    g = jax.jit(gathers)
    t_g = fetch_time(lambda: g(x, op._parts), args.iters)
    n_idx = sum(p[0].shape[0] for p in op._parts)
    log(f"gather only:  {t_g * 1e3:8.1f} ms  -> {n_idx / t_g / 1e6:6.1f} M idx/s")

    # reduce-only: ONE group's pre-gathered messages (all groups would be
    # groups x g_edges x F bytes — past HBM at products scale)
    src_g, dst_g, dgi, base, maps = op._parts[0]
    msgs0 = jnp.take(x, src_g, axis=0)
    float(msgs0.sum())  # force (tunnel-safe)

    def reduce1(m, dst_g, dgi, base, maps):
        npad = op._g_nblocks * ps.ROW_BLOCK
        out = ps._spmm_call_pregathered(
            m, dst_g, dgi, jnp.zeros_like(base), *maps,
            jnp.zeros((npad, f), jnp.float32),
            num_nodes=npad, ring_blocks=op._g_nblocks, feat=f, mean=True,
        )
        return out.sum(dtype=jnp.float32)

    r = jax.jit(reduce1)
    t_r = fetch_time(lambda: r(msgs0, dst_g, dgi, base, maps), args.iters)
    nchunks = maps[0].shape[0]
    e1 = op._groups[0][3]
    # the timed fn zero-fills the [npad, F] output inside the jit — a cost
    # the real chained path pays once per APPLY, not per group; measure the
    # fill separately so the per-group reduce figure isn't skewed by it
    npad = op._g_nblocks * ps.ROW_BLOCK
    zfill = jax.jit(
        lambda: jnp.zeros((npad, f), jnp.float32).sum(dtype=jnp.float32)
    )
    t_z = fetch_time(lambda: zfill(), args.iters)
    t_r_net = max(t_r - t_z, 0.0)
    log(f"reduce only (group 0): {t_r * 1e3:8.1f} ms  -> "
        f"{e1 / t_r / 1e6:6.1f} M edges/s"
        f"  ({t_r / nchunks * 1e6:.2f} us/chunk, {nchunks} chunks; "
        f"includes ~{t_z * 1e3:.1f} ms output zero-fill -> "
        f"{e1 / max(t_r_net, 1e-9) / 1e6:6.1f} M edges/s net)")
    t_r_all = t_r_net * len(op._parts) + t_z  # chained path fills ONCE
    log(f"gather+reduce serial sum (est): {(t_g + t_r_all) * 1e3:.1f} ms "
        f"(whole-op overhead: {(t - t_g - t_r_all) * 1e3:+.1f} ms)")


if __name__ == "__main__":
    main()
