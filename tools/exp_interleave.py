"""Pin down the hybrid SpMM's gather/kernel interleave overhead.

Round-3 decomposition at bench scale (1 M nodes, 32 M edges, F=256 bf16):
whole op 318 ms vs gather-only 243 ms + reduce-only 27 ms — ~48 ms
unexplained (docs/DESIGN.md "Known headroom"). Hypotheses probed here:

H1  The gather-only probe UNDERSTATES the real gather stage: its
    `take(x, idx).sum()` lets XLA fuse the reduction into the gather and
    never materializes the [E, F] message buffer, while the real op must
    write it to HBM for the Pallas custom call (write ~F*E bytes) and the
    kernel reads it back (read counted in reduce-only). Probe: gather with
    the output forced to materialize (optimization_barrier) vs fused.
H2  A layout copy at the XLA-gather -> custom-call boundary (relayout /
    copy fusion) doubles the intermediate traffic. Probe: HLO dump of the
    whole op, grep for copy/transpose between the gather and custom-call.
H3  Fixed per-group cost (dispatch/grid ramp). Probe: edge_budget sweep —
    overhead proportional to ngroups = fixed cost; proportional to bytes =
    bandwidth term.

Usage: python tools/exp_interleave.py [--nodes N --edges E --feat F]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


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
    ap.add_argument("--hlo", action="store_true", help="dump optimized HLO "
                    "of the whole op and summarize boundary ops")
    ap.add_argument("--sweep", action="store_true",
                    help="edge_budget sweep (H3)")
    args = ap.parse_args()

    import jax

    from noise_gnn_tpu.utils.memory import configure_jax_cache, configure_malloc

    configure_malloc()
    configure_jax_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.nodes, args.edges = 50_000, 1_000_000
    import jax.numpy as jnp

    from noise_gnn_tpu.ops import pallas_spmm as ps

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, platform: {dev.platform}")
    interp = dev.platform not in ("tpu", "axon")

    n, e, f = args.nodes, args.edges, args.feat
    deg = e // n
    e = deg * n
    x = jax.random.normal(jax.random.key(0), (n, f), jnp.dtype(args.dtype))
    indptr_np = np.arange(n + 1, dtype=np.int64) * deg
    indices = jax.random.randint(jax.random.key(1), (e,), 0, n, jnp.int32)

    def build(budget):
        op = ps.PallasSpmmDevice(indptr_np, indices, n, edge_budget=budget)
        float(op._parts[0][0].sum())  # force pack
        return op

    op = build(4 << 20)
    log(f"groups={len(op._groups)}, g_edges={op._g_edges}, "
        f"g_nblocks={op._g_nblocks}")

    # whole op
    jwhole = jax.jit(lambda xx, parts: op._traced(
        xx, parts, True, interp).sum(dtype=jnp.float32))
    t_whole = fetch_time(lambda: jwhole(x, op._parts), args.iters)
    log(f"whole op:             {t_whole * 1e3:8.1f} ms  "
        f"-> {e / t_whole / 1e6:6.1f} M edges/s")

    # H1a: fused gather (sum folds into the gather; no materialization)
    def g_fused(xx, parts):
        s = jnp.float32(0)
        for src_g, *_ in parts:
            s += jnp.take(xx, src_g, axis=0).sum(dtype=jnp.float32)
        return s

    jgf = jax.jit(g_fused)
    t_gf = fetch_time(lambda: jgf(x, op._parts), args.iters)
    n_idx = sum(p[0].shape[0] for p in op._parts)
    log(f"gather fused-sum:     {t_gf * 1e3:8.1f} ms  "
        f"-> {n_idx / t_gf / 1e6:6.1f} M idx/s")

    # H1b: materialized gather — barrier forces the [E, F] buffer to HBM,
    # then a separate (bandwidth-bound) sum reads it back. Pipeline-true
    # cost of the gather stage = this minus one full read of the buffer.
    def g_mat(xx, parts):
        s = jnp.float32(0)
        for src_g, *_ in parts:
            m = jax.lax.optimization_barrier(jnp.take(xx, src_g, axis=0))
            s += m.sum(dtype=jnp.float32)
        return s

    jgm = jax.jit(g_mat)
    t_gm = fetch_time(lambda: jgm(x, op._parts), args.iters)
    bytes_msgs = n_idx * f * jnp.dtype(args.dtype).itemsize
    t_read = bytes_msgs / 819e9
    log(f"gather materialized:  {t_gm * 1e3:8.1f} ms  "
        f"(msgs {bytes_msgs / 1e9:.1f} GB; minus one read "
        f"{t_read * 1e3:.1f} ms -> gather+write ~{(t_gm - t_read) * 1e3:.1f} ms)")
    log(f"  => materialization premium vs fused: "
        f"{(t_gm - t_read - t_gf) * 1e3:+.1f} ms")

    # pure copy roofline for reference (ONE group's worth — a full-size
    # second buffer OOMs next to the op's own intermediates)
    g1 = op._parts[0][0].shape[0] // 128 * 128
    big = jax.random.normal(jax.random.key(2), (g1, f), jnp.dtype(args.dtype))
    jcp = jax.jit(
        lambda a: jax.lax.optimization_barrier(a + 0).sum(dtype=jnp.float32))
    t_copy = fetch_time(lambda: jcp(big), args.iters)
    scale = n_idx / g1
    log(f"copy+read one group:  {t_copy * 1e3:8.1f} ms (read+write+read; "
        f"x{scale:.1f} groups = {t_copy * scale * 1e3:.1f} ms)")

    if args.hlo:
        txt = jax.jit(lambda xx, parts: op._traced(
            xx, parts, True, interp)).lower(x, op._parts).compile().as_text()
        path = "/tmp/spmm_whole_hlo.txt"
        with open(path, "w") as fh:
            fh.write(txt)
        import re

        log(f"HLO -> {path} ({len(txt.splitlines())} lines)")
        # summarize: ops with big shapes between gathers and custom calls
        for pat in ("copy", "transpose", "bitcast", "custom-call", "gather",
                    "dynamic-slice", "concatenate"):
            hits = [l.strip()[:160] for l in txt.splitlines()
                    if re.search(rf"= \S* {pat}", l)]
            log(f"  {pat}: {len(hits)}")
            for h in hits[:4]:
                log(f"    {h}")

    if args.sweep:
        for budget in (1 << 20, 2 << 20, 4 << 20, 8 << 20):
            try:
                opb = build(budget)
            except Exception as ex:
                log(f"budget {budget >> 20}M: pack failed {ex}")
                continue
            jw = jax.jit(lambda xx, parts, opb=opb: opb._traced(
                xx, parts, True, interp).sum(dtype=jnp.float32))
            t = fetch_time(lambda: jw(x, opb._parts), args.iters)
            log(f"budget {budget >> 20:2d}M edges ({len(opb._groups)} groups,"
                f" g_edges {opb._g_edges}): {t * 1e3:8.1f} ms "
                f"-> {e / t / 1e6:6.1f} M edges/s")


if __name__ == "__main__":
    main()
