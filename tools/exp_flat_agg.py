"""Measure the flat-subgraph aggregation paths on the TPU.

Round-1's TE/CTP/H steps ran the sampled tree's flat subgraph through the
edge-list conv (gather + jax.ops.segment_sum scatter-add). The CTP cora run
cost ~50 s/STEP with no rewiring at all — hypothesis: XLA's TPU scatter-add
over ~30 K wide rows is the pathology, and the tree's regular structure
(children contiguous per parent) lets aggregation be a reshape+masked-sum
with zero scatters.

Usage: timeout 900 python tools/exp_flat_agg.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from noise_gnn_tpu.ops.sampler import flat_edge_index
from noise_gnn_tpu.ops.scatter import gather_scatter_mean

B, FANOUTS, F = 512, (10, 5), 8710  # the CTP cora shape (hid 256, F=8710)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out) if os.environ.get("BUR") else float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print("device:", dev, dev.platform)
    sizes = [B]
    for f in FANOUTS:
        sizes.append(sizes[-1] * f)
    n_sub = sum(sizes)
    ei = np.asarray(flat_edge_index(B, FANOUTS))
    e = ei.shape[1]
    print(f"n_sub={n_sub} edges={e} F={F}")
    key = jax.random.key(0)
    x = jax.device_put(jax.random.normal(key, (n_sub, F), jnp.float32))
    ei_d = jax.device_put(jnp.asarray(ei))
    mask = jax.device_put(jnp.ones((e,), bool))

    # 1) edge-list path (round-1's conv backend for flat subgraphs)
    f1 = jax.jit(lambda x, ei, m: gather_scatter_mean(x, ei, n_sub, m))
    t = timeit(f1, x, ei_d, mask)
    print(f"edge-list gather+scatter mean: {t*1e3:.1f} ms")

    # 2) structured: per-depth reshape + masked mean (no scatter)
    bases = np.cumsum([0] + sizes[:-1])

    def structured(x, m):
        outs = []
        off = 0
        for d, f in enumerate(FANOUTS):
            child = jax.lax.dynamic_slice_in_dim(x, int(bases[d + 1]), sizes[d + 1])
            cm = jax.lax.dynamic_slice_in_dim(m, off, sizes[d + 1])
            off += sizes[d + 1]
            cb = child.reshape(sizes[d], f, F)
            mm = cm.reshape(sizes[d], f).astype(x.dtype)[..., None]
            s = (cb * mm).sum(axis=1)
            cnt = jnp.maximum(mm.sum(axis=1), 1.0)
            outs.append(s / cnt)
        outs.append(jnp.zeros((sizes[-1], F), x.dtype))
        return jnp.concatenate(outs, axis=0)

    f2 = jax.jit(structured)
    t2 = timeit(f2, x, mask)
    print(f"structured reshape mean:       {t2*1e3:.1f} ms")

    a = np.asarray(f1(x, ei_d, mask))
    b = np.asarray(f2(x, mask))
    print("max abs diff:", float(np.max(np.abs(a - b))))

    # 3) scatter-add over a small delta edge set (2k added edges)
    k2 = 2 * int(n_sub * 0.1)
    rng = np.random.default_rng(0)
    add = jnp.asarray(rng.integers(0, n_sub, (2, k2)).astype(np.int32))

    def delta(x, add):
        from noise_gnn_tpu.ops.scatter import segment_sum

        msgs = jnp.take(x, add[0], axis=0)
        return segment_sum(msgs, add[1], n_sub)

    f3 = jax.jit(delta)
    t3 = timeit(f3, x, add)
    print(f"delta scatter ({k2} edges):     {t3*1e3:.1f} ms")


if __name__ == "__main__":
    main()
