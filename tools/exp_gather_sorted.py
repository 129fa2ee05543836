"""Does XLA's TPU gather engine run faster on (partially) sorted indices?

Within one output block's edge storage, the SpMM reduce is order-invariant
(the one-hot matches dst wherever the edge sits in the slab), so the pack is
free to sort each block's edges by src. If the gather engine is
memory-locality sensitive, that's throughput for free.

Times jnp.take of E indices over an [N, F] bf16 table for: random order,
globally sorted, block-sorted (sorted within each 8192-edge block).
"""

from __future__ import annotations

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
    import jax

    from noise_gnn_tpu.utils.memory import configure_malloc

    configure_malloc()
    import jax.numpy as jnp

    n, e, f = 1_000_000, 8_000_000, 256
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    x = jax.random.normal(jax.random.key(0), (n, f), jnp.bfloat16)

    idx_rand = jax.random.randint(jax.random.key(1), (e + 640,), 0, n, jnp.int32)
    idx_sorted = jnp.sort(idx_rand)
    # block-sorted: sort within each 8192-index span (one ROW_BLOCK's edges)
    span = 8192
    blocks = (e + 512) // span
    idx_blk = jnp.sort(idx_rand[: blocks * span].reshape(blocks, span), axis=1).reshape(-1)
    # scalar fetches force completion (block_until_ready hangs via the tunnel)
    for a in (idx_rand, idx_sorted, idx_blk):
        float(a.sum())

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(dtype=jnp.float32))
    for name, idx in [("random", idx_rand), ("sorted", idx_sorted),
                      ("block-sorted(8k)", idx_blk)]:
        t = fetch_time(lambda: take(x, idx))
        log(f"{name:<18} {t * 1e3:8.1f} ms -> {idx.shape[0] / t / 1e6:6.1f} M idx/s")


if __name__ == "__main__":
    main()
