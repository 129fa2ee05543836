"""Experiment: what bounds SpMM on v5e — gather rates under different
index regimes, and the Pallas reduce kernel in isolation.

Findings feed the design of a faster full-graph SpMM (bench.py north star).
Run: timeout 580 python tools/exp_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    import jax.numpy as jnp

    n, e, f = 1_000_000, 8_000_000, 256
    dt = jnp.bfloat16
    key = jax.random.key(0)
    x = jax.random.normal(key, (n, f), dt)

    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    idx_sorted = jnp.sort(idx_rand)

    take = jax.jit(lambda xx, i: jnp.take(xx, i, axis=0).sum())
    t = fetch_time(lambda: take(x, idx_rand))
    print(f"gather random    : {t*1e3:8.1f} ms  {e/t/1e6:7.1f} M idx/s")

    t = fetch_time(lambda: take(x, idx_sorted))
    print(f"gather sorted(same op): {t*1e3:8.1f} ms  {e/t/1e6:7.1f} M idx/s")

    def take_hint(xx, i):
        out = jax.lax.gather(
            xx, i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, f),
            indices_are_sorted=True,
            unique_indices=False,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return out.sum()
    take_hint_j = jax.jit(take_hint)
    t = fetch_time(lambda: take_hint_j(x, idx_sorted))
    print(f"gather sorted+hint    : {t*1e3:8.1f} ms  {e/t/1e6:7.1f} M idx/s")

    # narrow gather (does width matter at all?)
    x32 = x[:, :128]
    take32 = jax.jit(lambda xx, i: jnp.take(xx, i, axis=0).sum())
    t = fetch_time(lambda: take32(x32, idx_rand))
    print(f"gather random F=128   : {t*1e3:8.1f} ms  {e/t/1e6:7.1f} M idx/s")

    # dense streaming read for reference
    stream = jax.jit(lambda xx: xx.astype(jnp.float32).sum())
    t = fetch_time(lambda: stream(x))
    bw = n * f * 2 / t
    print(f"stream read x        : {t*1e3:8.1f} ms  {bw/1e9:7.1f} GB/s")

    # one-hot expand from a VMEM-window (XLA emulation): block-diag expand
    # msgs[g] = xwin[src_local[g]] with xwin = 1024-row window, as matmul
    G, B = 2048, 1024
    nchunk = e // G
    src_local = jnp.asarray(rng.integers(0, B, (nchunk, G)).astype(np.int32))

    def expand(xref, sl):
        # per chunk c: onehot [G,B] @ x[c*?: ...] -- emulate with same window
        win = jax.lax.dynamic_slice_in_dim(xref, 0, B)
        oh = (sl[:, :, None] == jnp.arange(B)[None, None, :]).astype(dt)
        return jnp.einsum("cgb,bf->cgf", oh, win,
                          preferred_element_type=jnp.float32).sum()
    expand_j = jax.jit(expand)
    t = fetch_time(lambda: expand_j(x, src_local))
    print(f"onehot expand (XLA)  : {t*1e3:8.1f} ms  {e/t/1e6:7.1f} M edges/s")

    # Pallas reduce kernel alone at current EDGE_CHUNK
    from noise_gnn_tpu.ops.pallas_spmm import PallasSpmm

    dst_counts = np.bincount(rng.integers(0, n, e), minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(dst_counts, out=indptr[1:])
    src = rng.integers(0, n, e).astype(np.int32)
    op = PallasSpmm(indptr, src, n)
    (src_g, dst_g, dgi, base, maps) = op._parts[0]
    msgs = jax.random.normal(key, (src_g.shape[0], f), dt)
    red = jax.jit(lambda m: __import__(
        "noise_gnn_tpu.ops.pallas_spmm", fromlist=["x"]
    )._spmm_call_pregathered(
        m, dst_g, dgi, base * 0, *maps,
        jnp.zeros((op._g_nblocks * 256, f), jnp.float32),
        num_nodes=op._g_nblocks * 256, ring_blocks=op._g_nblocks, feat=f,
        mean=True,
    ).sum())
    t = fetch_time(lambda: red(msgs))
    print(f"pallas reduce alone  : {t*1e3:8.1f} ms  {e/t/1e6:7.1f} M edges/s "
          f"(slab rows {src_g.shape[0]})")


if __name__ == "__main__":
    main()
