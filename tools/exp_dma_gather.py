"""Round-3 gather-wall attack (VERDICT r2 #5): can K overlapping per-row
DMAs beat the XLA gather engine?

Round-1 measured a SEQUENTIAL per-row Pallas DMA gather at 0.7 M rows/s.
This keeps K row-block DMAs in flight per kernel instance: scalar-prefetched
indices and a K-deep semaphore ring, each DMA copying the ALIGNED 8-row f32
block containing the target row (Mosaic cannot slice single rows out of a
tiled HBM buffer) into a VMEM ring slot.

MEASURED (TPU v5e, 2026-08-21, 2.1 M indices x [256] f32 rows):

    XLA fast_take                      46.7 M rows/s
    dma ring depth=2                    7.7 M rows/s
    dma ring depth=4                   11.8 M rows/s
    dma ring depth=8                   18.9 M rows/s
    dma ring depth=16                  22.9 M rows/s   <- saturation
    dma ring depth=24                  22.5 M rows/s

NEGATIVE RESULT: overlap raises the DMA path 32x over the sequential
round-1 number, but the scalar core saturates at ~23 M DMA descriptors/s
(the 8-row blocks mean 184 GB/s of wire traffic at that point — only 22 %
of HBM, so the bound is descriptor ISSUE, not bandwidth). That is 2x below
XLA's own gather on identical shapes and 6x below the ~147 M idx/s
per-index wall. Random-row gather cannot be widened per descriptor
(indices are not contiguous), and v5e has a single Pallas core, so ~23 M/s
is the ceiling of this design. The XLA gather engine remains the right
mechanism; docs/DESIGN.md carries the conclusion.

Usage (real chip):  timeout 1200 python tools/exp_dma_gather.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


E = 131072  # scalar-prefetch arrays live in SMEM: keep them small
P = 16  # grid passes over the index set per launch (amortizes fetch latency)


def make(depth: int, chunk: int, feat: int, x3):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, x_hbm, out_ref, scratch, sems):
        base = pl.program_id(1) * chunk

        def dma(i):
            slot = jax.lax.rem(i, depth)
            return pltpu.make_async_copy(
                x_hbm.at[idx_ref[base + i]], scratch.at[slot], sems.at[slot]
            )

        for k in range(depth):
            dma(k).start()

        def body(i, _):
            nxt = i + depth

            @pl.when(nxt < chunk)
            def _():
                dma(nxt).start()

            dma(i).wait()
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)
        out_ref[:] = scratch[0]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P, E // chunk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, feat), lambda p, c, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((depth, 8, feat), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )

    def fn(idx, xx):
        return pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, feat), jnp.float32),
        )(idx, xx)

    return jax.jit(lambda idx, xx: fn(idx, xx).sum())


def main():
    import jax
    import jax.numpy as jnp

    from noise_gnn_tpu.ops.scatter import fast_take
    from noise_gnn_tpu.utils.memory import configure_jax_cache, configure_malloc

    configure_malloc()
    configure_jax_cache()
    log(f"device: {jax.devices()[0]}")
    n, f = 1_000_000, 256
    x3 = jax.random.normal(jax.random.key(0), (n // 8, 8, f), jnp.float32)
    x2 = x3.reshape(n, f)
    idx_np = np.random.default_rng(0).integers(0, n // 8, E).astype(np.int32)
    idx = jnp.asarray(idx_np)

    big_idx = jnp.asarray(np.tile(idx_np * 8, P))
    jf = jax.jit(lambda xx, ii: fast_take(xx, ii).sum())
    float(jf(x2, big_idx))
    t0 = time.perf_counter()
    float(jf(x2, big_idx))
    t_x = time.perf_counter() - t0
    log(f"XLA fast_take {P*E} idx of [256]f32: {t_x*1e3:.1f} ms -> "
        f"{P*E/t_x/1e6:.1f} M rows/s")

    for depth in (2, 4, 8, 16, 24):
        try:
            jr = make(depth, 2048, f, x3)
            float(jr(idx, x3))
            t0 = time.perf_counter()
            float(jr(idx, x3))
            t = time.perf_counter() - t0
            tot = P * E
            log(f"dma ring depth={depth:3d}: {t*1e3:8.1f} ms -> "
                f"{tot/t/1e6:7.2f} M rows/s "
                f"({8*tot/t/1e6:.0f} M 8-block rows moved/s)")
        except Exception as ex:
            log(f"depth={depth} FAILED: {type(ex).__name__} {str(ex)[:150]}")


if __name__ == "__main__":
    main()
