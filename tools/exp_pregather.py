"""Probe: pre-gathered edge-feature tables at arxiv scale (the one
remaining named SpMM lever in docs/DESIGN.md's headroom list — VERDICT r4
next #8).

Hypothesis: the single-stream SpMM floor is XLA's per-INDEX-bound gather.
If the edge-ordered source-feature table T[e] = x[src[e]] (E x F, ~0.6 GB
bf16 at arxiv scale — fits HBM there, NOT at products) is materialized
once, the aggregation becomes a gather-free contiguous segment reduction.
Two regimes:

  * per-layer (honest training cost): every SpMM consumes a DIFFERENT x,
    so each application pays build (one gather + E x F write) + reduce —
    this can only win if streaming reduce beats the gather by more than
    the extra write costs.
  * amortized (repeated sweeps over the SAME x, e.g. eval epochs over
    frozen features / the exact-leaf table's regime): build once, reduce
    K times.

Measured against the hybrid Pallas kernel under the same chained K=8
protocol on the same graph. One JSON line at the end; findings go to
docs/DESIGN.md either way (positive or negative).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fetch_time(fn, iters=3):
    float(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    from noise_gnn_tpu.utils.memory import configure_jax_cache, configure_malloc

    configure_malloc()
    configure_jax_cache()
    import jax.numpy as jnp

    from noise_gnn_tpu.ops.pallas_spmm import PallasSpmm
    from noise_gnn_tpu.ops.scatter import fast_take, segment_sum

    dev = jax.devices()[0]
    interp = dev.platform not in ("tpu", "axon")
    # arxiv scale: N=169,343, E~2.3M undirected, F=128 (ogbn-arxiv profile)
    n, e, f = 169_343, 2_332_486, 128
    if "--cpu" in sys.argv:  # plumbing smoke test only
        n, e = 20_000, 200_000
    dtype = jnp.bfloat16
    K = 8
    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e).astype(np.int32)
    dst_counts = np.bincount(rng.integers(0, n, e), minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(dst_counts, out=indptr[1:])
    dst_sorted = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), dst_counts))
    src_dev = jnp.asarray(src)
    deg = jnp.asarray(np.maximum(dst_counts, 1).astype(np.float32))
    x = jax.random.normal(jax.random.key(0), (n, f), dtype)
    log(f"device {dev}; N={n} E={e} F={f}; table {e * f * 2 / 1e9:.2f} GB bf16")

    # ---- hybrid Pallas kernel, chained (the incumbent)
    op = PallasSpmm(indptr, src, n)

    def chain_hybrid(xx, parts):
        y = xx
        for _ in range(K):
            y = op._traced(y, parts, True, interp, out_dtype=xx.dtype)
        return y.sum(dtype=jnp.float32)

    t = fetch_time(lambda: jax.jit(chain_hybrid)(x, op._parts))
    r_hybrid = K * e / t
    log(f"hybrid chained: {t * 1e3:.1f} ms -> {r_hybrid / 1e6:.1f} M edges/s")

    # ---- pre-gather, per-layer regime: build + reduce inside every link
    def chain_perlayer(xx, ds, sd, dg):
        y = xx
        for _ in range(K):
            tbl = fast_take(y, sd)                      # build (the gather)
            agg = segment_sum(tbl, ds, n)               # contiguous reduce
            y = (agg / dg[:, None]).astype(xx.dtype)
        return y.sum(dtype=jnp.float32)

    t = fetch_time(lambda: jax.jit(chain_perlayer)(x, dst_sorted, src_dev, deg))
    r_perlayer = K * e / t
    log(f"pre-gather per-layer chained: {t * 1e3:.1f} ms -> "
        f"{r_perlayer / 1e6:.1f} M edges/s")

    # ---- pre-gather, amortized regime: ONE build, K reduces of the same
    # table (the repeated-sweep case; output feeds a bias-add so links stay
    # data-dependent without re-building the table)
    def chain_amortized(xx, ds, sd, dg):
        tbl = fast_take(xx, sd)
        acc = jnp.zeros((), jnp.float32)
        for _ in range(K):
            agg = segment_sum(tbl, ds, n) / dg[:, None]
            acc = acc + agg.sum(dtype=jnp.float32)
            tbl = tbl + (acc * 0).astype(tbl.dtype)     # data dependence
        return acc

    t = fetch_time(lambda: jax.jit(chain_amortized)(x, dst_sorted, src_dev, deg))
    r_amortized = K * e / t
    log(f"pre-gather amortized (1 build, {K} reduces): {t * 1e3:.1f} ms -> "
        f"{r_amortized / 1e6:.1f} M edges/s")

    # ---- reduce-only rate (table already resident): the ceiling the
    # amortized regime approaches as K grows
    tbl0 = fast_take(x, src_dev)

    def reduce_only(tb, ds, dg):
        return (segment_sum(tb, ds, n) / dg[:, None]).sum(dtype=jnp.float32)

    t = fetch_time(lambda: jax.jit(reduce_only)(tbl0, dst_sorted, deg))
    r_reduce = e / t
    log(f"reduce-only (single shot, incl ~24 ms tunnel fetch): "
        f"{t * 1e3:.1f} ms -> {r_reduce / 1e6:.1f} M edges/s")

    print(json.dumps({
        "probe": "pregather_arxiv_scale",
        "hybrid_chained": r_hybrid,
        "pregather_perlayer_chained": r_perlayer,
        "pregather_amortized": r_amortized,
        "reduce_only_single": r_reduce,
        "table_gb": e * f * 2 / 1e9,
    }))


if __name__ == "__main__":
    main()
