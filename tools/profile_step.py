"""Stage decomposition of the exact-leaf co-teaching train step.

The step measures ~8.7 ms on v5e (half-scale products shapes) while its
gather-index count alone only explains ~2.5 ms at the gather-engine rate —
this tool cuts the step at successive points (each a 50-iteration lax.scan
inside one jit, checksum folded into the carry so nothing is DCE'd) to find
where the rest goes.

Usage: python tools/profile_step.py [--steps 50] [--stages all]
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
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from noise_gnn_tpu.graph.containers import CSRGraph
    from noise_gnn_tpu.losses.coteaching import ct_loss
    from noise_gnn_tpu.models import nets
    from noise_gnn_tpu.ops.leaf_agg import fused_leaf_table
    from noise_gnn_tpu.ops.sampler import sample_khop_tree
    from noise_gnn_tpu.ops.scatter import fast_take
    from noise_gnn_tpu.train import steps as S
    from noise_gnn_tpu.utils.memory import configure_malloc

    configure_malloc()
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, platform: {dev.platform}")

    n, deg = args.nodes, args.deg
    e = n * deg
    fanouts = tuple(int(f) for f in args.fanouts.split(","))
    fan_s = fanouts[:-1]
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    indptr = jnp.arange(n + 1, dtype=jnp.int32) * deg
    indices = jax.random.randint(k1, (e,), 0, n, jnp.int32)
    csr = CSRGraph(indptr=indptr, indices=indices, num_nodes=n)
    x = jax.random.normal(k2, (n, args.feat), jnp.dtype(args.dtype))
    y = jax.random.randint(k3, (n,), 0, args.classes, jnp.int32)
    indptr_np = np.arange(n + 1, dtype=np.int64) * deg
    table = fused_leaf_table(x, csr, indptr_np=indptr_np, aggr="mean")
    data = S.GraphData(x=x, y=y, yhn=y, clean=jnp.ones((n,), bool), csr=csr,
                       leaf_agg=table)
    float(data.leaf_agg.sum())  # force (tunnel-safe)

    spec = nets.NetSpec(
        module="sage", in_size=args.feat, hidden_size=args.hidden,
        out_size=args.classes, num_layers=len(fanouts), dropout=0.5,
        compute_dtype=args.dtype,
    )
    opt = optax.adam(1e-3)
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    seeds = jax.random.randint(k4, (args.steps, args.batch), 0, n, jnp.int32)
    masks = jnp.ones((args.steps, args.batch), bool)
    fr = jnp.float32(0.2)

    # fixed index sets for the gathers_only stage (shapes of the real step)
    d1 = args.batch * fanouts[0]
    d2 = d1 * fanouts[1]
    gk = jax.random.split(jax.random.key(7), 3)
    idx_d1 = jax.random.randint(gk[0], (args.steps, d1), 0, n, jnp.int32)
    idx_d2 = jax.random.randint(gk[1], (args.steps, d2), 0, n, jnp.int32)
    # sampler-shaped CSR reads: d1 starts + d1*f2 children positions
    idx_csr = jax.random.randint(gk[2], (args.steps, d2), 0, e, jnp.int32)

    def timed(name, scan_fn, *xs_args):
        f = jax.jit(scan_fn)
        t0 = time.perf_counter()
        float(f(*xs_args))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*xs_args))
            ts.append(time.perf_counter() - t0)
        per_step = min(ts) / args.steps
        log(f"{name:<28} {per_step * 1e3:7.3f} ms/step   (compile {compile_s:.1f}s)")
        return per_step

    # ---- stage: rng only (threefry cost of the sampler's draws)
    def rng_only(seeds, masks, key):
        def body(c, inp):
            b_seeds, b_mask, k = inp
            kb, k1h, k2h = jax.random.split(k, 3)
            ks = jax.random.split(kb, 2)
            u1 = jax.random.uniform(ks[0], (args.batch, fanouts[0]))
            u2 = jax.random.uniform(ks[1], (d1, fanouts[1]))
            return c + u1.sum() + u2.sum(), None
        keys = jax.random.split(key, args.steps)
        c, _ = jax.lax.scan(body, jnp.float32(0), (seeds, masks, keys))
        return c

    # ---- stage: fixed-index gathers with the step's shapes
    def gathers_only(data, idx_d1, idx_d2, idx_csr):
        def body(c, inp):
            i1, i2, ic = inp
            a = fast_take(data.x, i1)                # [d1, F]
            b = fast_take(data.leaf_agg, i2)         # [d2, 2F]
            cc = fast_take(data.csr.indices, ic)     # [d2] int32
            return c + a.sum(dtype=jnp.float32) + b.sum(dtype=jnp.float32) \
                + cc.sum().astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), (idx_d1, idx_d2, idx_csr))
        return c

    # ---- stage: sampling only
    def sample_only(data, seeds, masks, key):
        def body(c, inp):
            b_seeds, b_mask, k = inp
            kb, _, _ = jax.random.split(k, 3)
            tb = sample_khop_tree(kb, data.csr, b_seeds, fan_s, b_mask)
            return c + tb.n_ids[-1].sum().astype(jnp.float32), None
        keys = jax.random.split(key, args.steps)
        c, _ = jax.lax.scan(body, jnp.float32(0), (seeds, masks, keys))
        return c

    # ---- stage: sampling + feature/table gathers
    def sample_gather(data, seeds, masks, key):
        def body(c, inp):
            b_seeds, b_mask, k = inp
            kb, _, _ = jax.random.split(k, 3)
            tb, xs, la = S._sample_tree(kb, data, b_seeds, b_mask, fanouts, True)
            s = sum(v.sum(dtype=jnp.float32) for v in xs) + la.sum(dtype=jnp.float32)
            return c + s, None
        keys = jax.random.split(key, args.steps)
        c, _ = jax.lax.scan(body, jnp.float32(0), (seeds, masks, keys))
        return c

    # ---- stage: + one forward
    def fwd1(data, seeds, masks, key):
        def body(c, inp):
            b_seeds, b_mask, k = inp
            kb, k1h, _ = jax.random.split(k, 3)
            tb, xs, la = S._sample_tree(kb, data, b_seeds, b_mask, fanouts, True)
            o1 = nets.apply_tree(spec, s1.params, xs, list(tb.masks), tb.fanouts,
                                 train=True, key=k1h, leaf_agg=la)["logits"]
            return c + o1.sum(dtype=jnp.float32), None
        keys = jax.random.split(key, args.steps)
        c, _ = jax.lax.scan(body, jnp.float32(0), (seeds, masks, keys))
        return c

    # ---- stage: + one forward WITHOUT dropout (isolates threefry+mask cost)
    def fwd1_nodrop(data, seeds, masks, key):
        def body(c, inp):
            b_seeds, b_mask, k = inp
            kb, k1h, _ = jax.random.split(k, 3)
            tb, xs, la = S._sample_tree(kb, data, b_seeds, b_mask, fanouts, True)
            o1 = nets.apply_tree(spec, s1.params, xs, list(tb.masks), tb.fanouts,
                                 train=False, leaf_agg=la)["logits"]
            return c + o1.sum(dtype=jnp.float32), None
        keys = jax.random.split(key, args.steps)
        c, _ = jax.lax.scan(body, jnp.float32(0), (seeds, masks, keys))
        return c

    # ---- stage: + both forwards + ct loss (no grad)
    def fwd2_loss(data, seeds, masks, key):
        def body(c, inp):
            b_seeds, b_mask, k = inp
            kb, k1h, k2h = jax.random.split(k, 3)
            tb, xs, la = S._sample_tree(kb, data, b_seeds, b_mask, fanouts, True)
            yb = jnp.take(data.yhn, b_seeds)
            cb = jnp.take(data.clean, b_seeds)
            o1 = nets.apply_tree(spec, s1.params, xs, list(tb.masks), tb.fanouts,
                                 train=True, key=k1h, leaf_agg=la)["logits"]
            o2 = nets.apply_tree(spec, s2.params, xs, list(tb.masks), tb.fanouts,
                                 train=True, key=k2h, leaf_agg=la)["logits"]
            out = ct_loss(o1, o2, yb, fr, cb, b_mask)
            return c + out.loss_1 + out.loss_2, None
        keys = jax.random.split(key, args.steps)
        c, _ = jax.lax.scan(body, jnp.float32(0), (seeds, masks, keys))
        return c

    # ---- stage: both forwards VMAPPED over stacked params + ct loss
    pstack = jax.tree.map(lambda a, b: jnp.stack([a, b]), s1.params, s2.params)

    def fwd2_vmap(pstack, data, seeds, masks, key):
        def body(c, inp):
            b_seeds, b_mask, k = inp
            kb, k1h, k2h = jax.random.split(k, 3)
            tb, xs, la = S._sample_tree(kb, data, b_seeds, b_mask, fanouts, True)
            yb = jnp.take(data.yhn, b_seeds)
            cb = jnp.take(data.clean, b_seeds)

            def one(p, kk):
                return nets.apply_tree(spec, p, xs, list(tb.masks), tb.fanouts,
                                       train=True, key=kk, leaf_agg=la)["logits"]

            oo = jax.vmap(one)(pstack, jnp.stack([k1h, k2h]))
            out = ct_loss(oo[0], oo[1], yb, fr, cb, b_mask)
            return c + out.loss_1 + out.loss_2, None
        keys = jax.random.split(key, args.steps)
        c, _ = jax.lax.scan(body, jnp.float32(0), (seeds, masks, keys))
        return c

    # ---- stage: full step (epoch driver)
    epoch_fn = S.make_ct_epoch(spec, opt, fanouts, exact_leaf=True)

    def full(data, seeds, masks, key):
        _, _, m = epoch_fn(s1, s2, data, seeds, masks, key, fr)
        return m["loss_1"]

    timed("rng_only", rng_only, seeds, masks, jax.random.key(9))
    timed("gathers_only(fixed idx)", gathers_only, data, idx_d1, idx_d2, idx_csr)
    timed("sample_only", sample_only, data, seeds, masks, jax.random.key(9))
    timed("sample+gather", sample_gather, data, seeds, masks, jax.random.key(9))
    timed("+forward x1 (no dropout)", fwd1_nodrop, data, seeds, masks,
          jax.random.key(9))
    timed("+forward x1", fwd1, data, seeds, masks, jax.random.key(9))
    timed("+forward x2 + ct_loss", fwd2_loss, data, seeds, masks, jax.random.key(9))
    timed("+fwd x2 VMAPPED + ct_loss", fwd2_vmap, pstack, data, seeds, masks,
          jax.random.key(9))
    timed("full step (grad+update x2)", full, data, seeds, masks, jax.random.key(9))


if __name__ == "__main__":
    main()
