"""Decompose the CTP (sagePL flat-subgraph) train step cost on the TPU.

Round-1's CTP ran ~50 s/STEP on cora-scale (out/metrics/dt820_cora_id990...).
This measures the step at the same shapes — sagePL hid 256, F=8710,
N=19793, bs 512, fanouts (10, 5) — comparing the round-1 edge-list conv path
against the round-2 TreeTopo structured path, and isolating forward /
backward / optimizer stages.

Usage: timeout 1800 python tools/exp_ctp_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from noise_gnn_tpu.graph.datasets import load_network
from noise_gnn_tpu.losses.coteaching import ct_loss
from noise_gnn_tpu.losses.consistency import fix_cr, get_uncertainty
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.ops.sampler import flat_edge_index, sample_khop_tree
from noise_gnn_tpu.train import steps as S


def timeit(fn, *args, iters=2):
    r = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    print("device:", jax.devices()[0])
    cfg = {"dataset_name": "cora", "seed": 0}
    g = load_network(cfg)
    fanouts = (10, 5)
    bs = 512
    spec = nets.NetSpec(module="sagePL", in_size=g.num_features, hidden_size=256,
                        out_size=g.num_classes, num_layers=2, dropout=0.5,
                        nbr_nodes=g.num_nodes)
    data = S.GraphData(
        x=jnp.asarray(g.x), y=jnp.asarray(g.y), yhn=jnp.asarray(g.y),
        clean=jnp.ones((g.num_nodes,), bool), csr=g.csr(),
    )
    rng = np.random.default_rng(0)
    seeds = jnp.asarray(rng.integers(0, g.num_nodes, bs).astype(np.int32))
    batch = S.Batch(seeds, jnp.ones((bs,), bool))
    key = jax.random.key(0)
    opt = optax.adam(1e-3)
    p1 = nets.init_params(jax.random.key(1), spec)
    p2 = nets.init_params(jax.random.key(2), spec)
    fr = jnp.float32(0.3)

    ei_const = jnp.asarray(flat_edge_index(bs, fanouts))

    def make_loss(use_topo, use_cr):
        def loss_of(p1, p2, data, batch, key, forget_rate):
            kb, k1, k2 = jax.random.split(key, 3)
            tb = sample_khop_tree(kb, data.csr, batch.seeds, fanouts, batch.mask)
            x_sub, n_id, node_mask, topo = S._flat_subgraph(data, tb)
            n_sub = x_sub.shape[0]
            bsz = tb.batch_size
            yb = jnp.take(data.yhn, batch.seeds)
            cb = jnp.take(data.clean, batch.seeds)
            graph_arg = topo if use_topo else ei_const
            em = None if use_topo else topo.edge_mask

            def one_out(p, k):
                return nets.apply(spec, p, x_sub, graph_arg, num_nodes=n_sub,
                                  edge_mask=em, train=True, key=k, n_id=n_id,
                                  noise_rate=0.1)

            out1 = one_out(p1, k1)
            out2 = one_out(p2, k2)
            o1 = out1["z_pure"][:bsz]
            o2 = out2["z_pure"][:bsz]
            ct = ct_loss(o1, o2, yb, forget_rate, cb, batch.mask)
            loss1, loss2 = ct.loss_1, ct.loss_2
            if use_cr:
                w1 = jax.lax.stop_gradient(
                    get_uncertainty(graph_arg, out1["y_pure"], spec.out_size, em))
                w2 = jax.lax.stop_gradient(
                    get_uncertainty(graph_arg, out2["y_pure"], spec.out_size, em))
                loss1 = loss1 + fix_cr(out1["y_pure"], out1["y_noisy"], bsz, w=w1,
                                       sample_mask=batch.mask)
                loss2 = loss2 + fix_cr(out2["y_pure"], out2["y_noisy"], bsz, w=w2,
                                       sample_mask=batch.mask)
            return loss1 + loss2

        return loss_of

    for name, use_topo in [("TreeTopo (round-2)", True)] + ([("edge-list (round-1)", False)] if "--old" in sys.argv else []):
        loss_of = make_loss(use_topo, use_cr=True)
        fwd = jax.jit(lambda p1, p2, k: loss_of(p1, p2, data, batch, k, fr))
        t_f = timeit(fwd, p1, p2, key)
        print(f"{name}: forward only          {t_f*1e3:8.1f} ms")

        grad_fn = jax.jit(jax.grad(lambda p1, p2, k: loss_of(p1, p2, data, batch, k, fr),
                                   argnums=(0, 1)))
        t_g = timeit(grad_fn, p1, p2, key)
        print(f"{name}: forward+backward      {t_g*1e3:8.1f} ms")

        os1, os2 = opt.init(p1), opt.init(p2)

        @jax.jit
        def full(p1, p2, os1, os2, k):
            g1, g2 = jax.grad(lambda a, b: loss_of(a, b, data, batch, k, fr),
                              argnums=(0, 1))(p1, p2)
            u1, os1b = opt.update(g1, os1, p1)
            u2, os2b = opt.update(g2, os2, p2)
            return optax.apply_updates(p1, u1), optax.apply_updates(p2, u2), os1b, os2b

        t_s = timeit(full, p1, p2, os1, os2, key)
        print(f"{name}: full step (+2 Adam)   {t_s*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
