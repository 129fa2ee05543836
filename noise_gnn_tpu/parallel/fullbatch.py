"""Distributed full-GRAPH training over node-sharded features.

The reference's `batch_size_full` mode (src/pipeline_s.py:62-63) still runs
fanout-sampled neighborhoods — one giant NeighborLoader batch. This module is
the TPU build's scaling upgrade past that: co-teaching/baseline training on
the EXACT aggregation over every edge, features sharded over the mesh `data`
axis, one halo boundary exchange per layer per direction (parallel/halo.py).

There is deliberately no hand-written VJP: `halo_spmm` is linear in x and
composed of primitives whose transposes XLA already knows (gather -> scatter-
add, segment_sum -> take, all_to_all -> all_to_all with swapped axes), so
`jax.grad` derives the reversed boundary exchange automatically and — because
the op is linear — stores no residuals for it. Gradient equality against the
single-device edge-list step is asserted by tests/test_fullgraph.py.

Memory feasibility at flagship scale (ogbn-products, 2.45M nodes, 123.7M
directed edges, D=8 shards, hidden 256, f32):
  per-shard features         x:  2.45M/8 x 100 x 4       ~ 123 MB
  per-shard activations         2 nets x 3 layers x 256  ~ 0.9 GB (bf16: 0.5)
  partition arrays           src_local+slot: 2 x E/8 x 4 ~ 124 MB/shard
  boundary buffers           [D, B_max, 256] x 4         ~ deps on locality;
                             contiguous-ID worst case ~0.9 GB, locality_order
                             measured -40% boundary (docs/SCALING.md)
  => fits a 16 GB v5e chip with >3x headroom; single-device full-graph
  (everything x8) would not fit the activations of both nets plus Adam.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses.coteaching import (
    backward_correction,
    codi_loss,
    cross_entropy,
    ct_loss,
)
from ..models import nets
from ..models.layers import dropout
from ..train.steps import TrainState, _acc_count
from .halo import HaloPartition, build_halo_partition, halo_spmm, place_partition


def build_train_partition(mesh, edge_index: np.ndarray, num_nodes: int):
    """Placed halo partition for full-graph training (same pack as eval)."""
    return place_partition(
        mesh, build_halo_partition(edge_index, num_nodes, mesh.shape["data"])
    )


def fullgraph_forward(mesh, part: HaloPartition, spec, params, x,
                      train: bool = False, key=None):
    """Node-sharded conv-stack forward: [N_pad, F] -> [N_pad, C] logits.

    Mirrors nets._stack_forward (conv -> relu -> dropout between layers; no
    BN — gated off by the pipeline) with the SpMM replaced by the halo
    exchange. Dropout draws fresh [N_pad, H] masks; with the partitionable
    threefry PRNG the draw for a global row is shard-layout independent."""
    is_gcn = spec.module == "gcn"
    if spec.compute_dtype != "float32":
        x = x.astype(jnp.dtype(spec.compute_dtype))
    for i, p in enumerate(params["convs"]):
        agg = halo_spmm(mesh, part, x, mean=not is_gcn)
        if is_gcn:
            x = (agg + x) @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
        else:
            x = (
                agg @ p["w_neigh"].astype(x.dtype)
                + x @ p["w_root"].astype(x.dtype)
                + p["b"].astype(x.dtype)
            )
        if i != spec.num_layers - 1:
            x = jax.nn.relu(x)
            if train and key is not None:
                key, sub = jax.random.split(key)
                x = dropout(sub, x, spec.dropout, True)
    return x.astype(jnp.float32)


def _shardings(mesh):
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("data"))
    return rep, row


def make_fullgraph_ct_epoch(
    mesh,
    spec: nets.NetSpec,
    optimizer,
    algo: str = "coteaching",
    co_lambda: float = 0.1,
):
    """One full-graph co-teaching update (an 'epoch' IS one step: every
    train node participates; b_seeds/b_mask are [T] vectors covering the
    whole train split, padded to the replicated-arg contract).

    x: [N_pad, F] sharded over `data`; part: the placed halo partition
    (passed as a pytree argument, NOT closed over — closed-over buffers
    serialize into the remote-compile payload)."""
    rep, row = _shardings(mesh)

    @functools.partial(
        jax.jit,
        donate_argnums=(0, 1),
        in_shardings=(rep, rep, row, row, rep, rep, rep, rep, rep, rep, rep),
        out_shardings=(rep, rep, rep),
    )
    def epoch(s1, s2, part, x, y, yhn, clean, b_seeds, b_mask, key,
              forget_rate):
        k1, k2 = jax.random.split(key)
        yb = jnp.take(yhn, b_seeds)
        yt = jnp.take(y, b_seeds)
        cb = jnp.take(clean, b_seeds)

        def loss_fn(p1, p2):
            l1 = fullgraph_forward(mesh, part, spec, p1, x, True, k1)
            l2 = fullgraph_forward(mesh, part, spec, p2, x, True, k2)
            o1 = jnp.take(l1, b_seeds, axis=0)
            o2 = jnp.take(l2, b_seeds, axis=0)
            if algo == "codi":
                out = codi_loss(o1, o2, yb, forget_rate, cb, co_lambda, b_mask)
            else:
                out = ct_loss(o1, o2, yb, forget_rate, cb, b_mask)
            return out.loss_1 + out.loss_2, (out, o1, o2)

        (_, (out, o1, o2)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(s1.params, s2.params)
        u1, os1 = optimizer.update(grads[0], s1.opt_state, s1.params)
        u2, os2 = optimizer.update(grads[1], s2.opt_state, s2.params)
        metrics = {
            "loss_1": out.loss_1,
            "loss_2": out.loss_2,
            "pure_ratio_1": out.pure_ratio_1,
            "pure_ratio_2": out.pure_ratio_2,
            "correct_1": _acc_count(o1, yt, b_mask).astype(jnp.float32),
            "correct_2": _acc_count(o2, yt, b_mask).astype(jnp.float32),
        }
        return (
            TrainState(optax.apply_updates(s1.params, u1), os1),
            TrainState(optax.apply_updates(s2.params, u2), os2),
            metrics,
        )

    return epoch


def make_fullgraph_baseline_epoch(
    mesh,
    spec: nets.NetSpec,
    optimizer,
    compare_loss: str = "normal",
):
    """Full-graph CE / backward-correction baseline update (one step)."""
    rep, row = _shardings(mesh)

    @functools.partial(
        jax.jit,
        donate_argnums=(0,),
        in_shardings=(rep, row, row, rep, rep, rep, rep, rep, rep),
        out_shardings=(rep, rep),
    )
    def epoch(s, part, x, y, yhn, b_seeds, b_mask, key, noise_mat):
        yb = jnp.take(yhn, b_seeds)
        yt = jnp.take(y, b_seeds)

        def loss_fn(p):
            logits = fullgraph_forward(mesh, part, spec, p, x, True, key)
            o = jnp.take(logits, b_seeds, axis=0)
            if compare_loss == "back":
                loss = backward_correction(o, yb, noise_mat, b_mask)
            else:
                ce = cross_entropy(o, yb)
                w = b_mask.astype(jnp.float32)
                loss = jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)
            return loss, o

        (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(s.params)
        u, os_ = optimizer.update(grads, s.opt_state, s.params)
        metrics = {
            "loss": loss,
            "correct": _acc_count(o, yt, b_mask).astype(jnp.float32),
        }
        return TrainState(optax.apply_updates(s.params, u), os_), metrics

    return epoch
