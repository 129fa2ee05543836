"""Data-parallel co-teaching: seed batches sharded over the mesh ``data``
axis, parameters replicated (optionally TP-sharded over ``model``), gradient
all-reduce inserted by GSPMD from the sharding annotations — no hand-written
collectives (SURVEY §2.4 disposition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..losses.coteaching import codi_loss, ct_loss
from ..models import nets
from ..ops.sampler import sample_khop_tree
from ..train.steps import Batch, GraphData, TrainState
from .mesh import batch_sharding, replicated


def shard_batch(batch: Batch, mesh) -> Batch:
    """Place a padded seed batch with the leading dim over ``data``."""
    bs = batch_sharding(mesh)
    return Batch(jax.device_put(batch.seeds, bs), jax.device_put(batch.mask, bs))


def make_dp_ct_epoch(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    mesh,
    algo: str = "coteaching",
    co_lambda: float = 0.1,
    exact_leaf: bool = False,
):
    """Whole-epoch DP driver: the single-chip lax.scan epoch (steps.py)
    compiled with the per-step seed batch dimension sharded over ``data``.
    GSPMD inserts the gradient all-reduce per scan step; states, graph data
    and metrics stay replicated. (Thin alias of steps.make_ct_epoch(mesh=...),
    which is what the product pipelines call.)"""
    from ..train.steps import make_ct_epoch

    return make_ct_epoch(spec, optimizer, fanouts, algo, co_lambda,
                         exact_leaf, mesh=mesh)


def make_dp_ct_step(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    mesh,
    algo: str = "coteaching",
    co_lambda: float = 0.1,
):
    """Co-teaching step compiled with explicit shardings over `mesh`.

    The small-loss selection needs each device to rank ALL batch losses, so
    logits are all-gathered to the full batch before the loss — GSPMD emits
    exactly that from the replicated output sharding of the ranks. The batch
    dimension of the sampled tree and forward pass stays sharded.
    """
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    @functools.partial(
        jax.jit,
        donate_argnums=(0, 1),
        in_shardings=(rep, rep, rep, Batch(bsh, bsh), rep, rep),
        out_shardings=(rep, rep, rep),
    )
    def step(
        s1: TrainState,
        s2: TrainState,
        data: GraphData,
        batch: Batch,
        key: jax.Array,
        forget_rate: jax.Array,
    ):
        kb, k1, k2 = jax.random.split(key, 3)
        tb = sample_khop_tree(kb, data.csr, batch.seeds, fanouts, batch.mask)
        yb = jnp.take(data.yhn, batch.seeds)
        yt = jnp.take(data.y, batch.seeds)
        cb = jnp.take(data.clean, batch.seeds)

        def loss_fn(p1, p2):
            xs = tb.gather_features(data.x)
            o1 = nets.apply_tree(spec, p1, xs, list(tb.masks), fanouts,
                                 train=True, key=k1)["logits"]
            o2 = nets.apply_tree(spec, p2, xs, list(tb.masks), fanouts,
                                 train=True, key=k2)["logits"]
            if algo == "codi":
                out = codi_loss(o1, o2, yb, forget_rate, cb, co_lambda, batch.mask)
            else:
                out = ct_loss(o1, o2, yb, forget_rate, cb, batch.mask)
            return out.loss_1 + out.loss_2, (out, o1, o2)

        (_, (out, o1, o2)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(s1.params, s2.params)
        u1, os1 = optimizer.update(grads[0], s1.opt_state, s1.params)
        u2, os2 = optimizer.update(grads[1], s2.opt_state, s2.params)
        pred_ok_1 = jnp.sum((jnp.argmax(o1, -1) == yt) & batch.mask)
        pred_ok_2 = jnp.sum((jnp.argmax(o2, -1) == yt) & batch.mask)
        metrics = {
            "loss_1": out.loss_1,
            "loss_2": out.loss_2,
            "pure_ratio_1": out.pure_ratio_1,
            "pure_ratio_2": out.pure_ratio_2,
            "correct_1": pred_ok_1,
            "correct_2": pred_ok_2,
        }
        return (
            TrainState(optax.apply_updates(s1.params, u1), os1),
            TrainState(optax.apply_updates(s2.params, u2), os2),
            metrics,
        )

    return step
