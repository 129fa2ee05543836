"""Jitted train steps: sampling + forward + loss + update in ONE compiled
program per step (kills the per-step host sync of the reference's CTLoss,
src/utils/losses.py:21-25, and the loader worker processes).

Each ``make_*`` factory closes over *static* configuration only; all arrays
(features, labels, CSR graph) travel through the ``GraphData`` pytree
argument so nothing large is baked into the executable as a constant.

Step inventory (reference pipeline -> factory):
  PipelineCO / PipelineS  -> make_ct_step, make_baseline_step   (tree mode)
  PipelineTE / PipelineTES / PipelineSG / PipelineA
                          -> make_te_step                      (subgraph mode)
  PipelineCTP             -> make_ctp_step
  PipelineH               -> make_h_step
  PipelineCT              -> make_ct_step (warmup) + make_contrast_train_step
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..augment.features import shuffle_pos
from ..augment.rewire import topk_rewire_tree
from ..graph.containers import CSRGraph
from ..ops.tree_agg import TreeTopo
from ..losses.coteaching import backward_correction, codi_loss, cross_entropy, ct_loss
from ..losses.consistency import fix_cr, get_uncertainty, neighbor_align
from ..losses.contrastive import (
    bce_expert_loss,
    bce_expert_loss2,
    discriminator_innerprod,
    discriminator_innerprod2,
)
from ..models import nets
from ..ops.sampler import sample_khop_tree
from ..ops.scatter import fast_take

Array = jax.Array


class GraphData(NamedTuple):
    """Device-resident training data (a pytree; pass, don't close over)."""

    x: Array  # [N, F] features
    y: Array  # [N] true labels
    yhn: Array  # [N] noisy labels
    clean: Array  # [N] bool, True = label clean (noise_or_not oracle)
    csr: CSRGraph  # reversed-CSR for in-neighbor sampling
    # [N, 2F] fused exact-leaf table concat([x, M], 1) (ops/leaf_agg.py),
    # set by pipelines when `exact_leaf` is on; None otherwise
    leaf_agg: Array | None = None


def _sample_tree(key, data: GraphData, seeds, mask, fanouts, exact_leaf: bool):
    """Sample the (possibly one-hop-shallower) tree and fetch its features.

    Returns (tb, xs, leaf_agg_rows): with ``exact_leaf`` the deepest hop is
    not sampled; the deepest depth's own features AND exact neighbor
    aggregate arrive as ONE gather into the fused [N, 2F] table (the gather
    engine is per-index bound, so the double-width row is free)."""
    fan_s = fanouts[:-1] if exact_leaf else fanouts
    tb = sample_khop_tree(key, data.csr, seeds, fan_s, mask)
    if not exact_leaf:
        return tb, tb.gather_features(data.x), None
    f = data.x.shape[-1]
    xs = [fast_take(data.x, ids) for ids in tb.n_ids[:-1]]
    fused = fast_take(data.leaf_agg, tb.n_ids[-1])
    xs.append(fused[:, :f])
    la = jnp.where(tb.masks[-1][:, None], fused[:, f:], 0)
    return tb, xs, la


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState


def init_state(key: Array, spec: nets.NetSpec, optimizer) -> TrainState:
    params = nets.init_params(key, spec)
    return TrainState(params, optimizer.init(params))


class Batch(NamedTuple):
    """Per-step host-provided seed batch."""

    seeds: Array  # [B] global node ids (padded)
    mask: Array  # [B] bool, False on padding


def _seed_labels(data, batch):
    yb = jnp.take(data.yhn, batch.seeds)
    yt = jnp.take(data.y, batch.seeds)
    cb = jnp.take(data.clean, batch.seeds)
    return yb, yt, cb


def epoch_jit(
    n_states: int,
    mesh=None,
    n_data_args: int = 1,
    n_seed_args: int = 2,
    n_tail_args: int = 2,
):
    """jit decorator for whole-epoch drivers with the canonical signature
    ``(*states, data..., seed_arrays..., key/extras...)``.

    With ``mesh`` (a jax.sharding.Mesh with a ``data`` axis): data-parallel
    compilation — the per-step batch dimension of the [nsteps, B] seed/mask
    arrays is sharded over ``data``, everything else (states, graph data,
    PRNG key, scalars) replicated, and GSPMD inserts the per-step gradient
    all-reduce from the replicated output sharding (SURVEY §2.4 disposition:
    no hand-written collectives). The small-loss ranking inside ct_loss needs
    every device to see all batch losses; GSPMD emits exactly that gather
    because the ranks flow into replicated outputs.

    With a ``model`` axis of size > 1 (TP), states arrive pre-sharded by
    parallel.mesh.param_sharding (hidden weight columns over ``model``); the
    state shardings are left unpinned so GSPMD keeps the layout the caller
    placed (pinning them replicated would silently all-gather the params
    every epoch — the round-3 'TP is a config no-op' defect).

    Without ``mesh``: the plain single-device jit used since round 1."""
    donate = tuple(range(n_states))
    if mesh is None:
        return functools.partial(jax.jit, donate_argnums=donate)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    seed = NamedSharding(mesh, P(None, "data"))
    # None = inherit the operand's placement / let GSPMD choose the output
    st = None if dict(mesh.shape).get("model", 1) > 1 else rep
    in_sh = (
        (st,) * n_states
        + (rep,) * n_data_args
        + (seed,) * n_seed_args
        + (rep,) * n_tail_args
    )
    out_sh = (st,) * n_states + (rep,)
    return functools.partial(
        jax.jit, donate_argnums=donate, in_shardings=in_sh, out_shardings=out_sh
    )


def _acc_count(logits, y_true, mask):
    pred = jnp.argmax(logits, axis=-1)
    return jnp.sum((pred == y_true) & mask)


# ------------------------------------------------------------ co-teaching


def ct_epoch_fn(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    algo: str = "coteaching",
    co_lambda: float = 0.1,
    exact_leaf: bool = False,
):
    """Raw (un-jitted) whole-epoch co-teaching function — jitted plain by
    make_ct_epoch, or with mesh shardings by parallel.dp.make_dp_ct_epoch."""

    def epoch(
        s1: TrainState,
        s2: TrainState,
        data: GraphData,
        seeds: Array,
        masks: Array,
        key: Array,
        forget_rate: Array,
    ):
        def body(carry, inp):
            s1, s2 = carry
            b_seeds, b_mask, k = inp
            kb, k1, k2 = jax.random.split(k, 3)
            tb, xs, la = _sample_tree(kb, data, b_seeds, b_mask, fanouts, exact_leaf)
            yb = jnp.take(data.yhn, b_seeds)
            yt = jnp.take(data.y, b_seeds)
            cb = jnp.take(data.clean, b_seeds)

            def loss_fn(p1, p2):
                o1 = nets.apply_tree(spec, p1, xs, list(tb.masks), tb.fanouts,
                                     train=True, key=k1, leaf_agg=la)["logits"]
                o2 = nets.apply_tree(spec, p2, xs, list(tb.masks), tb.fanouts,
                                     train=True, key=k2, leaf_agg=la)["logits"]
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
            # memorization probes: fit to the NOISY training targets overall
            # (agree_*) and restricted to the corrupted samples (noisyfit_*,
            # the direct memorization signal — climbs toward 1 iff the net
            # learns the flipped labels). Counts; host divides.
            corrupt = (~cb) & b_mask
            m = jnp.stack(
                [
                    out.loss_1,
                    out.loss_2,
                    out.pure_ratio_1,
                    out.pure_ratio_2,
                    _acc_count(o1, yt, b_mask).astype(jnp.float32),
                    _acc_count(o2, yt, b_mask).astype(jnp.float32),
                    _acc_count(o1, yb, b_mask).astype(jnp.float32),
                    _acc_count(o2, yb, b_mask).astype(jnp.float32),
                    jnp.sum((jnp.argmax(o1, -1) == yb) & corrupt).astype(jnp.float32),
                    jnp.sum((jnp.argmax(o2, -1) == yb) & corrupt).astype(jnp.float32),
                    jnp.sum(corrupt).astype(jnp.float32),
                ]
            )
            new = (
                TrainState(optax.apply_updates(s1.params, u1), os1),
                TrainState(optax.apply_updates(s2.params, u2), os2),
            )
            return new, m

        keys = jax.random.split(key, seeds.shape[0])
        (s1, s2), ms = jax.lax.scan(body, (s1, s2), (seeds, masks, keys))
        tot = ms.sum(axis=0)
        metrics = {
            "loss_1": tot[0],
            "loss_2": tot[1],
            "pure_ratio_1": tot[2],
            "pure_ratio_2": tot[3],
            "correct_1": tot[4],
            "correct_2": tot[5],
            "agree_1": tot[6],
            "agree_2": tot[7],
            "noisyfit_1": tot[8],
            "noisyfit_2": tot[9],
            "corrupt_n": tot[10],
        }
        return s1, s2, metrics

    return epoch


def make_ct_epoch(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    algo: str = "coteaching",
    co_lambda: float = 0.1,
    exact_leaf: bool = False,
    mesh=None,
):
    """Whole-epoch co-teaching driver: lax.scan over the seed batches inside
    ONE jit. Removes per-step host dispatch entirely (measured ~3 ms/step
    through the dev tunnel; a products epoch has ~1300 steps).

    seeds/masks: [nsteps, B]; returns summed metrics (host divides by
    nsteps). With ``mesh``, compiles data-parallel (see epoch_jit)."""
    return epoch_jit(2, mesh)(
        ct_epoch_fn(spec, optimizer, fanouts, algo, co_lambda, exact_leaf)
    )


def make_ct_step(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    algo: str = "coteaching",
    co_lambda: float = 0.1,
    exact_leaf: bool = False,
):
    """Dual-network co-teaching step, both nets + both optimizers in one jit
    (reference hot loop: src/pipeline.py:110-133)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(
        s1: TrainState,
        s2: TrainState,
        data: GraphData,
        batch: Batch,
        key: Array,
        forget_rate: Array,
    ):
        kb, k1, k2 = jax.random.split(key, 3)
        tb, xs, la = _sample_tree(
            kb, data, batch.seeds, batch.mask, fanouts, exact_leaf
        )
        yb, yt, cb = _seed_labels(data, batch)

        def loss_fn(p1, p2):
            o1 = nets.apply_tree(spec, p1, xs, list(tb.masks), tb.fanouts,
                                 train=True, key=k1, leaf_agg=la)["logits"]
            o2 = nets.apply_tree(spec, p2, xs, list(tb.masks), tb.fanouts,
                                 train=True, key=k2, leaf_agg=la)["logits"]
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
        metrics = {
            "loss_1": out.loss_1,
            "loss_2": out.loss_2,
            "pure_ratio_1": out.pure_ratio_1,
            "pure_ratio_2": out.pure_ratio_2,
            "correct_1": _acc_count(o1, yt, batch.mask),
            "correct_2": _acc_count(o2, yt, batch.mask),
        }
        return (
            TrainState(optax.apply_updates(s1.params, u1), os1),
            TrainState(optax.apply_updates(s2.params, u2), os2),
            metrics,
        )

    return step


def make_baseline_epoch(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    compare_loss: str = "normal",
    exact_leaf: bool = False,
    mesh=None,
):
    """Whole-epoch baseline driver (lax.scan; see make_ct_epoch)."""

    @epoch_jit(1, mesh)
    def epoch(
        s: TrainState,
        data: GraphData,
        seeds: Array,
        masks: Array,
        key: Array,
        noise_mat: Array,
    ):
        def body(carry, inp):
            st = carry
            b_seeds, b_mask, k = inp
            kb, kd = jax.random.split(k)
            if spec.module == "gat":
                # dense masked attention wants an edge LIST, not a dense
                # tree: run the flat seed-first subgraph view of the sampled
                # tree through the edge-list forward (small graphs only)
                tb = sample_khop_tree(kb, data.csr, b_seeds, fanouts, b_mask)
                x_sub, _, _, _ = _flat_subgraph(data, tb)
                ei, e_mask = tb.flat_edges()
            else:
                tb, xs, la = _sample_tree(kb, data, b_seeds, b_mask, fanouts,
                                          exact_leaf)
            yb = jnp.take(data.yhn, b_seeds)
            yt = jnp.take(data.y, b_seeds)
            cb = jnp.take(data.clean, b_seeds)

            def loss_fn(p):
                if spec.module == "gat":
                    o = nets.apply(
                        spec, p, x_sub, ei, num_nodes=x_sub.shape[0],
                        edge_mask=e_mask, train=True, key=kd,
                    )["logits"][: b_seeds.shape[0]]
                else:
                    o = nets.apply_tree(spec, p, xs, list(tb.masks), tb.fanouts,
                                        train=True, key=kd, leaf_agg=la)["logits"]
                if compare_loss == "back":
                    loss = backward_correction(o, yb, noise_mat, b_mask)
                else:
                    ce = cross_entropy(o, yb)
                    w = b_mask.astype(jnp.float32)
                    loss = jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)
                return loss, o

            (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
            u, os_ = optimizer.update(grads, st.opt_state, st.params)
            # memorization probes (see ct_epoch_fn): fit to noisy targets
            # overall and on the corrupted subset
            corrupt = (~cb) & b_mask
            m = jnp.stack([
                loss,
                _acc_count(o, yt, b_mask).astype(jnp.float32),
                _acc_count(o, yb, b_mask).astype(jnp.float32),
                jnp.sum((jnp.argmax(o, -1) == yb) & corrupt).astype(jnp.float32),
                jnp.sum(corrupt).astype(jnp.float32),
            ])
            return TrainState(optax.apply_updates(st.params, u), os_), m

        keys = jax.random.split(key, seeds.shape[0])
        s, ms = jax.lax.scan(body, s, (seeds, masks, keys))
        tot = ms.sum(axis=0)
        return s, {"loss": tot[0], "correct": tot[1], "agree": tot[2],
                   "noisyfit": tot[3], "corrupt_n": tot[4]}

    return epoch


def make_baseline_step(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    compare_loss: str = "normal",
    exact_leaf: bool = False,
):
    """Plain CE / backward-correction baseline (reference train(),
    src/pipeline.py:144-173). noise_mat rides along for 'back'."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(
        s: TrainState,
        data: GraphData,
        batch: Batch,
        key: Array,
        noise_mat: Array,
    ):
        kb, kd = jax.random.split(key)
        tb, xs, la = _sample_tree(
            kb, data, batch.seeds, batch.mask, fanouts, exact_leaf
        )
        yb, yt, _ = _seed_labels(data, batch)

        def loss_fn(p):
            o = nets.apply_tree(spec, p, xs, list(tb.masks), tb.fanouts,
                                train=True, key=kd, leaf_agg=la)["logits"]
            if compare_loss == "back":
                loss = backward_correction(o, yb, noise_mat, batch.mask)
            else:
                ce = cross_entropy(o, yb)
                w = batch.mask.astype(jnp.float32)
                loss = jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)
            return loss, o

        (loss, o), grads = jax.value_and_grad(loss_fn, has_aux=True)(s.params)
        u, os_ = optimizer.update(grads, s.opt_state, s.params)
        metrics = {"loss": loss, "correct": _acc_count(o, yt, batch.mask)}
        return TrainState(optax.apply_updates(s.params, u), os_), metrics

    return step


# ------------------------------------------- sagePL co-teaching+contrastive


def _flat_subgraph(data, tb):
    """Flat seed-first subgraph view of a sampled tree.

    Returns the topology as a :class:`TreeTopo` — the conv layers take the
    scatter-free structured-aggregation path for it (ops/tree_agg.py), which
    is numerically identical to the edge-list path on ``tb.flat_edges()`` but
    ~3 orders of magnitude faster on TPU (XLA scatter-add serializes;
    tools/exp_flat_agg.py)."""
    n_id = tb.flat_n_id()
    node_mask = tb.flat_node_mask()
    edge_mask = (
        jnp.concatenate(tb.masks[1:]) if len(tb.masks) > 1 else jnp.zeros((0,), bool)
    )
    topo = TreeTopo(tb.batch_size, tb.fanouts, edge_mask)
    x_sub = fast_take(data.x, n_id)
    x_sub = jnp.where(node_mask[:, None], x_sub, 0)
    return x_sub, n_id, node_mask, topo


def make_te_step(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    algo: str = "coteaching",
    co_lambda: float = 0.1,
    use_contrast: bool = False,
    spl_cont_beta: float = 1.0,
    spl_rewire_rate: float = 0.1,
    spl_noise_rate_pos: float = 0.1,
    spl_noise_rate_neg: float = 0.1,
):
    """sagePL dual-branch co-teaching + (after ct_tk) topk-rewire contrastive
    on noisy-selected seeds, single joint optimizer over both nets
    (reference PipelineTE.train_ct, src/pipeline_test.py:92-162).

    ``use_contrast`` is static — the epoch <= ct_tk phase compiles without the
    rewiring graphs, matching `if epoch > ct_tk` (src/pipeline_test.py:123).
    """
    loss_of = _te_step_math(
        spec, fanouts, algo, co_lambda, use_contrast, spl_cont_beta,
        spl_rewire_rate, spl_noise_rate_pos, spl_noise_rate_neg,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(
        s: TrainState,
        data: GraphData,
        batch: Batch,
        key: Array,
        forget_rate: Array,
    ):
        yt = jnp.take(data.y, batch.seeds)
        (_, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            s.params, data, batch, key, forget_rate
        )
        u, os_ = optimizer.update(grads, s.opt_state, s.params)
        ct = aux["ct"]
        metrics = {
            "loss_1": ct.loss_1,
            "loss_2": ct.loss_2,
            "pure_ratio_1": ct.pure_ratio_1,
            "pure_ratio_2": ct.pure_ratio_2,
            "loss_cont_1": aux["loss_cont_1"],
            "loss_cont_2": aux["loss_cont_2"],
            "correct_1": _acc_count(aux["o1"], yt, batch.mask),
            "correct_2": _acc_count(aux["o2"], yt, batch.mask),
        }
        return TrainState(optax.apply_updates(s.params, u), os_), metrics

    return step


# ------------------------------------------------- co-teaching + consistency


def make_te_epoch(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    algo: str = "coteaching",
    co_lambda: float = 0.1,
    use_contrast: bool = False,
    spl_cont_beta: float = 1.0,
    spl_rewire_rate: float = 0.1,
    spl_noise_rate_pos: float = 0.1,
    spl_noise_rate_neg: float = 0.1,
    mesh=None,
):
    """Whole-epoch TE driver: lax.scan over seed batches of the sagePL
    co-teaching(+contrastive) step (see make_te_step for the math)."""
    step_math = _te_step_math(
        spec, fanouts, algo, co_lambda, use_contrast, spl_cont_beta,
        spl_rewire_rate, spl_noise_rate_pos, spl_noise_rate_neg,
    )

    @epoch_jit(1, mesh)
    def epoch(
        s: TrainState,
        data: GraphData,
        seeds: Array,
        masks: Array,
        key: Array,
        forget_rate: Array,
    ):
        def body(carry, inp):
            st = carry
            b_seeds, b_mask, k = inp
            (loss, aux), grads = jax.value_and_grad(
                step_math, has_aux=True
            )(st.params, data, Batch(b_seeds, b_mask), k, forget_rate)
            u, os_ = optimizer.update(grads, st.opt_state, st.params)
            ct = aux["ct"]
            yt = jnp.take(data.y, b_seeds)
            m = jnp.stack([
                ct.loss_1, ct.loss_2, ct.pure_ratio_1, ct.pure_ratio_2,
                aux["loss_cont_1"], aux["loss_cont_2"],
                _acc_count(aux["o1"], yt, b_mask).astype(jnp.float32),
                _acc_count(aux["o2"], yt, b_mask).astype(jnp.float32),
            ])
            return TrainState(optax.apply_updates(st.params, u), os_), m

        keys = jax.random.split(key, seeds.shape[0])
        s, ms = jax.lax.scan(body, s, (seeds, masks, keys))
        tot = ms.sum(axis=0)
        metrics = {
            "loss_1": tot[0], "loss_2": tot[1],
            "pure_ratio_1": tot[2], "pure_ratio_2": tot[3],
            "loss_cont_1": tot[4], "loss_cont_2": tot[5],
            "correct_1": tot[6], "correct_2": tot[7],
        }
        return s, metrics

    return epoch


def _te_step_math(
    spec, fanouts, algo, co_lambda, use_contrast, spl_cont_beta,
    spl_rewire_rate, spl_noise_rate_pos, spl_noise_rate_neg,
):
    """Loss of one TE step as a pure function of the joint params
    (shared by make_te_step and make_te_epoch)."""

    def loss_of(joint, data, batch, key, forget_rate):
        kb, k1, k2, k3, k4, k5, k6, kshuf = jax.random.split(key, 8)
        tb = sample_khop_tree(kb, data.csr, batch.seeds, fanouts, batch.mask)
        x_sub, n_id, node_mask, topo = _flat_subgraph(data, tb)
        n_sub = x_sub.shape[0]
        bsz = tb.batch_size
        yb = jnp.take(data.yhn, batch.seeds)
        cb = jnp.take(data.clean, batch.seeds)

        p1, p2 = joint
        out1 = nets.apply(
            spec, p1, x_sub, topo, num_nodes=n_sub,
            train=True, key=k1, n_id=n_id, noise_rate=spl_noise_rate_pos,
        )
        out2 = nets.apply(
            spec, p2, x_sub, topo, num_nodes=n_sub,
            train=True, key=k2, n_id=n_id, noise_rate=spl_noise_rate_pos,
        )
        o1 = out1["z_pure"][:bsz]
        o2 = out2["z_pure"][:bsz]
        if algo == "codi":
            ct = codi_loss(o1, o2, yb, forget_rate, cb, co_lambda, batch.mask)
        else:
            ct = ct_loss(o1, o2, yb, forget_rate, cb, batch.mask)
        loss = ct.loss_1 + ct.loss_2
        aux = {"ct": ct, "o1": o1, "o2": o2,
               "loss_cont_1": jnp.float32(0), "loss_cont_2": jnp.float32(0)}
        if use_contrast:
            pos_topo, neg_topo = topk_rewire_tree(
                out1["h_pure"], topo, spl_rewire_rate
            )
            hedge1 = nets.apply(
                spec, p1, x_sub, pos_topo, num_nodes=n_sub,
                train=True, key=k3, n_id=n_id, noise_rate=spl_noise_rate_pos,
            )["h_pure"]
            hedge2 = nets.apply(
                spec, p2, x_sub, pos_topo, num_nodes=n_sub,
                train=True, key=k4, n_id=n_id, noise_rate=spl_noise_rate_pos,
            )["h_pure"]
            new_x = shuffle_pos(kshuf, x_sub, spl_noise_rate_neg)
            hneg1 = nets.apply(
                spec, p1, new_x, neg_topo, num_nodes=n_sub,
                train=True, key=k5, n_id=n_id, noise_rate=spl_noise_rate_neg,
            )["h_noisy"]
            hneg2 = nets.apply(
                spec, p2, new_x, neg_topo, num_nodes=n_sub,
                train=True, key=k6, n_id=n_id, noise_rate=spl_noise_rate_neg,
            )["h_noisy"]
            lp1, ln1 = discriminator_innerprod(
                out1["h_pure"][:bsz], hedge1[:bsz], hneg1[:bsz]
            )
            lp2, ln2 = discriminator_innerprod(
                out2["h_pure"][:bsz], hedge2[:bsz], hneg2[:bsz]
            )
            lc1 = bce_expert_loss(lp1, ln1, ct.noisy_1, ct.noisy_1)
            lc2 = bce_expert_loss(lp2, ln2, ct.noisy_2, ct.noisy_2)
            loss = loss + spl_cont_beta * (lc1 + lc2)
            aux["loss_cont_1"] = lc1
            aux["loss_cont_2"] = lc2
        return loss, aux

    return loss_of


def _ctp_step_math(
    spec, fanouts, use_cr, beta, spl_noise, use_ncr, ncr_temp,
):
    """Loss of one CTP step as a pure function of (p1, p2) — shared by
    make_ctp_step and make_ctp_epoch."""

    def loss_of(p1, p2, data, batch, key, forget_rate):
        kb, k1, k2 = jax.random.split(key, 3)
        tb = sample_khop_tree(kb, data.csr, batch.seeds, fanouts, batch.mask)
        x_sub, n_id, node_mask, topo = _flat_subgraph(data, tb)
        n_sub = x_sub.shape[0]
        bsz = tb.batch_size
        yb = jnp.take(data.yhn, batch.seeds)
        cb = jnp.take(data.clean, batch.seeds)

        def one_out(p, k):
            return nets.apply(
                spec, p, x_sub, topo, num_nodes=n_sub,
                train=True, key=k, n_id=n_id, noise_rate=spl_noise,
            )

        out1 = one_out(p1, k1)
        out2 = one_out(p2, k2)
        o1 = out1["z_pure"][:bsz]
        o2 = out2["z_pure"][:bsz]
        ct = ct_loss(o1, o2, yb, forget_rate, cb, batch.mask)
        loss1, loss2 = ct.loss_1, ct.loss_2
        cr1 = cr2 = jnp.float32(0)
        if use_ncr:
            # neighborhood-consistency regularizer (the reference's commented
            # NCR path, src/pipeline_ctp.py:119-126, with the intended
            # neighbor_align math)
            pad1 = jnp.zeros((x_sub.shape[0] - bsz,), bool)
            nm1 = jnp.concatenate([ct.noisy_1, pad1])
            nm2 = jnp.concatenate([ct.noisy_2, pad1])
            nal1 = neighbor_align(topo, out1["y_pure"], nm1, temp=ncr_temp)
            nal2 = neighbor_align(topo, out2["y_pure"], nm2, temp=ncr_temp)
            loss1 = loss1 + beta * nal1
            loss2 = loss2 + beta * nal2
        if use_cr:
            w1 = jax.lax.stop_gradient(
                get_uncertainty(topo, out1["y_pure"], spec.out_size)
            )
            w2 = jax.lax.stop_gradient(
                get_uncertainty(topo, out2["y_pure"], spec.out_size)
            )
            cr1 = fix_cr(out1["y_pure"], out1["y_noisy"], bsz, w=w1,
                         sample_mask=batch.mask)
            cr2 = fix_cr(out2["y_pure"], out2["y_noisy"], bsz, w=w2,
                         sample_mask=batch.mask)
            loss1 = loss1 + beta * cr1
            loss2 = loss2 + beta * cr2
        return loss1 + loss2, (ct, o1, o2, cr1, cr2)

    return loss_of


def make_ctp_epoch(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    use_cr: bool = False,
    beta: float = 1.0,
    spl_noise: float = 0.1,
    use_ncr: bool = False,
    ncr_temp: float = 0.1,
    mesh=None,
):
    """Whole-epoch CTP driver: lax.scan over seed batches of the
    co-teaching+consistency step (see make_ctp_step for the math)."""
    loss_of = _ctp_step_math(
        spec, fanouts, use_cr, beta, spl_noise, use_ncr, ncr_temp
    )

    @epoch_jit(2, mesh)
    def epoch(
        s1: TrainState,
        s2: TrainState,
        data: GraphData,
        seeds: Array,
        masks: Array,
        key: Array,
        forget_rate: Array,
    ):
        def body(carry, inp):
            s1, s2 = carry
            b_seeds, b_mask, k = inp
            (_, (ct, o1, o2, cr1, cr2)), grads = jax.value_and_grad(
                loss_of, argnums=(0, 1), has_aux=True
            )(s1.params, s2.params, data, Batch(b_seeds, b_mask), k, forget_rate)
            u1, os1 = optimizer.update(grads[0], s1.opt_state, s1.params)
            u2, os2 = optimizer.update(grads[1], s2.opt_state, s2.params)
            yt = jnp.take(data.y, b_seeds)
            m = jnp.stack([
                ct.loss_1 + beta * cr1, ct.loss_2 + beta * cr2, cr1, cr2,
                ct.pure_ratio_1, ct.pure_ratio_2,
                _acc_count(o1, yt, b_mask).astype(jnp.float32),
                _acc_count(o2, yt, b_mask).astype(jnp.float32),
            ])
            new = (
                TrainState(optax.apply_updates(s1.params, u1), os1),
                TrainState(optax.apply_updates(s2.params, u2), os2),
            )
            return new, m

        keys = jax.random.split(key, seeds.shape[0])
        (s1, s2), ms = jax.lax.scan(body, (s1, s2), (seeds, masks, keys))
        tot = ms.sum(axis=0)
        metrics = {
            "loss_1": tot[0], "loss_2": tot[1],
            "loss_cr_1": tot[2], "loss_cr_2": tot[3],
            "pure_ratio_1": tot[4], "pure_ratio_2": tot[5],
            "correct_1": tot[6], "correct_2": tot[7],
        }
        return s1, s2, metrics

    return epoch


def make_ctp_step(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    use_cr: bool = False,
    beta: float = 1.0,
    spl_noise: float = 0.1,
    use_ncr: bool = False,
    ncr_temp: float = 0.1,
):
    """Co-teaching + FixMatch consistency weighted by neighborhood-entropy
    uncertainty (reference PipelineCTP.train_ct, src/pipeline_ctp.py:85-177;
    the reference's dead ``topk_rewire``/``noisy_rate=`` stale-API calls are
    intentionally dropped — see SURVEY §7.3 item 8)."""
    loss_of = _ctp_step_math(
        spec, fanouts, use_cr, beta, spl_noise, use_ncr, ncr_temp
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(
        s1: TrainState,
        s2: TrainState,
        data: GraphData,
        batch: Batch,
        key: Array,
        forget_rate: Array,
    ):
        yt = jnp.take(data.y, batch.seeds)
        (_, (ct, o1, o2, cr1, cr2)), grads = jax.value_and_grad(
            loss_of, argnums=(0, 1), has_aux=True
        )(s1.params, s2.params, data, batch, key, forget_rate)
        u1, os1 = optimizer.update(grads[0], s1.opt_state, s1.params)
        u2, os2 = optimizer.update(grads[1], s2.opt_state, s2.params)
        metrics = {
            "loss_1": ct.loss_1 + beta * cr1,
            "loss_2": ct.loss_2 + beta * cr2,
            "loss_cr_1": cr1,
            "loss_cr_2": cr2,
            "pure_ratio_1": ct.pure_ratio_1,
            "pure_ratio_2": ct.pure_ratio_2,
            "correct_1": _acc_count(o1, yt, batch.mask),
            "correct_2": _acc_count(o2, yt, batch.mask),
        }
        return (
            TrainState(optax.apply_updates(s1.params, u1), os1),
            TrainState(optax.apply_updates(s2.params, u2), os2),
            metrics,
        )

    return step


# ------------------------------------------------- pseudo-label co-teaching


def _h_step_math(spec, pseudo_spec, fanouts, use_pseudo, beta, rewire_rate):
    """Loss of one PipelineH step as a pure function of the joint
    (p1, p2, p_pseudo) params — shared by make_h_step and make_h_epoch."""

    def loss_of(joint, data, batch, key, forget_rate):
        kb, k1, k2, k3 = jax.random.split(key, 4)
        tb = sample_khop_tree(kb, data.csr, batch.seeds, fanouts, batch.mask)
        x_sub, n_id, node_mask, topo = _flat_subgraph(data, tb)
        n_sub = x_sub.shape[0]
        bsz = tb.batch_size
        yb = jnp.take(data.yhn, batch.seeds)
        cb = jnp.take(data.clean, batch.seeds)

        p1, p2, pp = joint
        o1 = nets.apply(spec, p1, x_sub, topo, num_nodes=n_sub,
                        train=True, key=k1)["logits"][:bsz]
        o2 = nets.apply(spec, p2, x_sub, topo, num_nodes=n_sub,
                        train=True, key=k2)["logits"][:bsz]
        ct = ct_loss(o1, o2, yb, forget_rate, cb, batch.mask)
        loss = ct.loss_1 + ct.loss_2
        loss_pred = loss_add = jnp.float32(0)
        if use_pseudo:
            # pseudo labels from the rewired (positive) graph, raw features
            pos_topo, _ = topk_rewire_tree(x_sub, topo, rewire_rate)
            pl = nets.apply(pseudo_spec, pp, x_sub, pos_topo, num_nodes=n_sub,
                            train=True, key=k3)["logits"][:bsz]
            pred_soft = jax.lax.stop_gradient(jax.nn.softmax(pl, axis=-1))
            logp1 = jax.nn.log_softmax(o1, axis=-1)
            logp2 = jax.nn.log_softmax(o2, axis=-1)
            w1 = ct.noisy_1.astype(jnp.float32)
            w2 = ct.noisy_2.astype(jnp.float32)
            add1 = jnp.sum(-jnp.sum(pred_soft * logp1, -1) * w1) / jnp.maximum(w1.sum(), 1.0)
            add2 = jnp.sum(-jnp.sum(pred_soft * logp2, -1) * w2) / jnp.maximum(w2.sum(), 1.0)
            loss_add = add1 + add2
            wm = batch.mask.astype(jnp.float32)
            ce_p = jnp.sum(cross_entropy(pl, yb) * wm) / jnp.maximum(wm.sum(), 1.0)
            loss_pred = 2.0 * ce_p  # reference sums CE for both (identical) clones
            loss = loss + loss_pred + beta * loss_add
        return loss, (ct, o1, o2, loss_pred, loss_add)

    return loss_of


def make_h_epoch(
    spec: nets.NetSpec,
    pseudo_spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    use_pseudo: bool = False,
    beta: float = 1.0,
    rewire_rate: float = 0.2,
    mesh=None,
):
    """Whole-epoch PipelineH driver: lax.scan over seed batches of the
    3-net pseudo-label co-teaching step (see make_h_step for the math)."""
    loss_of = _h_step_math(spec, pseudo_spec, fanouts, use_pseudo, beta,
                           rewire_rate)

    @epoch_jit(1, mesh)
    def epoch(
        s: TrainState,
        data: GraphData,
        seeds: Array,
        masks: Array,
        key: Array,
        forget_rate: Array,
    ):
        def body(carry, inp):
            st = carry
            b_seeds, b_mask, k = inp
            (_, (ct, o1, o2, lp, la)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(st.params, data, Batch(b_seeds, b_mask), k, forget_rate)
            u, os_ = optimizer.update(grads, st.opt_state, st.params)
            yt = jnp.take(data.y, b_seeds)
            m = jnp.stack([
                ct.loss_1, ct.loss_2, lp, la,
                ct.pure_ratio_1, ct.pure_ratio_2,
                _acc_count(o1, yt, b_mask).astype(jnp.float32),
                _acc_count(o2, yt, b_mask).astype(jnp.float32),
            ])
            return TrainState(optax.apply_updates(st.params, u), os_), m

        keys = jax.random.split(key, seeds.shape[0])
        s, ms = jax.lax.scan(body, s, (seeds, masks, keys))
        tot = ms.sum(axis=0)
        metrics = {
            "loss_1": tot[0], "loss_2": tot[1],
            "loss_pred": tot[2], "loss_add": tot[3],
            "pure_ratio_1": tot[4], "pure_ratio_2": tot[5],
            "correct_1": tot[6], "correct_2": tot[7],
        }
        return s, metrics

    return epoch


def make_h_step(
    spec: nets.NetSpec,
    pseudo_spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    use_pseudo: bool = False,
    beta: float = 1.0,
    rewire_rate: float = 0.2,
):
    """Co-teaching + third pseudo-labeler net on a topk-rewired graph,
    one joint optimizer over all three nets (reference PipelineH.train_ct,
    src/pipeline_h.py:95-175). State params = (p1, p2, p_pseudo)."""
    loss_of = _h_step_math(spec, pseudo_spec, fanouts, use_pseudo, beta,
                           rewire_rate)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(
        s: TrainState,
        data: GraphData,
        batch: Batch,
        key: Array,
        forget_rate: Array,
    ):
        yt = jnp.take(data.y, batch.seeds)
        (_, (ct, o1, o2, lp, la)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(s.params, data, batch, key, forget_rate)
        u, os_ = optimizer.update(grads, s.opt_state, s.params)
        metrics = {
            "loss_1": ct.loss_1,
            "loss_2": ct.loss_2,
            "loss_pred": lp,
            "loss_add": la,
            "pure_ratio_1": ct.pure_ratio_1,
            "pure_ratio_2": ct.pure_ratio_2,
            "correct_1": _acc_count(o1, yt, batch.mask),
            "correct_2": _acc_count(o2, yt, batch.mask),
        }
        return TrainState(optax.apply_updates(s.params, u), os_), metrics

    return step


# --------------------------------------------- contrastive pretrain/finetune


def _contrast_step_math(spec, fanouts, lam):
    """Loss of one PipelineCT finetune step as a pure function of the params
    — shared by make_contrast_train_step and make_contrast_train_epoch."""

    def loss_of(p, data, views, clean_batch, noisy_batch, key):
        keys = jax.random.split(key, 12)
        yb = jnp.take(data.yhn, clean_batch.seeds)

        def embed(x, csr, batch, kk, kd):
            tb = sample_khop_tree(kk, csr, batch.seeds, fanouts, batch.mask)
            xs = [jnp.take(x, ids, axis=0) for ids in tb.n_ids]
            return nets.apply_tree(
                spec, p, xs, list(tb.masks), fanouts, train=True, key=kd
            )

        out_c = embed(data.x, data.csr, clean_batch, keys[0], keys[1])
        o_semi = out_c["logits"]
        w = clean_batch.mask.astype(jnp.float32)
        loss_semi = jnp.sum(cross_entropy(o_semi, yb) * w) / jnp.maximum(w.sum(), 1.0)

        h = embed(*views["orig"], noisy_batch, keys[2], keys[3])["h"]
        h_s1 = embed(*views["edge_s"], noisy_batch, keys[4], keys[5])["h"]
        h_s2 = embed(*views["feat_s"], noisy_batch, keys[6], keys[7])["h"]
        h_l = embed(*views["large"], noisy_batch, keys[8], keys[9])["h"]
        lp1, lp2, ln = discriminator_innerprod2(h, h_s1, h_s2, h_l)
        loss_cont = bce_expert_loss2(lp1, lp2, ln, noisy_batch.mask, noisy_batch.mask)
        return loss_semi + lam * loss_cont, (loss_semi, loss_cont, o_semi)

    return loss_of


def make_contrast_train_epoch(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    lam: float = 1.0,
    mesh=None,
):
    """Whole-epoch PipelineCT finetune driver: lax.scan over zipped
    (clean, noisy) seed batches (see make_contrast_train_step for the math)."""
    loss_of = _contrast_step_math(spec, fanouts, lam)

    @epoch_jit(1, mesh, n_data_args=2, n_seed_args=4, n_tail_args=1)
    def epoch(
        s: TrainState,
        data: GraphData,
        views: dict,
        clean_seeds: Array,   # [nsteps, Bc]
        clean_masks: Array,
        noisy_seeds: Array,   # [nsteps, Bn]
        noisy_masks: Array,
        key: Array,
    ):
        def body(carry, inp):
            st = carry
            cs, cm, ns, nm, k = inp
            (loss, (ls, lc, o)), grads = jax.value_and_grad(
                loss_of, has_aux=True
            )(st.params, data, views, Batch(cs, cm), Batch(ns, nm), k)
            u, os_ = optimizer.update(grads, st.opt_state, st.params)
            yt = jnp.take(data.y, cs)
            m = jnp.stack([
                ls, lc, loss,
                _acc_count(o, yt, cm).astype(jnp.float32),
            ])
            return TrainState(optax.apply_updates(st.params, u), os_), m

        keys = jax.random.split(key, clean_seeds.shape[0])
        s, ms = jax.lax.scan(
            body, s, (clean_seeds, clean_masks, noisy_seeds, noisy_masks, keys)
        )
        tot = ms.sum(axis=0)
        metrics = {
            "loss_semi": tot[0],
            "loss_cont": tot[1],
            "loss": tot[2],
            "correct": tot[3],
        }
        return s, metrics

    return epoch


def make_contrast_train_step(
    spec: nets.NetSpec,
    optimizer,
    fanouts: tuple[int, ...],
    lam: float = 1.0,
):
    """Phase-2 step of PipelineCT (reference src/pipeline_contrast.py:133-183):
    semi-supervised CE on clean seeds + inner-product contrastive over four
    views of noisy seeds (orig / edge-augmented / feature-shuffled as
    positives, edge+feature-large as negative).

    ``views`` is a GraphData-like pytree per view (same y/yhn; x and csr can
    differ). State params: single finetuned net (model1)."""
    loss_of = _contrast_step_math(spec, fanouts, lam)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(
        s: TrainState,
        data: GraphData,
        views: dict,  # {'orig','edge_s','feat_s','large'} -> (x, csr)
        clean_batch: Batch,
        noisy_batch: Batch,
        key: Array,
    ):
        yt = jnp.take(data.y, clean_batch.seeds)
        (loss, (ls, lc, o)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            s.params, data, views, clean_batch, noisy_batch, key
        )
        u, os_ = optimizer.update(grads, s.opt_state, s.params)
        metrics = {
            "loss_semi": ls,
            "loss_cont": lc,
            "loss": loss,
            "correct": _acc_count(o, yt, clean_batch.mask),
        }
        return TrainState(optax.apply_updates(s.params, u), os_), metrics

    return step


# ------------------------------------------------------------------- eval


def make_eval_fn(spec: nets.NetSpec):
    """Full-graph forward -> logits, entirely on device (replaces the
    reference's layer-wise host-staged inference, src/models/layers/sage.py:42-58).
    For sagePL/sageH/sageFC the eval path is the plain conv stack (parity with
    their ``inference``)."""

    @jax.jit
    def logits_fn(params: dict, x: Array, edge_index: Array):
        out = nets.apply(spec, params, x, edge_index, train=False)
        if spec.module == "sagePL":
            return out["z_pure"]
        return out["logits"]

    return logits_fn
