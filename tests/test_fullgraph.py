"""Distributed full-GRAPH training (parallel/fullbatch.py): the halo-exchange
SpMM is linear, so jax.grad derives the reversed boundary exchange — these
tests pin gradient equality against the single-device edge-list forward and
run the product path end-to-end (VERDICT r2 item #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.parallel import fullbatch as FB
from noise_gnn_tpu.parallel.halo import shard_features
from noise_gnn_tpu.parallel.mesh import make_mesh, replicated
from noise_gnn_tpu.losses.coteaching import ct_loss
from noise_gnn_tpu.train import steps as S


@pytest.fixture(scope="module")
def setup():
    g = synthetic_graph(256, 16, 4, 2048, seed=0)
    mesh = make_mesh()
    spec = nets.NetSpec(module="sage", in_size=16, hidden_size=16,
                        out_size=4, num_layers=2, dropout=0.0)
    part = FB.build_train_partition(mesh, g.edge_index, g.num_nodes)
    xs = shard_features(mesh, g.x, part)
    return g, mesh, spec, part, xs


@pytest.mark.parametrize("module", ["sage", "gcn"])
def test_fullgraph_forward_matches_apply(setup, module):
    g, mesh, spec, part, xs = setup
    import dataclasses

    spec = dataclasses.replace(spec, module=module)
    params = nets.init_params(jax.random.key(0), spec)
    got = np.asarray(
        FB.fullgraph_forward(mesh, part, spec, params, xs)
    )[: g.num_nodes]
    want = np.asarray(
        nets.apply(spec, params, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                   train=False)["logits"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fullgraph_ct_gradients_match_edge_list(setup):
    """Param gradients of the sharded full-graph co-teaching loss equal the
    single-device edge-list computation (dropout off: the two forwards draw
    different mask shapes)."""
    g, mesh, spec, part, xs = setup
    p1 = nets.init_params(jax.random.key(1), spec)
    p2 = nets.init_params(jax.random.key(2), spec)
    rng = np.random.default_rng(0)
    yhn = np.where(rng.random(g.num_nodes) < 0.3,
                   rng.integers(0, 4, g.num_nodes), g.y)
    clean = jnp.asarray(yhn == g.y)
    yhn = jnp.asarray(yhn)
    seeds = jnp.arange(128, dtype=jnp.int32)
    mask = jnp.ones(128, bool)
    fr = jnp.float32(0.3)

    def loss_sharded(p1, p2):
        l1 = FB.fullgraph_forward(mesh, part, spec, p1, xs)
        l2 = FB.fullgraph_forward(mesh, part, spec, p2, xs)
        out = ct_loss(jnp.take(l1, seeds, 0), jnp.take(l2, seeds, 0),
                      jnp.take(yhn, seeds), fr, jnp.take(clean, seeds), mask)
        return out.loss_1 + out.loss_2

    def loss_single(p1, p2):
        x, ei = jnp.asarray(g.x), jnp.asarray(g.edge_index)
        l1 = nets.apply(spec, p1, x, ei, train=False)["logits"]
        l2 = nets.apply(spec, p2, x, ei, train=False)["logits"]
        out = ct_loss(jnp.take(l1, seeds, 0), jnp.take(l2, seeds, 0),
                      jnp.take(yhn, seeds), fr, jnp.take(clean, seeds), mask)
        return out.loss_1 + out.loss_2

    g_sh = jax.grad(loss_sharded, argnums=(0, 1))(p1, p2)
    g_sd = jax.grad(loss_single, argnums=(0, 1))(p1, p2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-3, atol=2e-4),
        g_sh, g_sd,
    )


def test_fullgraph_ct_epoch_trains(setup):
    """The jitted full-graph epoch (part as a pytree ARG, states donated)
    runs and reduces the loss over updates."""
    g, mesh, spec, part, xs = setup
    opt = optax.adam(5e-2)
    epoch = FB.make_fullgraph_ct_epoch(mesh, spec, opt)
    rep = replicated(mesh)
    s1 = jax.device_put(S.init_state(jax.random.key(1), spec, opt), rep)
    s2 = jax.device_put(S.init_state(jax.random.key(2), spec, opt), rep)
    y = jax.device_put(jnp.asarray(g.y), rep)
    seeds = jax.device_put(jnp.arange(192, dtype=jnp.int32), rep)
    mask = jax.device_put(jnp.ones(192, bool), rep)
    losses = []
    for e in range(8):
        s1, s2, m = epoch(s1, s2, part, xs, y, y, jnp.ones(g.num_nodes, bool),
                          seeds, mask, jax.random.key(10 + e),
                          jnp.float32(0.0))
        losses.append(float(m["loss_1"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_pipeline_full_graph_product_path(tmp_path):
    """PipelineS with `full_graph: true` trains both branches end-to-end on
    the mesh and reports finite accuracies well above chance."""
    from noise_gnn_tpu.train.pipelines import PipelineS
    from noise_gnn_tpu.utils.config import DEFAULTS

    cfg = dict(DEFAULTS)
    cfg.update(
        dataset_name="cora", synthetic_scale=16, hidden_size=32, num_layers=2,
        nbr_neighbors=[5, 3], num_runs=1, max_epochs=8, batch_size=128,
        noise_rate=0.3, noise_type="sym", ct_tk=2, ct_tau=0.5,
        epoch_logger=False, out_dir=str(tmp_path), seed=0,
        train_type="both", compare_loss="back", full_graph=True,
        learning_rate=5e-3,
    )
    pipe = PipelineS(cfg)
    assert pipe._fullgraph_on(pipe.spec_for())
    res = pipe.loop()
    assert res["nalgo"][0] > 2.0 / cfg["nbr_classes"]
    assert np.isfinite(res["baseline"][0])
