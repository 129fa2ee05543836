"""Train-step integration tests: every step factory compiles and learns."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.noise import flip_label, noise_or_not
from noise_gnn_tpu.train import steps as S


@pytest.fixture(scope="module")
def tiny():
    g = synthetic_graph(300, 16, 4, 2400, homophily=0.9, seed=0)
    yhn, mat = flip_label(g.y, 4, "sym", 0.3, np.random.default_rng(0))
    data = S.GraphData(
        x=jnp.asarray(g.x),
        y=jnp.asarray(g.y),
        yhn=jnp.asarray(yhn),
        clean=jnp.asarray(noise_or_not(g.y, yhn)),
        csr=g.csr(),
    )
    return g, data, mat


def batch_of(n, b, rng):
    seeds = rng.choice(n, size=b, replace=False).astype(np.int32)
    return S.Batch(jnp.asarray(seeds), jnp.ones(b, bool))


def spec_for(g, module="sage", layers=2):
    return nets.NetSpec(module=module, in_size=g.num_features, hidden_size=32,
                        out_size=g.num_classes, num_layers=layers,
                        dropout=0.3, nbr_nodes=g.num_nodes)


def test_ct_step_learns(tiny):
    g, data, _ = tiny
    spec = spec_for(g)
    opt = optax.adam(5e-3)
    step = S.make_ct_step(spec, opt, (5, 3))
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(20):
        b = batch_of(g.num_nodes, 64, rng)
        s1, s2, m = step(s1, s2, data, b, jax.random.key(i), jnp.float32(0.2))
        losses.append(float(m["loss_1"]))
    assert losses[-1] < losses[0]
    assert 0.0 <= float(m["pure_ratio_1"]) <= 1.0


def test_ct_step_codi(tiny):
    g, data, _ = tiny
    spec = spec_for(g)
    opt = optax.adam(5e-3)
    step = S.make_ct_step(spec, opt, (5, 3), algo="codi", co_lambda=0.2)
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    b = batch_of(g.num_nodes, 32, np.random.default_rng(1))
    s1, s2, m = step(s1, s2, data, b, jax.random.key(0), jnp.float32(0.1))
    assert np.isfinite(float(m["loss_1"]))


@pytest.mark.parametrize("compare_loss", ["normal", "back"])
def test_baseline_step(tiny, compare_loss):
    g, data, mat = tiny
    spec = spec_for(g)
    opt = optax.adam(5e-3)
    step = S.make_baseline_step(spec, opt, (5, 3), compare_loss=compare_loss)
    s = S.init_state(jax.random.key(0), spec, opt)
    nm = jnp.asarray(mat, jnp.float32)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(15):
        s, m = step(s, data, batch_of(g.num_nodes, 64, rng), jax.random.key(i), nm)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("use_contrast", [False, True])
def test_te_step(tiny, use_contrast):
    g, data, _ = tiny
    spec = spec_for(g, module="sagePL")
    opt = optax.adam(1e-3)
    step = S.make_te_step(spec, opt, (4, 3), use_contrast=use_contrast,
                          spl_rewire_rate=0.05)
    p1 = nets.init_params(jax.random.key(1), spec)
    p2 = nets.init_params(jax.random.key(2), spec)
    s = S.TrainState((p1, p2), opt.init((p1, p2)))
    b = batch_of(g.num_nodes, 16, np.random.default_rng(2))
    s, m = step(s, data, b, jax.random.key(0), jnp.float32(0.2))
    assert np.isfinite(float(m["loss_1"]))
    if use_contrast:
        assert float(m["loss_cont_1"]) != 0.0


@pytest.mark.parametrize("use_cr", [False, True])
def test_ctp_step(tiny, use_cr):
    g, data, _ = tiny
    spec = spec_for(g, module="sagePL")
    opt = optax.adam(1e-3)
    step = S.make_ctp_step(spec, opt, (4, 3), use_cr=use_cr)
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    b = batch_of(g.num_nodes, 16, np.random.default_rng(3))
    s1, s2, m = step(s1, s2, data, b, jax.random.key(0), jnp.float32(0.2))
    assert np.isfinite(float(m["loss_1"]))
    if use_cr:
        assert np.isfinite(float(m["loss_cr_1"]))


@pytest.mark.parametrize("use_pseudo", [False, True])
def test_h_step(tiny, use_pseudo):
    g, data, _ = tiny
    spec = spec_for(g, module="sageH")
    pseudo_spec = spec_for(g, module="sage")
    opt = optax.adam(1e-3)
    step = S.make_h_step(spec, pseudo_spec, opt, (4, 3), use_pseudo=use_pseudo,
                         rewire_rate=0.05)
    joint = (
        nets.init_params(jax.random.key(1), spec),
        nets.init_params(jax.random.key(2), spec),
        nets.init_params(jax.random.key(3), pseudo_spec),
    )
    s = S.TrainState(joint, opt.init(joint))
    b = batch_of(g.num_nodes, 16, np.random.default_rng(4))
    s, m = step(s, data, b, jax.random.key(0), jnp.float32(0.2))
    assert np.isfinite(float(m["loss_1"]))
    if use_pseudo:
        assert np.isfinite(float(m["loss_pred"]))


def test_contrast_train_step(tiny):
    g, data, _ = tiny
    spec = spec_for(g, module="sageFC")
    opt = optax.adam(1e-3)
    step = S.make_contrast_train_step(spec, opt, (4, 3), lam=1.0)
    s = S.init_state(jax.random.key(0), spec, opt)
    views = {k: (data.x, data.csr) for k in ("orig", "edge_s", "feat_s", "large")}
    rng = np.random.default_rng(5)
    s, m = step(s, data, views, batch_of(g.num_nodes, 16, rng),
                batch_of(g.num_nodes, 16, rng), jax.random.key(1))
    assert np.isfinite(float(m["loss_semi"]))
    assert np.isfinite(float(m["loss_cont"]))


def test_eval_fn(tiny):
    g, data, _ = tiny
    spec = spec_for(g)
    params = nets.init_params(jax.random.key(0), spec)
    eval_fn = S.make_eval_fn(spec)
    logits = eval_fn(params, data.x, jnp.asarray(g.edge_index))
    assert logits.shape == (g.num_nodes, g.num_classes)
    # sagePL eval path = pure-branch logits
    spec_pl = spec_for(g, module="sagePL")
    params_pl = nets.init_params(jax.random.key(1), spec_pl)
    logits_pl = S.make_eval_fn(spec_pl)(params_pl, data.x, jnp.asarray(g.edge_index))
    assert logits_pl.shape == (g.num_nodes, g.num_classes)


def test_ctp_step_ncr(tiny):
    g, data, _ = tiny
    spec = spec_for(g, module="sagePL")
    opt = optax.adam(1e-3)
    step = S.make_ctp_step(spec, opt, (4, 3), use_ncr=True)
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    b = batch_of(g.num_nodes, 16, np.random.default_rng(9))
    s1, s2, m = step(s1, s2, data, b, jax.random.key(0), jnp.float32(0.2))
    assert np.isfinite(float(m["loss_1"]))


def test_epoch_scan_matches_step_loop(tiny):
    """make_ct_epoch == iterating make_ct_step with the same keys."""
    g, data, _ = tiny
    spec = spec_for(g)
    opt = optax.adam(5e-3)
    fan = (4, 3)
    nsteps, bs = 3, 32
    rng = np.random.default_rng(11)
    seeds = rng.choice(g.num_nodes, (nsteps, bs), replace=False).astype(np.int32)
    masks = np.ones((nsteps, bs), bool)
    fr = jnp.float32(0.2)
    key = jax.random.key(5)

    e_fn = S.make_ct_epoch(spec, opt, fan)
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    s1e, s2e, me = e_fn(s1, s2, data, jnp.asarray(seeds), jnp.asarray(masks), key, fr)

    step = S.make_ct_step(spec, opt, fan)
    s1b = S.init_state(jax.random.key(1), spec, opt)
    s2b = S.init_state(jax.random.key(2), spec, opt)
    tot = 0.0
    for i, k in enumerate(jax.random.split(key, nsteps)):
        b = S.Batch(jnp.asarray(seeds[i]), jnp.asarray(masks[i]))
        s1b, s2b, m = step(s1b, s2b, data, b, k, fr)
        tot += float(m["loss_1"])
    np.testing.assert_allclose(float(me["loss_1"]), tot, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1e.params),
                     jax.tree_util.tree_leaves(s1b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-5)


def test_ctp_epoch_matches_step_loop(tiny):
    """make_ctp_epoch == iterating make_ctp_step with the same keys."""
    g, data, _ = tiny
    spec = spec_for(g, module="sagePL")
    opt = optax.adam(1e-3)
    fan = (4, 3)
    nsteps, bs = 2, 16
    rng = np.random.default_rng(13)
    seeds = rng.choice(g.num_nodes, (nsteps, bs), replace=False).astype(np.int32)
    masks = np.ones((nsteps, bs), bool)
    fr = jnp.float32(0.2)
    key = jax.random.key(7)

    e_fn = S.make_ctp_epoch(spec, opt, fan, use_cr=True)
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    s1e, s2e, me = e_fn(s1, s2, data, jnp.asarray(seeds), jnp.asarray(masks), key, fr)

    step = S.make_ctp_step(spec, opt, fan, use_cr=True)
    s1b = S.init_state(jax.random.key(1), spec, opt)
    s2b = S.init_state(jax.random.key(2), spec, opt)
    tot = 0.0
    for i, k in enumerate(jax.random.split(key, nsteps)):
        b = S.Batch(jnp.asarray(seeds[i]), jnp.asarray(masks[i]))
        s1b, s2b, m = step(s1b, s2b, data, b, k, fr)
        tot += float(m["loss_1"])
    np.testing.assert_allclose(float(me["loss_1"]), tot, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(s1e.params),
                     jax.tree_util.tree_leaves(s1b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-5)


def test_h_epoch_matches_step_loop(tiny):
    """make_h_epoch == iterating make_h_step with the same keys."""
    g, data, _ = tiny
    spec = spec_for(g, module="sageH")
    pseudo_spec = spec_for(g, module="sage")
    opt = optax.adam(1e-3)
    fan = (4, 3)
    nsteps, bs = 2, 16
    rng = np.random.default_rng(17)
    seeds = rng.choice(g.num_nodes, (nsteps, bs), replace=False).astype(np.int32)
    masks = np.ones((nsteps, bs), bool)
    fr = jnp.float32(0.2)
    key = jax.random.key(9)

    def fresh_state():
        joint = (
            nets.init_params(jax.random.key(1), spec),
            nets.init_params(jax.random.key(2), spec),
            nets.init_params(jax.random.key(3), pseudo_spec),
        )
        return S.TrainState(joint, opt.init(joint))

    e_fn = S.make_h_epoch(spec, pseudo_spec, opt, fan, use_pseudo=True,
                          rewire_rate=0.05)
    se, me = e_fn(fresh_state(), data, jnp.asarray(seeds), jnp.asarray(masks),
                  key, fr)

    step = S.make_h_step(spec, pseudo_spec, opt, fan, use_pseudo=True,
                         rewire_rate=0.05)
    sb = fresh_state()
    tot = 0.0
    for i, k in enumerate(jax.random.split(key, nsteps)):
        b = S.Batch(jnp.asarray(seeds[i]), jnp.asarray(masks[i]))
        sb, m = step(sb, data, b, k, fr)
        tot += float(m["loss_1"])
    np.testing.assert_allclose(float(me["loss_1"]), tot, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(se.params),
                     jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-5)


def test_te_epoch_matches_step_loop(tiny):
    """make_te_epoch == iterating make_te_step with the same keys."""
    g, data, _ = tiny
    spec = spec_for(g, module="sagePL")
    opt = optax.adam(1e-3)
    fan = (4, 3)
    nsteps, bs = 2, 16
    rng = np.random.default_rng(19)
    seeds = rng.choice(g.num_nodes, (nsteps, bs), replace=False).astype(np.int32)
    masks = np.ones((nsteps, bs), bool)
    fr = jnp.float32(0.2)
    key = jax.random.key(11)
    kw = dict(use_contrast=True, spl_rewire_rate=0.05)

    def fresh_state():
        p1 = nets.init_params(jax.random.key(1), spec)
        p2 = nets.init_params(jax.random.key(2), spec)
        return S.TrainState((p1, p2), opt.init((p1, p2)))

    e_fn = S.make_te_epoch(spec, opt, fan, **kw)
    se, me = e_fn(fresh_state(), data, jnp.asarray(seeds), jnp.asarray(masks),
                  key, fr)

    step = S.make_te_step(spec, opt, fan, **kw)
    sb = fresh_state()
    tot = 0.0
    for i, k in enumerate(jax.random.split(key, nsteps)):
        b = S.Batch(jnp.asarray(seeds[i]), jnp.asarray(masks[i]))
        sb, m = step(sb, data, b, k, fr)
        tot += float(m["loss_1"])
    np.testing.assert_allclose(float(me["loss_1"]), tot, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(se.params),
                     jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-5)


def test_contrast_epoch_matches_step_loop(tiny):
    """make_contrast_train_epoch == iterating make_contrast_train_step."""
    g, data, _ = tiny
    spec = spec_for(g, module="sageFC")
    opt = optax.adam(1e-3)
    fan = (4, 3)
    nsteps, bs = 2, 16
    rng = np.random.default_rng(23)
    cs = rng.choice(g.num_nodes, (nsteps, bs), replace=False).astype(np.int32)
    ns = rng.choice(g.num_nodes, (nsteps, bs), replace=False).astype(np.int32)
    cm = np.ones((nsteps, bs), bool)
    key = jax.random.key(13)
    views = {k: (data.x, data.csr) for k in ("orig", "edge_s", "feat_s", "large")}

    e_fn = S.make_contrast_train_epoch(spec, opt, fan, lam=1.0)
    s0 = S.init_state(jax.random.key(0), spec, opt)
    se, me = e_fn(s0, data, views, jnp.asarray(cs), jnp.asarray(cm),
                  jnp.asarray(ns), jnp.asarray(cm), key)

    step = S.make_contrast_train_step(spec, opt, fan, lam=1.0)
    sb = S.init_state(jax.random.key(0), spec, opt)
    tot = 0.0
    for i, k in enumerate(jax.random.split(key, nsteps)):
        bc = S.Batch(jnp.asarray(cs[i]), jnp.asarray(cm[i]))
        bn = S.Batch(jnp.asarray(ns[i]), jnp.asarray(cm[i]))
        sb, m = step(sb, data, views, bc, bn, k)
        tot += float(m["loss"])
    np.testing.assert_allclose(float(me["loss"]), tot, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(se.params),
                     jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=1e-5)
