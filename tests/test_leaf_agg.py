"""Exact-leaf mode (ops/leaf_agg.py): parity with the sampled tree forward
when sampling is exhaustive, and end-to-end learning through the step
factories."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.noise import flip_label, noise_or_not
from noise_gnn_tpu.ops.leaf_agg import (
    fused_leaf_table,
    leaf_agg_eligible,
    precompute_leaf_agg,
)
from noise_gnn_tpu.ops.sampler import sample_khop_tree
from noise_gnn_tpu.train import steps as S


@pytest.fixture(scope="module")
def tiny():
    g = synthetic_graph(200, 16, 4, 1200, homophily=0.9, seed=3)
    yhn, _ = flip_label(g.y, 4, "sym", 0.3, np.random.default_rng(0))
    return g, jnp.asarray(yhn)


def spec_for(g, module="sage", layers=2, aggr="mean"):
    return nets.NetSpec(module=module, in_size=g.num_features, hidden_size=32,
                        out_size=g.num_classes, num_layers=layers,
                        dropout=0.0, nbr_nodes=g.num_nodes, aggr=aggr)


@pytest.mark.parametrize("module,aggr", [
    ("sage", "mean"), ("sage", "max"), ("gcn", "mean"), ("sageH", "mean"),
])
def test_exact_leaf_matches_exhaustive_tree(tiny, module, aggr):
    """With fanouts >= max in-degree the sampler takes ALL neighbors
    (deg <= fanout path, ops/sampler.py), so the sampled tree forward is
    already exact — the exact-leaf forward must match it."""
    g, _ = tiny
    csr = g.csr()
    max_deg = int(np.max(np.asarray(csr.indptr[1:] - csr.indptr[:-1])))
    fanouts = (max_deg, max_deg)
    spec = spec_for(g, module=module, aggr=aggr)
    params = nets.init_params(jax.random.key(0), spec)
    x = jnp.asarray(g.x)
    seeds = jnp.arange(32, dtype=jnp.int32)
    mask = jnp.ones(32, bool)

    tb_full = sample_khop_tree(jax.random.key(1), csr, seeds, fanouts, mask)
    out_full = nets.apply_tree(
        spec, params, tb_full.gather_features(x), list(tb_full.masks),
        tb_full.fanouts,
    )

    kind = "sum" if module == "gcn" else aggr
    table = precompute_leaf_agg(x, csr, aggr=kind)
    tb = sample_khop_tree(jax.random.key(2), csr, seeds, fanouts[:-1], mask)
    la = jnp.take(table, tb.n_ids[-1], axis=0)
    la = jnp.where(tb.masks[-1][:, None], la, 0)
    out = nets.apply_tree(
        spec, params, tb.gather_features(x), list(tb.masks), tb.fanouts,
        leaf_agg=la,
    )
    for k in out_full:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(out_full[k]), rtol=2e-5, atol=2e-5
        )


def test_precompute_matches_dense_reference(tiny):
    g, _ = tiny
    csr = g.csr()
    x = np.asarray(g.x)
    n = g.num_nodes
    dense = np.zeros((n, n), np.float32)
    src, dst = g.edge_index
    # accumulate (edge multiplicity preserved, unlike dense[dst, src] = 1)
    np.add.at(dense, (dst, src), 1.0)
    deg = np.maximum(dense.sum(1, keepdims=True), 1.0)
    np.testing.assert_allclose(
        np.asarray(precompute_leaf_agg(jnp.asarray(x), csr, aggr="mean")),
        dense @ x / deg, rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(precompute_leaf_agg(jnp.asarray(x), csr, aggr="sum")),
        dense @ x, rtol=1e-5, atol=1e-4,
    )


def test_exact_leaf_ct_epoch_learns(tiny):
    g, yhn = tiny
    data = S.GraphData(
        x=jnp.asarray(g.x), y=jnp.asarray(g.y), yhn=yhn,
        clean=jnp.asarray(noise_or_not(g.y, np.asarray(yhn))),
        csr=g.csr(),
    )
    spec = spec_for(g)
    table = fused_leaf_table(data.x, data.csr, aggr="mean")
    assert table.shape == (g.num_nodes, 2 * g.num_features)
    np.testing.assert_array_equal(np.asarray(table[:, : g.num_features]),
                                  np.asarray(data.x))
    data = data._replace(leaf_agg=table)
    opt = optax.adam(5e-3)
    epoch_fn = S.make_ct_epoch(spec, opt, (5, 3), exact_leaf=True)
    s1 = S.init_state(jax.random.key(1), spec, opt)
    s2 = S.init_state(jax.random.key(2), spec, opt)
    seeds = jnp.arange(128, dtype=jnp.int32).reshape(2, 64)
    masks = jnp.ones((2, 64), bool)
    first = last = None
    for i in range(15):
        s1, s2, m = epoch_fn(s1, s2, data, seeds, masks, jax.random.key(i),
                             jnp.float32(0.2))
        last = float(m["loss_1"])
        if first is None:
            first = last
    assert np.isfinite(last) and last < first


def test_eligibility_guards(tiny):
    g, _ = tiny
    assert leaf_agg_eligible(spec_for(g, "sage"), (5, 3))
    assert not leaf_agg_eligible(spec_for(g, "sagePL"), (5, 3))
    assert not leaf_agg_eligible(spec_for(g, "sage"), (5,))  # depth mismatch
    bn_spec = nets.NetSpec(module="sage", in_size=g.num_features,
                           hidden_size=32, out_size=4, num_layers=2,
                           use_bn=True)
    assert not leaf_agg_eligible(bn_spec, (5, 3))
    with pytest.raises(ValueError):
        nets.apply_tree(
            spec_for(g, "sagePL"), {}, [jnp.zeros((1, 16))], [jnp.ones(1, bool)],
            (), leaf_agg=jnp.zeros((1, 16)),
        )
