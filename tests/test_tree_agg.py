"""Scatter-free flat-tree aggregation == edge-list path (ops/tree_agg.py).

The TE/CTP/H steps moved from edge-list scatter convs to the structured
tree backend in round 2; these tests pin numerical equivalence so the
restructure cannot drift from the reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_gnn_tpu.augment.rewire import topk_rewire, topk_rewire_tree
from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.losses.consistency import get_uncertainty
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.ops.sampler import flat_edge_index, sample_khop_tree
from noise_gnn_tpu.ops.scatter import (
    gather_scatter_max,
    gather_scatter_mean,
    gather_scatter_sum,
)
from noise_gnn_tpu.ops.sddmm import hier_topk
from noise_gnn_tpu.ops.tree_agg import TreeTopo, tree_gather_scatter


def _sample_topo(seed=0, b=16, fanouts=(4, 3), n=200):
    g = synthetic_graph(n, 24, 5, 1400, seed=seed)
    rng = np.random.default_rng(seed)
    seeds = jnp.asarray(rng.integers(0, n, b).astype(np.int32))
    mask = jnp.asarray(np.concatenate([np.ones(b - 2, bool), np.zeros(2, bool)]))
    tb = sample_khop_tree(jax.random.key(seed), g.csr(), seeds, fanouts, mask)
    edge_mask = jnp.concatenate(tb.masks[1:])
    topo = TreeTopo(b, fanouts, edge_mask)
    x_sub = jnp.take(jnp.asarray(g.x), tb.flat_n_id(), axis=0)
    x_sub = jnp.where(tb.flat_node_mask()[:, None], x_sub, 0)
    ei = jnp.asarray(flat_edge_index(b, fanouts))
    return topo, x_sub, ei, edge_mask


@pytest.mark.parametrize("aggr", ["mean", "sum", "max"])
def test_tree_agg_matches_edge_list(aggr):
    topo, x, ei, em = _sample_topo()
    got = tree_gather_scatter(x, topo, aggr=aggr)
    fn = {"mean": gather_scatter_mean, "sum": gather_scatter_sum,
          "max": gather_scatter_max}[aggr]
    want = fn(x, ei, topo.num_nodes, em)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("aggr", ["mean", "sum", "max"])
def test_tree_agg_with_extra_edges(aggr):
    topo, x, ei, em = _sample_topo(seed=1)
    rng = np.random.default_rng(1)
    k = 50
    es = jnp.asarray(rng.integers(0, topo.num_nodes, k).astype(np.int32))
    ed = jnp.asarray(rng.integers(0, topo.num_nodes, k).astype(np.int32))
    emask = jnp.asarray(rng.random(k) < 0.8)
    topo2 = TreeTopo(topo.batch_size, topo.fanouts, em, es, ed, emask)
    got = tree_gather_scatter(x, topo2, aggr=aggr)
    ei2 = jnp.concatenate([ei, jnp.stack([es, ed])], axis=1)
    em2 = jnp.concatenate([em, emask])
    fn = {"mean": gather_scatter_mean, "sum": gather_scatter_sum,
          "max": gather_scatter_max}[aggr]
    want = fn(x, ei2, topo.num_nodes, em2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("module", ["sage", "gcn", "sageH", "sagePL"])
def test_apply_with_topo_matches_edge_list(module):
    topo, x, ei, em = _sample_topo(seed=2)
    n = topo.num_nodes
    spec = nets.NetSpec(module=module, in_size=24, hidden_size=16, out_size=5,
                        num_layers=2, nbr_nodes=300)
    params = nets.init_params(jax.random.key(2), spec)
    n_id = jnp.arange(n) % 300
    got = nets.apply(spec, params, x, topo, num_nodes=n, train=False, n_id=n_id)
    want = nets.apply(spec, params, x, ei, num_nodes=n, edge_mask=em,
                      train=False, n_id=n_id)
    for k in got:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_get_uncertainty_topo_matches_edge_list():
    topo, x, ei, em = _sample_topo(seed=3)
    n = topo.num_nodes
    y = jax.nn.log_softmax(jnp.asarray(
        np.random.default_rng(3).standard_normal((n, 5)).astype(np.float32)))
    got = get_uncertainty(topo, y, 5)
    want = get_uncertainty(ei, y, 5, edge_mask=em)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_hier_topk_exact():
    rng = np.random.default_rng(0)
    for n, k in [(10_000, 257), (5000, 5000), (300, 17), (70_000, 1000)]:
        vals = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        gv, gi = hier_topk(vals, k)
        wv, wi = jax.lax.top_k(vals, min(k, n))
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), rtol=0, atol=0)
        assert set(np.asarray(gi).tolist()) == set(np.asarray(wi).tolist())


def test_topk_rewire_tree_matches_generic():
    topo, x, ei, em = _sample_topo(seed=4, b=12, fanouts=(3, 2), n=150)
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.standard_normal((topo.num_nodes, 8)).astype(np.float32))
    pos_topo, neg_topo = topk_rewire_tree(h, topo, k_percent=0.1)
    (pos_e, pos_m), (neg_e, neg_m) = topk_rewire(h, ei, em, k_percent=0.1)
    e = ei.shape[1]
    # removals: identical keep masks over the structural edges
    np.testing.assert_array_equal(np.asarray(pos_topo.edge_mask),
                                  np.asarray(pos_m[:e]))
    np.testing.assert_array_equal(np.asarray(neg_topo.edge_mask),
                                  np.asarray(neg_m[:e]))
    # additions: identical edge sets
    got_pos = set(zip(np.asarray(pos_topo.extra_src).tolist(),
                      np.asarray(pos_topo.extra_dst).tolist()))
    want_pos = set(zip(np.asarray(pos_e[0, e:]).tolist(),
                       np.asarray(pos_e[1, e:]).tolist()))
    assert got_pos == want_pos
    got_neg = set(zip(np.asarray(neg_topo.extra_src).tolist(),
                      np.asarray(neg_topo.extra_dst).tolist()))
    want_neg = set(zip(np.asarray(neg_e[0, e:]).tolist(),
                       np.asarray(neg_e[1, e:]).tolist()))
    assert got_neg == want_neg
