"""FullGraphInference vs the edge-list apply() path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_gnn_tpu.eval.inference import FullGraphInference
from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.models import nets


@pytest.mark.parametrize("module", ["sage", "gcn"])
def test_inference_matches_apply(module):
    g = synthetic_graph(400, 48, 5, 3000, seed=0)
    spec = nets.NetSpec(module=module, in_size=48, hidden_size=32, out_size=5,
                        num_layers=3, dropout=0.5)
    params = nets.init_params(jax.random.key(0), spec)
    infer = FullGraphInference(spec, g.edge_index, g.num_nodes, backend="xla")
    got = infer(params, jnp.asarray(g.x))
    want = nets.apply(spec, params, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                      train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_inference_sagepl_pure_branch():
    g = synthetic_graph(300, 32, 4, 2000, seed=1)
    spec = nets.NetSpec(module="sagePL", in_size=32, hidden_size=16, out_size=4,
                        num_layers=2, nbr_nodes=300)
    params = nets.init_params(jax.random.key(1), spec)
    infer = FullGraphInference(spec, g.edge_index, g.num_nodes, backend="xla")
    got = infer(params, jnp.asarray(g.x))
    want = nets.apply(spec, params, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                      train=False)["z_pure"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("module,aggr", [("sage", "mean"), ("gcn", "mean"),
                                         ("sage", "max")])
def test_inference_with_precomputed_x_agg(module, aggr):
    """Supplying the run-constant first-layer aggregate (ops/leaf_agg.py)
    must not change the result."""
    from noise_gnn_tpu.ops.leaf_agg import precompute_leaf_agg

    g = synthetic_graph(300, 32, 4, 2400, seed=2)
    spec = nets.NetSpec(module=module, in_size=32, hidden_size=16, out_size=4,
                        num_layers=2, aggr=aggr)
    params = nets.init_params(jax.random.key(2), spec)
    kind = "sum" if module == "gcn" else aggr
    x_agg = precompute_leaf_agg(jnp.asarray(g.x), g.csr(), aggr=kind)
    base = FullGraphInference(spec, g.edge_index, g.num_nodes, backend="xla")
    fast = FullGraphInference(spec, g.edge_index, g.num_nodes, backend="xla",
                              x_agg=x_agg)
    x = jnp.asarray(g.x)
    np.testing.assert_allclose(
        np.asarray(fast(params, x)), np.asarray(base(params, x)),
        rtol=1e-4, atol=1e-4,
    )


def test_inference_bn_matches_apply():
    """use_bn specs: FullGraphInference and the edge-list eval path must
    agree (round-1 gap: inference silently dropped bn1/bn2)."""
    g = synthetic_graph(300, 32, 4, 2000, seed=3)
    spec = nets.NetSpec(module="sage", in_size=32, hidden_size=16, out_size=4,
                        num_layers=2, use_bn=True)
    params = nets.init_params(jax.random.key(3), spec)
    infer = FullGraphInference(spec, g.edge_index, g.num_nodes, backend="xla")
    got = infer(params, jnp.asarray(g.x))
    want = nets.apply(spec, params, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                      train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("module,use_bn", [("sage", False), ("gcn", False),
                                           ("sage", True), ("sagePL", False)])
def test_inference_pair_matches_single(module, use_bn):
    """Fused dual-model eval (one [N, 2H] SpMM sweep) must equal two
    independent single-model passes."""
    g = synthetic_graph(300, 32, 4, 2200, seed=5)
    spec = nets.NetSpec(module=module, in_size=32, hidden_size=16, out_size=4,
                        num_layers=2, use_bn=use_bn, nbr_nodes=300)
    p1 = nets.init_params(jax.random.key(10), spec)
    p2 = nets.init_params(jax.random.key(11), spec)
    infer = FullGraphInference(spec, g.edge_index, g.num_nodes, backend="xla")
    x = jnp.asarray(g.x)
    l1, l2 = infer.pair(p1, p2, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(infer(p1, x)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(infer(p2, x)),
                               rtol=1e-4, atol=1e-4)


def test_inference_gat_matches_apply():
    """GAT (dense masked attention) full-graph inference delegates to the
    edge-list forward instead of raising (round-1 left it NotImplemented)."""
    g = synthetic_graph(200, 24, 4, 1500, seed=6)
    spec = nets.NetSpec(module="gat", in_size=24, hidden_size=16, out_size=4,
                        num_layers=2)
    params = nets.init_params(jax.random.key(7), spec)
    infer = FullGraphInference(spec, g.edge_index, g.num_nodes, backend="xla")
    x = jnp.asarray(g.x)
    got = infer(params, x)
    want = nets.apply(spec, params, x, jnp.asarray(g.edge_index),
                      train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    l1, l2 = infer.pair(params, params, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
