"""Per-layer activation parity against a LIVE torch replica of the
reference layer semantics (BASELINE.md accuracy target #1).

The reference's layers are PyG modules; PyG is not installed here, so each
replica is ~20 lines of plain torch implementing the documented semantics:

  SAGEConv  (reference src/models/layers/sage.py:16, PyG default):
      out = W_neigh . mean_{j in N(i)} x_j + W_root . x_i + b
      (scatter-mean via index_add_; isolated nodes aggregate to 0)
  GCNConv(normalize=False) as wired by the reference's SimpleGCN
      (src/models/layers/convolution.py:19-23): neighbor-SUM + root term
  SAGE stack (sage.py:30-40): conv -> ReLU -> dropout between layers
  sageH (sageH.py:27-33): also returns last pre-dropout hidden
  sagePL (sagePL.py:33-76): pure branch + noise branch with
      x + F.normalize(noise[n_id]) * noise_rate

Weights are COPIED from the jax params, so any disagreement is a math bug,
not an init difference. Dropout off (eval parity, like the reference
``inference`` methods)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.models import layers as L
from noise_gnn_tpu.models import nets

ATOL = 2e-5


@pytest.fixture(scope="module")
def graph():
    g = synthetic_graph(200, 12, 5, 1200, seed=3)
    return g


def scatter_mean_t(x, edge_index, num_nodes):
    src = torch.as_tensor(edge_index[0], dtype=torch.long)
    dst = torch.as_tensor(edge_index[1], dtype=torch.long)
    tot = torch.zeros((num_nodes, x.shape[1]), dtype=x.dtype)
    tot.index_add_(0, dst, x[src])
    cnt = torch.zeros(num_nodes, dtype=x.dtype)
    cnt.index_add_(0, dst, torch.ones_like(dst, dtype=x.dtype))
    return tot / cnt.clamp(min=1.0)[:, None]


def scatter_sum_t(x, edge_index, num_nodes):
    src = torch.as_tensor(edge_index[0], dtype=torch.long)
    dst = torch.as_tensor(edge_index[1], dtype=torch.long)
    tot = torch.zeros((num_nodes, x.shape[1]), dtype=x.dtype)
    tot.index_add_(0, dst, x[src])
    return tot


def sage_conv_t(p, x, edge_index, num_nodes):
    agg = scatter_mean_t(x, edge_index, num_nodes)
    return (
        agg @ torch.as_tensor(np.array(p["w_neigh"]))
        + x @ torch.as_tensor(np.array(p["w_root"]))
        + torch.as_tensor(np.array(p["b"]))
    )


def gcn_conv_t(p, x, edge_index, num_nodes):
    agg = scatter_sum_t(x, edge_index, num_nodes) + x
    return agg @ torch.as_tensor(np.array(p["w"])) + torch.as_tensor(
        np.asarray(p["b"])
    )


def stack_t(conv_t, params, x, edge_index, num_nodes, num_layers):
    """Torch replica of the reference SAGE/GCN stack (sage.py:30-40), eval
    mode. Returns every layer's OUTPUT activation (post-ReLU where applied)
    and the sageH/sagePL hidden h (last pre-final post-ReLU)."""
    acts, h = [], None
    for i, p in enumerate(params["convs"]):
        x = conv_t(p, x, edge_index, num_nodes)
        if i != num_layers - 1:
            x = torch.relu(x)
            h = x
        acts.append(x)
    return acts, h


def jax_stack_acts(spec, params, x, edge_index, num_nodes):
    """Per-layer activations through the PRODUCTION primitives
    (models/layers.sage_conv / gcn_conv — the same calls _stack_forward
    makes)."""
    acts = []
    for i, p in enumerate(params["convs"]):
        if spec.module == "gcn":
            x = L.gcn_conv(p, x, edge_index, num_nodes)
        else:
            x = L.sage_conv(p, x, edge_index, num_nodes)
        if i != spec.num_layers - 1:
            x = jax.nn.relu(x)
        acts.append(x)
    return acts


@pytest.mark.parametrize("module,layers", [
    ("sage", 2), ("sage", 3), ("gcn", 2),
])
def test_per_layer_activations_match_torch(graph, module, layers):
    g = graph
    spec = nets.NetSpec(module=module, in_size=g.num_features, hidden_size=16,
                        out_size=g.num_classes, num_layers=layers, dropout=0.5)
    params = nets.init_params(jax.random.key(0), spec)
    x_j = jnp.asarray(g.x)
    ei = jnp.asarray(g.edge_index)

    acts_j = jax_stack_acts(spec, params, x_j, ei, g.num_nodes)
    conv_t = gcn_conv_t if module == "gcn" else sage_conv_t
    acts_t, _ = stack_t(conv_t, params, torch.as_tensor(np.array(g.x)),
                        g.edge_index, g.num_nodes, layers)
    assert len(acts_j) == len(acts_t) == layers
    for i, (a_j, a_t) in enumerate(zip(acts_j, acts_t)):
        np.testing.assert_allclose(
            np.asarray(a_j), a_t.numpy(), rtol=1e-4, atol=ATOL,
            err_msg=f"layer {i} activations diverge from the torch replica",
        )
    # the end-to-end apply() must equal the last layer too
    logits = nets.apply(spec, params, x_j, ei, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(logits), acts_t[-1].numpy(),
                               rtol=1e-4, atol=ATOL)


def test_sageh_hidden_matches_torch(graph):
    g = graph
    spec = nets.NetSpec(module="sageH", in_size=g.num_features,
                        hidden_size=16, out_size=g.num_classes, num_layers=3,
                        dropout=0.5)
    params = nets.init_params(jax.random.key(1), spec)
    out = nets.apply(spec, params, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                     train=False)
    acts_t, h_t = stack_t(sage_conv_t, params,
                          torch.as_tensor(np.array(g.x)), g.edge_index,
                          g.num_nodes, 3)
    np.testing.assert_allclose(np.asarray(out["logits"]), acts_t[-1].numpy(),
                               rtol=1e-4, atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["h"]), h_t.numpy(),
                               rtol=1e-4, atol=ATOL)


def test_sagepl_branches_match_torch(graph):
    """sagePL dual forward (reference sagePL.py:33-76): pure branch is the
    plain stack; noisy branch perturbs the input by the row-L2-normalized
    learned noise rows times noise_rate."""
    g = graph
    noise_rate = 0.2
    spec = nets.NetSpec(module="sagePL", in_size=g.num_features,
                        hidden_size=16, out_size=g.num_classes, num_layers=2,
                        dropout=0.5, nbr_nodes=g.num_nodes)
    params = nets.init_params(jax.random.key(2), spec)
    n_id = jnp.arange(g.num_nodes)
    out = nets.apply(spec, params, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                     train=False, n_id=n_id, noise_rate=noise_rate)

    x_t = torch.as_tensor(np.array(g.x))
    acts_pure, _ = stack_t(sage_conv_t, params, x_t, g.edge_index,
                           g.num_nodes, 2)
    noise_t = torch.as_tensor(np.array(params["noise"]))
    x_noisy = x_t + torch.nn.functional.normalize(noise_t, dim=1) * noise_rate
    acts_noisy, _ = stack_t(sage_conv_t, params, x_noisy, g.edge_index,
                            g.num_nodes, 2)
    np.testing.assert_allclose(np.asarray(out["z_pure"]),
                               acts_pure[-1].numpy(), rtol=1e-4, atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["z_noisy"]),
                               acts_noisy[-1].numpy(), rtol=1e-4, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(out["y_pure"]),
        torch.log_softmax(acts_pure[-1], dim=-1).numpy(),
        rtol=1e-4, atol=1e-4,
    )


def test_sima_matches_torch(graph):
    """SIMA learned similarity (reference attention.py:5-21): eval-mode
    drop-free forward sim = relu(x Wi) @ relu(x Wj)^T."""
    g = graph
    p = L.sima_init(jax.random.key(5), g.num_nodes, g.num_features)
    got = np.asarray(L.sima(p, jnp.asarray(g.x)))
    x_t = torch.as_tensor(np.array(g.x))
    wi = torch.as_tensor(np.array(p["w_i"]))
    wj = torch.as_tensor(np.array(p["w_j"]))
    want = torch.relu(x_t @ wi) @ torch.relu(x_t @ wj).T
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-3)


def test_tree_conv_matches_torch_on_full_neighborhoods(graph):
    """The dense-tree SAGEConv (the hot training path) equals the torch
    edge-list replica when the 'sampled' tree contains every in-neighbor."""
    g = graph
    # build full in-neighbor lists padded to max degree
    N = g.num_nodes
    indeg = np.zeros(N, np.int64)
    np.add.at(indeg, g.edge_index[1], 1)
    K = int(indeg.max())
    neigh = np.zeros((N, K), np.int64)
    mask = np.zeros((N, K), bool)
    fill = np.zeros(N, np.int64)
    for s, d in zip(*g.edge_index):
        neigh[d, fill[d]] = s
        mask[d, fill[d]] = True
        fill[d] += 1
    p = L.sage_conv_init(jax.random.key(3), g.num_features, 8)
    x = jnp.asarray(g.x)
    out_tree = L.sage_conv_tree(p, x, jnp.take(x, jnp.asarray(neigh), 0),
                                jnp.asarray(mask))
    out_t = sage_conv_t(p, torch.as_tensor(np.array(g.x)), g.edge_index, N)
    np.testing.assert_allclose(np.asarray(out_tree), out_t.numpy(),
                               rtol=1e-4, atol=ATOL)
