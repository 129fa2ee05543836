"""Functional GNN layers (params as plain dict pytrees).

SAGEConv parity (PyG default, reference src/models/layers/sage.py:16):
    out[i] = mean_{(j->i) in E} x[j] @ W_l + b  +  x[i] @ W_r
with no normalization; isolated nodes aggregate to 0. Glorot-uniform weights,
zero bias.

GCNConv with normalize=False (reference src/models/layers/convolution.py:19):
    out[i] = (sum_{(j->i) in E} x[j] + x[i]·0) @ W + b   -- PyG GCNConv with
normalize=False adds self-loops unless add_self_loops=False; the reference
uses the default, so self-loops ARE added:  out[i] = (x[i] + sum_neigh) @ W + b.

Two compute paths per layer:
  * edge-list (`sage_conv`) — scatter/segment over a [2, E] edge list;
  * dense tree (`sage_conv_tree`) — [N, K, F] neighbor blocks from the
    on-device fanout sampler, mean over axis 1 (no scatter; MXU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.scatter import gather_scatter_max, gather_scatter_mean, gather_scatter_sum
from ..ops.tree_agg import TreeTopo, tree_gather_scatter

Array = jax.Array


def _neighbor_agg(x, edge_index, num_nodes, edge_mask, aggr):
    """Aggregation dispatch: [2, E] edge list -> gather+scatter backend;
    TreeTopo (flat tree subgraph) -> scatter-free structured backend
    (ops/tree_agg.py; TPU scatter-add is ~3 orders slower at these shapes)."""
    if isinstance(edge_index, TreeTopo):
        return tree_gather_scatter(x, edge_index, aggr=aggr)
    if aggr == "max":
        return gather_scatter_max(x, edge_index, num_nodes, edge_mask)
    if aggr == "sum":
        return gather_scatter_sum(x, edge_index, num_nodes, edge_mask)
    return gather_scatter_mean(x, edge_index, num_nodes, edge_mask)


def glorot(key: Array, shape: tuple[int, ...], dtype=jnp.float32) -> Array:
    fan_in, fan_out = shape[0], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def linear_init(key: Array, in_size: int, out_size: int, bias: bool = True) -> dict:
    p = {"w": glorot(key, (in_size, out_size))}
    if bias:
        p["b"] = jnp.zeros((out_size,), jnp.float32)
    return p


def linear(params: dict, x: Array) -> Array:
    out = x @ params["w"].astype(x.dtype)
    if "b" in params:
        out = out + params["b"].astype(x.dtype)
    return out


# ---------------------------------------------------------------- SAGEConv


def sage_conv_init(key: Array, in_size: int, out_size: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "w_neigh": glorot(k1, (in_size, out_size)),  # PyG lin_l (aggregated)
        "w_root": glorot(k2, (in_size, out_size)),  # PyG lin_r (no bias)
        "b": jnp.zeros((out_size,), jnp.float32),
    }


def sage_conv(
    params: dict,
    x: Array,
    edge_index: Array,
    num_nodes: int | None = None,
    edge_mask: Array | None = None,
    aggr: str = "mean",
) -> Array:
    """Edge-list SAGEConv. edge_index [2, E], messages src -> dst.

    aggr 'mean' is the reference's PyG default (sage.py:16); 'max' matches
    SAGEConv(aggr='max') semantics (isolated nodes aggregate to 0)."""
    n = num_nodes if num_nodes is not None else x.shape[0]
    agg = _neighbor_agg(x, edge_index, n, edge_mask, aggr)
    out = agg @ params["w_neigh"].astype(x.dtype) + x[:n] @ params["w_root"].astype(x.dtype)
    return out + params["b"].astype(x.dtype)


def sage_conv_tree(
    params: dict,
    x_self: Array,  # [N, F]
    x_neigh: Array,  # [N, K, F]
    neigh_mask: Array,  # [N, K] bool
    aggr: str = "mean",
) -> Array:
    """Dense-tree SAGEConv: mean/max over the sampled-neighbor axis.

    Matmul-first order: aggregate raw features then one matmul each for the
    neighbor and root paths (same math, fewer flops than per-neighbor matmul).
    """
    if aggr == "max":
        neg = jnp.array(-jnp.inf, x_neigh.dtype)
        agg = jnp.max(jnp.where(neigh_mask[..., None], x_neigh, neg), axis=1)
        agg = jnp.where(jnp.isfinite(agg), agg, 0)
    else:
        m = neigh_mask.astype(x_neigh.dtype)[..., None]
        count = jnp.maximum(m.sum(axis=1), 1.0)
        agg = (x_neigh * m).sum(axis=1) / count
    out = agg @ params["w_neigh"].astype(x_self.dtype) + x_self @ params["w_root"].astype(
        x_self.dtype
    )
    return out + params["b"].astype(x_self.dtype)


def sage_conv_pre(params: dict, x_self: Array, agg: Array) -> Array:
    """SAGEConv from an already-aggregated neighbor feature (exact-leaf path,
    ops/leaf_agg.py): out = agg @ W_l + x_self @ W_r + b."""
    out = agg @ params["w_neigh"].astype(x_self.dtype) + x_self @ params[
        "w_root"
    ].astype(x_self.dtype)
    return out + params["b"].astype(x_self.dtype)


# ----------------------------------------------------------------- GCNConv


def gcn_conv_init(key: Array, in_size: int, out_size: int) -> dict:
    return {
        "w": glorot(key, (in_size, out_size)),
        "b": jnp.zeros((out_size,), jnp.float32),
    }


def gcn_conv(
    params: dict,
    x: Array,
    edge_index: Array,
    num_nodes: int | None = None,
    edge_mask: Array | None = None,
    add_self_loops: bool = True,
) -> Array:
    """GCNConv(normalize=False): neighbor-sum (+ self loop) then linear."""
    n = num_nodes if num_nodes is not None else x.shape[0]
    agg = _neighbor_agg(x, edge_index, n, edge_mask, "sum")
    if add_self_loops:
        agg = agg + x[:n]
    return agg @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)


def gcn_conv_tree(
    params: dict, x_self: Array, x_neigh: Array, neigh_mask: Array
) -> Array:
    m = neigh_mask.astype(x_neigh.dtype)[..., None]
    agg = (x_neigh * m).sum(axis=1) + x_self
    return agg @ params["w"].astype(x_self.dtype) + params["b"].astype(x_self.dtype)


def gcn_conv_pre(params: dict, x_self: Array, agg: Array) -> Array:
    """GCNConv(normalize=False) from a precomputed neighbor SUM (exact-leaf
    path): out = (agg + x_self) @ W + b (self-loop kept explicit)."""
    return (agg + x_self) @ params["w"].astype(x_self.dtype) + params["b"].astype(
        x_self.dtype
    )


# ---------------------------------------------------------------- dropout


def dropout(key: Array, x: Array, rate: float, train: bool) -> Array:
    # dropout costs 0.5 ms/step per net on v5e (tools/profile_step.py) —
    # measured to be mask-materialization BANDWIDTH, not threefry: a uint8
    # random-bits variant (4 draws per 32-bit block) timed identical, so
    # the straightforward bernoulli form stays.
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# -------------------------------------------------------------- batch norm


def batch_norm_init(size: int) -> dict:
    return {
        "scale": jnp.ones((size,), jnp.float32),
        "bias": jnp.zeros((size,), jnp.float32),
    }


def batch_norm(params: dict, x: Array, eps: float = 1e-5) -> Array:
    """Batch statistics (training-mode) normalization, as the reference's
    nn.BatchNorm1d is only exercised in training (sage.py:21-24)."""
    mean = x.mean(axis=0, keepdims=True)
    var = x.var(axis=0, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)


def sima_init(key: Array, nbr_nodes: int, nbr_features: int) -> dict:
    """Learned pairwise-similarity layer (reference attention.py:5-21 SIMA;
    dead code there — never imported by a pipeline — ported for inventory
    completeness). Two [F, N] projections, standard-normal init."""
    k1, k2 = jax.random.split(key)
    return {
        "w_i": jax.random.normal(k1, (nbr_features, nbr_nodes), jnp.float32),
        "w_j": jax.random.normal(k2, (nbr_features, nbr_nodes), jnp.float32),
    }


def sima(
    params: dict,
    x: Array,
    rate: float = 0.5,
    train: bool = False,
    key: Array | None = None,
) -> Array:
    """similarity = drop(relu(x W_i)) @ drop(relu(x W_j))^T  -> [N, N].

    Matches the reference forward (attention.py:13-20): both projections
    ReLU'd and dropped out independently before the MXU-friendly outer
    product."""
    ai = jax.nn.relu(x @ params["w_i"].astype(x.dtype))
    aj = jax.nn.relu(x @ params["w_j"].astype(x.dtype))
    if train and key is not None:
        k1, k2 = jax.random.split(key)
        ai = dropout(k1, ai, rate, train)
        aj = dropout(k2, aj, rate, train)
    return ai @ aj.T


def prelu_init() -> dict:
    return {"alpha": jnp.array(0.25, jnp.float32)}


def prelu(params: dict, x: Array) -> Array:
    a = params["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)
