"""Network definitions covering the reference model family.

Modules (reference files in src/models/layers/):
  * ``sage``    — SAGE stack, ReLU+dropout between layers, optional BN (sage.py)
  * ``gcn``     — SimpleGCN stack of GCNConv(normalize=False) (convolution.py)
  * ``sageH``   — SAGE returning (logits, last hidden) (sageH.py)
  * ``sageFC``  — SAGE + Linear(hidden,128)+BN projection head (sageFC.py)
  * ``sagePL``  — SAGE + learned per-node input noise; dual pure/noisy
                  branches each returning (h, log_softmax, logits) (sagePL.py)
  * ``gcn_head``— 1-layer SAGEConv with pre-dropout (gcn.py)
  * ``gat``     — dense-adjacency GAT (attention.py; dead code in the
                  reference, kept for inventory completeness)

Every module supports the edge-list forward (``apply``) and the dense k-hop
tree forward (``apply_tree``) used for TPU mini-batch training.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..ops.scatter import fast_take

from .layers import (
    batch_norm,
    batch_norm_init,
    dropout,
    gcn_conv,
    gcn_conv_init,
    gcn_conv_pre,
    gcn_conv_tree,
    glorot,
    linear,
    linear_init,
    prelu,
    prelu_init,
    sage_conv,
    sage_conv_init,
    sage_conv_pre,
    sage_conv_tree,
)

Array = jax.Array

MODULES = ("sage", "gcn", "sageH", "sageFC", "sagePL", "gcn_head", "gat")


@dataclass(frozen=True)
class NetSpec:
    """Static architecture description (hashable -> usable as jit static arg).

    Mirrors NGNN's constructor surface (reference src/models/model.py:14-35).
    """

    module: str = "sage"
    in_size: int = 100
    hidden_size: int = 128
    out_size: int = 47
    num_layers: int = 2
    dropout: float = 0.5
    use_bn: bool = False
    nbr_nodes: int = 1  # for sagePL's per-node noise parameter
    proj_size: int = 128  # sageFC projection head width
    aggr: str = "mean"  # SAGE neighbor aggregation: 'mean' (PyG default) | 'max'
    # mixed precision: cast activations to this dtype for the conv stack
    # (params stay f32; layers cast weights to the activation dtype; outputs
    # are returned in f32 for numerically-safe losses)
    compute_dtype: str = "float32"

    def layer_sizes(self) -> list[tuple[int, int]]:
        sizes = []
        for i in range(self.num_layers):
            fin = self.in_size if i == 0 else self.hidden_size
            fout = self.out_size if i == self.num_layers - 1 else self.hidden_size
            sizes.append((fin, fout))
        return sizes


def make_network(config: dict, in_size: int, out_size: int, nbr_nodes: int = 1) -> NetSpec:
    """Build a NetSpec from a reference-style config dict."""
    return NetSpec(
        module=config.get("module", "sage"),
        in_size=in_size,
        hidden_size=int(config.get("hidden_size", 128)),
        out_size=out_size,
        num_layers=int(config.get("num_layers", 2)),
        dropout=float(config.get("dropout", 0.5)),
        use_bn=bool(config.get("use_bn", False)),
        nbr_nodes=nbr_nodes,
        compute_dtype=str(config.get("compute_dtype", "float32")),
        aggr=str(config.get("aggr", "mean")),
    )


def init_params(key: Array, spec: NetSpec) -> dict:
    if spec.module == "gat":
        return _gat_init(key, spec)
    keys = jax.random.split(key, spec.num_layers + 3)
    convs = []
    for i, (fin, fout) in enumerate(spec.layer_sizes()):
        if spec.module == "gcn":
            convs.append(gcn_conv_init(keys[i], fin, fout))
        else:
            convs.append(sage_conv_init(keys[i], fin, fout))
    params: dict = {"convs": convs}
    if spec.use_bn:
        params["bn1"] = batch_norm_init(spec.in_size)
        params["bn2"] = batch_norm_init(spec.hidden_size)
    if spec.module == "sagePL":
        # learned per-node input noise (reference sagePL.py:22)
        params["noise"] = jax.random.normal(
            keys[-1], (spec.nbr_nodes, spec.in_size), jnp.float32
        )
    if spec.module == "sageFC":
        params["proj"] = linear_init(keys[-2], spec.hidden_size, spec.proj_size)
        params["bnl"] = batch_norm_init(spec.proj_size)
    if spec.module in ("sageH", "sageFC"):
        params["act"] = prelu_init()  # present in the reference, unused in forward
    return params


# ------------------------------------------------------------------ helpers


def _maybe_cast(spec: NetSpec, x: Array) -> Array:
    if spec.compute_dtype != "float32":
        return x.astype(jnp.dtype(spec.compute_dtype))
    return x


def _f32(out: dict) -> dict:
    return {k: v.astype(jnp.float32) for k, v in out.items()}


def _l2_normalize_rows(v: Array, eps: float = 1e-12) -> Array:
    """F.normalize(dim=1) parity: x / max(||x||_2, eps)."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, eps)


def _conv(spec: NetSpec, p: dict, x, edge_index, num_nodes, edge_mask):
    if spec.module == "gcn":
        return gcn_conv(p, x, edge_index, num_nodes, edge_mask)
    return sage_conv(p, x, edge_index, num_nodes, edge_mask, aggr=spec.aggr)


def _conv_tree(spec: NetSpec, p: dict, x_self, x_neigh, mask):
    if spec.module == "gcn":
        return gcn_conv_tree(p, x_self, x_neigh, mask)
    return sage_conv_tree(p, x_self, x_neigh, mask, aggr=spec.aggr)


def _conv_pre(spec: NetSpec, p: dict, x_self, agg):
    if spec.module == "gcn":
        return gcn_conv_pre(p, x_self, agg)
    return sage_conv_pre(p, x_self, agg)


# ------------------------------------------------------- edge-list forward


def _stack_forward(
    spec: NetSpec,
    params: dict,
    x: Array,
    edge_index: Array,
    num_nodes: int,
    edge_mask: Array | None,
    train: bool,
    key: Array | None,
):
    """Shared SAGE/GCN stack: conv -> (relu, [bn], dropout) between layers.

    Returns (logits, h) where h is the post-ReLU hidden of the last
    non-final layer (reference sageH.py:33, sagePL.py:60)."""
    h_out = x
    if spec.use_bn:
        x = batch_norm(params["bn1"], x)
    for i, p in enumerate(params["convs"]):
        x = _conv(spec, p, x, edge_index, num_nodes, edge_mask)
        if i != spec.num_layers - 1:
            x = jax.nn.relu(x)
            if spec.use_bn:
                x = batch_norm(params["bn2"], x)
            h_out = x
            if train and key is not None:
                key, sub = jax.random.split(key)
                x = dropout(sub, x, spec.dropout, train)
    return x, h_out


def apply(
    spec: NetSpec,
    params: dict,
    x: Array,
    edge_index: Array,
    *,
    num_nodes: int | None = None,
    edge_mask: Array | None = None,
    train: bool = False,
    key: Array | None = None,
    n_id: Array | None = None,
    noise_rate: float = 0.1,
) -> dict:
    """Edge-list forward. Returns a dict:

    sage/gcn:        {"logits"}
    sageH:           {"logits", "h"}
    sageFC:          {"logits", "h"}   (h = BN(proj(hidden)))
    sagePL:          {"h_pure","y_pure","z_pure","h_noisy","y_noisy","z_noisy"}
    gcn_head:        {"logits"}
    gat:             {"logits"}
    """
    n = num_nodes if num_nodes is not None else x.shape[0]
    x = _maybe_cast(spec, x)

    if spec.module == "gat":
        return _f32(
            {"logits": _gat_forward(spec, params, x, edge_index, n, edge_mask)}
        )

    if spec.module == "gcn_head":
        # pre-dropout then single conv (reference gcn.py:19-23)
        if train and key is not None:
            key, sub = jax.random.split(key)
            x = dropout(sub, x, spec.dropout, train)
        logits = sage_conv(params["convs"][0], x, edge_index, n, edge_mask)
        return _f32({"logits": logits})

    if spec.module == "sagePL":
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)
        z_pure, h_pure = _stack_forward(
            spec, params, x, edge_index, n, edge_mask, train, k1
        )
        noise = params["noise"]
        nr = fast_take(noise, n_id) if n_id is not None else noise[: x.shape[0]]
        x_noisy = x + (_l2_normalize_rows(nr) * noise_rate).astype(x.dtype)
        z_noisy, h_noisy = _stack_forward(
            spec, params, x_noisy, edge_index, n, edge_mask, train, k2
        )
        z_pure = z_pure.astype(jnp.float32)
        z_noisy = z_noisy.astype(jnp.float32)
        return _f32({
            "h_pure": h_pure,
            "y_pure": jax.nn.log_softmax(z_pure, axis=-1),
            "z_pure": z_pure,
            "h_noisy": h_noisy,
            "y_noisy": jax.nn.log_softmax(z_noisy, axis=-1),
            "z_noisy": z_noisy,
        })

    logits, h = _stack_forward(spec, params, x, edge_index, n, edge_mask, train, key)
    if spec.module == "sageH":
        return _f32({"logits": logits, "h": h})
    if spec.module == "sageFC":
        proj = batch_norm(params["bnl"], linear(params["proj"], h.astype(jnp.float32)))
        return _f32({"logits": logits, "h": proj})
    return _f32({"logits": logits})


# ------------------------------------------------------------ tree forward


def _stack_forward_tree(
    spec: NetSpec,
    params: dict,
    xs: list[Array],
    masks: list[Array],
    fanouts: tuple[int, ...],
    train: bool,
    key: Array | None,
    leaf_agg: Array | None = None,
):
    """Dense k-hop tree forward.

    xs[d]: [N_d, F] features of depth-d tree nodes (depth 0 = seeds,
    N_d = B * prod(fanouts[:d])); masks[d]: [N_d] node validity. Layer i
    consumes depths 0..L-1-i and produces depths 0..L-1-i.

    With ``leaf_agg`` (exact-leaf mode, ops/leaf_agg.py) the tree is one hop
    shallower: xs has L depth arrays, and the first layer's deepest conv
    uses the precomputed neighbor aggregate rows instead of sampled leaves.
    Returns (logits [B, C], h [B, hidden])."""
    L = spec.num_layers
    exact = leaf_agg is not None
    want = L if exact else L + 1
    assert len(xs) == want, f"need {want} depth arrays, got {len(xs)}"
    h_out = xs[0]
    if spec.use_bn:
        assert not exact, "exact-leaf mode is incompatible with input BN"
        xs = [batch_norm(params["bn1"], x) for x in xs]
    for i, p in enumerate(params["convs"]):
        new_xs = []
        for d in range(L - i):
            if i == 0 and d == L - 1 and exact:
                new_xs.append(
                    _conv_pre(spec, p, xs[d], leaf_agg.astype(xs[d].dtype))
                )
                continue
            n_d = xs[d].shape[0]
            f = fanouts[d]
            x_neigh = xs[d + 1].reshape(n_d, f, xs[d + 1].shape[-1])
            m_neigh = masks[d + 1].reshape(n_d, f)
            new_xs.append(_conv_tree(spec, p, xs[d], x_neigh, m_neigh))
        xs = new_xs
        if i != L - 1:
            xs = [jax.nn.relu(x) for x in xs]
            if spec.use_bn:
                xs = [batch_norm(params["bn2"], x) for x in xs]
            h_out = xs[0]
            if train and key is not None:
                key, *subs = jax.random.split(key, len(xs) + 1)
                xs = [dropout(k, x, spec.dropout, train) for k, x in zip(subs, xs)]
    return xs[0], h_out


def apply_tree(
    spec: NetSpec,
    params: dict,
    xs: list[Array],
    masks: list[Array],
    fanouts: tuple[int, ...],
    *,
    train: bool = False,
    key: Array | None = None,
    n_ids: list[Array] | None = None,
    noise_rate: float = 0.1,
    leaf_agg: Array | None = None,
) -> dict:
    """Tree forward; same output contract as :func:`apply` but rows = seeds.

    ``leaf_agg`` [N_{L-1}, F]: precomputed exact neighbor aggregates for the
    deepest depth's nodes (ops/leaf_agg.py); the tree then carries one hop
    fewer. Not supported for sagePL (step-dependent input noise), gcn_head,
    or gat."""
    if leaf_agg is not None and spec.module not in ("sage", "gcn", "sageH", "sageFC"):
        raise ValueError(f"exact-leaf mode unsupported for module {spec.module!r}")
    xs = [_maybe_cast(spec, x) for x in xs]
    if leaf_agg is not None:
        leaf_agg = _maybe_cast(spec, leaf_agg)
    if spec.module == "sagePL":
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)
        z_pure, h_pure = _stack_forward_tree(spec, params, xs, masks, fanouts, train, k1)
        noise = params["noise"]
        xs_noisy = [
            x + (_l2_normalize_rows(fast_take(noise, nid)) * noise_rate).astype(x.dtype)
            for x, nid in zip(xs, n_ids)
        ]
        z_noisy, h_noisy = _stack_forward_tree(
            spec, params, xs_noisy, masks, fanouts, train, k2
        )
        z_pure = z_pure.astype(jnp.float32)
        z_noisy = z_noisy.astype(jnp.float32)
        return _f32({
            "h_pure": h_pure,
            "y_pure": jax.nn.log_softmax(z_pure, axis=-1),
            "z_pure": z_pure,
            "h_noisy": h_noisy,
            "y_noisy": jax.nn.log_softmax(z_noisy, axis=-1),
            "z_noisy": z_noisy,
        })

    if spec.module == "gcn_head":
        if train and key is not None:
            key, *subs = jax.random.split(key, len(xs) + 1)
            xs = [dropout(k, x, spec.dropout, train) for k, x in zip(subs, xs)]
        n0 = xs[0].shape[0]
        x_neigh = xs[1].reshape(n0, fanouts[0], xs[1].shape[-1])
        m = masks[1].reshape(n0, fanouts[0])
        return _f32({"logits": sage_conv_tree(params["convs"][0], xs[0], x_neigh, m)})

    logits, h = _stack_forward_tree(
        spec, params, xs, masks, fanouts, train, key, leaf_agg=leaf_agg
    )
    if spec.module == "sageH":
        return _f32({"logits": logits, "h": h})
    if spec.module == "sageFC":
        proj = batch_norm(params["bnl"], linear(params["proj"], h.astype(jnp.float32)))
        return _f32({"logits": logits, "h": proj})
    return _f32({"logits": logits})


# ------------------------------------------------------------------- GAT


def _gat_init(key: Array, spec: NetSpec) -> dict:
    """Dense-adjacency GAT (reference attention.py:22-88): per-layer linear
    W [F, F'] plus attention vector a [2F', 1]."""
    keys = jax.random.split(key, 2 * spec.num_layers)
    layers = []
    for i, (fin, fout) in enumerate(spec.layer_sizes()):
        layers.append(
            {
                "w": glorot(keys[2 * i], (fin, fout)),
                "a": glorot(keys[2 * i + 1], (2 * fout, 1)),
            }
        )
    return {"layers": layers}


def _gat_forward(spec, params, x, edge_index, num_nodes, edge_mask):
    """Masked dense attention over the (small) graph's adjacency."""
    n = num_nodes
    adj = jnp.zeros((n, n), dtype=bool)
    src, dst = edge_index[0], edge_index[1]
    if edge_mask is not None:
        src = jnp.where(edge_mask, src, 0)
        dst = jnp.where(edge_mask, dst, 0)
        adj = adj.at[dst, src].set(edge_mask)
    else:
        adj = adj.at[dst, src].set(True)
    for i, p in enumerate(params["layers"]):
        wh = x[:n] @ p["w"].astype(x.dtype)
        f = wh.shape[-1]
        e_src = wh @ p["a"][:f, 0].astype(x.dtype)  # [n]
        e_dst = wh @ p["a"][f:, 0].astype(x.dtype)  # [n]
        e = jax.nn.leaky_relu(e_dst[:, None] + e_src[None, :], 0.2)
        e = jnp.where(adj, e, -1e9)
        alpha = jax.nn.softmax(e, axis=1)
        alpha = jnp.where(adj, alpha, 0.0)
        x = alpha @ wh
        if i != spec.num_layers - 1:
            x = jax.nn.elu(x)
    return x
