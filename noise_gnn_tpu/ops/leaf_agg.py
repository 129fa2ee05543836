"""Exact precomputed leaf aggregation for tree-mode training.

TPU-first optimization with no reference counterpart: in a sampled k-hop
tree (the ``NeighborLoader`` replacement, reference src/pipeline.py:75-92),
the DEEPEST hop exists only to estimate ``agg_{j in N(v)} x_j`` for each
depth-(L-1) node v — and ``x`` (the raw input features) never changes during
training. The leaf hop is the bulk of the tree (fanouts [15,10,5]: 750 of
916 slots per seed) and the train step is gather-bound on XLA's per-index
engine (docs/DESIGN.md), so sampling it every step is pure waste.

Instead, compute ``M[v] = agg_{j in N(v)} x_j`` ONCE per run with the
full-graph SpMM and gather one M row per depth-(L-1) tree node. This

  * removes ~70 % of the step's gather indices (the leaf-hop sampling AND
    the leaf feature rows), and
  * is EXACT — the aggregate over all true in-neighbors — where the sampled
    leaf hop is a fanout-limited estimate; it also matches what full-graph
    inference computes, shrinking the train/eval distribution gap.

Estimator note: for ``deg <= fanout`` the sampler already aggregates all
neighbors (identical result); for ``deg > fanout`` this replaces an unbiased
high-variance estimate with its exact mean (for 'mean'), the true maximum
(for 'max'), and the true neighbor SUM for GCN — where the sampled hop's sum
is fanout-truncated, so exact mode also removes that bias.

Not applicable when the first layer's INPUT is step-dependent: sagePL's
learned input noise (reference src/models/layers/sagePL.py:41-49) perturbs
``x`` per step, and BatchNorm on the input depth arrays would have to move
inside the aggregate. Step factories guard both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .scatter import gather_scatter_max, gather_scatter_mean, gather_scatter_sum

Array = jax.Array


def precompute_leaf_agg(
    x: Array,
    csr,
    indptr_np: np.ndarray | None = None,
    aggr: str = "mean",
    backend: str = "auto",
) -> Array:
    """``M[v] = aggr_{j in N(v)} x[j]`` for every node, on device.

    ``csr`` is the device-resident reversed CSR (rows = destinations) the
    sampler uses, so N(v) here is exactly the neighbor set the sampled leaf
    hop draws from. ``indptr_np`` (host copy of csr.indptr) avoids a
    device->host fetch when available.
    """
    num_nodes = csr.num_nodes
    if indptr_np is None:
        indptr_np = np.asarray(csr.indptr)
    n_edges = int(indptr_np[-1])
    if backend == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        use_pallas = on_tpu and n_edges >= 4_000_000 and aggr in ("mean", "sum")
        backend = "pallas" if use_pallas else "xla"

    if backend == "pallas":
        from .pallas_spmm import PallasSpmmDevice

        spmm = PallasSpmmDevice(
            np.asarray(indptr_np, np.int64), csr.indices, num_nodes
        )
        f = x.shape[-1]
        f_pad = -(-f // 128) * 128
        xp = jnp.pad(x, ((0, 0), (0, f_pad - f))) if f_pad != f else x
        # cast at the kernel's flush DMA (accumulation stays f32): same
        # values as materialize-f32-then-astype, half the flush traffic
        out = spmm(xp, mean=(aggr == "mean"), out_dtype=x.dtype)[:, :f]
        return out

    # XLA path: derive the COO dst on device from the resident CSR
    k = jnp.arange(max(n_edges, 1), dtype=jnp.int32)
    indptr_dev = csr.indptr.astype(jnp.int32)
    dst = (jnp.searchsorted(indptr_dev, k, side="right") - 1).astype(jnp.int32)
    edge_index = jnp.stack([csr.indices.astype(jnp.int32)[: max(n_edges, 1)], dst])
    if n_edges == 0:
        return jnp.zeros_like(x)
    if aggr == "max":
        return gather_scatter_max(x, edge_index, num_nodes)
    if aggr == "sum":
        return gather_scatter_sum(x, edge_index, num_nodes)
    return gather_scatter_mean(x, edge_index, num_nodes)


def fused_leaf_table(
    x: Array,
    csr,
    indptr_np: np.ndarray | None = None,
    aggr: str = "mean",
    backend: str = "auto",
) -> Array:
    """``concat([x, M], axis=1)`` — the fused [N, 2F] exact-leaf table.

    XLA's gather engine is per-INDEX bound regardless of row width
    (docs/DESIGN.md), so fetching a leaf-depth node's own features AND its
    precomputed neighbor aggregate as ONE double-width row costs half the
    indices of two separate gathers."""
    m = precompute_leaf_agg(x, csr, indptr_np=indptr_np, aggr=aggr,
                            backend=backend)
    return jnp.concatenate([x, m.astype(x.dtype)], axis=1)


def leaf_agg_eligible(spec, fanouts) -> bool:
    """True when the exact-leaf path preserves the model's semantics."""
    return (
        spec.module in ("sage", "gcn", "sageH", "sageFC")
        and not spec.use_bn
        and len(fanouts) == spec.num_layers
        and spec.num_layers >= 1
    )
