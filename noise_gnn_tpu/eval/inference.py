"""Full-graph layer-wise inference with a pre-packed SpMM operator.

Replaces the reference's host-staged streaming inference
(src/models/layers/sage.py:42-58: per layer, stream every node's sampled
neighborhood through the device and concatenate activations on the CPU) with
an entirely on-device pass over ALL edges.

Backends:
  * 'xla'    — gather + segment-sum (ops/scatter.py); auto-chunks large E;
  * 'pallas' — the hybrid Pallas kernel (ops/pallas_spmm.py), ~2.3x faster
               on v5e for many-edge graphs; features are zero-padded to a
               lane multiple (weights padded to match, so results are equal).

Only the conv stack runs at eval (parity with the reference's
SAGE/sagePL/sageH ``inference`` methods, which all ignore dropout/noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.nets import NetSpec
from ..ops.pallas_spmm import LANES, PallasSpmm
from ..ops.scatter import gather_scatter_max, gather_scatter_mean, gather_scatter_sum

Array = jax.Array


def _pad_cols(x: Array, mult: int = LANES) -> Array:
    f = x.shape[-1]
    pad = (-f) % mult
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)))


class FullGraphInference:
    """Callable (params, x) -> logits for a fixed graph."""

    def __init__(
        self,
        spec: NetSpec,
        edge_index: np.ndarray | None,
        num_nodes: int,
        backend: str = "auto",
        csr=None,
        indptr_np: np.ndarray | None = None,
        x_agg=None,
    ):
        """Pass EITHER a host ``edge_index`` (it will be staged to the
        device) OR an already-resident ``csr`` (CSRGraph) + its host
        ``indptr_np`` — the resident path uploads nothing but a few KB
        (crucial on slow host->device links).

        ``x_agg`` [N, F]: the first layer's neighbor aggregate of the RAW
        features, which is constant across the whole run (x never changes) —
        supplying it makes layer 1 matmul-only, saving one full-graph SpMM
        per call (ops/leaf_agg.py provides the table)."""
        self._x_agg = x_agg
        self.spec = spec
        self.num_nodes = int(num_nodes)
        n_edges = int(indptr_np[-1]) if csr is not None else edge_index.shape[1]
        if backend == "auto":
            on_tpu = jax.devices()[0].platform == "tpu"
            backend = "pallas" if (on_tpu and n_edges >= 4_000_000) else "xla"
        if spec.aggr == "max":
            backend = "xla"  # the Pallas one-hot-matmul reduce is sum/mean only
        if spec.module == "gat":
            # dense masked attention consumes the edge LIST, not an SpMM —
            # force the edge-list backend so _edge_index is always available
            # (with 'pallas' the gat branch would trip its assert at trace)
            backend = "xla"
        self.backend = backend
        # Per-launch gather-slab budget ~2 GB: the widest row this op carries
        # is the PAIR path's [*, 2H] fused activations, so size the edge
        # budget from that (the round-2 products flagship OOM'd when the
        # dual-width slab doubled the default 4M-edge groups to 4 GB/launch)
        itemsize = jnp.dtype(spec.compute_dtype).itemsize
        # the slab actually launched is lane-padded ([*, 2F] -> next multiple
        # of LANES), so budget from the padded width or padding-dominated
        # shapes (e.g. 2F=200 -> 256 lanes) overshoot the 2 GB target
        widest = -(-2 * max(spec.hidden_size, spec.in_size) // LANES) * LANES
        edge_budget = max((2 << 30) // max(widest * itemsize, 1), 1 << 20)
        if csr is not None:
            indptr_np = np.asarray(indptr_np, np.int64)
            if backend == "pallas":
                from ..ops.pallas_spmm import PallasSpmmDevice

                self._spmm = PallasSpmmDevice(indptr_np, csr.indices,
                                              self.num_nodes,
                                              edge_budget=edge_budget)
                self._edge_index = None
            else:
                # derive the COO dst on device from the resident CSR
                e = n_edges
                k = jnp.arange(e, dtype=jnp.int32)
                indptr_dev = jnp.asarray(indptr_np.astype(np.int32))
                dst = (jnp.searchsorted(indptr_dev, k, side="right") - 1).astype(jnp.int32)
                self._edge_index = jnp.stack([csr.indices.astype(jnp.int32), dst])
        elif backend == "pallas":
            from .. import native

            src = np.ascontiguousarray(edge_index[0])
            dst = np.ascontiguousarray(edge_index[1])
            indptr, indices = native.coo_to_csr(src, dst, self.num_nodes)
            self._spmm = PallasSpmm(indptr, indices, self.num_nodes,
                                    edge_budget=edge_budget)
            self._edge_index = None
        else:
            self._edge_index = jnp.asarray(edge_index)

        self._jitted = jax.jit(self._forward)
        self._jitted_pair = jax.jit(self._forward_pair)

    def _agg(self, x: Array, mean: bool, parts=None, edge_index=None) -> Array:
        if self.backend == "pallas":
            # out_dtype=x.dtype: the kernel accumulates in f32 and casts at
            # the flush DMA, so a bf16 compute dtype halves the flush +
            # group-concat HBM traffic with identical downstream values.
            return self._spmm._traced(
                _pad_cols(x), parts, mean, False, out_dtype=x.dtype
            )[:, : x.shape[-1]]
        if mean:
            return gather_scatter_mean(x, edge_index, self.num_nodes)
        return gather_scatter_sum(x, edge_index, self.num_nodes)

    def _forward(
        self, params: dict, x: Array, parts=None, x_agg=None, edge_index=None
    ) -> Array:
        spec = self.spec
        if spec.compute_dtype != "float32":
            x = x.astype(jnp.dtype(spec.compute_dtype))
        if spec.module == "gat":
            # dense masked attention (reference attention.py is dead code but
            # kept for completeness) is O(N^2) — small-graph edge-list
            # backend only, same math as the training forward
            from ..models.nets import _gat_forward

            assert edge_index is not None, (
                "gat inference needs the edge-list backend (small graphs)"
            )
            return _gat_forward(
                spec, params, x, edge_index, self.num_nodes, None
            ).astype(jnp.float32)
        is_gcn = spec.module == "gcn"
        if spec.use_bn:
            # parity with the stack forward (models/nets.py _stack_forward):
            # bn1 on the input, bn2 after each inter-layer ReLU. x_agg tables
            # aggregate RAW features, so they are invalid under input BN.
            from ..models.layers import batch_norm

            assert x_agg is None, "x_agg is incompatible with use_bn"
            x = batch_norm(params["bn1"], x)
        for i, p in enumerate(params["convs"]):
            if i == 0 and x_agg is not None:
                # precomputed first-layer aggregate: x is run-constant, so
                # agg(x) is too (ops/leaf_agg.py) — layer 1 is matmul-only
                agg = x_agg.astype(x.dtype)
            elif is_gcn:
                agg = self._agg(x, mean=False, parts=parts, edge_index=edge_index)
            elif spec.aggr == "max":
                agg = gather_scatter_max(x, edge_index, self.num_nodes)
            else:
                agg = self._agg(x, mean=True, parts=parts, edge_index=edge_index)
            if is_gcn:
                x = (agg + x) @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
            else:
                x = (
                    agg @ p["w_neigh"].astype(x.dtype)
                    + x @ p["w_root"].astype(x.dtype)
                    + p["b"].astype(x.dtype)
                )
            if i != spec.num_layers - 1:
                x = jax.nn.relu(x)
                if spec.use_bn:
                    from ..models.layers import batch_norm

                    x = batch_norm(params["bn2"], x)
        return x.astype(jnp.float32)

    def _forward_pair(
        self, params_pair, x: Array, parts=None, x_agg=None, edge_index=None
    ):
        """Both co-teaching networks in ONE pass: activations are concatenated
        along the feature axis so every SpMM serves both models with a single
        gather sweep. The gather engine is per-INDEX bound (~147 M idx/s on
        v5e, row width free up to ≥1 KB — docs/DESIGN.md), so the fused
        [N, 2H] aggregation costs the same as one model's — eval throughput
        per model doubles. Per-chunk src dedup (the other roofline attack)
        measured only 1.01x on dst-sorted chunks of randomly-structured
        graphs, so index-count *sharing* is the lever that actually works."""
        spec = self.spec
        p1, p2 = params_pair
        if spec.compute_dtype != "float32":
            x = x.astype(jnp.dtype(spec.compute_dtype))
        if spec.module == "gat":
            # dense attention has no shared SpMM to fuse — two plain passes
            return (
                self._forward(p1, x, parts, x_agg, edge_index),
                self._forward(p2, x, parts, x_agg, edge_index),
            )
        is_gcn = spec.module == "gcn"
        if spec.use_bn:
            from ..models.layers import batch_norm

            assert x_agg is None, "x_agg is incompatible with use_bn"
            x1 = batch_norm(p1["bn1"], x)
            x2 = batch_norm(p2["bn1"], x)
        else:
            x1 = x2 = x
        for i, (l1, l2) in enumerate(zip(p1["convs"], p2["convs"])):
            f = x1.shape[-1]
            if i == 0 and x_agg is not None:
                agg1 = agg2 = x_agg.astype(x1.dtype)
            else:
                both = jnp.concatenate([x1, x2], axis=1)
                if spec.aggr == "max" and not is_gcn:
                    agg = gather_scatter_max(both, edge_index, self.num_nodes)
                else:
                    agg = self._agg(both, mean=not is_gcn, parts=parts,
                                    edge_index=edge_index)
                agg1, agg2 = agg[:, :f], agg[:, f:]

            def conv(p, xi, agg):
                if is_gcn:
                    return (agg + xi) @ p["w"].astype(xi.dtype) + p["b"].astype(xi.dtype)
                return (
                    agg @ p["w_neigh"].astype(xi.dtype)
                    + xi @ p["w_root"].astype(xi.dtype)
                    + p["b"].astype(xi.dtype)
                )

            x1, x2 = conv(l1, x1, agg1), conv(l2, x2, agg2)
            if i != spec.num_layers - 1:
                x1, x2 = jax.nn.relu(x1), jax.nn.relu(x2)
                if spec.use_bn:
                    from ..models.layers import batch_norm

                    x1 = batch_norm(p1["bn2"], x1)
                    x2 = batch_norm(p2["bn2"], x2)
        return x1.astype(jnp.float32), x2.astype(jnp.float32)

    def pair(self, params1: dict, params2: dict, x: Array):
        """Fused two-model inference -> (logits1, logits2)."""
        if self.backend == "pallas":
            return self._jitted_pair((params1, params2), x, self._spmm._parts,
                                     self._x_agg)
        return self._jitted_pair((params1, params2), x, None, self._x_agg,
                                 self._edge_index)

    def __call__(self, params: dict, x: Array) -> Array:
        if self.backend == "pallas":
            # whole forward (all layers x all SpMM super-groups) in ONE
            # executable; the group edge/schedule arrays and the x_agg table
            # travel as args, not closed-over constants (large closures
            # break remote compile)
            return self._jitted(params, x, self._spmm._parts, self._x_agg)
        # edge_index travels as an argument for the same reason: a closed-over
        # device array serializes into the remote-compile payload (HTTP 413 on
        # big graphs) and gets constant-folded at compile time on CPU
        return self._jitted(params, x, None, self._x_agg, self._edge_index)
