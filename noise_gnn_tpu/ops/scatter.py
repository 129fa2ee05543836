"""Segment reductions and sparse message-passing primitives (XLA backend).

TPU-native replacement for the torch-scatter / torch-sparse CUDA kernels the
reference's ``SAGEConv``/``GCNConv`` message passing delegates to
(reference: src/models/layers/sage.py:16-19, src/utils/losses.py:200).

All shapes are static; masked (padded) edges are routed to a dead segment so
everything stays jittable. Accumulation is fp32 regardless of input dtype
(bf16 features accumulate in fp32, matching MXU best practice).

A Pallas fused gather+segment kernel for the hot SpMM path lives in
``noise_gnn_tpu.ops.pallas_spmm``; this module is the reference/general
backend that XLA compiles to scatter-adds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# XLA's TPU gather emits a ~1.5-2x slower loop when the (flattened) index
# count is divisible by 1024 (measured on v5e: 74-93 vs 120-150 M idx/s at
# training-batch shapes). Dodge it by gathering 512 extra wrapped indices
# and slicing them back off; the barrier keeps the simplifier from folding
# the slice into the gather. Only worth it above a few thousand rows.
_FAST_TAKE_MIN = 8192


def fast_take(x: Array, idx: Array, axis: int = 0) -> Array:
    """``jnp.take`` that avoids XLA's slow TPU gather path at %1024 counts."""
    if axis != 0:
        return jnp.take(x, idx, axis=axis)
    n = int(idx.size)
    if n < _FAST_TAKE_MIN or n % 1024:
        return jnp.take(x, idx, axis=0)
    flat = idx.reshape(-1)
    padded = jnp.concatenate([flat, flat[:512]])
    out = jax.lax.optimization_barrier(jnp.take(x, padded, axis=0))[:n]
    return out.reshape(idx.shape + x.shape[1:])


def segment_sum(data: Array, segment_ids: Array, num_segments: int) -> Array:
    """Sum `data` rows into `num_segments` buckets. fp32 accumulation."""
    acc_dtype = jnp.float32 if data.dtype in (jnp.bfloat16, jnp.float16) else data.dtype
    out = jax.ops.segment_sum(
        data.astype(acc_dtype), segment_ids, num_segments=num_segments
    )
    return out.astype(data.dtype)


def segment_count(segment_ids: Array, num_segments: int, mask: Array | None = None) -> Array:
    """Number of (valid) entries per segment, shape [num_segments]."""
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: Array, segment_ids: Array, num_segments: int, mask: Array | None = None
) -> Array:
    """Mean of `data` rows per segment; empty segments yield 0 (PyG semantics)."""
    if mask is not None:
        data = jnp.where(mask[:, None], data, 0)
    total = segment_sum(data, segment_ids, num_segments)
    count = segment_count(segment_ids, num_segments, mask)
    return (total.astype(jnp.float32) / jnp.maximum(count, 1.0)[:, None]).astype(data.dtype)


def segment_max(
    data: Array, segment_ids: Array, num_segments: int, mask: Array | None = None
) -> Array:
    """Max of `data` rows per segment; empty segments yield 0."""
    neg_inf = jnp.array(-jnp.inf, dtype=data.dtype)
    if mask is not None:
        data = jnp.where(mask[:, None], data, neg_inf)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0)


def _apply_edge_mask(src: Array, dst: Array, edge_mask: Array | None, num_nodes: int):
    """Route masked edges to a dead destination so scatter stays static-shape.

    The dead segment is `num_nodes` (one extra row that is sliced off)."""
    if edge_mask is None:
        return src, dst, None
    dst = jnp.where(edge_mask, dst, num_nodes)
    return src, dst, edge_mask


# above this many gathered elements ([E, F] message matrix), switch to the
# edge-chunked accumulation path so the intermediate never materializes
_CHUNK_THRESHOLD_ELEMS = 1 << 27  # ~512 MB fp32
_EDGE_CHUNK = 1 << 21


def _chunked_scatter_sum(x: Array, src: Array, dst: Array, num_nodes: int) -> Array:
    """fori_loop over edge chunks: acc.at[dst_chunk].add(x[src_chunk]).

    Keeps peak memory at [chunk, F] instead of [E, F]; shapes stay static
    (edges pre-padded to a chunk multiple, padding routed to a dead row).
    """
    e = src.shape[0]
    chunk = min(_EDGE_CHUNK, e)
    nchunks = -(-e // chunk)
    pad = nchunks * chunk - e
    src_p = jnp.concatenate([src, jnp.zeros((pad,), src.dtype)])
    dst_p = jnp.concatenate([dst, jnp.full((pad,), num_nodes, dst.dtype)])
    acc_dtype = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype

    def body(i, acc):
        s = jax.lax.dynamic_slice_in_dim(src_p, i * chunk, chunk)
        d = jax.lax.dynamic_slice_in_dim(dst_p, i * chunk, chunk)
        msgs = fast_take(x, s).astype(acc_dtype)
        return acc.at[d].add(msgs)

    acc = jnp.zeros((num_nodes + 1, x.shape[1]), acc_dtype)
    acc = jax.lax.fori_loop(0, nchunks, body, acc)
    return acc[:num_nodes].astype(x.dtype)


def gather_scatter_sum(
    x: Array, edge_index: Array, num_nodes: int, edge_mask: Array | None = None
) -> Array:
    """out[i] = sum_{(j -> i) in E} x[j].

    `edge_index` is [2, E] with row 0 = source, row 1 = destination (PyG
    convention: messages flow source -> target, reference SAGEConv
    aggregation). Masked edges contribute nothing. Large graphs (E * F over
    ~128M elements) automatically take the edge-chunked path.
    """
    src, dst = edge_index[0], edge_index[1]
    src, dst, _ = _apply_edge_mask(src, dst, edge_mask, num_nodes)
    if src.shape[0] * x.shape[1] > _CHUNK_THRESHOLD_ELEMS:
        return _chunked_scatter_sum(x, src, dst, num_nodes)
    msgs = fast_take(x, src)
    out = segment_sum(msgs, dst, num_nodes + 1)
    return out[:num_nodes]


def gather_scatter_mean(
    x: Array, edge_index: Array, num_nodes: int, edge_mask: Array | None = None
) -> Array:
    """out[i] = mean_{(j -> i) in E} x[j]; 0 for isolated nodes."""
    src, dst = edge_index[0], edge_index[1]
    src, dst, _ = _apply_edge_mask(src, dst, edge_mask, num_nodes)
    if src.shape[0] * x.shape[1] > _CHUNK_THRESHOLD_ELEMS:
        total = _chunked_scatter_sum(x, src, dst, num_nodes)
    else:
        total = segment_sum(fast_take(x, src), dst, num_nodes + 1)[:num_nodes]
    count = segment_count(dst, num_nodes + 1)[:num_nodes]
    return (total.astype(jnp.float32) / jnp.maximum(count, 1.0)[:, None]).astype(x.dtype)


def gather_scatter_max(
    x: Array, edge_index: Array, num_nodes: int, edge_mask: Array | None = None
) -> Array:
    """out[i] = max_{(j -> i) in E} x[j]; 0 for isolated nodes (PyG
    MaxAggregation semantics behind SAGEConv(aggr='max'))."""
    src, dst = edge_index[0], edge_index[1]
    src, dst, _ = _apply_edge_mask(src, dst, edge_mask, num_nodes)
    if src.shape[0] * x.shape[1] > _CHUNK_THRESHOLD_ELEMS:
        return _chunked_scatter_max(x, src, dst, num_nodes)
    msgs = fast_take(x, src)
    out = jax.ops.segment_max(msgs, dst, num_segments=num_nodes + 1)[:num_nodes]
    return jnp.where(jnp.isfinite(out), out, 0)


def _chunked_scatter_max(x: Array, src: Array, dst: Array, num_nodes: int) -> Array:
    """fori_loop over edge chunks: acc.at[dst_chunk].max(x[src_chunk])."""
    e = src.shape[0]
    chunk = min(_EDGE_CHUNK, e)
    nchunks = -(-e // chunk)
    pad = nchunks * chunk - e
    src_p = jnp.concatenate([src, jnp.zeros((pad,), src.dtype)])
    dst_p = jnp.concatenate([dst, jnp.full((pad,), num_nodes, dst.dtype)])

    def body(i, acc):
        s = jax.lax.dynamic_slice_in_dim(src_p, i * chunk, chunk)
        d = jax.lax.dynamic_slice_in_dim(dst_p, i * chunk, chunk)
        return acc.at[d].max(fast_take(x, s))

    acc = jnp.full((num_nodes + 1, x.shape[1]), -jnp.inf, x.dtype)
    acc = jax.lax.fori_loop(0, nchunks, body, acc)
    return jnp.where(jnp.isfinite(acc[:num_nodes]), acc[:num_nodes], 0)


def degree(edge_index: Array, num_nodes: int, edge_mask: Array | None = None, axis: int = 1) -> Array:
    """In-degree (axis=1, default) or out-degree (axis=0) per node."""
    ids = edge_index[axis]
    if edge_mask is not None:
        ids = jnp.where(edge_mask, ids, num_nodes)
    return segment_count(ids, num_nodes + 1)[:num_nodes]
