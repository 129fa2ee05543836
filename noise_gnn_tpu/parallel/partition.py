"""Edge-partitioned full-graph aggregation — the graph analog of
sequence/context parallelism (SURVEY §2.4, §5 "long-context" row).

The COO edge list is sharded over the ``data`` axis; each device computes a
local partial segment-sum of its edge shard into the full destination range,
then one ``psum`` over ICI combines the partials. Features are replicated in
this round-1 design (fine through ogbn-arxiv scale on v5e); node-sharded
features + ring all-gather overlap is the round-2 upgrade path for
products-scale full-graph inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.scatter import fast_take
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.scatter import segment_count, segment_sum


def shard_edges(edge_index: np.ndarray, n_shards: int):
    """Pad the edge list to a shard multiple (padding masked via dead dst)."""
    e = edge_index.shape[1]
    per = -(-e // n_shards)
    pad = per * n_shards - e
    ei = np.concatenate([edge_index, np.zeros((2, pad), edge_index.dtype)], axis=1)
    mask = np.concatenate([np.ones(e, bool), np.zeros(pad, bool)])
    return ei, mask


def _local_partial(x, src, dst, mask, num_nodes):
    dst = jnp.where(mask, dst, num_nodes)
    msgs = fast_take(x, src)
    total = segment_sum(msgs, dst, num_nodes + 1)[:num_nodes]
    count = segment_count(dst, num_nodes + 1)[:num_nodes]
    return total, count


def partitioned_spmm_sum(mesh, x, edge_index, edge_mask, num_nodes: int):
    """out[i] = sum over ALL edge shards of x[src] into dst; edges sharded
    over ``data``, x replicated, one psum."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "data"), P("data")),
        out_specs=P(),
    )
    def run(x_, ei_, mask_):
        total, _ = _local_partial(x_, ei_[0], ei_[1], mask_, num_nodes)
        return jax.lax.psum(total, "data")

    return run(x, edge_index, edge_mask)


def make_partitioned_inference(mesh, spec, edge_index: np.ndarray, num_nodes: int):
    """Distributed full-graph inference: the SAGE/GCN conv stack with every
    aggregation running as an edge-partitioned SpMM over the mesh — the
    TPU replacement for the reference's host-staged layer-wise eval loop
    (src/models/layers/sage.py:42-58), with no host round-trip and the
    edge work split across devices.

    Returns ``infer(params, x) -> logits``; edges are padded/sharded once
    at build time."""
    ei, mask = shard_edges(np.asarray(edge_index), mesh.devices.size)
    ei_dev = jax.device_put(ei, jax.NamedSharding(mesh, P(None, "data")))
    mask_dev = jax.device_put(mask, jax.NamedSharding(mesh, P("data")))
    is_gcn = spec.module == "gcn"

    def infer(params, x):
        if spec.compute_dtype != "float32":
            x = x.astype(jnp.dtype(spec.compute_dtype))
        for i, p in enumerate(params["convs"]):
            if is_gcn:
                agg = partitioned_spmm_sum(mesh, x, ei_dev, mask_dev, num_nodes) + x
                x = agg @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
            else:
                agg = partitioned_spmm_mean(mesh, x, ei_dev, mask_dev, num_nodes)
                x = (
                    agg @ p["w_neigh"].astype(x.dtype)
                    + x @ p["w_root"].astype(x.dtype)
                    + p["b"].astype(x.dtype)
                )
            if i != spec.num_layers - 1:
                x = jax.nn.relu(x)
        return x.astype(jnp.float32)

    return infer


def partitioned_spmm_mean(mesh, x, edge_index, edge_mask, num_nodes: int):
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "data"), P("data")),
        out_specs=(P(), P()),
    )
    def run(x_, ei_, mask_):
        total, count = _local_partial(x_, ei_[0], ei_[1], mask_, num_nodes)
        return jax.lax.psum(total, "data"), jax.lax.psum(count, "data")

    total, count = run(x, edge_index, edge_mask)
    return (
        total.astype(jnp.float32) / jnp.maximum(count, 1.0)[:, None]
    ).astype(x.dtype)
