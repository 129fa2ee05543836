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
    msgs = jnp.take(x, src, axis=0)
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
