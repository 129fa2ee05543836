"""On-device fanout neighbor sampling (the ``NeighborLoader`` replacement).

Reference: PyG NeighborLoader backed by the pyg-lib C++ ``neighbor_sample``
(reference src/pipeline.py:75-92). TPU-native redesign: instead of building a
ragged merged subgraph on the host, sampling happens on device with
``jax.random`` and produces a **dense k-hop tree** with fully static shapes:

    depth 0: the B seed nodes
    depth d: [B * f1 * ... * fd] sampled in-neighbors of depth d-1

Semantics vs PyG (documented deviation, accuracy-parity tested):
  * deg <= fanout: ALL neighbors taken (offsets 0..deg-1, rest masked) —
    exact, no replacement, like PyG;
  * deg  > fanout: fanout i.i.d. uniform picks (with replacement) instead of
    without-replacement — an unbiased mean-aggregation estimator with
    slightly higher variance; avoids per-node dynamic-length machinery.
  * duplicates across the batch are NOT merged: each occurrence samples its
    own subtree (independent unbiased estimates; pure gathers, no relabeling).

The tree also exposes a *flat subgraph view* (`flat_edge_index`) with PyG's
seed-first contract: local node 0..B-1 are the seeds, ``n_id`` maps
local->global, edges point child -> parent. This serves the pipelines that
operate on the sampled subgraph itself (rewiring, discriminators —
reference src/pipeline_test.py:123-148).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.containers import CSRGraph
from .scatter import fast_take

Array = jax.Array


class TreeBatch(NamedTuple):
    """Static-shape sampled k-hop tree."""

    n_ids: tuple[Array, ...]  # n_ids[d]: [B * prod(fanouts[:d])] global ids
    masks: tuple[Array, ...]  # same shapes, True = real node
    fanouts: tuple[int, ...]
    batch_size: int

    def gather_features(self, x: Array) -> list[Array]:
        return [fast_take(x, ids) for ids in self.n_ids]

    @property
    def num_sub_nodes(self) -> int:
        return int(sum(ids.shape[0] for ids in self.n_ids))

    def flat_n_id(self) -> Array:
        return jnp.concatenate(self.n_ids)

    def flat_node_mask(self) -> Array:
        return jnp.concatenate(self.masks)

    def flat_edges(self) -> tuple[Array, Array]:
        """(edge_index_local [2, E_sub], edge_mask [E_sub]): child -> parent."""
        ei = jnp.asarray(flat_edge_index(self.batch_size, self.fanouts))
        mask = jnp.concatenate(self.masks[1:]) if len(self.masks) > 1 else jnp.zeros((0,), bool)
        return ei, mask


@functools.lru_cache(maxsize=64)
def flat_edge_index(batch_size: int, fanouts: tuple[int, ...]) -> np.ndarray:
    """Structural edge list of the sampled tree (constant per config).

    Child at depth d+1, flat-position base_{d+1} + j, connects to parent
    base_d + j // fanouts[d]; messages flow child -> parent.
    """
    sizes = [batch_size]
    for f in fanouts:
        sizes.append(sizes[-1] * f)
    bases = np.cumsum([0] + sizes[:-1])
    src, dst = [], []
    for d, f in enumerate(fanouts):
        n_child = sizes[d + 1]
        j = np.arange(n_child, dtype=np.int32)
        src.append(bases[d + 1] + j)
        dst.append(bases[d] + j // f)
    if not src:
        return np.zeros((2, 0), np.int32)
    return np.stack([np.concatenate(src), np.concatenate(dst)]).astype(np.int32)


def _sample_one_hop(
    key: Array, indptr: Array, indices: Array, frontier: Array, frontier_mask: Array, fanout: int
):
    """Sample `fanout` in-neighbors for every frontier node — i.i.d. picks.

    Returns (children [N*f], child_mask [N*f]) in child-major order
    (children of frontier[i] occupy slots i*f .. (i+1)*f - 1)."""
    n = frontier.shape[0]
    start = fast_take(indptr, frontier)
    deg = fast_take(indptr, frontier + 1) - start
    u = jax.random.uniform(key, (n, fanout))
    off_rep = jnp.floor(u * deg[:, None]).astype(jnp.int32)
    off_seq = jnp.broadcast_to(jnp.arange(fanout, dtype=jnp.int32), (n, fanout))
    take_all = (deg <= fanout)[:, None]
    off = jnp.where(take_all, off_seq, off_rep)
    valid = frontier_mask[:, None] & (off < deg[:, None])
    off = jnp.minimum(off, jnp.maximum(deg - 1, 0)[:, None])
    children = fast_take(indices, start[:, None] + off)
    children = jnp.where(valid, children, 0)
    return children.reshape(-1), valid.reshape(-1)


_HOP_SAMPLERS = {"iid": _sample_one_hop}


def sample_khop_tree(
    key: Array,
    csr: CSRGraph,
    seeds: Array,
    fanouts: tuple[int, ...],
    seed_mask: Array | None = None,
    mode: str = "iid",
) -> TreeBatch:
    """Sample the dense k-hop tree rooted at `seeds`. Jit-safe (static
    fanouts / batch size).

    ``mode``: 'iid' — fanout independent uniform picks per node. This is at
    XLA's per-index gather roofline (~71 M indices/s on v5e, measured): a
    circular-window variant using slice-form gathers (2 slices/node instead
    of fanout point gathers) was built and measured 16x SLOWER — XLA's fast
    gather path handles point gathers only (vmap(dynamic_slice) and
    lax.gather with slice_sizes both hit a slow path at ~4 M slices/s)."""
    b = seeds.shape[0]
    if seed_mask is None:
        seed_mask = jnp.ones((b,), bool)
    hop = _HOP_SAMPLERS[mode]
    n_ids = [seeds.astype(jnp.int32)]
    masks = [seed_mask]
    keys = jax.random.split(key, max(len(fanouts), 1))
    for d, f in enumerate(fanouts):
        children, child_mask = hop(
            keys[d], csr.indptr, csr.indices, n_ids[-1], masks[-1], f
        )
        n_ids.append(children)
        masks.append(child_mask)
    return TreeBatch(tuple(n_ids), tuple(masks), tuple(fanouts), b)
