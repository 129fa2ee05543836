"""Similarity top-k rewiring without O(N^2) materialization.

Reference ``topk_rewire`` (src/utils/augmentation.py:9-86) builds several
dense N x N matrices; here the similarity matrix stays implicit:

  * per-edge scores via SDDMM (E values);
  * global best/worst non-edges via blockwise top-k over h @ h.T with
    O(block * N) memory (ops.sddmm.blockwise_topk).

Undirected-mode semantics replicated (k = N * k_percent):
  pos graph: remove the 2k LOWEST-similarity existing (off-diagonal) edges,
             add the 2k HIGHEST-similarity non-edges (vs the kept adjacency);
  neg graph: remove the 2k HIGHEST-similarity existing edges,
             add the 2k LOWEST-similarity non-edges (vs the original
             adjacency).

Returns static-shape (edges [2, E+2k], mask) pairs: original edges with
removals masked out, additions appended. Fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sddmm import blockwise_topk, l2_normalize

Array = jax.Array


def _edge_scores(hn: Array, edge_index: Array) -> Array:
    return jnp.sum(
        jnp.take(hn, edge_index[0], axis=0) * jnp.take(hn, edge_index[1], axis=0),
        axis=-1,
    )


def _remove_k(edge_sim: Array, valid: Array, k: int, lowest: bool) -> Array:
    """Boolean mask of the k lowest/highest-similarity valid edges."""
    neg_inf = jnp.float32(-jnp.inf)
    scores = jnp.where(valid, edge_sim, neg_inf)
    if lowest:
        scores = jnp.where(valid, -edge_sim, neg_inf)
    vals, idx = jax.lax.top_k(scores, min(k, edge_sim.shape[0]))
    sel = jnp.zeros(edge_sim.shape, bool).at[idx].set(vals > neg_inf)
    return sel


def _adj_mask_fn(edge_index: Array, edge_valid: Array, n: int):
    """mask_fn for blockwise_topk: excludes existing (valid) edges + diagonal.

    Builds the [block, N] adjacency slice per row-block by scattering the
    edge list (edges outside the block land in a dead row).
    """

    src, dst = edge_index[0], edge_index[1]

    def mask_fn(row0, row_ids, sim):
        block = sim.shape[0]
        local = src - row0
        in_blk = edge_valid & (local >= 0) & (local < block)
        rows = jnp.where(in_blk, local, block)  # dead row `block`
        adj = (
            jnp.zeros((block + 1, sim.shape[1]), bool).at[rows, dst].set(True)[:block]
        )
        neg_inf = jnp.float32(-jnp.inf)
        sim = jnp.where(adj, neg_inf, sim)
        diag = row_ids[:, None] == jnp.arange(sim.shape[1])[None, :]
        return jnp.where(diag, neg_inf, sim)

    return mask_fn


def topk_rewire(
    h: Array,
    edge_index: Array,
    edge_mask: Array | None,
    k_percent: float = 0.1,
    block: int = 1024,
):
    """Returns ((pos_edges, pos_mask), (neg_edges, neg_mask)).

    h: [N, D] node embeddings; edge_index [2, E] over those N nodes.
    """
    n = h.shape[0]
    e = edge_index.shape[1]
    k2 = max(2 * int(n * k_percent), 1)
    # only integer edge ids / boolean masks leave this function, so no
    # gradient can flow through the similarity scores (the reference's
    # torch.topk indices are equally non-differentiable) — cut the autodiff
    # graph explicitly so jit never builds a backward for the O(N^2) SDDMM
    hn = l2_normalize(jax.lax.stop_gradient(h).astype(jnp.float32))
    if edge_mask is None:
        edge_mask = jnp.ones((e,), bool)
    off_diag = edge_index[0] != edge_index[1]
    valid = edge_mask & off_diag

    sim = _edge_scores(hn, edge_index)

    # ---- positive graph
    rm_low = _remove_k(sim, valid, k2, lowest=True)
    pos_keep = edge_mask & ~rm_low
    _, add_r, add_c = blockwise_topk(
        hn, k2, _adj_mask_fn(edge_index, pos_keep, n), largest=True, block=block
    )
    pos_edges = jnp.concatenate([edge_index, jnp.stack([add_r, add_c])], axis=1)
    pos_mask = jnp.concatenate([pos_keep, jnp.ones((k2,), bool)])

    # ---- negative graph
    rm_high = _remove_k(sim, valid, k2, lowest=False)
    neg_keep = edge_mask & ~rm_high
    _, nadd_r, nadd_c = blockwise_topk(
        hn, k2, _adj_mask_fn(edge_index, edge_mask, n), largest=False, block=block
    )
    neg_edges = jnp.concatenate([edge_index, jnp.stack([nadd_r, nadd_c])], axis=1)
    neg_mask = jnp.concatenate([neg_keep, jnp.ones((k2,), bool)])

    return (pos_edges, pos_mask), (neg_edges, neg_mask)
