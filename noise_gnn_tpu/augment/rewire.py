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

from ..ops.sddmm import blockwise_topk, hier_topk, l2_normalize
from ..ops.tree_agg import TreeTopo

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


def _tree_edge_scores(hn: Array, topo: TreeTopo) -> Array:
    """<hn[child], hn[parent]> per structural tree edge (edge e is the
    out-edge of flat child node e + batch_size) — a structural repeat, no
    edge-list gather."""
    sizes, bases = topo.sizes, topo.bases
    parts = []
    for d, f in enumerate(topo.fanouts):
        parent_rows = jax.lax.slice_in_dim(hn, bases[d], bases[d] + sizes[d])
        parts.append(
            jnp.repeat(parent_rows, f, axis=0, total_repeat_length=sizes[d + 1])
        )
    parents = jnp.concatenate(parts, axis=0)
    children = jax.lax.slice_in_dim(hn, bases[1], topo.num_nodes)
    return jnp.sum(children * parents, axis=-1)


def topk_rewire_tree(
    h: Array,
    topo: TreeTopo,
    k_percent: float = 0.1,
    block: int = 2048,
) -> tuple[TreeTopo, TreeTopo]:
    """Tree-subgraph ``topk_rewire`` in delta form: (pos_topo, neg_topo).

    Same semantics as :func:`topk_rewire` on ``topo``'s equivalent edge list
    (removals become edge-mask updates, additions become extra edges), but
    TPU-shaped: the per-block existing-edge mask is ARITHMETIC (each tree
    child has exactly one out-edge — its structural parent) instead of a
    scattered adjacency, the positive/negative sweeps share one similarity
    matmul per block, and top-k selection is the segment-max hierarchy
    (ops/sddmm.py hier_topk) instead of a 32M-element sort.
    """
    n = topo.num_nodes
    b_seed = topo.batch_size
    e = n - b_seed  # structural edge count
    k2 = max(2 * int(n * k_percent), 1)
    hn = l2_normalize(jax.lax.stop_gradient(h).astype(jnp.float32))

    sim_e = _tree_edge_scores(hn, topo)
    valid = topo.edge_mask
    rm_low = _remove_k(sim_e, valid, k2, lowest=True)
    rm_high = _remove_k(sim_e, valid, k2, lowest=False)
    pos_keep = valid & ~rm_low
    neg_keep = valid & ~rm_high

    block = min(block, n)
    nblocks = -(-n // block)
    hp = jnp.pad(hn, ((0, nblocks * block - n), (0, 0)))
    neg_inf = jnp.float32(-jnp.inf)
    cols = jnp.arange(n)

    def body(i, carry):
        pv, pr, pc, nv, nr, nc = carry
        row0 = i * block
        hb = jax.lax.dynamic_slice_in_dim(hp, row0, block, axis=0)
        sim = (hb @ hn.T).astype(jnp.float32)
        row_ids = row0 + jnp.arange(block)
        in_range = row_ids < n
        rid = jnp.minimum(row_ids, n - 1)
        par = topo.parent_of(rid)
        eid = jnp.clip(rid - b_seed, 0, max(e - 1, 0))
        has_edge = (rid >= b_seed) & in_range
        col_is_parent = par[:, None] == cols[None, :]
        base_inval = (~in_range[:, None]) | (rid[:, None] == cols[None, :])
        pos_adj = col_is_parent & (has_edge & pos_keep[eid])[:, None]
        neg_adj = col_is_parent & (has_edge & valid[eid])[:, None]

        bv, bi = hier_topk(jnp.where(base_inval | pos_adj, neg_inf, sim).reshape(-1), k2)
        nv_b, ni = hier_topk(jnp.where(base_inval | neg_adj, neg_inf, -sim).reshape(-1), k2)

        def merge(cv, cr, cc, v, idx):
            r = row0 + idx // n
            c = idx % n
            mv, mi = jax.lax.top_k(jnp.concatenate([cv, v]), k2)
            return (
                mv,
                jnp.take(jnp.concatenate([cr, r]), mi),
                jnp.take(jnp.concatenate([cc, c]), mi),
            )

        pv, pr, pc = merge(pv, pr, pc, bv, bi)
        nv, nr, nc = merge(nv, nr, nc, nv_b, ni)
        return pv, pr, pc, nv, nr, nc

    init1 = (
        jnp.full((k2,), neg_inf, jnp.float32),
        jnp.zeros((k2,), jnp.int32),
        jnp.zeros((k2,), jnp.int32),
    )
    pv, pr, pc, nv, nr, nc = jax.lax.fori_loop(0, nblocks, body, init1 + init1)

    ones = jnp.ones((k2,), bool)
    pos_topo = TreeTopo(b_seed, topo.fanouts, pos_keep,
                        pr.astype(jnp.int32), pc.astype(jnp.int32), ones)
    neg_topo = TreeTopo(b_seed, topo.fanouts, neg_keep,
                        nr.astype(jnp.int32), nc.astype(jnp.int32), ones)
    return pos_topo, neg_topo
