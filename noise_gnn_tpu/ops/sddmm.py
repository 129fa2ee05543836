"""SDDMM-style similarity ops and blockwise global top-k.

Replaces the reference's dense N x N similarity materializations
(``topk_rewire``, src/utils/augmentation.py:14,40 — allocates several full
N^2 matrices) with:

  * ``sddmm_cosine`` — per-edge cosine similarity (only E values);
  * ``blockwise_topk`` — global top-k over the implicit similarity matrix
    h @ h.T computed in row blocks with a running top-k merge, O(block * N)
    memory instead of O(N^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def l2_normalize(h: Array, eps: float = 1e-12) -> Array:
    n = jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True))
    return h / jnp.maximum(n, eps)


def sddmm_cosine(h: Array, edge_index: Array) -> Array:
    """Cosine similarity per edge: sim[e] = <h_norm[src_e], h_norm[dst_e]>."""
    hn = l2_normalize(h)
    return jnp.sum(
        jnp.take(hn, edge_index[0], axis=0) * jnp.take(hn, edge_index[1], axis=0),
        axis=-1,
    )


def hier_topk(flat: Array, k: int, seg: int = 128):
    """Exact top-k of a large 1-D array via a segment-max hierarchy.

    ``lax.top_k`` lowers to a full sort on TPU — O(n log n) over n=32 M
    elements per rewire block was the round-1 rewire pathology. Two-level
    selection: (1) per-segment maxima (a reshape+max, bandwidth-bound);
    (2) top-k over the ~n/seg maxima; (3) top-k over the k winning segments'
    elements. Exact: every element >= the k-th largest lives in a segment
    whose max is >= it, and at most k segments can have max >= the k-th
    largest value, so the k winning segments cover all of them.
    """
    n = flat.shape[0]
    if n <= max(4 * seg, 4 * k):
        return jax.lax.top_k(flat, min(k, n))
    pad = (-n) % seg
    neg_inf = jnp.array(-jnp.inf, flat.dtype)
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), neg_inf, flat.dtype)])
    segs = flat.reshape(-1, seg)
    maxima = segs.max(axis=1)
    kk = min(k, maxima.shape[0])
    _, si = jax.lax.top_k(maxima, kk)
    cand = jnp.take(segs, si, axis=0).reshape(-1)
    vals, ci = jax.lax.top_k(cand, min(k, cand.shape[0]))
    idx = si[ci // seg] * seg + ci % seg
    # -inf winners (fewer than k real entries) may point into the padding;
    # clamp so callers always get an in-range index
    return vals, jnp.minimum(idx, n - 1)


def blockwise_topk(
    h_norm: Array,
    k: int,
    mask_fn,
    largest: bool = True,
    block: int = 1024,
):
    """Top-k entries of (h_norm @ h_norm.T) under a caller-supplied mask.

    mask_fn(row_start, row_ids [B], sim [B, N]) -> sim with excluded entries
    set to -inf (callers handle both directions; for smallest-k we negate).
    Returns (values [k], rows [k], cols [k]).
    """
    n = h_norm.shape[0]
    block = min(block, n)
    nblocks = -(-n // block)
    n_pad = nblocks * block
    hp = jnp.pad(h_norm, ((0, n_pad - n), (0, 0)))

    sign = 1.0 if largest else -1.0
    neg_inf = jnp.float32(-jnp.inf)

    def body(i, carry):
        vals, rows, cols = carry
        row0 = i * block
        hb = jax.lax.dynamic_slice_in_dim(hp, row0, block, axis=0)
        sim = (hb @ h_norm.T).astype(jnp.float32) * sign
        row_ids = row0 + jnp.arange(block)
        sim = jnp.where((row_ids < n)[:, None], sim, neg_inf)
        sim = mask_fn(row0, row_ids, sim)
        bv, bc = hier_topk(sim.reshape(-1), k)
        width = sim.shape[1]
        br = row0 + bc // width
        bc = bc % width
        cat_v = jnp.concatenate([vals, bv])
        cat_r = jnp.concatenate([rows, br])
        cat_c = jnp.concatenate([cols, bc])
        mv, mi = jax.lax.top_k(cat_v, k)
        return mv, jnp.take(cat_r, mi), jnp.take(cat_c, mi)

    init = (
        jnp.full((k,), neg_inf, jnp.float32),
        jnp.zeros((k,), jnp.int32),
        jnp.zeros((k,), jnp.int32),
    )
    vals, rows, cols = jax.lax.fori_loop(0, nblocks, body, init)
    return vals * sign, rows, cols
