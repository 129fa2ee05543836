"""Consistency-regularization losses (FixMatch-style) and neighborhood
uncertainty weighting.

Reference: src/utils/losses.py:182-292. The sparse A @ p products go through
the same segment-sum SpMM as message passing — no host scipy roundtrip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.scatter import segment_count, segment_sum
from ..ops.tree_agg import TreeTopo, tree_parent_gather

Array = jax.Array


def _out_neighbor_mean(edge_index, h: Array, edge_mask, epsilon: float) -> Array:
    """Row-normalized A·h over edge SOURCES: mean over each node's
    out-neighbors in the subgraph (reference torch.sparse.mm pattern,
    losses.py:199-201). TreeTopo inputs take the scatter-free path."""
    if isinstance(edge_index, TreeTopo):
        total, deg = tree_parent_gather(h, edge_index)
        return total / (deg[:, None] + epsilon)
    n = h.shape[0]
    row, col = edge_index[0], edge_index[1]
    if edge_mask is not None:
        row = jnp.where(edge_mask, row, n)
    total = segment_sum(jnp.take(h, col, axis=0), row, n + 1)[:n]
    deg = segment_count(row, n + 1)[:n]
    return total / (deg[:, None] + epsilon)


def entropy(p: Array, axis: int = -1) -> Array:
    """Base-2 entropy with the reference's 1e-5 guard (losses.py:182)."""
    return -jnp.sum(p * jnp.log2(p + 1e-5), axis=axis)


def get_uncertainty(
    edge_index: Array,
    y_pure: Array,
    nbr_classes: int,
    edge_mask: Array | None = None,
    epsilon: float = 1e-16,
) -> Array:
    """w = exp(-H(A·p / deg) / log2 C).

    Reference get_uncertainty_batch (losses.py:185-204): p = exp(y_pure)
    (y_pure is log-softmax), aggregated over ROW = edge_index[0] (the node's
    out-neighbors in the sampled subgraph), row-normalized by out-degree.
    """
    p = jnp.exp(y_pure)
    ptc = _out_neighbor_mean(edge_index, p, edge_mask, epsilon)
    hpt = entropy(ptc)
    return jnp.exp(-hpt / jnp.log2(jnp.asarray(float(nbr_classes))))


def ce_loss(logits: Array, targets: Array, use_hard_labels: bool = True) -> Array:
    """Per-sample CE with hard or soft targets (reference ce_loss,
    losses.py:206-213)."""
    if use_hard_labels:
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.sum(-targets * logp, axis=-1)


def fix_cr(
    y_pure: Array,
    y_noisy: Array,
    batch_size: int,
    name: str = "ce",
    p_cutoff: float = 0.0,
    use_hard_labels: bool = True,
    w: Array | None = None,
    sample_mask: Array | None = None,
) -> Array:
    """FixMatch consistency between the pure and noisy branches.

    Reference fix_cr (losses.py:215-246): y_pure/y_noisy are log-softmax
    outputs; pseudo = exp(y). The pure branch gives hard pseudo-labels with a
    confidence mask max_prob >= p_cutoff; CE is taken of the *probability*
    vector exp(y_noisy) treated as logits (faithful to the reference),
    optionally weighted by w[:batch_size]. Applied on seed rows only.
    """
    y_pure = y_pure[:batch_size]
    y_noisy = y_noisy[:batch_size]
    pseudo_pure = jnp.exp(y_pure)
    pseudo_noisy = jnp.exp(y_noisy)
    if name == "l2":
        return jnp.mean((y_noisy - y_pure) ** 2)
    max_probs = jnp.max(pseudo_pure, axis=-1)
    max_idx = jnp.argmax(pseudo_pure, axis=-1)
    mask = (max_probs >= p_cutoff).astype(jnp.float32)
    if use_hard_labels:
        masked_loss = ce_loss(pseudo_noisy, max_idx, True) * mask
    else:
        masked_loss = ce_loss(pseudo_noisy, pseudo_pure, False) * mask
    if w is not None:
        masked_loss = w[:batch_size] * masked_loss
    if sample_mask is not None:
        sm = sample_mask[:batch_size].astype(jnp.float32)
        return jnp.sum(masked_loss * sm) / jnp.maximum(sm.sum(), 1.0)
    return jnp.mean(masked_loss)


def neighbor_align(
    edge_index: Array,
    h: Array,
    noisy_mask: Array,
    temp: float = 0.1,
    ncr_conf: float = 0.0,
    epsilon: float = 1e-16,
    edge_mask: Array | None = None,
) -> Array:
    """Neighborhood-consistency KL regularizer.

    Reference neighbor_align_batch (losses.py:248-292) — note the reference
    body crashes on a leftover debug ``print(a)`` (losses.py:276); this is
    the intended math: sharpened neighborhood mean of h, KL against h on
    noisy-selected rows with a confidence filter.
    """
    mean = _out_neighbor_mean(edge_index, h, edge_mask, epsilon)
    powed = jnp.power(jnp.maximum(mean, 0.0), 1.0 / temp)
    sharp = jax.lax.stop_gradient(
        powed / jnp.sum(powed + epsilon, axis=-1, keepdims=True)
    )
    # F.kl_div(h, sharp): sharp * (log sharp - h), h expected in log space
    kl = sharp * (jnp.log(jnp.maximum(sharp, 1e-30)) - h)
    kl_sum = kl.sum(axis=-1)
    conf = jnp.max(mean, axis=-1) > ncr_conf
    sel = noisy_mask & conf
    w = sel.astype(jnp.float32)
    return jnp.sum(kl_sum * w) / jnp.maximum(w.sum(), 1.0)
