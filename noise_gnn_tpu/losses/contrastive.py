"""Contrastive objectives: inner-product discriminator + expert BCE.

Reference: src/utils/data_utils.py:5-97.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def kl_divergence(p: Array, q: Array) -> Array:
    """Per-sample KL with the reference's 1e-10 guards (data_utils.py:5)."""
    return jnp.sum(p * jnp.log((p + 1e-10) / (q + 1e-10)), axis=-1)


def jensen_shannon(p: Array, q: Array) -> Array:
    """JS divergence of two probability rows (data_utils.py:9-15)."""
    m = (p + q) / 2.0
    return 0.5 * kl_divergence(p, m) + 0.5 * kl_divergence(q, m)


def discriminator_innerprod(h: Array, h_pos: Array, h_neg: Array):
    """logits = row-wise inner products with the positive / negative views
    (reference Discriminator_innerprod, data_utils.py:53-64)."""
    logits_pos = jnp.sum(h * h_pos, axis=-1)
    logits_neg = jnp.sum(h * h_neg, axis=-1)
    return logits_pos, logits_neg


def discriminator_innerprod2(h: Array, h_pos1: Array, h_pos2: Array, h_neg: Array):
    """Two-positive variant (data_utils.py:85-97)."""
    return (
        jnp.sum(h * h_pos1, axis=-1),
        jnp.sum(h * h_pos2, axis=-1),
        jnp.sum(h * h_neg, axis=-1),
    )


def _bce_with_logits(logits: Array, targets: Array, weights: Array | None) -> Array:
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is None:
        return jnp.mean(per)
    w = weights.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(w.sum(), 1.0)


def bce_expert_loss(
    logits_pos: Array,
    logits_neg: Array,
    pos_mask: Array | None = None,
    neg_mask: Array | None = None,
) -> Array:
    """BCE(positives vs 1) + BCE(negatives vs 0) (reference BCEExeprtLoss,
    data_utils.py:34-50). Masks support padded selections: the reference
    indexes dynamic ind_noisy subsets; here the subset is a boolean mask and
    the mean runs over selected rows only."""
    lp = _bce_with_logits(logits_pos, jnp.ones_like(logits_pos), pos_mask)
    ln = _bce_with_logits(logits_neg, jnp.zeros_like(logits_neg), neg_mask)
    return lp + ln


def bce_expert_loss2(
    logits_pos1: Array,
    logits_pos2: Array,
    logits_neg: Array,
    pos_mask: Array | None = None,
    neg_mask: Array | None = None,
) -> Array:
    """Two-positive variant (reference BCEExeprtLoss2 intent,
    data_utils.py:66-83; its __init__ super-call bug is fixed here)."""
    pos = jnp.concatenate([logits_pos1, logits_pos2])
    pm = None if pos_mask is None else jnp.concatenate([pos_mask, pos_mask])
    lp = _bce_with_logits(pos, jnp.ones_like(pos), pm)
    ln = _bce_with_logits(logits_neg, jnp.zeros_like(logits_neg), neg_mask)
    return lp + ln


def topk_accuracy(logits: Array, targets: Array, topk: tuple[int, ...] = (1,)):
    """precision@k (reference topk_accuracy, data_utils.py:17-32)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == targets[:, None]
    out = []
    for k in topk:
        out.append(100.0 * correct[:, :k].any(axis=-1).mean())
    return out
