"""Co-teaching family losses, fully on-device with static shapes.

Reference: src/utils/losses.py:10-180. The reference's CTLoss does a
per-step GPU->CPU sync (np.argsort at losses.py:21,25); here selection is a
rank mask inside the jitted step: keep sample i iff rank(loss_i) < n_keep,
where n_keep = floor((1 - forget_rate) * B) may be a traced scalar.

Selected-set cross-entropy ``mean(ce[sel])`` is computed as
``sum(ce * mask) / n_keep`` — identical math, no dynamic shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy(logits: Array, labels: Array) -> Array:
    """Per-sample CE (F.cross_entropy(reduction='none') parity)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def _rank_of(values: Array) -> Array:
    """rank[i] = position of i in ascending sort of `values`."""
    order = jnp.argsort(values)
    return jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))


def small_loss_selection(per_sample_loss: Array, forget_rate: Array):
    """Boolean keep-mask of the (1-forget_rate) fraction smallest losses.

    Returns (keep_mask [B] bool, n_keep scalar f32, sorted_order [B] int).
    n_keep = floor((1-fr)*B) matching the reference's int() truncation
    (losses.py:29); the 1e-4 guard absorbs f32 representation error.
    """
    b = per_sample_loss.shape[0]
    n_keep = jnp.floor((1.0 - forget_rate) * b + 1e-4)
    rank = _rank_of(per_sample_loss)
    keep = rank < n_keep
    return keep, n_keep, rank


class CTLossOut(NamedTuple):
    loss_1: Array
    loss_2: Array
    pure_ratio_1: Array
    pure_ratio_2: Array
    keep_1: Array  # bool mask: net1's small-loss selection ("ind_1_update")
    keep_2: Array
    noisy_1: Array  # bool mask: rejected by net1 ("ind_1_noisy")
    noisy_2: Array


def ct_loss(
    logits_1: Array,
    logits_2: Array,
    y_noise: Array,
    forget_rate: Array,
    clean_mask: Array,
    sample_mask: Array | None = None,
) -> CTLossOut:
    """Co-teaching with small-loss exchange (reference CTLoss, losses.py:19-49).

    ``clean_mask`` is noise_or_not gathered for the batch (True = clean),
    used only for the pure-ratio diagnostics. ``sample_mask`` marks valid
    rows when the batch is padded; invalid rows are never selected.
    """
    ce1 = cross_entropy(logits_1, y_noise)
    ce2 = cross_entropy(logits_2, y_noise)
    return _exchange(ce1, ce2, logits_1, logits_2, y_noise, forget_rate, clean_mask, sample_mask)


def _exchange(ce1, ce2, logits_1, logits_2, y_noise, forget_rate, clean_mask, sample_mask):
    big = jnp.array(jnp.finfo(ce1.dtype).max / 2, ce1.dtype)
    b = ce1.shape[0]
    if sample_mask is not None:
        # n_keep counts only VALID rows (reference batches are never padded);
        # padded rows get +inf loss so they sort last and are never kept
        n_valid = sample_mask.sum()
        ce1 = jnp.where(sample_mask, ce1, big)
        ce2 = jnp.where(sample_mask, ce2, big)
    else:
        n_valid = jnp.float32(b)
    n_keep = jnp.floor((1.0 - forget_rate) * n_valid + 1e-4)
    keep1 = _rank_of(ce1) < n_keep
    keep2 = _rank_of(ce2) < n_keep
    if sample_mask is not None:
        keep1 = keep1 & sample_mask
        keep2 = keep2 & sample_mask

    clean = clean_mask.astype(jnp.float32)
    pure_1 = jnp.sum(clean * keep1) / jnp.maximum(n_keep, 1.0)
    pure_2 = jnp.sum(clean * keep2) / jnp.maximum(n_keep, 1.0)

    # exchange: net1 trains on net2's selection and vice-versa
    ce1_fresh = cross_entropy(logits_1, y_noise)
    ce2_fresh = cross_entropy(logits_2, y_noise)
    loss_1 = jnp.sum(ce1_fresh * keep2) / jnp.maximum(n_keep, 1.0)
    loss_2 = jnp.sum(ce2_fresh * keep1) / jnp.maximum(n_keep, 1.0)

    noisy1 = ~keep1
    noisy2 = ~keep2
    if sample_mask is not None:
        noisy1 = noisy1 & sample_mask
        noisy2 = noisy2 & sample_mask
    return CTLossOut(loss_1, loss_2, pure_1, pure_2, keep1, keep2, noisy1, noisy2)


def _js_per_sample(logits_1: Array, logits_2: Array) -> Array:
    """sum_c JS terms per sample, F.kl_div convention (losses.py:95-105):
    JS = 0.5*KL(m || p1-as-logprob) ... concretely the reference computes
    kl_i = m * (log m - log_softmax(pred)) summed over classes, averaged."""
    p1 = jax.nn.softmax(logits_1, axis=-1)
    p2 = jax.nn.softmax(logits_2, axis=-1)
    m = (p1 + p2) / 2.0
    logm = jnp.log(jnp.maximum(m, 1e-30))
    kl1 = m * (logm - jax.nn.log_softmax(logits_1, axis=-1))
    kl2 = m * (logm - jax.nn.log_softmax(logits_2, axis=-1))
    return ((kl1 + kl2) / 2.0).sum(axis=-1)


def codi_loss(
    logits_1: Array,
    logits_2: Array,
    y_noise: Array,
    forget_rate: Array,
    clean_mask: Array,
    co_lambda: float = 0.1,
    sample_mask: Array | None = None,
) -> CTLossOut:
    """CoDis: per-sample CE - co_lambda * JS(y1,y2) (detached) then the same
    small-loss exchange, but the exchange CE is the plain CE
    (reference CoDiLoss, losses.py:106-137)."""
    js = jax.lax.stop_gradient(_js_per_sample(logits_1, logits_2))
    ce1 = cross_entropy(logits_1, y_noise) - co_lambda * js
    ce2 = cross_entropy(logits_2, y_noise) - co_lambda * js
    return _exchange(ce1, ce2, logits_1, logits_2, y_noise, forget_rate, clean_mask, sample_mask)


def ct_loss2(
    logits_1: Array,
    logits_2: Array,
    y_noise_1: Array,
    y_noise_2: Array,
    forget_rate: Array,
    clean_mask: Array,
    sample_mask: Array | None = None,
) -> CTLossOut:
    """CTLoss2: co-teaching where each net has its own noisy-label view
    (reference losses.py:141-180)."""
    ce1 = cross_entropy(logits_1, y_noise_1)
    ce2 = cross_entropy(logits_2, y_noise_2)
    big = jnp.array(jnp.finfo(ce1.dtype).max / 2, ce1.dtype)
    if sample_mask is not None:
        n_valid = sample_mask.sum()
        ce1 = jnp.where(sample_mask, ce1, big)
        ce2 = jnp.where(sample_mask, ce2, big)
    else:
        n_valid = jnp.float32(ce1.shape[0])
    n_keep = jnp.floor((1.0 - forget_rate) * n_valid + 1e-4)
    keep1 = _rank_of(ce1) < n_keep
    keep2 = _rank_of(ce2) < n_keep
    if sample_mask is not None:
        keep1 = keep1 & sample_mask
        keep2 = keep2 & sample_mask
    clean = clean_mask.astype(jnp.float32)
    pure_1 = jnp.sum(clean * keep1) / jnp.maximum(n_keep, 1.0)
    pure_2 = jnp.sum(clean * keep2) / jnp.maximum(n_keep, 1.0)
    loss_1 = jnp.sum(cross_entropy(logits_1, y_noise_1) * keep2) / jnp.maximum(n_keep, 1.0)
    loss_2 = jnp.sum(cross_entropy(logits_2, y_noise_2) * keep1) / jnp.maximum(n_keep, 1.0)
    return CTLossOut(loss_1, loss_2, pure_1, pure_2, keep1, keep2, ~keep1, ~keep2)


def backward_correction(
    logits: Array,
    labels: Array,
    noise_mat: Array,
    sample_mask: Array | None = None,
) -> Array:
    """Backward loss correction with the true injected noise matrix C:
    -mean( onehot @ C^-1 * log(clamp(softmax(out))) )
    (reference backward_correction, losses.py:51-70; mean over ALL B*C
    elements, matching torch.mean of the full matrix)."""
    c_inv = jnp.linalg.inv(noise_mat.astype(jnp.float32))
    onehot = jax.nn.one_hot(labels, noise_mat.shape[0], dtype=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.clip(probs, 1e-5, 1.0 - 1e-5)
    elems = (onehot @ c_inv) * jnp.log(probs)
    if sample_mask is None:
        return -jnp.mean(elems)
    w = sample_mask.astype(jnp.float32)[:, None]
    return -jnp.sum(elems * w) / jnp.maximum(w.sum() * elems.shape[1], 1.0)
