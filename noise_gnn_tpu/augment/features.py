"""Feature-view augmentations (reference: src/utils/augmentation.py:88-115).

``shuffle_pos``: for each row independently, pick ``prob * F`` random columns
and permute the selected elements within the row (positive view).
``shuffle_neg``: permute whole rows (negative view).

Reference does this in a Python loop over rows; here it is one vectorized
gather/scatter, jittable for in-step use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def shuffle_pos(key: Array, x: Array, prob: float = 0.1) -> Array:
    n, f = x.shape
    m = int(f * prob)
    if m <= 1:
        return x
    k1, k2 = jax.random.split(key)
    # per-row random choice of m distinct columns: first m of a random order
    col_order = jnp.argsort(jax.random.uniform(k1, (n, f)), axis=1)
    sel = col_order[:, :m]  # [n, m] selected column indices
    perm = jnp.argsort(jax.random.uniform(k2, (n, m)), axis=1)
    src_cols = jnp.take_along_axis(sel, perm, axis=1)
    vals = jnp.take_along_axis(x, src_cols, axis=1)
    return x.at[jnp.arange(n)[:, None], sel].set(vals)


def shuffle_neg(key: Array, x: Array) -> Array:
    perm = jax.random.permutation(key, x.shape[0])
    return jnp.take(x, perm, axis=0)
