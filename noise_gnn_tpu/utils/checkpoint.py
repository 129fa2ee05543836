"""Checkpointing: params + optimizer state + PRNG key + epoch, config-derived
paths (the reference only saves bare ``state_dict`` under hard-coded names,
src/pipeline_contrast.py:308-320 — SURVEY §5 calls for the full bundle).

Format: a single ``.npz`` of flattened pytree leaves + a JSON treedef
sidecar — dependency-free and portable.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, str(treedef)


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def save_checkpoint(path: str, tree, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef_str = _flatten(tree)
    # typed PRNG keys can't round-trip through numpy; store their raw
    # counter data (rewrapped on load from the template's key impl)
    arrays = {
        f"leaf_{i}": np.asarray(jax.random.key_data(x) if _is_key(x) else x)
        for i, x in enumerate(leaves)
    }
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    side = {"treedef": treedef_str, "num_leaves": len(leaves), "meta": meta or {}}
    with open(_sidecar(path), "w") as f:
        json.dump(side, f)


def load_checkpoint(path: str, like):
    """Restore into the structure of ``like`` (a template pytree)."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    tmpl_leaves, treedef = jax.tree_util.tree_flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects {treedef.num_leaves}"
        )
    leaves = [
        jax.random.wrap_key_data(x, impl=jax.random.key_impl(t))
        if _is_key(t) else x
        for x, t in zip(leaves, tmpl_leaves)
    ]
    with open(_sidecar(path)) as f:
        meta = json.load(f).get("meta", {})
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def _sidecar(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"
