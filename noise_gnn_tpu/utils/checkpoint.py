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


def save_checkpoint(path: str, tree, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef_str = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    side = {"treedef": treedef_str, "num_leaves": len(leaves), "meta": meta or {}}
    with open(_sidecar(path), "w") as f:
        json.dump(side, f)


def load_checkpoint(path: str, like):
    """Restore into the structure of ``like`` (a template pytree)."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    _, treedef = jax.tree_util.tree_flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects {treedef.num_leaves}"
        )
    with open(_sidecar(path)) as f:
        meta = json.load(f).get("meta", {})
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def _sidecar(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"
