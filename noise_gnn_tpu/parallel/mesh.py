"""Mesh construction and sharding rules.

Axes:
  ``data``  — seed-node batch parallelism (DP) and edge shards;
  ``model`` — tensor parallelism over the hidden feature dimension (TP),
              useful for wide layers (hidden >= 512 configs,
              reference config/config_cora.yml:12).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """(data, model) mesh; data axis absorbs what model doesn't use."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def param_sharding(mesh: Mesh, params) -> dict:
    """Tensor-parallel sharding rules for a network param pytree.

    Hidden-dimension columns of weight matrices shard over ``model`` when
    divisible; everything else (biases, small vectors) replicates. With
    model_parallel=1 this degrades to full replication.
    """
    tp = mesh.shape["model"]

    def rule(leaf):
        if tp > 1 and hasattr(leaf, "ndim") and leaf.ndim == 2 and leaf.shape[1] % tp == 0:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)
