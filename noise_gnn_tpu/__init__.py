"""noise-gnn-tpu: a TPU-native framework for noise-robust GNN training.

Built from scratch for JAX/XLA/Pallas/pjit with the capabilities of the
reference repo ``hhilsber/noise-GNN`` (see SURVEY.md): GraphSAGE/GCN message
passing, on-device fanout neighbor sampling, synthetic label/edge/feature
noise injection, and noise-robust training pipelines (co-teaching, CoDis,
backward correction, contrastive, consistency) as pure jitted train steps,
scaling over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from . import graph, losses, models, noise, ops

__all__ = ["graph", "losses", "models", "noise", "ops", "__version__"]
