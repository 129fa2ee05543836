"""Multi-chip parallelism over a jax.sharding.Mesh.

The reference is strictly single-process/single-GPU (SURVEY §2.4: no DDP,
no collectives anywhere). This package supplies the TPU-native scaling story:

* ``mesh``      — mesh construction and named-sharding rules (data x model);
* ``dp``        — data-parallel train steps: seed batches sharded over the
                  ``data`` axis, parameters replicated, gradients psummed by
                  GSPMD from the sharding annotations;
* ``partition`` — edge-partitioned full-graph aggregation (the graph analog
                  of sequence/context parallelism): each device reduces its
                  edge shard locally, partials combine with one psum over ICI.
"""

from .mesh import make_mesh, param_sharding, replicated, batch_sharding
from .multihost import initialize as distributed_initialize, process_info
from .dp import make_dp_ct_epoch, make_dp_ct_step, shard_batch
from .partition import (
    make_partitioned_inference,
    partitioned_spmm_mean,
    partitioned_spmm_sum,
    shard_edges,
)

__all__ = [
    "make_mesh",
    "param_sharding",
    "replicated",
    "batch_sharding",
    "make_dp_ct_epoch",
    "make_dp_ct_step",
    "shard_batch",
    "make_partitioned_inference",
    "partitioned_spmm_sum",
    "partitioned_spmm_mean",
    "shard_edges",
    "distributed_initialize",
    "process_info",
]
