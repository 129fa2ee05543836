"""Models: functional GNN layers and network definitions (params as pytrees).

Covers the reference model family (src/models/layers/): SAGE, SimpleGCN,
SAGEH, SAGEFC, SAGEPL (learned per-node input noise), the 1-layer GCN head,
and the dense-adjacency GAT. Every network has two forward paths:

* ``apply``      — edge-list message passing (full-batch graphs, parity tests,
                   full-graph inference);
* ``apply_tree`` — dense k-hop sampled-tree forward for mini-batch training
                   (static shapes, pure gathers + batched MXU matmuls).
"""

from .layers import (
    glorot,
    sage_conv_init,
    sage_conv,
    sage_conv_tree,
    gcn_conv_init,
    gcn_conv,
    linear_init,
    linear,
    sima_init,
    sima,
)
from .nets import (
    MODULES,
    NetSpec,
    apply,
    apply_tree,
    init_params,
    make_network,
)

__all__ = [
    "glorot",
    "sage_conv_init",
    "sage_conv",
    "sage_conv_tree",
    "gcn_conv_init",
    "gcn_conv",
    "linear_init",
    "linear",
    "sima_init",
    "sima",
    "MODULES",
    "NetSpec",
    "apply",
    "apply_tree",
    "init_params",
    "make_network",
]
