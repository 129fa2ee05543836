"""Compute kernels: scatter/segment reductions, SpMM, SDDMM, neighbor sampling.

These replace the third-party native kernels the reference delegates to
(pyg-lib / torch-scatter / torch-sparse, see reference docs/requirements.txt):
scatter-mean message passing, the C++ fanout neighbor sampler behind
``NeighborLoader``, and dense similarity matmuls.
"""

from .scatter import (
    fast_take,
    gather_scatter_max,
    segment_sum,
    segment_mean,
    segment_max,
    segment_count,
    gather_scatter_mean,
    gather_scatter_sum,
)
from .sampler import sample_khop_tree, TreeBatch
from .sddmm import sddmm_cosine, blockwise_topk
from .leaf_agg import precompute_leaf_agg, leaf_agg_eligible

__all__ = [
    "fast_take",
    "precompute_leaf_agg",
    "leaf_agg_eligible",
    "gather_scatter_max",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_count",
    "gather_scatter_mean",
    "gather_scatter_sum",
    "sample_khop_tree",
    "TreeBatch",
    "sddmm_cosine",
    "blockwise_topk",
]
