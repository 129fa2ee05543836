"""Graph containers, dataset loading, and split generation.

Replaces the reference's PyG ``Data`` objects and ``load_utils.py``
(reference: src/utils/load_utils.py) with torch-free numpy/JAX containers:
CSR (indptr/indices) + COO edge lists with static-shape padding invariants.
"""

from .containers import Graph, CSRGraph, pad_edges
from .datasets import load_network, DATASET_REGISTRY
from .splits import (
    random_planetoid_splits,
    random_computers_splits,
    ogb_products_splits,
    index_to_mask,
)

__all__ = [
    "Graph",
    "CSRGraph",
    "pad_edges",
    "load_network",
    "DATASET_REGISTRY",
    "random_planetoid_splits",
    "random_computers_splits",
    "ogb_products_splits",
    "index_to_mask",
]
