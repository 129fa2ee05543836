"""Graph augmentation: similarity-based rewiring, feature shuffles, and
random edge perturbation (reference: src/utils/augmentation.py)."""

from .rewire import topk_rewire
from .features import shuffle_pos, shuffle_neg
from .edges import augment_edges_pos, augment_edges_neg

__all__ = [
    "topk_rewire",
    "shuffle_pos",
    "shuffle_neg",
    "augment_edges_pos",
    "augment_edges_neg",
]
