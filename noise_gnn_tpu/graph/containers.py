"""Graph containers with static-shape invariants.

The host-side :class:`Graph` holds numpy arrays (features, labels, COO edges,
splits); :class:`CSRGraph` is the device-resident CSR form consumed by the
on-device neighbor sampler and the full-graph SpMM path.

Replaces PyG ``torch_geometric.data.Data`` usage throughout the reference
(e.g. src/pipeline.py:75-92 relies on ``data.x``, ``data.edge_index``,
``data.y``, ``data.yhn`` and boolean split masks).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_edges(edge_index: np.ndarray, multiple: int = 128):
    """Pad a [2, E] COO edge list to a multiple of `multiple`.

    Returns (padded_edge_index, edge_mask). Padded entries point 0->0 and are
    masked out; every consumer must honor the mask.
    """
    e = edge_index.shape[1]
    e_pad = max(_round_up(e, multiple), multiple)
    out = np.zeros((2, e_pad), dtype=np.int32)
    out[:, :e] = edge_index
    mask = np.zeros((e_pad,), dtype=bool)
    mask[:e] = True
    return out, mask


@dataclass
class Graph:
    """Host-side graph: numpy arrays, the unit of dataset loading.

    edge_index is [2, E] int32, row 0 = source, row 1 = destination
    (messages flow source -> destination, PyG convention).
    """

    x: np.ndarray  # [N, F] float32
    y: np.ndarray  # [N] int32
    edge_index: np.ndarray  # [2, E] int32
    num_classes: int
    train_mask: np.ndarray | None = None  # [N] bool
    val_mask: np.ndarray | None = None
    test_mask: np.ndarray | None = None
    yhn: np.ndarray | None = None  # noisy labels, set by noise.flip_label
    name: str = "graph"

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_features(self) -> int:
        return int(self.x.shape[1])

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    def replace(self, **kw) -> "Graph":
        return dataclasses.replace(self, **kw)

    def to_undirected(self) -> "Graph":
        """Symmetrize + dedupe the edge list (reference: ToUndirected on arxiv,
        src/utils/load_utils.py:31-33)."""
        src, dst = self.edge_index
        both = np.concatenate(
            [self.edge_index, np.stack([dst, src])], axis=1
        )
        key = both[0].astype(np.int64) * self.num_nodes + both[1].astype(np.int64)
        _, idx = np.unique(key, return_index=True)
        return self.replace(edge_index=both[:, np.sort(idx)].astype(np.int32))

    def csr(self) -> "CSRGraph":
        return CSRGraph.from_coo(self.edge_index, self.num_nodes)

    def split_idx(self) -> dict:
        """{'train','valid','test'} index arrays from the boolean masks."""
        return {
            "train": np.nonzero(self.train_mask)[0].astype(np.int32),
            "valid": np.nonzero(self.val_mask)[0].astype(np.int32),
            "test": np.nonzero(self.test_mask)[0].astype(np.int32),
        }


@dataclass
class CSRGraph:
    """Device-resident CSR adjacency.

    For sampling we index *out-neighbors of the destination-side frontier*:
    rows are destinations, columns the sources that message them — i.e. this
    is the CSR of the reversed edge list, so ``neighbors(i)`` are exactly the
    j with (j -> i) in E, matching what ``NeighborLoader`` expands
    (reference: src/pipeline.py:75).
    """

    indptr: jax.Array  # [N+1] int32
    indices: jax.Array  # [E] int32, grouped by destination row
    num_nodes: int

    @classmethod
    def from_coo(cls, edge_index: np.ndarray, num_nodes: int) -> "CSRGraph":
        from .. import native

        src, dst = np.asarray(edge_index[0]), np.asarray(edge_index[1])
        indptr, indices = native.coo_to_csr(src, dst, int(num_nodes))
        return cls(
            indptr=jnp.asarray(indptr, dtype=jnp.int32),
            indices=jnp.asarray(indices, dtype=jnp.int32),
            num_nodes=int(num_nodes),
        )

    @property
    def num_edges(self) -> int:
        return int(self.indices.shape[0])

    def degrees(self) -> jax.Array:
        return self.indptr[1:] - self.indptr[:-1]


jax.tree_util.register_pytree_node(
    CSRGraph,
    lambda g: ((g.indptr, g.indices), g.num_nodes),
    lambda aux, children: CSRGraph(children[0], children[1], aux),
)
